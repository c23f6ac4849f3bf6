// Hosted inside the org.apache.spark.sql package scope — same rationale as
// VectorExpressions: native Expressions need private[sql] API surface.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The rolling fold itself, shared by the scalar and array expressions;
  * a standalone object so generated code can call the static forwarder. */
object RollHash {
  def hash(input: UTF8String): Long = {
    val s = input.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }
}

/** Native Catalyst expression for the repo-convention rolling text hash
  * `h = (h*31 + codepoint) mod 1e9+7`, folded left-to-right over the
  * string's characters.
  *
  * The composed form — `aggregate(filter(split(c, ""), _ =!= ""), 0L,
  * (h, ch) => pmod(h*31 + ascii(ch), P))` — is a higher-order expression
  * chain that Spark evaluates INTERPRETED: per character it materializes a
  * one-char string, binds lambda variables, and tree-walks a pmod
  * expression. That chain sits under every token hash, which sits under
  * every shingle, which sits under the whole dedup family (d2/d3/d4/d5/
  * d7/d9) — the hottest scalar in the text tier. This expression is the
  * identical fold as one compiled loop.
  *
  * Parity notes: the old form's `ascii(one-char string)` is the char's
  * code point for everything in the BMP (and the DuckDB twin's `ascii` is
  * the code point outright), so this iterates CODE POINTS — bitwise-equal
  * results on BMP text, and aligned with the oracle beyond it. Empty and
  * null inputs behave exactly as before (0 and null).
  */
case class StringRollHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "roll_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringRollHash = copy(child = newChild)
}

/** Array form of [[StringRollHash]]: per-token rolling hashes of a token
  * array in ONE expression evaluation. The composed form —
  * `transform(toks, t => roll_hash(t))` — pays the interpreted
  * ArrayTransform machinery per element (lambda-variable binding, boxed
  * hand-off) even with a native child; this loops the array natively. It
  * feeds the shingle pipeline under the whole MinHash/Jaccard family.
  * Null elements hash to null, matching the transform formulation's
  * propagation. */
case class TokenRollHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "roll_hashes"

  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (!elemsNullable) {
      // null-free elements ⇒ primitive long[] (no per-element boxing)
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = RollHash.hash(arr.getUTF8String(i)); i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) null
        else RollHash.hash(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  // When the input array is null-free the generated loop fills a primitive
  // long[] (GenericArrayData has a long[] constructor) — no per-element
  // boxing; the nullable path boxes EXPLICITLY via Long.valueOf rather
  // than a bare (Object) cast, so the generated source never relies on
  // Janino accepting a primitive-to-Object boxing conversion (a silent
  // fallback-to-interpreted risk, which would cost exactly the speedup
  // this expression exists for).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      if (!elemsNullable)
        s"""
           |int $n = $a.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = org.apache.spark.sql.graft.RollHash.hash(
           |    $a.getUTF8String($i));
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |int $n = $a.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $a.isNullAt($i) ? null
           |    : (Object) java.lang.Long.valueOf(
           |        org.apache.spark.sql.graft.RollHash.hash(
           |          $a.getUTF8String($i)));
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenRollHashes = copy(child = newChild)
}

/** Hashed 3-gram shingles combined arithmetically from a per-token-hash
  * array: out(j) = (th(j)*C1 + th(j+1)*C2 + th(j+2)) mod P, empty below 3
  * tokens — the native form of the `when(size<3, …).otherwise(transform(
  * sequence…))` chain in [[graft.functions.TextFunctions]], which paid
  * interpreted lambda machinery per shingle. Completes the native tier of
  * the shingle pipeline (tokens → [[TokenRollHashes]] → this) that feeds
  * the whole MinHash/Jaccard family. A window containing a null token
  * hash yields a null shingle hash, matching the composed form. */
case class HashedShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  private val C1 = 1000003L
  private val C2 = 8191L
  private val P = 1000000007L

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "hashed_shingles"

  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) new GenericArrayData(Array.empty[Long])
    else if (!elemsNullable) {
      // null-free token hashes ⇒ primitive long[] (no per-element boxing)
      val out = new Array[Long](n - 2)
      var j = 0
      while (j < n - 2) {
        out(j) = (arr.getLong(j) * C1 + arr.getLong(j + 1) * C2 +
          arr.getLong(j + 2)) % P
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n - 2)
      var j = 0
      while (j < n - 2) {
        out(j) =
          if (arr.isNullAt(j) || arr.isNullAt(j + 1) || arr.isNullAt(j + 2))
            null
          else (arr.getLong(j) * C1 + arr.getLong(j + 1) * C2 +
            arr.getLong(j + 2)) % P
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  // same boxing discipline as TokenRollHashes: primitive long[] on the
  // null-free path, explicit Long.valueOf on the nullable one — never a
  // bare primitive-to-Object cast for Janino to interpret
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      if (!elemsNullable)
        s"""
           |int $n = $a.numElements();
           |long[] $out = new long[$n < 3 ? 0 : $n - 2];
           |for (int $j = 0; $j < $n - 2; $j++) {
           |  $out[$j] = ($a.getLong($j) * ${C1}L +
           |    $a.getLong($j + 1) * ${C2}L +
           |    $a.getLong($j + 2)) % ${P}L;
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |int $n = $a.numElements();
           |Object[] $out = new Object[$n < 3 ? 0 : $n - 2];
           |for (int $j = 0; $j < $n - 2; $j++) {
           |  $out[$j] =
           |    ($a.isNullAt($j) || $a.isNullAt($j + 1) || $a.isNullAt($j + 2))
           |      ? null
           |      : (Object) java.lang.Long.valueOf(
           |          ($a.getLong($j) * ${C1}L +
           |            $a.getLong($j + 1) * ${C2}L +
           |            $a.getLong($j + 2)) % ${P}L);
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HashedShingles = copy(child = newChild)
}

/** Horner n-gram hashes over a token-hash array: out[j] = fold h =
  * (h·C1 + th[j+i]) mod P over the n hashes starting at j — the
  * general-width sibling of the 3-gram [[HashedShingles]] combine (which
  * keeps its distinct-multiplier form for d2/d3 oracle stability). Order-
  * sensitive, 8 bytes per shingle position, one compiled loop per doc —
  * the corpus-width hot path under duplicate-SPAN detection, where every
  * token position (not just distinct shingles) flows to the counting
  * shuffle. */
case class SpanHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "span width must be >= 1")

  private val C1 = 1000003L
  private val P = 1000000007L

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "span_hashes"

  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) new GenericArrayData(Array.empty[Long])
    else if (!elemsNullable) {
      val out = new Array[Long](len - n + 1)
      var j = 0
      while (j < len - n + 1) {
        var h = 0L
        var i = 0
        while (i < n) { h = (h * C1 + arr.getLong(j + i)) % P; i += 1 }
        out(j) = h
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](len - n + 1)
      var j = 0
      while (j < len - n + 1) {
        var anyNull = false
        var h = 0L
        var i = 0
        while (i < n) {
          if (arr.isNullAt(j + i)) anyNull = true
          else h = (h * C1 + arr.getLong(j + i)) % P
          i += 1
        }
        out(j) = if (anyNull) null else java.lang.Long.valueOf(h)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      if (!elemsNullable)
        s"""
           |int $len = $a.numElements();
           |long[] $out = new long[$len < $n ? 0 : $len - ${n - 1}];
           |for (int $j = 0; $j < $len - ${n - 1}; $j++) {
           |  long $h = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $h = ($h * ${C1}L + $a.getLong($j + $i)) % ${P}L;
           |  }
           |  $out[$j] = $h;
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else {
        val anyNull = ctx.freshName("anyNull")
        s"""
           |int $len = $a.numElements();
           |Object[] $out = new Object[$len < $n ? 0 : $len - ${n - 1}];
           |for (int $j = 0; $j < $len - ${n - 1}; $j++) {
           |  boolean $anyNull = false;
           |  long $h = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($j + $i)) { $anyNull = true; }
           |    else { $h = ($h * ${C1}L + $a.getLong($j + $i)) % ${P}L; }
           |  }
           |  $out[$j] = $anyNull
           |    ? null : (Object) java.lang.Long.valueOf($h);
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(
      newChild: Expression): SpanHashes = copy(child = newChild)
}

object TextExpressions {
  /** Spark's native integral division (the SQL `DIV`): pure long
    * arithmetic end to end, exact to 2⁶³ — unlike any form routed
    * through a double division, which silently loses exactness past
    * 2⁵³. Exposed here because IntegralDivide's Column wrapper lives
    * behind `private[sql]` (same altitude as the codegen shims). */
  def longDiv(a: Column, b: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd rolling-hash column — drop-in for the HOF fold. */
  def rollHash(c: Column): Column =
    ExpressionUtils.column(StringRollHash(ExpressionUtils.expression(c)))

  /** Codegen'd hashed 3-gram shingles from a token-hash array. */
  def hashedShingles(c: Column): Column =
    ExpressionUtils.column(HashedShingles(ExpressionUtils.expression(c)))

  /** Codegen'd per-token rolling hashes — drop-in for
    * `transform(toks, t => rollHash(t))`. */
  def rollHashes(c: Column): Column =
    ExpressionUtils.column(TokenRollHashes(ExpressionUtils.expression(c)))

  /** Codegen'd Horner n-gram hashes from a token-hash array. */
  def spanHashes(c: Column, n: Int): Column =
    ExpressionUtils.column(SpanHashes(ExpressionUtils.expression(c), n))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val rollHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("roll_hash"),
    new ExpressionInfo(classOf[StringRollHash].getName, "roll_hash"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "roll_hash takes exactly 1 argument")
      StringRollHash(children.head)
    })

  // SQL descriptors for the remaining text expressions — the full native
  // surface the DataFrame tier uses must be reachable from `spark.sql`
  // text too, or a SQL-only deployment silently falls back to interpreted
  // HOF folds for the dedup family's hottest loops (SqlSurfaceSpec pins
  // the parity).

  val tokenHashesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("token_hashes"),
    new ExpressionInfo(classOf[TokenRollHashes].getName, "token_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "token_hashes takes exactly 1 argument")
      TokenRollHashes(children.head)
    })

  val hashedShinglesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_shingles"),
    new ExpressionInfo(classOf[HashedShingles].getName, "hashed_shingles"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        "hashed_shingles takes exactly 1 argument")
      HashedShingles(children.head)
    })

  val spanHashesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("span_hashes"),
    new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "span_hashes takes exactly 2 arguments (array, n)")
      val n = children(1) match {
        case e if e.foldable && e.dataType ==
          org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"span_hashes n must be an int literal, got $other")
      }
      SpanHashes(children.head, n)
    })
}
