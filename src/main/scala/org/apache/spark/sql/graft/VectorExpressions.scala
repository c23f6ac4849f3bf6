// Hosted inside the org.apache.spark.sql package scope: a custom Catalyst
// Expression needs private[sql] API surface (AbstractDataType for input
// typing, ExpressionUtils for Column wrapping) — the standard shape for a
// Spark extension library's native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the one
  * hot-path scalar where the built-in operators genuinely can't keep up:
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a higher-order expression
  * chain that Spark evaluates INTERPRETED (per element: lambda-variable
  * binding, boxing, null checks), which dominates every similarity-join
  * stage. This expression compiles to a tight primitive loop inside
  * whole-stage codegen.
  *
  * Semantics are IDENTICAL to the fold form: a strict sequential
  * left-to-right accumulation in double of `(double)a(i) * (double)b(i)` —
  * the same IEEE operation order — so results are bitwise-equal to the
  * HOF formulation and to the DuckDB `list_reduce` oracle mirror
  * ([[graft.sim.Similarity.dotSql]]). Preference order per SURVEY §7:
  * compose built-ins first (done elsewhere); native `Expression` with
  * `doGenCode` where the built-ins can't express it EFFICIENTLY; UDF never.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Float-vector × double-vector dot product — same strict sequential
  * left-to-right double accumulation as [[FloatVectorDot]], for the case
  * where one side is a DOUBLE array (e.g. trained k-means centroids,
  * which must stay double on both engines for bitwise oracle parity —
  * rounding them to float only on the Spark side would diverge from the
  * DuckDB mirror's double centroids). */
case class FloatDoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "fdvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDot =
    copy(left = newLeft, right = newRight)
}

/** Per-vector-symmetric int8 quantization codes — `floor(x / max|x| ·
  * 127)` per element, the n6/n7 index-build kernel. The HOF formulation
  * (an `aggregate` max-fold for max|x| plus a `transform`) evaluates
  * INTERPRETED per element twice over every vector of the corpus at
  * index-build time; this compiles to two tight primitive loops.
  *
  * Semantics are identical to the HOF form on real (null/NaN-free)
  * vectors — double division and multiply in the same IEEE order, floor
  * exact, values in [-127, 127] exact in float — and to the DuckDB quant
  * CTE mirror ([[graft.sim.Similarity]]). An all-zero vector yields
  * all-zero codes (the callers' n2 > 0 filter drops it on both engines).
  * Null ELEMENTS are treated as 0 (the corpus contract is dense
  * vectors); a null array is null. */
case class Int8Quant(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "fvec_quant8"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val v = if (x.isNullAt(i)) 0.0 else math.abs(x.getFloat(i).toDouble)
      if (v > ma) ma = v
      i += 1
    }
    val out = new Array[Float](n)
    if (ma != 0.0) {
      i = 0
      while (i < n) {
        val v = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
        out(i) = math.floor(v / ma * 127.0).toFloat
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ma = ctx.freshName("ma")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $ma = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.isNullAt($i) ? 0.0
         |    : java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $ma) $ma = $v;
         |}
         |float[] $out = new float[$n];
         |if ($ma != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |    $out[$i] = (float) java.lang.Math.floor($v / $ma * 127.0);
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Int8Quant = copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd float-vector dot product column. */
  def fvecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd float-vector × double-vector dot product column. */
  def fdvecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDoubleDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd int8 scalar-quantization codes column. */
  def fvecQuant8(a: Column): Column =
    ExpressionUtils.column(Int8Quant(ExpressionUtils.expression(a)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val fvecDotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("fvec_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "fvec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "fvec_dot takes exactly 2 arguments")
      FloatVectorDot(children.head, children(1))
    })

  val fdvecDotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("fdvec_dot"),
    new ExpressionInfo(classOf[FloatDoubleDot].getName, "fdvec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "fdvec_dot takes exactly 2 arguments")
      FloatDoubleDot(children.head, children(1))
    })

  val fvecQuant8Descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("fvec_quant8"),
    new ExpressionInfo(classOf[Int8Quant].getName, "fvec_quant8"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "fvec_quant8 takes exactly 1 argument")
      Int8Quant(children.head)
    })

  /** Register the vector functions into an existing session's registry —
    * the imperative twin of [[GraftExtensions]] for sessions already
    * built. */
  def register(spark: SparkSession): Unit =
    Seq(fvecDotDescriptor, fdvecDotDescriptor, fvecQuant8Descriptor)
      .foreach { d =>
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
      }
}

/** SparkSessionExtensions hook: `spark.sql.extensions =
  * org.apache.spark.sql.graft.GraftExtensions` makes `fvec_dot` available
  * to pure-SQL users — the standard deployment shape for an engine
  * extension library. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.fvecDotDescriptor)
    ext.injectFunction(VectorExpressions.fdvecDotDescriptor)
    ext.injectFunction(VectorExpressions.fvecQuant8Descriptor)
    ext.injectFunction(TextExpressions.rollHashDescriptor)
    ext.injectFunction(TextExpressions.tokenHashesDescriptor)
    ext.injectFunction(TextExpressions.hashedShinglesDescriptor)
    ext.injectFunction(TextExpressions.spanHashesDescriptor)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
