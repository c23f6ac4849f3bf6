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

/** PQ encode — per subspace `j`, the argmin over codebook entries of the
  * ADC rank distance `-2⟨s_j,e⟩ + |e|²` (the |s|² term cancels out of the
  * argmin), emitting one small int code per subspace. This is the
  * corpus-width kernel of the n8/n8x/n9 index build: the composed form
  * (`array_sort` over Ksub `struct(d2p, code)` rows per subspace) allocates
  * and comparator-sorts M×Ksub boxed structs PER ROW, which at the trained
  * default (M=8, Ksub=64) dominated the whole query. Here it is one tight
  * primitive loop (M·Ksub·subDim fused multiply-adds) inside whole-stage
  * codegen.
  *
  * Semantics are IDENTICAL to the composed form, pinned by AnnIndexSpec:
  *  - per-entry dot is the strict sequential left-to-right double fold of
  *    `(double)s(i) · e(i)` over `min(subDim, len - j·subDim)` elements —
  *    [[FloatDoubleDot]]'s order against a slice, bitwise-equal;
  *  - |e|² comes from the same left-to-right fold the driver-side codebook
  *    builder uses (recomputed here, identical order);
  *  - the winner comparison is Spark's own double TOTAL order
  *    (`SQLOrderingUtil.compareDoubles` — the comparator `array_sort` used
  *    on the struct's first field: NaN greatest, -0.0 < 0.0), ties to the
  *    LOWER code exactly like the struct sort's second field.
  *
  * The codebook is a driver-trained constant (bounded: M × Ksub × subDim
  * doubles), shipped as a referenced object — not a SQL-surface function
  * (a trained artifact has no literal SQL spelling; SQL users get the
  * unrolled oracle form). */
/** Shared codebook geometry + flattening for [[PqEncode]]/[[PqDtab]]:
  * ONE definition of the rectangularity contract, the flattened
  * [(j·ksub + c)·subDim + i] layout, and the |e|² sequential fold (the
  * exact fold the driver-side codebook builders and the oracles use) —
  * the two kernels can never drift apart on codebook interpretation. */
private[graft] trait PqCodebookParams {
  def codebook: Seq[Seq[Seq[Double]]]
  protected final val m: Int = codebook.length
  protected final val ksub: Int =
    if (codebook.isEmpty) 0 else codebook.head.length
  protected final val subDim: Int =
    if (ksub == 0) 0 else codebook.head.head.length
  require(m > 0 && ksub > 0 && subDim > 0 &&
    codebook.forall(cb => cb.length == ksub && cb.forall(_.length == subDim)),
    s"codebook must be rectangular m×ksub×subDim, got $m×$ksub×$subDim")

  @transient protected final lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * subDim)
    var p = 0
    codebook.foreach(_.foreach(_.foreach { v => a(p) = v; p += 1 }))
    a
  }

  @transient protected final lazy val norms: Array[Double] =
    codebook.flatMap(_.map(_.foldLeft(0.0)((acc, x) => acc + x * x))).toArray
}

case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes with PqCodebookParams {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val len = x.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val nj = math.max(0, math.min(subDim, len - base))
      var bestD = 0.0
      var bestC = 0
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        while (i < nj) {
          acc += x.getFloat(base + i).toDouble *
            flat((j * ksub + c) * subDim + i)
          i += 1
        }
        val d = -2.0 * acc + norms(j * ksub + c)
        if (c == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(d, bestD) < 0) { bestD = d; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val nj = ctx.freshName("nj")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $len = $a.numElements();
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $subDim;
         |  int $nj = java.lang.Math.max(0,
         |    java.lang.Math.min($subDim, $len - $base));
         |  double $bestD = 0.0;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $nj; $i++) {
         |      $acc += ((double) $a.getFloat($base + $i))
         |        * $flatRef[($j * $ksub + $c) * $subDim + $i];
         |    }
         |    double $d = -2.0 * $acc + $normsRef[$j * $ksub + $c];
         |    if ($c == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles($d, $bestD) < 0) { $bestD = $d; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

/** ADC distance tables for a PQ query vector — dtab[j][c] = |s_j|² -
  * 2⟨s_j,e⟩ + |e|² (true L2² per subspace/entry), the query-side twin of
  * [[PqEncode]]. Evaluated on only Q rows, so runtime was never the
  * issue — the composed form unrolled M×Ksub literal arrays and dot
  * expressions into a plan whose ANALYSIS + Janino compile dominated the
  * whole query at the trained Ksub=64 default (each invocation embeds
  * fresh codebook literals ⇒ fresh codegen). One node, one referenced
  * codebook, constant plan size.
  *
  * Arithmetic mirrors the composed columns exactly: |s_j|² is
  * [[FloatVectorDot]]'s sequential self-dot of the slice, ⟨s_j,e⟩ is
  * [[FloatDoubleDot]]'s fold, and the combination associates as
  * `(ss - 2.0·acc) + ee`. */
case class PqDtab(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes with PqCodebookParams {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)

  override def prettyName: String = "pq_dtab"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val len = x.numElements()
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val nj = math.max(0, math.min(subDim, len - base))
      var ss = 0.0
      var i = 0
      while (i < nj) {
        val v = x.getFloat(base + i).toDouble
        ss += v * v
        i += 1
      }
      val row = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        i = 0
        while (i < nj) {
          acc += x.getFloat(base + i).toDouble *
            flat((j * ksub + c) * subDim + i)
          i += 1
        }
        row(c) = (ss - 2.0 * acc) + norms(j * ksub + c)
        c += 1
      }
      rows(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
      val len = ctx.freshName("len")
      val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val nj = ctx.freshName("nj")
      val base = ctx.freshName("base")
      val ss = ctx.freshName("ss")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $len = $a.numElements();
         |Object[] $rows = new Object[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $subDim;
         |  int $nj = java.lang.Math.max(0,
         |    java.lang.Math.min($subDim, $len - $base));
         |  double $ss = 0.0;
         |  for (int $i = 0; $i < $nj; $i++) {
         |    double $v = (double) $a.getFloat($base + $i);
         |    $ss += $v * $v;
         |  }
         |  double[] $row = new double[$ksub];
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $nj; $i++) {
         |      $acc += ((double) $a.getFloat($base + $i))
         |        * $flatRef[($j * $ksub + $c) * $subDim + $i];
         |    }
         |    $row[$c] = ($ss - 2.0 * $acc) + $normsRef[$j * $ksub + $c];
         |  }
         |  $rows[$j] =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqDtab = copy(child = newChild)
}

/** Two-level (hierarchical) nearest-cell assignment — the scale path
  * past [[PqEncode]]'s flat argmin when the cell count itself grows with
  * the corpus (SemDeDup's size-derived cells): argmin over K1 ≈ √cells
  * COARSE centroids first, then argmin over only that coarse bucket's
  * FINE seeds, emitting the fine seed's GLOBAL cell id. Per-row work
  * drops from `cells` dot products to `K1 + bucket` (≈ 2√cells when
  * buckets balance) — the standard IVF-style two-level quantizer
  * (FAISS's coarse+fine composition), here as one codegen'd kernel.
  *
  * Determinism contract (the oracle mirrors every step in SQL):
  *  - both argmins use the ADC rank form `-2⟨v,e⟩ + |e|²` with
  *    sequential double folds and [[PqEncode]]'s total order + lowest-id
  *    tie-break;
  *  - the fine→coarse bucketing is computed ONCE (driver/oracle side)
  *    with the identical arithmetic, so both engines hold the same
  *    partition of the fine seeds;
  *  - identical vectors take identical paths, so planted twins always
  *    share a cell — the same recall-by-construction as the flat form.
  *
  * Every bucket must be NON-EMPTY — enforced at construction: the
  * caller drops empty buckets (with their coarse centroids) before
  * building this expression, and the oracle restricts its coarse rank
  * to the same set. (In exact arithmetic an empty bucket is never
  * selectable — its seed lost only to an identical lower coarse — but
  * floating-point folds over near-identical seeds can round the
  * seed-side and vector-side comparisons differently, so the guard is
  * structural, not arithmetic.) */
case class PqEncodeNested(child: Expression,
    coarse: Seq[Seq[Double]],
    fineByBucket: Seq[Seq[(Int, Seq[Double])]])
    extends UnaryExpression with ExpectsInputTypes {

  private val k1 = coarse.length
  private val dim = if (coarse.isEmpty) 0 else coarse.head.length
  require(k1 > 0 && dim > 0 && coarse.forall(_.length == dim),
    s"coarse book must be rectangular k1×dim, got $k1×$dim")
  require(fineByBucket.length == k1,
    s"need one fine bucket per coarse centroid ($k1), " +
      s"got ${fineByBucket.length}")
  require(fineByBucket.forall(_.forall(_._2.length == dim)),
    "fine seeds must share the coarse dimensionality")
  require(fineByBucket.forall(b =>
    b.map(_._1) == b.map(_._1).sorted), "fine ids must ascend per bucket")
  require(fineByBucket.forall(_.nonEmpty),
    "every coarse bucket must be non-empty — drop empty buckets (and " +
      "their coarse centroids) before constructing the expression")

  @transient private lazy val coarseFlat: Array[Double] =
    coarse.flatten.toArray
  @transient private lazy val coarseNorms: Array[Double] =
    coarse.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray
  @transient private lazy val offsets: Array[Int] =
    fineByBucket.scanLeft(0)(_ + _.length).toArray
  @transient private lazy val fineFlat: Array[Double] =
    fineByBucket.flatMap(_.flatMap(_._2)).toArray
  @transient private lazy val fineNorms: Array[Double] =
    fineByBucket.flatMap(_.map(_._2.foldLeft(0.0)((a, x) => a + x * x)))
      .toArray
  @transient private lazy val fineIds: Array[Int] =
    fineByBucket.flatMap(_.map(_._1)).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "pq_encode_nested"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    def d2(flat: Array[Double], norms: Array[Double], c: Int): Double = {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * flat(c * dim + i); i += 1 }
      -2.0 * acc + norms(c)
    }
    var bestB = 0
    var bestD = 0.0
    var c = 0
    while (c < k1) {
      val d = d2(coarseFlat, coarseNorms, c)
      if (c == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(d, bestD) < 0) { bestD = d; bestB = c }
      c += 1
    }
    var bestF = 0
    var fbD = 0.0
    var first = true
    c = offsets(bestB)
    while (c < offsets(bestB + 1)) {
      val d = d2(fineFlat, fineNorms, c)
      if (first || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(d, fbD) < 0) { fbD = d; bestF = c; first = false }
      c += 1
    }
    fineIds(bestF)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cf = ctx.addReferenceObj("nestCoarse", coarseFlat, "double[]")
      val cn = ctx.addReferenceObj("nestCoarseN", coarseNorms, "double[]")
      val off = ctx.addReferenceObj("nestOff", offsets, "int[]")
      val ff = ctx.addReferenceObj("nestFine", fineFlat, "double[]")
      val fn = ctx.addReferenceObj("nestFineN", fineNorms, "double[]")
      val fi = ctx.addReferenceObj("nestFineIds", fineIds, "int[]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestB = ctx.freshName("bestB")
      val bestD = ctx.freshName("bestD")
      val bestF = ctx.freshName("bestF")
      val first = ctx.freshName("first")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |int $bestB = 0;
         |double $bestD = 0.0;
         |for (int $c = 0; $c < $k1; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $cf[$c * $dim + $i];
         |  }
         |  double $d = -2.0 * $acc + $cn[$c];
         |  if ($c == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |      .compareDoubles($d, $bestD) < 0) { $bestD = $d; $bestB = $c; }
         |}
         |int $bestF = 0;
         |boolean $first = true;
         |for (int $c = $off[$bestB]; $c < $off[$bestB + 1]; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $ff[$c * $dim + $i];
         |  }
         |  double $d = -2.0 * $acc + $fn[$c];
         |  if ($first || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |      .compareDoubles($d, $bestD) < 0) {
         |    $bestD = $d; $bestF = $c; $first = false;
         |  }
         |}
         |${ev.value} = $fi[$bestF];
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeNested = copy(child = newChild)
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

  /** Codegen'd PQ argmin-encode column over a driver-built codebook
    * (m × ksub × subDim). */
  def pqEncode(a: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(a), codebook))

  /** Codegen'd ADC distance-table column (query side of PQ search). */
  def pqDtab(a: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(
      PqDtab(ExpressionUtils.expression(a), codebook))

  /** Codegen'd two-level nearest-cell column (coarse → fine argmin). */
  def pqEncodeNested(a: Column, coarse: Seq[Seq[Double]],
      fineByBucket: Seq[Seq[(Int, Seq[Double])]]): Column =
    ExpressionUtils.column(
      PqEncodeNested(ExpressionUtils.expression(a), coarse, fineByBucket))

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
