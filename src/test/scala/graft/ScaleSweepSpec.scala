package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.tools.ScaleSweep

/** The scaling-curve evidence in BASELINE.md rests on the fan-out
  * generator's decorrelation properties — pin them: copies preserve the
  * source corpus's duplicate structure EXACTLY (per-copy substitution is
  * injective), per-copy token spaces are pairwise DISJOINT so the
  * vocabulary grows with the fan-out (a closed shared vocabulary made
  * pair candidates grow quadratically in the factor — the round-7
  * measurement artifact), and ids behave as documented. */
class ScaleSweepSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src1"))
  }

  test("documents fan-out: ids dense, dup structure per copy, decorrelated across copies") {
    val d = docs(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // exact dup of 0 — must stay a dup in EVERY copy
      (2L, "epsilon zeta eta theta iota kappa"))
    val out = ScaleSweep.scaleDocuments(d, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.size === 9)
    // id layout: copy k shifts by k*(max+1)
    assert(out.keySet === (0L until 9L).toSet)
    // within-copy dup structure preserved by the bijection
    for (k <- 0 until 3) {
      assert(out(k * 3 + 0L) === out(k * 3 + 1L),
        s"copy $k must preserve the planted exact dup")
      assert(out(k * 3 + 0L) !== out(k * 3 + 2L))
    }
    // copy 0 is verbatim
    assert(out(0L) === "alpha beta gamma delta")
    // cross-copy decorrelation, open-vocabulary form: each copy's token
    // space is DISJOINT from every other copy's (and from the source),
    // so no token — let alone shingle, band key, or signature — can
    // collide across copies, and the corpus vocabulary grows ×factor
    // exactly as real corpus growth adds vocabulary
    val copyVocabs = (0 until 3).map { k =>
      (0 until 3).flatMap(i => out(k * 3 + i.toLong).split(" ")).toSet
    }
    for (a <- 0 until 3; b <- a + 1 until 3) {
      assert(copyVocabs(a).intersect(copyVocabs(b)).isEmpty,
        s"copies $a and $b share tokens — closed-vocab artifact is back")
    }
    for (k <- 1 until 3) {
      val orig = out(0L).split(" ").toSeq
      val clone = out(k * 3 + 0L).split(" ").toSeq
      assert(orig.length === clone.length)
      orig.zip(clone).foreach { case (o, c) =>
        assert(o !== c, s"copy $k has a fixed point at token '$o'")
      }
      def shingles(t: Seq[String]) = t.sliding(3).map(_.mkString(" ")).toSet
      assert(shingles(orig).intersect(shingles(clone)).isEmpty,
        s"copy $k clone shares 3-gram shingles with the original")
    }
    // the dedup family's planted-twin convention must hold at any factor:
    // exact dedup on the doubled fan-out collapses every pair
    val scaled = ScaleSweep.scaleDocuments(d, 3)
      .select(col("doc_id"), col("text"))
    val dd = Dedup.exactDedup(scaled.unionByName(scaled))
    assert(dd.agg(min(col("copies"))).head.getLong(0) >= 2L)
  }

  test("embeddings fan-out: copy 0 verbatim, clones perturbed, ids dense") {
    import spark.implicits._
    val e = Seq((0L, Array(1.0f, 0.0f, 0.5f), 1),
        (1L, Array(0.2f, 0.9f, 0.1f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = ScaleSweep.scaleEmbeddings(e, 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).toArray).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    assert(out(0L).toSeq === Seq(1.0f, 0.0f, 0.5f))
    // the clone differs in every perturbed component but stays close
    // (offsets are bounded by ~0.05 in magnitude)
    val diff = out(2L).zip(out(0L)).map { case (a, b) => math.abs(a - b) }
    assert(diff.forall(_ <= 0.051f))
    assert(diff.exists(_ > 0f), "clone must not be a verbatim copy")
  }
}
