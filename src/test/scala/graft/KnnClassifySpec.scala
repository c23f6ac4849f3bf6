package graft

import graft.io.Sources
import graft.sim.Similarity

/** E103 k-NN label propagation: prediction shape on the driver corpus,
  * exact behavior on planted neighborhoods (unanimous vote, rank
  * tie-break, twin adoption). The oracle verifies the driver query
  * value-for-value; this spec pins the CLASSIFIER semantics a hash can't
  * explain: who wins and why. */
class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("knn1: one prediction per live query, votes bounded by k") {
    val out = Similarity
      .knnClassify(Sources.table(spark, sf0001, "embeddings")).collect()
    assert(out.length === Similarity.KnnQueries,
      "every nonzero-norm query must receive exactly one prediction")
    out.foreach { r =>
      val votes = r.getAs[Long]("votes")
      assert(votes >= 1L && votes <= Similarity.KnnK.toLong,
        s"vote count out of range: $votes")
      assert(r.getAs[Boolean]("correct") ===
        (r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")),
        "correct must be pred == ground truth")
    }
  }

  test("knn1: unanimous planted neighborhood wins with a full vote") {
    // query 0 points at (1,0); three pool vectors lie on (nearly) the same
    // direction with label 7, three orthogonal with label 3 — the top-3
    // neighborhood is unanimously 7.
    val df = emb(Seq(
      (0L, Seq(1f, 0f), 7), // ground truth matches the neighborhood
      (2L, Seq(0.9f, 0.1f), 7),
      (3L, Seq(0.8f, 0.05f), 7),
      (4L, Seq(1.0f, 0.2f), 7),
      (5L, Seq(0f, 1f), 3),
      (6L, Seq(0.1f, 1f), 3),
      (7L, Seq(0f, 0.9f), 3)))
    val out = Similarity.knnClassify(df, numQueries = 1, k = 3).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Int]("pred_label") === 7)
    assert(r.getAs[Long]("votes") === 3L)
    assert(r.getAs[Boolean]("correct"))
  }

  test("knn1: vote tie breaks toward the nearer neighbor's label") {
    // k=2, one vote each: label 9 holds rank 1 (closer), label 3 rank 2 —
    // the tie must go to 9 (best_rank ASC), not to the smaller label.
    val df = emb(Seq(
      (0L, Seq(1f, 0f), 3),
      (2L, Seq(0.99f, 0.01f), 9), // rank 1
      (3L, Seq(0.9f, 0.2f), 3), // rank 2
      (4L, Seq(0f, 1f), 5)))
    val out = Similarity.knnClassify(df, numQueries = 1, k = 2).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Int]("pred_label") === 9,
      "1-1 vote tie must resolve by best neighbor rank")
    assert(!out.head.getAs[Boolean]("correct"))
  }

  test("knn1: a planted twin at k=1 adopts its twin's label exactly") {
    val df = emb(Seq(
      (0L, Seq(0.3f, 0.7f), 1),
      (2L, Seq(0.3f, 0.7f), 8), // identical direction — cosine 1
      (3L, Seq(1f, 0f), 2),
      (4L, Seq(0f, 1f), 4)))
    val out = Similarity.knnClassify(df, numQueries = 1, k = 1).collect()
    assert(out.head.getAs[Int]("pred_label") === 8)
  }

  test("hn1: picks nearest same-label positive and cross-label negative") {
    // anchor label 5 at (1,0): same-label pool twin at cos≈0.995, but a
    // DIFFERENT-label vector sits exactly on the anchor — the hard
    // negative, so the margin must come out negative.
    val df = emb(Seq(
      (0L, Seq(1f, 0f), 5),
      (2L, Seq(0.9f, 0.1f), 5), // positive
      (3L, Seq(1f, 0f), 7), // hard negative, cosine 1.0
      (4L, Seq(0f, 1f), 7),
      (5L, Seq(0.5f, 0.5f), 5)))
    val out = Similarity.hardNegatives(df, numQueries = 1).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("pos_id") === 2L)
    assert(r.getAs[Long]("neg_id") === 3L)
    assert(r.getAs[Double]("neg_cosine") === 1.0)
    assert(r.getAs[Double]("margin") ===
      r.getAs[Double]("pos_cosine") - r.getAs[Double]("neg_cosine"))
    assert(r.getAs[Double]("margin") < 0.0,
      "the planted negative is closer than any positive")
  }

  test("hn1: an anchor with no same-label pool keeps a NULL positive") {
    val df = emb(Seq(
      (0L, Seq(1f, 0f), 9), // label 9 exists nowhere in the pool
      (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0f, 1f), 2)))
    val out = Similarity.hardNegatives(df, numQueries = 1).collect()
    assert(out.length === 1, "missing side must not drop the anchor")
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("pos_id")))
    assert(r.isNullAt(r.fieldIndex("margin")))
    assert(r.getAs[Long]("neg_id") === 2L)
  }

  test("knn1: zero-norm queries and pool vectors are excluded") {
    val df = emb(Seq(
      (0L, Seq(0f, 0f), 1), // zero-norm query: undefined cosine, no row
      (1L, Seq(1f, 0f), 2),
      (2L, Seq(0f, 0f), 9), // zero-norm pool vector: never a neighbor
      (3L, Seq(0.9f, 0.1f), 6),
      (4L, Seq(0.8f, 0f), 6)))
    val out = Similarity.knnClassify(df, numQueries = 2, k = 2).collect()
    assert(out.map(_.getAs[Long]("query_id")).toSet === Set(1L))
    assert(out.head.getAs[Int]("pred_label") === 6)
  }
}
