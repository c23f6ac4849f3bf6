package graft

import graft.io.Sources
import graft.sim.Similarity

/** E108 cluster profile: the partition/profile invariants on the driver
  * corpus, and exact purity on a planted separable fixture. */
class ClusterProfileSpec extends SparkSpec {
  import spark.implicits._

  test("cl1: clusters partition the corpus; profile fields are consistent") {
    val emb = Sources.table(spark, sf0001, "embeddings")
    val total = emb.count()
    val rows = Similarity.clusterProfile(emb).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === total,
      "every vector lands in exactly one cluster")
    val ids = rows.map(_.getAs[Long]("cluster"))
    assert(ids.distinct.length === ids.length)
    assert(ids.forall(c => c >= 0 && c < Similarity.NumCells))
    rows.foreach { r =>
      val (n, dn, nl, p) = (r.getAs[Long]("n"),
        r.getAs[Long]("dominant_n"), r.getAs[Long]("n_labels"),
        r.getAs[Double]("purity"))
      assert(p === dn.toDouble / n.toDouble)
      assert(dn >= 1L && dn <= n)
      assert(nl >= 1L && nl <= 10L)
      // the modal label must carry at least the even share
      assert(dn * nl >= n, s"dominant count below even share: $r")
    }
  }

  test("cb1: quota per cluster, full coverage, deterministic pick order") {
    val emb = Sources.table(spark, sf0001, "embeddings")
    val profile = Similarity.clusterProfile(emb).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n")).toMap
    val out = Similarity.clusterBalancedSample(emb).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster"))
    assert(byCluster.keySet === profile.keySet,
      "every non-empty cluster is represented — the balance property")
    byCluster.foreach { case (c, rows) =>
      val expect = math.min(Similarity.CbPerCluster.toLong, profile(c))
      assert(rows.length.toLong === expect,
        s"cluster $c: quota is min(perCluster, cluster size)")
      assert(rows.map(_.getAs[Long]("pick_rank")).sorted.toSeq ===
        (1L to expect))
    }
    // rerun-stable: the content-hash order makes the pick a function of
    // the data, not the scheduler
    val again = Similarity.clusterBalancedSample(emb).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("cl1: a separable fixture profiles at purity 1.0 per cluster") {
    // 256 vectors (the dense TrainSample prefix the trainer requires):
    // 16 exact one-hot directions, 16 copies each, label = direction.
    // Lloyd seeded by the first 16 rows converges immediately; every
    // cluster is exactly one direction's copies.
    val rows = (0 until 256).map { i =>
      val dir = i % 16
      val v = Array.fill(16)(0f)
      v(dir) = 1f
      (i.toLong, v.toSeq, dir)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterProfile(emb).collect()
    assert(out.length === 16)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === 16L)
      assert(r.getAs[Long]("n_labels") === 1L)
      assert(r.getAs[Double]("purity") === 1.0)
      assert(r.getAs[Int]("dominant_label") ===
        r.getAs[Long]("cluster").toInt,
        "seed order makes cluster id equal the planted direction")
    }
  }
}
