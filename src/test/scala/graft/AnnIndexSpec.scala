package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.io.Sources
import graft.sim.Similarity

/** E68: incremental IVF-SQ index maintenance — appending a batch against
  * the same quantizer seeds must equal a full rebuild BIT-FOR-BIT, in
  * both index rows and search results (the property that makes per-batch
  * index cost legitimate: nothing about the existing rows changes). */
class AnnIndexSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[(Long, Long, Seq[Float], Long)] =
    df.collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getSeq[Float](r.fieldIndex("codes")),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("n2")))
    }.toSet

  test("append == rebuild, for index rows and search results") {
    val emb = Sources.table(spark, sf0001, "embeddings")
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    assert(batch.count() > 0, "fixture: the batch must be non-empty")
    // seeds always come from the BASE corpus — the batch must not move
    // the quantizer (that is what makes the append incremental)
    val rebuilt = Similarity.ivfSqIndex(emb, base)
    val appended = Similarity.ivfSqAppend(
      Similarity.ivfSqIndex(base, base), batch, base)
    assert(rows(appended) === rows(rebuilt))
    // search over the appended index returns exactly the rebuild's
    // results, and the appended batch is actually searchable
    val q = emb.filter(col("vec_id") < 10)
    def res(ix: DataFrame) =
      Similarity.ivfSqSearch(ix, q, base, k = 5).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
    val fromAppended = res(appended)
    assert(fromAppended === res(rebuilt))
    assert(fromAppended.exists(_._3 >= 400),
      "some neighbor should come from the appended batch")
  }

  test("cell-partitioned index on disk: probes prune to their directories") {
    val emb = Sources.table(spark, sf0001, "embeddings")
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsq")
      .toString
    val path = s"$dir/index"
    // incremental persistence: base write, then the batch APPENDS as new
    // files inside existing cell dirs — base files never rewrite
    Similarity.writeIvfSqIndex(Similarity.ivfSqIndex(base, base), path)
    val baseFiles = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell=")).map(d =>
        d.getName -> d.listFiles().map(_.getName).toSet).toMap
    Similarity.writeIvfSqIndex(Similarity.ivfSqIndex(batch, base), path)
    val afterFiles = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell=")).map(d =>
        d.getName -> d.listFiles().map(_.getName).toSet).toMap
    baseFiles.foreach { case (cell, files) =>
      assert(files.subsetOf(afterFiles(cell)),
        s"$cell: base files must survive the append untouched")
    }
    // the disk round-trip equals the in-memory rebuild
    val back = spark.read.parquet(path)
      .select("vec_id", "cell", "codes", "n2")
    assert(rows(back.withColumn("cell", col("cell").cast("long")))
      === rows(Similarity.ivfSqIndex(emb, base)
        .withColumn("cell", col("cell").cast("long"))))
    // a probe's read PRUNES: the scan plan carries a cell partition
    // filter, so only the probed directories are opened
    val probed = back.filter(col("cell").isin(3, 7))
    val plan = probed.queryExecution.executedPlan.toString
    // a partitioned scan ALWAYS prints a PartitionFilters entry (possibly
    // empty) and 'cell' appears in any schema dump — assert the filter
    // list itself is non-empty and names the cell column
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      plan.take(1500))
    // search over the disk index matches search over the live one
    val q = emb.filter(col("vec_id") < 10)
    def res2(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSqSearch(ix, q, base, k = 5).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
    assert(res2(back) === res2(Similarity.ivfSqIndex(emb, base)))
  }

  test("native PqEncode == composed argmin, seeded and trained codebooks") {
    // the codegen'd argmin loop must emit the IDENTICAL code arrays as
    // the array_sort-over-structs formulation it replaced — same fold
    // order, same double total-order comparison, same lower-code
    // tie-break — across the whole fixture corpus, for both codebook
    // builders (64 trained entries exercises deep argmin chains)
    val emb = Sources.table(spark, sf0001, "embeddings")
    for (cb <- Seq(Similarity.pqCodebook(emb),
        Similarity.pqTrainedCodebook(emb))) {
      val both = emb.select(col("vec_id"),
        Similarity.pqCodes(cb, col("embedding")).as("fast"),
        Similarity.pqCodesComposed(cb, col("embedding")).as("composed"))
      val diverged = both
        .filter(col("fast") =!= col("composed")).count()
      assert(diverged === 0)
      // and the interpreted eval path (nullSafeEval, no codegen) agrees
      // with the codegen'd result on a sample
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val cbSeq = cb.toSeq.map(_.toSeq.map(_._1.toSeq))
      val sample = emb.orderBy(col("vec_id")).limit(50)
        .select(col("embedding"), Similarity.pqCodes(cb, col("embedding")))
        .collect()
      sample.foreach { r =>
        val viaEval = org.apache.spark.sql.graft.PqEncode(
          Literal.create(r.getSeq[Float](0), ArrayType(FloatType)), cbSeq)
          .eval(null).asInstanceOf[
            org.apache.spark.sql.catalyst.util.ArrayData].toIntArray.toSeq
        assert(viaEval === r.getSeq[Int](1))
      }
      // query-side dtab: native node == composed unrolled-literal form,
      // bit-for-bit (doubleToLongBits) across every (j, c) table entry
      val dtabs = emb.filter(col("vec_id") < 10).select(col("vec_id"),
        Similarity.pqDtab(cb, col("embedding")).as("fast"),
        Similarity.pqDtabComposed(cb, col("embedding")).as("composed"))
        .collect()
      dtabs.foreach { r =>
        def bits(i: Int): Seq[Seq[Long]] =
          r.getSeq[scala.collection.Seq[Double]](i)
            .map(_.map(java.lang.Double.doubleToLongBits).toSeq).toSeq
        assert(bits(1) === bits(2), s"vec ${r.getLong(0)}")
      }
    }
  }
}
