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
}
