package graft

import graft.text.TextAnalysis

/** E105 BM25 ranked retrieval: the relevance-model behaviors a value hash
  * can't explain — rare terms outweigh common ones (idf), repeated terms
  * saturate (k1), shorter docs win at equal overlap (b), and the planted
  * near-copy is always rank 1. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def ranked(d: org.apache.spark.sql.DataFrame, q: Int, k: Int) =
    TextAnalysis.bm25TopKRetrieval(d, numQueries = q, k = k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score")))

  test("bm25: the near-copy of the query ranks first") {
    val d = docs(
      (0L, "alpha beta gamma delta epsilon"),
      (10L, "alpha beta gamma delta epsilon zeta"), // near-copy
      (11L, "alpha something else entirely here"), // one shared term
      (12L, "unrelated text with no overlap at all"))
    val out = ranked(d, 1, 3)
    assert(out.head === ((0L, 1L, 10L, out.head._4)))
    assert(out.map(_._3).toSeq === Seq(10L, 11L),
      "zero-overlap docs must not appear at all")
  }

  test("bm25: a rare shared term outweighs a ubiquitous one") {
    // 'common' appears in every doc (df=6 of N=6), 'rarex' only in the
    // query and doc 20 (df=2): doc 20 must outrank doc 21 even though
    // both match exactly one query term once and have equal length.
    // filler is LONGER than doc 21 so length normalization keeps the
    // common-term docs ranked below it
    val filler = Seq("aa bb", "cc dd", "ee ff", "gg hh")
      .zipWithIndex.map { case (t, i) =>
        (30L + i, s"$t $t $t common pad pad")
      }
    val d = docs(Seq(
      (0L, "rarex common query words here"),
      (20L, "rarex one two three four"),
      (21L, "common one two three four")) ++ filler: _*)
    val out = ranked(d, 1, 2)
    assert(out.head._3 === 20L, s"rare-term doc must win: ${out.toSeq}")
    assert(out(1)._3 === 21L)
    assert(out.head._4 > out(1)._4)
  }

  test("bm25: shorter doc wins at equal term overlap (length norm)") {
    val d = docs(
      (0L, "target term query"),
      (20L, "target padded with many extra words here making it long"),
      (21L, "target short"))
    val out = ranked(d, 1, 2)
    assert(out.head._3 === 21L,
      s"b=0.75 must favor the shorter match: ${out.toSeq}")
  }

  test("bm25: tf saturates — 5x the term count is far less than 5x score") {
    val d = docs(
      (0L, "needle query"),
      (20L, "needle needle needle needle needle"),
      (21L, "needle aaaa bbbb cccc dddd"))
    val out = ranked(d, 1, 2)
    val (s20, s21) = (out.find(_._3 == 20L).get._4,
      out.find(_._3 == 21L).get._4)
    assert(s20 > s21, "more occurrences still score higher")
    assert(s20 < 5.0 * s21 / 2.0,
      s"k1 saturation must cap the tf payoff: $s20 vs $s21")
  }

  test("rrf1: a doc both systems rank beats every single-system doc") {
    val d = docs(
      (0L, "shared words about spark engines"),
      (1L, "shared words about spark engines too"), // text near-copy
      (2L, "shared words about spark engines also"), // text match only
      (3L, "completely disjoint other content body"), // vector match only
      (4L, "nothing in common with anything here"))
    val e = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0.99f, 0.01f), 0), // vector twin of the query
      (2L, Seq(0f, 1f), 1), // orthogonal: dense ignores it
      (3L, Seq(0.98f, 0.02f), 0), // dense match, no shared text
      (4L, Seq(-1f, 0.1f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = TextAnalysis.hybridRrf(d, e, numQueries = 1, innerK = 2,
        k = 4).collect()
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    assert(byRank.head.getAs[Long]("doc_id") === 1L,
      "the doc in BOTH top lists must fuse to rank 1")
    val r1 = byRank.head
    val (br, dr) = (r1.getAs[Long]("bm25_rank"), r1.getAs[Long]("dense_rank"))
    assert(r1.getAs[Double]("rrf") ===
      1.0 / (60L + br) + 1.0 / (60L + dr),
      "fused score is exactly the two reciprocal terms")
    // single-system docs carry a null rank on the missing side and one term
    val vOnly = out.find(_.getAs[Long]("doc_id") == 3L).get
    assert(vOnly.isNullAt(vOnly.fieldIndex("bm25_rank")))
    assert(vOnly.getAs[Double]("rrf") ===
      1.0 / (60L + vOnly.getAs[Long]("dense_rank")))
    val tOnly = out.find(_.getAs[Long]("doc_id") == 2L).get
    assert(tOnly.isNullAt(tOnly.fieldIndex("dense_rank")))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L),
      "doc 4 is in neither top list and must not appear")
  }

  test("pipe2: a doc repeating the query's window retrieves at cosine 1.0") {
    // doc 5 contains doc 0's text verbatim as its own first window — the
    // chunk md5s (and so the stub embeddings) coincide exactly
    val w = (1 to 32).map(i => s"tok$i").mkString(" ")
    val d = docs(
      (0L, w),
      (5L, w),
      (6L, (100 to 140).map(i => s"zz$i").mkString(" ")))
    val out = TextAnalysis.retrievalPrep(d, numQueryDocs = 1, k = 2)
      .collect().sortBy(r => (r.getAs[Long]("query_chunk"),
        r.getAs[Long]("rank")))
    val top = out.head
    assert(top.getAs[Long]("doc_id") === 5L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-12,
      "identical windows must embed identically end to end")
  }

  test("pipe2: redaction runs BEFORE chunking — PII variants converge") {
    // two docs identical except the concrete email address: after the
    // E51 redaction both read '<EMAIL>', so their chunks coincide and
    // retrieval scores them as exact duplicates
    val base = (1 to 31).map(i => s"w$i").mkString(" ")
    val d = docs(
      (0L, s"alice@example.com $base"),
      (7L, s"bob@other.org $base"),
      (8L, (200 to 240).map(i => s"qq$i").mkString(" ")))
    val out = TextAnalysis.retrievalPrep(d, numQueryDocs = 1, k = 1)
      .collect()
    assert(out.head.getAs[Long]("doc_id") === 7L)
    assert(math.abs(out.head.getAs[Double]("cosine") - 1.0) < 1e-12,
      "distinct PII must redact to identical chunks")
  }

  test("bm25: n_terms counts matched distinct query terms only") {
    val d = docs(
      (0L, "one two three"),
      (20L, "one two zzz yyy"),
      (21L, "one one one xxx www"))
    val rows = TextAnalysis.bm25TopKRetrieval(d, 1, 5).collect()
    val byDoc = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_terms")).toMap
    assert(byDoc(20L) === 2L)
    assert(byDoc(21L) === 1L, "repeated matches count once (tf, not terms)")
  }
}
