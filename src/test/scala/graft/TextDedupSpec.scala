package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Unit coverage for the extension primitives (each operator is also
  * value-verified against the DuckDB oracle by the driver gate; these
  * specs pin the local semantics). */
class TextDedupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, t) => Row(i, t, "en") }, 2), docSchema)

  test("lm1: bigram LM score is the exact hand-computed ratio") {
    // corpus: d1 = "a b a b", d2 = "a c"
    // bigram stream: (a,b) (b,a) (a,b) | (a,c)
    // C(a,b)=2 C(b,a)=1 C(a,c)=1; left counts C(a)=3 C(b)=1
    // d1: sum_pair = 2+1+2 = 5, sum_left = 3+1+3 = 7, min = min(2/3, 1) = 2/3
    // d2: sum_pair = 1, sum_left = 3
    val out = TextAnalysis.bigramLmScore(docs((1L, "a b a b"), (2L, "a c")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === ((3L, 5.0 / 7.0, 2.0 / 3.0)))
    assert(out(2L) === ((1L, 1.0 / 3.0, 1.0 / 3.0)))
    // a single-token doc has no bigrams and is absent from the doc grain
    assert(!TextAnalysis.bigramLmScore(docs((1L, "a b"), (2L, "a")))
      .collect().map(_.getLong(0)).contains(2L))
  }

  test("t20: collocation lift is the exact hand-computed rational") {
    // lm1's corpus: bigrams (a,b) (b,a) (a,b) | (a,c) — N = 4
    // pairs: (a,b)=2 (b,a)=1 (a,c)=1; left: a=3 b=1; right: b=2 a=1 c=1
    // lift(a,b) = 2·4/(3·2) = 4/3; lift(b,a) = 4/(1·1) = 4
    // lift(a,c) = 4/(3·1) = 4/3 — ties with (a,b), broken by the pair
    val corpus = docs((1L, "a b a b"), (2L, "a c"))
    val out = TextAnalysis.collocations(corpus, k = 10, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(out.toSeq === Seq(
      ("b", "a", 1L, 4.0),
      ("a", "b", 2L, 4.0 / 3.0),
      ("a", "c", 1L, 4.0 / 3.0)))
    // the k cut respects the (lift desc, pair) order
    val top2 = TextAnalysis.collocations(corpus, k = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    spark.catalog.clearCache()
    assert(top2.toSeq === Seq(("b", "a"), ("a", "b")))
    // the DF cap prunes singleton pairs before ranking
    val capped = TextAnalysis.collocations(corpus, k = 10, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    spark.catalog.clearCache()
    assert(capped.toSeq === Seq(("a", "b")))
  }

  test("charHash: deterministic rolling fold, whitespace-normalized input") {
    val out = docs((1L, "ab")).select(
      TextFunctions.charHash(col("text"))).head().getLong(0)
    // h("ab") = (0*31 + 97)*31 + 98 mod P = 3105
    assert(out === 3105L)
    val empty = docs((1L, "")).select(
      TextFunctions.charHash(col("text"))).head().getLong(0)
    assert(empty === 0L)
  }

  test("native roll_hash equals the composed HOF fold on varied inputs") {
    // the interpreted formulation StringRollHash replaced — kept here as
    // the executable spec of its semantics
    def hofHash(c: org.apache.spark.sql.Column) =
      aggregate(
        filter(split(c, ""), ch => ch =!= ""),
        lit(0L),
        (h, ch) => pmod(h * lit(31L) + ascii(ch), lit(TextFunctions.HashP)))
    val samples = Seq("", "a", "ab", "hello world", "  spaced  out  ",
      "punct!@# 123", "Ünïcödé bmp ×÷", "a" * 500)
    val df = docs(samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }: _*)
      .select(TextFunctions.charHash(col("text")).as("native"),
        hofHash(col("text")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0L,
      "native expression must be bitwise-equal to the HOF fold")

    // array form: equal to the per-element transform, null elements
    // propagate as null hashes
    val arrDf = docs(samples.zipWithIndex.map {
        case (s, i) => (i.toLong, s) }: _*)
      .select(TextFunctions.tokens(TextFunctions.norm(col("text"))).as("t"))
      .select(TextFunctions.tokenHashes(col("t")).as("native"),
        transform(col("t"), t => TextFunctions.charHash(t)).as("composed"))
    assert(arrDf.filter(to_json(col("native")) =!= to_json(col("composed")))
      .count() === 0L)
    val withNull = docs((1L, "x")).select(
      TextFunctions.tokenHashes(
        array(lit("ab"), lit(null).cast("string"))).as("h"))
      .head().getSeq[Any](0)
    assert(withNull === Seq(3105L, null))

    // shingle combine: native equals the composed arithmetic transform,
    // sub-3-token arrays are empty, null windows propagate
    def composedShingles(th: org.apache.spark.sql.Column) =
      when(size(th) < 3, array().cast("array<bigint>"))
        .otherwise(transform(
          sequence(lit(1), size(th) - lit(2)),
          i => pmod(
            element_at(th, i) * lit(TextFunctions.ShingleC1) +
              element_at(th, i + lit(1)) * lit(TextFunctions.ShingleC2) +
              element_at(th, i + lit(2)),
            lit(TextFunctions.HashP))))
    val shDf = docs(samples.zipWithIndex.map {
        case (s, i) => (i.toLong, s) }: _*)
      .select(TextFunctions.tokenHashes(
        TextFunctions.tokens(TextFunctions.norm(col("text")))).as("th"))
      .select(TextFunctions.hashedShinglesFromTh(col("th")).as("native"),
        composedShingles(col("th")).as("composed"))
    assert(shDf.filter(to_json(col("native")) =!= to_json(col("composed")))
      .count() === 0L)
    val shNull = docs((1L, "x")).select(
      TextFunctions.hashedShinglesFromTh(array(
        lit(null).cast("bigint"), lit(1L), lit(2L), lit(3L))).as("s"))
      .head().getSeq[Any](0)
    assert(shNull === Seq(null,
      (1L * TextFunctions.ShingleC1 + 2L * TextFunctions.ShingleC2 + 3L)
        % TextFunctions.HashP))
  }

  test("tokens: empty and multi-space input normalize cleanly") {
    val toks = docs((1L, "  a   b  c "), (2L, ""))
      .select(col("doc_id"),
        TextFunctions.tokens(TextFunctions.norm(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(1L) === Seq("a", "b", "c"))
    assert(toks(2L) === Seq.empty)
  }

  test("PII redaction replaces planted email/phone/IP and counts matches") {
    // doc 30 plants all three (30 % 2 = % 3 = % 5 = 0); doc 7 plants none
    val pii = TextAnalysis.withPii(docs((30L, "alpha beta"), (7L, "gamma")))
    val out = TextAnalysis.piiRedact(pii).collect()
      .map(r => r.getLong(0) -> r).toMap
    val full = out(30L)
    assert(full.getAs[String]("clean_text") ===
      "alpha beta contact <EMAIL> call <PHONE> host <IP>")
    assert(full.getAs[Long]("n_emails") === 1L)
    assert(full.getAs[Long]("n_phones") === 1L)
    assert(full.getAs[Long]("n_ips") === 1L)
    val none = out(7L)
    assert(none.getAs[String]("clean_text") === "gamma",
      "a doc with no PII must pass through untouched")
    assert(none.getAs[Long]("n_emails") === 0L)

    // overlapping classes: an IP-shaped email local part is ONE email,
    // not an email plus an IP — counts are staged with the redaction
    // order, so every count has a matching placeholder in the output
    val overlap = TextAnalysis.piiRedact(
      docs((11L, "ping 1.2.3.4@x.example.com")).select(
        col("doc_id"), col("text"))).head()
    assert(overlap.getAs[String]("clean_text") === "ping <EMAIL>")
    assert(overlap.getAs[Long]("n_emails") === 1L)
    assert(overlap.getAs[Long]("n_ips") === 0L,
      "a span consumed by the email stage must not also count as an IP")
  }

  test("chunking: 32-token windows at stride 24 with 8-token overlap") {
    val text80 = (1 to 80).map(i => s"w$i").mkString(" ")
    val chunks = TextAnalysis.chunkOverlap(docs((1L, text80), (2L, "a b c")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 80 tokens: chunks start at 1, 25, 49 — 1 + ceil(48/24) = 3, all full
    assert(chunks.keys.count(_._1 == 1L) === 3)
    assert(Seq(0L, 1L, 2L).forall(c => chunks((1L, c)) === 32L))
    // 3 tokens: one short chunk
    assert(chunks((2L, 0L)) === 3L)
    assert(chunks.keys.count(_._1 == 2L) === 1)
    // zero tokens: ZERO chunks — a phantom empty window would collide
    // every empty doc on md5("") in chunk-level dedup
    assert(TextAnalysis.chunkOverlap(docs((3L, "  "))).count() === 0L)
    // the overlap property: consecutive chunks share exactly 8 tokens —
    // chunk 1 of doc 1 starts at token 25 = w25
    val texts = TextAnalysis.chunkOverlap(docs((1L, text80)))
      .select(col("chunk_no"), col("chunk_md5")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = docs((9L, (25 to 56).map(i => s"w$i").mkString(" ")))
      .select(md5(col("text").cast("binary"))).head().getString(0)
    assert(texts(1L) === m, "chunk 1 must be exactly tokens 25..56")
  }

  test("exact dedup keeps the min doc_id and counts copies") {
    val d = docs((5L, "same text"), (2L, "same text"), (9L, "other"))
    val out = Dedup.exactDedup(d).collect()
      .map(r => (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("copies")))
      .toSet
    assert(out === Set((2L, 2L), (9L, 1L)))
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now today friends"))
    val pairs = Dedup.ngramJaccardPairs(d).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs === Map((1L, 2L) -> 1.0))
  }

  test("simhash: identical docs share a signature; pairs find them") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "unrelated totally other completely distinct text body"))
    val sigs = Dedup.simhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    val pairs = Dedup.simhashPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("simhash 60-bit: identical docs pair up and high bits are live") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "unrelated totally other completely distinct text body"))
    val sigs = Dedup.simhashSignatures(d, bits = 60).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    // signature bits >= 30 vote on the affine-mixed second hash — if the
    // wiring regressed to the raw (mod 1e9+7, < 2^30) hash they would all
    // be dead zeros and the wide variant would be no better than 32-bit
    assert(sigs.values.exists(s => (s >>> 30) != 0L),
      "no live signature bits above bit 29 — second-hash wiring broken")
    val pairs = Dedup.simhashPairs(d, bits = 60).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("df-capped jaccard fails loud when every shingle is a stop-shingle") {
    // three verbatim copies: every shingle has df 3 > maxDf 2 ⇒ the prefix
    // filter drops 100% of shingle mass ⇒ vacuous method must throw, not
    // report "no duplicates"
    val text = "one two three four five six seven"
    val d = docs((1L, text), (2L, text), (3L, text))
    val e = intercept[IllegalStateException] {
      Dedup.ngramJaccardDfCapped(d, maxDf = 2).count()
    }
    assert(e.getMessage.contains("100%"))
    // a corpus with surviving shingles still works at the same cap
    val ok = Dedup.ngramJaccardDfCapped(
      docs((1L, text), (2L, text),
        (3L, "unrelated totally other completely distinct text body")),
      maxDf = 2)
    assert(ok.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L)))
  }

  test("d14: containment finds the quote pair Jaccard suppresses") {
    // a 12-token quote inside a 48-token original: containment(B→A) = 1.0
    // exactly, Jaccard ≈ 10/46 — far under d7's 0.6 threshold. The
    // asymmetric score is the only member of the ladder that fires.
    val long = (1 to 48).map(i => s"tok$i").mkString(" ")
    val quote = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = "completely different body with no shared shingles at all"
    val d = docs((1L, long), (2L, quote), (3L, other))
    val cont = Dedup.containmentPairs(d, maxDf = 20).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getAs[Double]("containment_b") === 1.0,
      "the quote's capped shingle set is a subset by construction")
    assert(r.getAs[Double]("jaccard") < Dedup.JaccardThreshold,
      "the planted pair must be one Jaccard would miss")
    assert(Dedup.ngramJaccardDfCapped(d, maxDf = 20).count() === 0L,
      "d7 at its threshold must NOT see the quote pair")
  }

  test("d14: containment dominates jaccard on every emitted pair") {
    val d = Dedup.withContainedDups(
      docs((1L, (1 to 30).map(i => s"a$i").mkString(" ")),
        (2L, (1 to 9).map(i => s"b$i").mkString(" ")),
        (3L, (5 to 40).map(i => s"a$i").mkString(" "))))
    val rows = Dedup.containmentPairs(d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb, j) = (r.getAs[Double]("containment_a"),
        r.getAs[Double]("containment_b"), r.getAs[Double]("jaccard"))
      assert(ca >= j && cb >= j,
        s"containment is inter/side vs inter/union — must dominate: $r")
      assert(math.max(ca, cb) >= Dedup.ContainmentThreshold)
    }
    // every original gained a planted quote twin at +QuoteOffset with
    // full directional containment (doc 2 is only 9 tokens, so its
    // "quote" is the whole doc — exact dup, containment 1.0 both ways)
    val planted = rows.filter(r =>
      r.getLong(1) == r.getLong(0) + Dedup.QuoteOffset)
    assert(planted.length === 3)
    planted.foreach(r =>
      assert(r.getAs[Double]("containment_b") === 1.0))
  }

  test("d15: re-crawled near-dups match their stored originals; clean batch passes") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val d = docs(
      (1L, "an entirely fresh body of text with no stored counterpart at all"),
      (2L, "the quick brown fox jumps over the lazy dog again and again daily"),
      (4L, "pack my box with five dozen liquor jugs said the mad sphinx twice"))
      .select(col("doc_id"), col("text"))
    val store = Dedup.minhashSigStore(d.filter(col("doc_id") % 2 === 0))
    val batch = d.filter(col("doc_id") % 2 === 1)
      .unionByName(d.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + Dedup.ReCrawlOffset).as("doc_id"),
          concat(col("text"), lit(" spark")).as("text")))
    val out = Dedup.incrementalLshDedup(batch, store).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keeper_id"), r.getAs[Double]("best_est")))
      .toMap
    assert(out.keySet ===
      Set(2L + Dedup.ReCrawlOffset, 4L + Dedup.ReCrawlOffset),
      s"exactly the re-crawls are flagged, the fresh doc passes: $out")
    assert(out(2L + Dedup.ReCrawlOffset)._1 === 2L)
    assert(out(4L + Dedup.ReCrawlOffset)._1 === 4L)
    out.values.foreach { case (_, est) =>
      assert(est >= Dedup.MinhashEstThreshold)
    }
  }

  test("langId picks the marker-richest language deterministically") {
    val d = docs(
      (1L, "the cat is of the house and it is a thing"),
      (2L, "der hund ist nicht das und der die"))
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang"))
      .toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
  }

  test("cosine: identical vectors score 1.0, orthogonal 0.0") {
    val schema = StructType(Seq(StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      Row(Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f))), 1), schema)
    val out = df.select(
      (Similarity.dot(col("a"), col("b")) /
        (Similarity.norm2(col("a")) * Similarity.norm2(col("b"))))
        .as("cos")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) === 0.0)
  }

  test("codegen'd FloatVectorDot is bitwise-equal to the HOF fold") {
    val emb = graft.io.Sources.table(spark, sf0001, "embeddings")
    val both = emb.select(
      Similarity.dot(col("embedding"), col("embedding")).as("native"),
      Similarity.dotFold(col("embedding"), col("embedding")).as("fold"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(both.length === 500)
  }

  test("native fvec_quant8 equals the composed HOF quantizer on real vectors") {
    val emb = graft.io.Sources.table(spark, sf0001, "embeddings")
    val both = emb.select(
      org.apache.spark.sql.graft.VectorExpressions
        .fvecQuant8(col("embedding")).as("native"),
      Similarity.quant8Fold(col("embedding")).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Float](0) === r.getSeq[Float](1))
    }
  }

  test("fvec_dot registers as a SQL function via the extensions hook") {
    org.apache.spark.sql.graft.VectorExpressions.register(spark)
    val out = spark.sql(
      """SELECT fvec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d"""
        .stripMargin).head().getDouble(0)
    assert(out === 11.0)
    // the full extension-advertised SQL surface, as GraftExtensions
    // injects it (register() mirrors the same descriptors)
    val fd = spark.sql(
      """SELECT fdvec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d"""
        .stripMargin).head().getDouble(0)
    assert(fd === 11.0)
    val q8 = spark.sql(
      "SELECT fvec_quant8(CAST(array(0.5, -1.0, 0.25) AS ARRAY<FLOAT>)) AS c")
      .head().getSeq[Float](0)
    assert(q8 === Seq(63.0f, -127.0f, 31.0f))
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.graft.TextExpressions.rollHashDescriptor._1,
      org.apache.spark.sql.graft.TextExpressions.rollHashDescriptor._2,
      org.apache.spark.sql.graft.TextExpressions.rollHashDescriptor._3)
    assert(spark.sql("SELECT roll_hash('ab') AS h").head().getLong(0)
      === 3105L)
  }

  test("connected components labels chains, triangles, and islands") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round), triangle
    // 10-11-12, isolated edge 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val labels = graft.dedup.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
    assert(labels.size === 9)
  }

  test("connected components never mutates the caller session's confs") {
    // The loop runs on a newSession() clone, so a query planned CONCURRENTLY
    // on the caller session must observe the caller's shuffle width and AQE
    // for the loop's whole duration — the old implementation mutated the
    // shared conf and restored it in a finally, which this test would catch
    // almost surely (the loop holds the narrowed conf for seconds).
    import spark.implicits._
    val widthKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val width0 = spark.conf.get(widthKey)
    val aqe0 = spark.conf.get(aqeKey)
    val edges = (1L to 400L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cc = Future(
      graft.dedup.Dedup.connectedComponents(edges, maxIters = 300).count())
    var observed = List.empty[(String, String)]
    while (!cc.isCompleted) {
      observed = (spark.conf.get(widthKey), spark.conf.get(aqeKey)) :: observed
      Thread.sleep(20)
    }
    assert(Await.result(cc, 1.minute) === 400L)
    assert(observed.nonEmpty)
    assert(observed.forall(_ == (width0, aqe0)),
      s"caller session conf changed mid-loop: ${observed.distinct}")
  }

  test("connected components fails loud when a component outlives maxIters") {
    // A 30-node path has diameter 29: min-label propagation cannot
    // converge in 3 rounds, and the every-2nd-round convergence count
    // must still detect that and throw rather than return half-propagated
    // labels (which would silently report a wrong cluster count).
    import spark.implicits._
    val edges = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      graft.dedup.Dedup.connectedComponents(edges, maxIters = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // and with enough rounds the same graph converges to one cluster
    val labels = graft.dedup.Dedup.connectedComponents(edges, maxIters = 40)
      .collect().map(_.getLong(1)).distinct
    assert(labels.toSeq === Seq(1L))
  }

  test("d16: survivors partition the corpus and each cluster keeps its best") {
    // withNearDups plants a " spark"-suffixed twin per doc, so every
    // original/twin pair forms a 2-doc cluster and nothing is a singleton
    // unless LSH happens to miss it (it doesn't on these texts: twin
    // shingle sets overlap far past the 0.5 estimate threshold).
    val base = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "red orange yellow green blue indigo violet white black grey"))
    val corpus = Dedup.withNearDups(base)
    val out = Dedup.dedupSurvivors(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // clusters partition the corpus: sizes sum to |corpus|, one survivor
    // per cluster, and cluster ids are distinct
    assert(out.map(_._3).sum === corpus.count())
    assert(out.map(_._2).distinct.size === out.size)
    // n_removed is always size-1
    assert(out.forall(r => r._4 === r._3 - 1))
    // independent re-derivation of the ELECTION: for each cluster, the
    // survivor must be the max-score (tie: min doc_id) member per the
    // t12 score joined to the d9 labels
    val labels = Dedup.connectedComponents(
        Dedup.minhashLshPairs(corpus).select(col("doc_a"), col("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scores = graft.text.TextAnalysis.classifierScore(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val expect = scores.keys
      .groupBy(id => labels.getOrElse(id, id))
      .map { case (cl, ids) =>
        cl -> ids.minBy(id => (-scores(id), id)) }
    assert(out.map(r => r._2 -> r._1).toMap === expect)
    // singletons (a doc with no planted twin pair) survive as themselves
    val lone = docs((9L, "utterly disjoint vocabulary here notwithstanding"))
      .select(col("doc_id"), col("text"))
    val mixed = corpus.unionByName(lone)
    val out2 = Dedup.dedupSurvivors(mixed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out2.exists(r => r._1 === 9L && r._2 === 9L && r._3 === 1L))
  }

  test("s4: cluster split is total, leak-free, and minimal-perturbation") {
    val base = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "red orange yellow green blue indigo violet white black grey"))
    val corpus = Dedup.withNearDups(base).unionByName(
      docs((9L, "utterly disjoint vocabulary here notwithstanding"))
        .select(col("doc_id"), col("text")))
    val assign = Dedup.clusterSplit(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // total: every corpus doc assigned exactly once
    assert(assign.size.toLong === corpus.count())
    // leak-free BY CONSTRUCTION: both sides of every near-dup pair get
    // the same split (the s3 matrix's off-diagonal is empty)
    val pairs = Dedup.minhashLshPairs(corpus)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => assign(a)._2 === assign(b)._2 })
    // minimal perturbation: an UNCLUSTERED doc groups as itself and keeps
    // exactly its independent E83 hash split
    import graft.functions.TextFunctions.splitOf
    val s9 = corpus.sparkSession.range(9, 10)
      .select(splitOf(col("id")).as("s")).head().getString(0)
    assert(assign(9L) === ((9L, s9)))
  }

  test("incremental dedup drops re-crawled docs, keeps genuinely new ones") {
    val history = docs((1L, "alpha beta gamma"), (2L, "delta epsilon"))
    val incoming = docs(
      (10L, "alpha   beta gamma"), // whitespace variant of seen doc 1
      (11L, "brand new document"),
      (12L, "delta epsilon"))      // verbatim re-crawl of seen doc 2
    val seen = graft.dedup.Dedup.fingerprints(history)
    val out = graft.dedup.Dedup.incrementalDedup(incoming, seen)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // normalization makes the whitespace variant a duplicate too
    assert(out === Set(11L))
    // survivors' fingerprints appended to the store close the loop
    val seen2 = seen.unionByName(graft.dedup.Dedup.fingerprints(
      incoming.filter(org.apache.spark.sql.functions.col("doc_id") === 11L)))
    assert(graft.dedup.Dedup.incrementalDedup(incoming, seen2).count() === 0)
  }

  test("native span_hashes equals the composed Horner fold") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four"),   // exactly n-1 tokens at n=5 → empty
      (3L, "solo"),
      (4L, ""))
    val th = TextFunctions.tokenHashes(
      TextFunctions.tokens(TextFunctions.norm(col("text"))))
    Seq(2, 5).foreach { n =>
      val both = d.select(col("doc_id"), th.as("th"))
        .select(col("doc_id"),
          TextFunctions.spanHashesFromTh(col("th"), n).as("native"),
          TextFunctions.spanHashesFromThFold(col("th"), n).as("fold"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"n=$n doc=${r.getLong(0)}")
      }
      // width-n windows over t tokens → max(0, t-n+1) hashes
      val sizes = both.map(r => r.getLong(0) -> r.getSeq[Long](1).size).toMap
      assert(sizes(1L) === math.max(0, 8 - n + 1))
      assert(sizes(4L) === 0)
    }
  }

  test("dupSpans merges flagged windows into maximal per-doc spans") {
    // B repeats A's tokens 6..12 (7 tokens → 5-gram starts 6,7,8 in A /
    // 1,2,3 in B); C repeats A's 14..18 (5 tokens → one window); all
    // other tokens are unique, so no background collisions
    val a = (1 to 20).map(i => s"tok$i").mkString(" ")
    val b = ((6 to 12).map(i => s"tok$i") ++ Seq("bx1", "bx2", "bx3"))
      .mkString(" ")
    val c = (Seq("cx1", "cx2") ++ (14 to 18).map(i => s"tok$i")).mkString(" ")
    val out = Dedup.dupSpans(docs((1L, a), (2L, b), (3L, c)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(
      (1L, 6L, 12L, 3L),   // A: two separated duplicated regions =
      (1L, 14L, 18L, 1L),  //    two spans, not one (gap 14-8=6 > n)
      (2L, 1L, 7L, 3L),    // B: its prefix run, merged across overlaps
      (3L, 3L, 7L, 1L)))   // C: single window at tokens 3..7
  }

  test("dupSpans gap boundary: adjacent windows merge, gap n+1 splits") {
    // shared runs at positions 1..5 and 7..11 of doc 1 (window starts 1
    // and 7: gap 6 > n=5 → split); doc 3 shares BOTH runs contiguously
    // minus the separator, exercising the merge arm
    val d = docs(
      (1L, "a1 a2 a3 a4 a5 x1 b1 b2 b3 b4 b5"),
      (2L, "a1 a2 a3 a4 a5 y1 y2 y3 y4 y5 y6"),
      (3L, "z1 b1 b2 b3 b4 b5 w1 w2 w3 w4 w5"))
    val out = Dedup.dupSpans(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 1L, 5L), (1L, 7L, 11L),
      (2L, 1L, 5L), (3L, 2L, 6L)))
  }

  test("dupSpanRate: merged spans count covered tokens once, per source") {
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    def sdocs(rows: (Long, String, String)*) =
      spark.createDataFrame(spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2), s)
    // srcA: doc 1 (10 toks) shares its first 7 with doc 2 (srcB, 7 toks);
    // srcC: fully unique doc → rate 0
    val d = sdocs(
      (1L, "t1 t2 t3 t4 t5 t6 t7 u1 u2 u3", "srcA"),
      (2L, "t1 t2 t3 t4 t5 t6 t7", "srcB"),
      (3L, "v1 v2 v3 v4 v5 v6", "srcC"))
    val out = Dedup.dupSpanRate(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // shared run of 7 tokens → one merged span covering tokens 1..7 in
    // both docs (3 overlapping windows, counted once)
    assert(out("srcA") === ((10L, 7L, 0.7)))
    assert(out("srcB") === ((7L, 7L, 1.0)))
    assert(out("srcC") === ((6L, 0L, 0.0)))
  }

  test("r4: winnowing guarantee — a shared run of w+k-1 tokens is always caught") {
    // the scheme's detection floor (Schleimer–Wilkerson–Aiken theorem):
    // a match of length >= w+k-1 = 4+5-1 = 8 tokens contains one FULL
    // window of w identical k-gram hashes, and that window's selection
    // (rightmost min) is a function of the window contents alone — both
    // docs select the same fingerprint. Exactly-at-the-floor fixture:
    // 8 shared tokens, everything else unique.
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(
      (1L, s"u1 u2 u3 $shared"),
      (2L, s"$shared v1 v2"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")) // no overlap — no pair
    val pairs = Dedup.winnowPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("r4: window selection is the rightmost minimal hash; selections subset the span hashes") {
    // all-identical tokens -> every 5-gram hash is EQUAL, so each full
    // window must select its rightmost position: 9 tokens = 5 spans =
    // 2 full windows (starts 1, 2) covering positions 1-4 and 2-5 ->
    // selected positions exactly {4, 5}
    val d = docs((1L, Seq.fill(9)("rep").mkString(" ")))
    val fp = Dedup.winnowFingerprints(d).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(fp.map(_._2).toSet === Set(4L, 5L))
    assert(fp.map(_._1).distinct.length === 1) // one repeated hash
    // and on a varied doc: every selected hash is one of the doc's span
    // hashes at its claimed position, and the count respects the
    // coverage bounds (>= ceil(nwin/w): one selection serves at most w
    // windows; <= nwin: one per window)
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val d2 = docs((7L, text))
    val th = TextFunctions.tokenHashes(
      TextFunctions.tokens(TextFunctions.norm(col("text"))))
    val spans = d2.select(TextFunctions.spanHashesFromTh(th, 5).as("sh"))
      .head().getSeq[Long](0)
    val nwin = spans.length - Dedup.WinnowW + 1 // 16 spans -> 13 windows
    val sel = Dedup.winnowFingerprints(d2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    sel.foreach { case (h, pos) =>
      assert(spans(pos.toInt - 1) === h, s"fingerprint ($h, $pos)")
    }
    assert(sel.length >= (nwin + Dedup.WinnowW - 1) / Dedup.WinnowW &&
      sel.length <= nwin, s"got ${sel.length} of $nwin windows")
  }

  test("r4: every planted prefix twin is caught on the real corpus") {
    // the r2 corpus convention: every 10th doc gets a 15-token-prefix
    // twin — 15 >= the 8-token floor, so winnowing must pair each twin
    // with its original (dfCap must not prune the planted evidence)
    val corpus = Dedup.withSpanTwins(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val pairs = Dedup.winnowPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = corpus.where(col("doc_id") >= Dedup.TwinOffset)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(twins.nonEmpty)
    twins.foreach { t =>
      assert(pairs.contains((t - Dedup.TwinOffset, t)),
        s"twin pair (${t - Dedup.TwinOffset}, $t) not caught")
    }
  }

  private val sourcedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))

  private def sourcedDocs(rows: (Long, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, t, s) => Row(i, t, s) }, 2), sourcedSchema)

  test("r5: paragraph keeper election, tail isolation, empty docs") {
    // paraTokens = 4 for a hand-checkable fixture. Blocks:
    //  doc 1 (s1): [p1 p2 p3 p4] [q1 q2 q3 q4]   — both keepers
    //  doc 2 (s2): [x1 x2 x3 x4] [p1 p2 p3 p4]   — block 1 dups doc 1's
    //                block 0 at a DIFFERENT position (content, not offset)
    //  doc 3 (s1): [q1 q2 q3 q4] [q1 q2 q3 q4]   — both dup doc 1's block
    //                1 (the within-doc repeat counts too)
    //  doc 4 (s2): [q1 q2]                        — a 2-token tail must
    //                NOT match the 4-token [q1 q2 q3 q4] block
    //  doc 5 (s3): zero tokens — counted as a doc, holds no paragraph
    val d = sourcedDocs(
      (1L, "p1 p2 p3 p4 q1 q2 q3 q4", "s1"),
      (2L, "x1 x2 x3 x4 p1 p2 p3 p4", "s2"),
      (3L, "q1 q2 q3 q4 q1 q2 q3 q4", "s1"),
      (4L, "q1 q2", "s2"),
      (5L, "", "s3"))
    val out = Dedup.paragraphDedup(d, paraTokens = 4).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_paras"),
          r.getAs[Long]("dup_paras")))).toMap
    assert(out("s1") === ((2L, 4L, 2L)))
    assert(out("s2") === ((2L, 3L, 1L)))
    assert(out("s3") === ((1L, 0L, 0L)))
  }

  test("r5: every planted shared-paragraph twin drops on the real corpus") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = Dedup.withSharedParagraphs(base)
    val twinCount = corpus
      .where(col("doc_id") >= Dedup.ParaOffset).count()
    assert(twinCount > 0)
    val rows = Dedup.paragraphDedup(corpus).collect()
    // every twin shares its first paragraph with its original, so at
    // least one occurrence per twin loses the keeper election
    val dupTotal = rows.map(_.getAs[Long]("dup_paras")).sum
    assert(dupTotal >= twinCount,
      s"dup_paras $dupTotal < planted twin count $twinCount")
    // doc conservation: the report partitions the corpus by source
    assert(rows.map(_.getAs[Long]("n_docs")).sum === corpus.count())
  }

  test("d11: fuzzy vocab pairs meet exactly once and respect the distance cap") {
    // vocab: cat/cart (Δlen=1, dist 1), cat/bat (equal len, dist 1),
    // cat/dog (dist 3 — must not appear). Repetition makes frequencies
    // distinguishable: the canonical (higher-n) side is derivable.
    val d = docs((1L, "cat cat cat cart bat dog"), (2L, "cat cart dog"))
    val out = Dedup.fuzzyVocabPairs(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // each qualifying pair appears EXACTLY once (the max(len) key rule —
    // equal-length pairs would otherwise match on both L and L+1 buckets)
    assert(out.keySet === Set(("bat", "cat"), ("cart", "cat"), ("bat", "cart")))
    assert(out(("bat", "cat")) === ((1L, 4L, 1L)))
    assert(out(("cart", "cat")) === ((2L, 4L, 1L)))
    assert(out(("bat", "cart")) === ((1L, 2L, 2L)))
  }

  test("d11: length buckets cover the full |Δlen| <= maxDist candidate range") {
    // 'helo' -> 'heallo' is a double insertion: dist 2, Δlen 2. Keys
    // limited to {L, L+1} would never let the sides meet (the gap the
    // round-8 review closed); keys L..L+maxDist must surface it exactly
    // once, and a Δlen=2 pair with dist 3 must still be rejected by the
    // DP, not by the bucket scheme.
    val d = docs((1L, "helo heallo haexlm"))
    val out = Dedup.fuzzyVocabPairs(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out(("heallo", "helo")) === 2L, s"Δlen=2 pair missing: $out")
    // same Δlen=2 but distance 3 (two inserts + a substitution): reaches
    // the DP via the buckets and is rejected there
    assert(!out.contains(("haexlm", "helo")), s"dist-3 pair kept: $out")
  }

  test("quality buckets are ordered with the score") {
    val d = docs(
      (1L, ("the data of and is to in that " * 12).trim), // stopword-rich, long
      (2L, "!!! ??? ###"))
    val out = TextAnalysis.qualityScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("quality_score"), r.getAs[String]("quality_bucket")))
      .toMap
    assert(out(1L)._1 > out(2L)._1)
    assert(out(2L)._2 === "low")
  }
}
