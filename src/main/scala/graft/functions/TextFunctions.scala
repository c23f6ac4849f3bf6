package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar text primitives for the training-data pipeline operators
  * (dedup, language-ID, quality scoring, fingerprinting).
  *
  * Every primitive here has a DuckDB-SQL twin (the `Sql` members) built from
  * the SAME constants, so each operator can be oracle-verified by exact value
  * hash, not just row counts. The conventions are chosen to be engine-neutral:
  *
  *  - normalization collapses whitespace FIRST, so tokenization is a split on
  *    a single literal space — no regex-engine divergence;
  *  - the rolling char hash is a mod-arithmetic fold (h*31 + codepoint mod
  *    1e9+7) that both engines evaluate in BIGINT exactly;
  *  - everything is a built-in codegen'd expression (aggregate / transform /
  *    filter higher-order functions) — no UDFs, so whole-stage codegen spans
  *    stay intact and the same code runs unchanged on a 1000-executor
  *    cluster.
  */
object TextFunctions {

  /** Spread a FEW-SPLIT corpus scan across the session's cores before
    * an expensive per-row expansion (tokenize → shingle/hash explode →
    * signature/posting aggregation): a corpus whose bytes fit in one
    * or two input splits pins that whole narrow chain to one or two
    * tasks (measured: the 64-permutation MinHash partial aggregation
    * ran on the 2 scan tasks of the twin-union corpus, and the BM25
    * tokenization on the raw corpus's single split — ~0.4 s serial per
    * query while 30 cores idled). This is the guide's input-skew
    * remedy (repartition right after the read), made SCALE-ADAPTIVE:
    * it fires only when the scan carries fewer partitions than the
    * session's parallelism, so a real corpus — whose splits already
    * exceed the core count — passes through untouched and never pays
    * the extra shuffle. Hash-partitioned on doc_id (deterministic,
    * retry-safe; never round-robin — the guide's SPARK-38388 note). */
  /** The BARE key is the right spread expression (measured, twice):
    * hash(key) pre-satisfies every downstream groupBy that clusters on
    * a superset of the key, ELIDING that aggregation's exchange — one
    * less shuffle per pipeline. The flip side is that an elided
    * exchange can no longer be REUSED by the two sides of a banded
    * self-join (the signature aggregation then computes once per
    * side), but the A/B (xxhash64-mangled key, which preserves every
    * downstream exchange) measured the elision strictly better even on
    * the self-join pipelines: 12-query family 25.6 s bare vs 30.1 s
    * mangled — parallel recompute of a narrow aggregation is cheaper
    * than shuffling it once and reusing. */
  def spreadSmallScan(docs: org.apache.spark.sql.DataFrame,
      key: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val p = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions >= p) docs
    else docs.repartition(p, col(key))
  }

  /** Mod prime for the rolling hash — fits h*31+cp well inside a long. */
  val HashP = 1000000007L

  /** Canonical text normalization: collapse whitespace, trim, lowercase.
    * The whitespace class is the EXPLICIT ASCII set `[\t-\r ]` (HT LF VT
    * FF CR space), not `\s`: Java's `\s` includes vertical tab but
    * DuckDB's RE2 `\s` does not, so a document containing \x0B would
    * fingerprint/tokenize differently per engine — exactly the fork the
    * bit-identical [[docFp]] contract forbids. `[\t-\r ]` is the same
    * set on both engines. */
  def norm(c: Column): Column =
    lower(trim(regexp_replace(c, "[\\t-\\r ]+", " ")))

  def normSql(c: String): String =
    s"lower(trim(regexp_replace($c, '[\\t-\\r ]+', ' ', 'g')))"

  /** THE content fingerprint: md5 over the normalized text. One
    * definition shared by every consumer (batch dedup d1/d8, streaming
    * dedup E53, decontamination c1, corpus-prep) — the streaming horizon
    * only composes with the batch fingerprint store if the fingerprints
    * are bit-identical, so this must never fork per module. */
  def docFp(c: Column): Column = md5(norm(c).cast("binary"))

  def docFpSql(c: String): String = s"md5(${normSql(c)})"

  /** Tokens of a normalized string: split on the single canonical space.
    * Empty input yields an empty array, not [""]. */
  def tokens(normed: Column): Column =
    when(normed === "", array().cast("array<string>"))
      .otherwise(split(normed, " ", -1))

  def tokensSql(normed: String): String =
    s"CASE WHEN $normed = '' THEN []::VARCHAR[] ELSE string_split($normed, ' ') END"

  /** Rolling char hash: fold h = (h*31 + codepoint) mod 1e9+7 over the
    * string's characters, left to right. Deterministic, associo-free
    * (sequential fold), and exactly mirrored in DuckDB via list_reduce.
    *
    * Native codegen'd expression ([[org.apache.spark.sql.graft.StringRollHash]]);
    * the composed HOF form (`aggregate(filter(split(c, "")), …)`) computes
    * the identical fold but interpreted per character — this hash sits
    * under every token/shingle in the dedup family, so it earns the
    * native-Expression tier of SURVEY §7's preference order. */
  def charHash(c: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.rollHash(c)

  def charHashSql(c: String): String =
    // list_reduce has no init arg in DuckDB — prepend the 0 seed.
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(string_split($c, ''), ch -> ascii(ch)::BIGINT)),
       |  (h, cp) -> (h * 31 + cp) % ${HashP})""".stripMargin


  /** Content-stable doc-id hash (hex md5 of the id's decimal string) —
    * THE sampling/sharding convention shared by t5/mix1/pk1/s1: rerun-
    * and retry-stable, no rand(), exactly [[docIdHashSql]] on the DuckDB
    * side. Every hash-cutoff/shard/sample-order decision derives from
    * this one expression so the cross-engine convention lives in one
    * place. */
  def docIdHash(id: Column): Column = md5(id.cast("string").cast("binary"))

  def docIdHashSql(id: String): String = s"md5(CAST($id AS VARCHAR))"

  /** E83/E97 deterministic train/val/test assignment (≈80/10/10 by the
    * first two hex chars of [[docIdHash]]): rerun/retry-stable, zero
    * coordination — any worker re-derives any doc's split. Shared by the
    * s2 split audit and the s3 split-leakage audit so the convention
    * lives in one place. */
  def splitOf(id: Column): Column = {
    val h = substring(docIdHash(id), 1, 2)
    when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
  }

  def splitOfSql(id: String): String =
    s"""CASE WHEN substr(${docIdHashSql(id)}, 1, 2) < 'cc' THEN 'train'
       |  WHEN substr(${docIdHashSql(id)}, 1, 2) < 'e6' THEN 'val'
       |  ELSE 'test' END""".stripMargin

  /** BPE-ish subword token pattern: letter runs, single digits, single
    * non-alnum marks — the shape of a byte-pair pre-tokenizer's splits. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Language-marker stopword lists for the n-gram/stopword language-ID
    * heuristic. Alphabetical by language code — the tie-break order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "de", "un"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une", "dans", "pour"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "zai", "you", "ren"))

  /** Word n-gram shingles over the token array (n consecutive tokens joined
    * by a single space); empty when fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))

  def shinglesSql(toks: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$toks[i + $k]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toks) < $n THEN []::VARCHAR[]
       |  ELSE list_transform(range(1, len($toks) - ${n - 2}), i -> $parts)
       |END""".stripMargin
  }

  /** Per-token rolling hashes of a token array — native array expression
    * ([[org.apache.spark.sql.graft.TokenRollHashes]]), one evaluation per
    * array instead of an interpreted per-element transform. */
  def tokenHashes(toks: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.rollHashes(toks)

  def tokenHashesSql(toks: String): String =
    s"list_transform($toks, t -> ${charHashSql("t")})"

  /** Shingle-combine multipliers for [[hashedShingles]]. */
  val ShingleC1 = 1000003L
  val ShingleC2 = 8191L

  /** Hashed word-3-gram shingles combined ARITHMETICALLY from an already-
    * materialized per-token-hash array column `th` — h(i)·C1 + h(i+1)·C2 +
    * h(i+2) mod P — instead of materializing shingle strings and re-folding
    * their characters; order-sensitive and collision-sparse like the
    * string form, the scale-critical path for MinHash over billions of
    * documents. Native codegen'd array expression
    * ([[org.apache.spark.sql.graft.HashedShingles]], constants mirrored
    * there) — one compiled loop per doc instead of an interpreted
    * per-shingle transform. `th` must be a real column (not an inline
    * expression) so neither engine re-evaluates token hashing per
    * element access. */
  def hashedShinglesFromTh(th: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.hashedShingles(th)

  def hashedShinglesFromThSql(th: String): String =
    s"""CASE WHEN len($th) < 3 THEN []::BIGINT[]
       |  ELSE list_transform(range(1, len($th) - 1),
       |    i -> ($th[i] * $ShingleC1 + $th[i + 1] * $ShingleC2 + $th[i + 2])
       |         % $HashP)
       |END""".stripMargin

  /** Horner n-gram hashes from a token-hash array column — the general-
    * width sibling of [[hashedShinglesFromTh]] (which keeps its 3-gram
    * distinct-multiplier form): h = fold (h·C1 + th[j+i]) mod P over the
    * n hashes starting at j. Native codegen'd array expression
    * ([[org.apache.spark.sql.graft.SpanHashes]]); one compiled loop per
    * doc. `th` must be a materialized column, as for
    * [[hashedShinglesFromTh]]. */
  def spanHashesFromTh(th: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextExpressions.spanHashes(th, n)

  /** The HOF formulation (equivalence-spec twin of [[spanHashesFromTh]]):
    * same Horner fold, interpreted. */
  def spanHashesFromThFold(th: Column, n: Int): Column =
    when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(th) - lit(n - 1)), j =>
        (0 until n).foldLeft(lit(0L)) { (h, i) =>
          pmod(h * lit(ShingleC1) + element_at(th, j + lit(i)), lit(HashP))
        }))

  def spanHashesFromThSql(th: String, n: Int): String =
    s"""CASE WHEN len($th) < $n THEN []::BIGINT[]
       |  ELSE list_transform(range(1, len($th) - ${n - 2}),
       |    j -> list_reduce(list_prepend(0::BIGINT, $th[j:j + ${n - 1}]),
       |      (h, x) -> (h * $ShingleC1 + x) % $HashP))
       |END""".stripMargin
}
