package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token statistics, language-ID, quality scoring, fingerprinting.
  *
  * All four are single-pass, shuffle-free per-row projections (narrow
  * transformations) built from codegen'd higher-order functions — at 100 TB
  * they scan once, prune to the columns they touch, and never exchange.
  * Each has an exact DuckDB oracle (`graft.SparkEntry.oracleSql`) built from
  * the same constants in [[graft.functions.TextFunctions]].
  */
object TextAnalysis {

  private def toksCol: Column = tokens(norm(col("text")))

  /** T1: token statistics — whitespace token count, BPE-ish subword token
    * count, character count, mean word length. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toksCol).as("ws_tokens").cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("chars"),
      (length(regexp_replace(norm(col("text")), " ", "")).cast("double") /
        greatest(size(toksCol), lit(1))).as("mean_word_len"))

  /** Context lengths t18 audits — the ladder a pretraining run sizes
    * against. A literal constant: the audit is decision support for
    * choosing max sequence length, not a tunable of the data. */
  val CtxLens: Seq[Long] = Seq(128L, 256L, 512L, 1024L, 2048L)

  /** E134 (T18): context-length TRUNCATION audit — the sizing question
    * every pretraining run answers before fixing max_seq_len: at context
    * length L, how many documents overflow and how much token mass is
    * lost to truncation? For each candidate L this reports docs_over
    * (docs longer than L), tokens_lost (Σ max(0, n − L)) and the loss
    * rate — the curve whose knee picks L (c.f. the truncation-vs-packing
    * trade pk1 implements once L is chosen).
    *
    * ONE conditional-aggregate corpus pass whatever |CtxLens|: the
    * per-doc BPE-ish token count (t1's `bpe_tokens` definition — the
    * composition rule, so the count is hash-identical to t1's column)
    * folds through 2·|CtxLens| conditional sums in a single map-side-
    * combined aggregate; the |CtxLens|-row output reshapes from the
    * 1-row frame (an explode over literals — zero corpus cost). All
    * counts exact longs; loss_rate is the only double, NULL (not a ÷0
    * abort — the ANSI discipline) on an empty corpus. */
  def truncationAudit(docs: DataFrame): DataFrame = {
    val n = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .cast("long")
    val base = docs.select(n.as("n"))
    val condAggs = CtxLens.flatMap { l =>
      Seq(sum(when(col("n") > l, 1L).otherwise(0L)).as(s"docs_over_$l"),
        sum(greatest(col("n") - lit(l), lit(0L))).as(s"lost_$l"))
    }
    val tot = base.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("n")), lit(0L)).as("tokens_total") +: condAggs: _*)
    tot.select(
        col("n_docs"), col("tokens_total"),
        explode(array(CtxLens.map { l =>
          struct(lit(l).as("ctx_len"),
            coalesce(col(s"docs_over_$l"), lit(0L)).as("docs_over"),
            coalesce(col(s"lost_$l"), lit(0L)).as("tokens_lost"))
        }: _*)).as("r"))
      .select(col("r.ctx_len").as("ctx_len"), col("n_docs"),
        col("tokens_total"), col("r.docs_over").as("docs_over"),
        col("r.tokens_lost").as("tokens_lost"),
        when(col("tokens_total") === 0L, lit(null).cast("double"))
          .otherwise(col("r.tokens_lost").cast("double") /
            col("tokens_total").cast("double")).as("loss_rate"))
  }

  /** T2: language-ID by stopword-marker scoring — count of tokens hitting
    * each language's marker list, argmax with alphabetical tie-break.
    * A classic n-gram/stopword heuristic; deterministic and columnar. */
  /** The per-language marker scores and the argmax pick, defined ONCE —
    * [[langId]] reports them, [[dataCard]] fuses the pick into its
    * single corpus scan. */
  private def langScoreExprs: Seq[(String, Column)] = {
    val toks = toksCol
    LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*))).cast("long")
    }
  }

  private def predictedLangExpr(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit("und")) {
      case (acc, (lang, s)) => when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  def langId(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val scores = langScoreExprs
    docs.select(
      col("doc_id") +: carry.map(col) ++: col("lang").as("actual_lang") +:
        scores.map { case (l, s) => s.as(s"score_$l") } :+
        predictedLangExpr(scores).as("predicted_lang"): _*)
  }

  /** T3: quality scoring — length, punctuation ratio, stopword ratio, mean
    * word length folded into one [0,1]-ish score plus a bucket label.
    * The shape every corpus-filtering pipeline needs before training. */
  /** The T3 quality components over a `text` column, defined ONCE —
    * [[qualityScore]] reports them, the [[corpusPrep]] filter uses the
    * score; a single definition keeps the reported ratios and the score
    * they feed from ever diverging (and the float evaluation order
    * identical everywhere). */
  private final class QualityParts {
    private val toks = toksCol
    val nChars: Column = length(col("text")).cast("long")
    val wordCount: Column = size(toks).cast("long")
    private val punct = size(regexp_extract_all(col("text"),
      lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    private val stopHits = size(filter(toks,
      t => t.isin(LangMarkers.toMap.apply("en"): _*))).cast("long")
    val punctRatio: Column = punct.cast("double") / greatest(nChars, lit(1L))
    val stopRatio: Column = stopHits.cast("double") /
      greatest(wordCount, lit(1L))
    val meanLen: Column = (length(regexp_replace(norm(col("text")), " ", ""))
      .cast("double") / greatest(wordCount, lit(1L)))
    private val lenScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val score: Column = lenScore * lit(0.4) + stopRatio * lit(0.3) +
      (lit(1.0) - punctRatio) * lit(0.2) +
      least(meanLen / lit(8.0), lit(1.0)) * lit(0.1)
  }

  /** The T3 quality score as a reusable Column (the [[corpusPrep]]
    * filter's form of [[QualityParts]]). */
  private def qualityScoreExpr: Column = new QualityParts().score

  def qualityScore(docs: DataFrame): DataFrame = {
    val q = new QualityParts
    docs.select(
      col("doc_id"), q.wordCount.as("word_count"),
      q.nChars.as("n_chars_actual"),
      q.punctRatio.as("punct_ratio"), q.stopRatio.as("stopword_ratio"),
      q.meanLen.as("mean_word_len"), q.score.as("quality_score"),
      when(q.score >= 0.6, "high").when(q.score >= 0.4, "medium")
        .otherwise("low").as("quality_bucket"))
  }

  /** E137 (S5): quality-WEIGHTED Bernoulli sampling — the soft quality
    * filter of corpus curation (the CCNet/FineWeb-style alternative to a
    * hard threshold): each document survives with probability
    * proportional to its own t3 quality score (p = rate·score/max),
    * so high-quality docs are kept near-always, low-quality docs are
    * downweighted but not censored — preserving tail diversity a hard
    * cutoff destroys. Distinct from the rest of the sampling family:
    * t5 is uniform, mix1 weights by SOURCE (categorical), s1 is exact-N
    * stratified, sel1 is deterministic top-k under a budget; s5's
    * weight is the document's own continuous score.
    *
    * Determinism (the house convention): the coin is the first 8 hex
    * chars of the doc-id md5 mapped to u ∈ [0,1) (an exact dyadic —
    * /2³²), and p is one mirrored multiply-divide of the t3 score
    * (composition rule: the score column is hash-identical to t3's).
    * Rerun/retry-stable, engine-independent, no RNG state.
    *
    * Scale: two corpus passes — one aggregate for the score max (a
    * 1-row bounds frame, broadcast back: the v4x convention) and the
    * scoring/filter scan. Both narrow; nothing corpus-sized shuffles.
    * A production run that already knows the score scale (bounded by
    * construction: t3 ≤ 1) passes it as `scoreMax` and pays ONE pass. */
  def qualitySample(docs: DataFrame, rate: Double = 0.5,
      scoreMax: Option[Double] = None): DataFrame = {
    val q = new QualityParts
    val scored = docs.select(col("doc_id"), q.score.as("quality_score"))
    val withMax = scoreMax match {
      case Some(m) => scored.withColumn("smax", lit(m))
      case None => scored.crossJoin(
        broadcast(scored.agg(max(col("quality_score")).as("smax"))))
    }
    val u = conv(substring(docIdHash(col("doc_id")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    withMax.select(col("doc_id"), col("quality_score"),
        u.as("u"),
        when(col("smax") === 0.0, lit(0.0))
          .otherwise(lit(rate) * col("quality_score") / col("smax"))
          .as("p"))
      .where(col("u") < col("p"))
  }

  /** S5 oracle: the t3 score via [[qualityScoreSql]] (one definition),
    * the same dyadic coin and mirrored p. */
  def qualitySampleSql(rate: Double = 0.5): String = s"""
    WITH scored AS (
      SELECT doc_id, quality_score FROM ($qualityScoreSql) qs),
    m AS (SELECT coalesce(max(quality_score), 0.0) AS smax FROM scored),
    c AS (
      SELECT doc_id, quality_score,
        (('0x' || substr(${docIdHashSql("doc_id")}, 1, 8))::BIGINT)::DOUBLE
          / 4294967296.0 AS u,
        CASE WHEN smax = 0.0 THEN 0.0
          ELSE $rate * quality_score / smax END AS p
      FROM scored, m)
    SELECT doc_id, quality_score, u, p FROM c WHERE u < p"""

  /** T4: document fingerprinting — md5 content fingerprint plus the rolling
    * char hash (both over normalized text). The md5 keys exact dedup; the
    * rolling hash is the shingle-hash primitive minhash builds on. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      docFp(col("text")).as("fp_md5"),
      charHash(norm(col("text"))).as("fp_roll"))

  /** T6 (E45): corpus vocabulary top-k — token document frequency and
    * total occurrences, top `k` by DF with a deterministic token
    * tie-break. The vocab/stopword-building pass of a data pipeline:
    * explode is narrow, the aggregate partial-combines map-side on the
    * token key (one shuffle whose width is the VOCABULARY, not the
    * corpus), and the final ranking is a bounded TakeOrderedAndProject —
    * no full sort at any scale. */
  def topTokens(docs: DataFrame, k: Int = 50): DataFrame =
    docs.select(explode(array_distinct(toksCol)).as("token"),
        col("doc_id"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("token").asc)
      .limit(k)

  /** E138 (T19): per-source DISTINCTIVE terms — the "what makes this
    * source different" column of a data card (the Monroe et al.
    * log-odds-with-prior shape): for each source, the top-k tokens by
    * the Dirichlet-smoothed rate ratio
    * `((a+1)/(A+V)) / ((b+1)/(B+V))` — occurrences in the source vs
    * the REST of the corpus, each smoothed by a vocabulary-sized
    * prior so rare tokens don't dominate on noise. The log is dropped
    * deliberately (the BM25/idf house rule: log is monotone, libm is
    * engine-dependent — rank by the exact rational instead).
    *
    * ONE corpus pass: the (source, token) occurrence aggregate is the
    * only corpus-scale job; it persists (cache-lifetime contract: the
    * caller clearCache()s after materializing — the t14/heavyHitters
    * convention) and the token-grain totals, source totals, corpus
    * bounds frame, scoring join, and per-source top-k window all ride
    * the small vocabulary-grain relation. The ranking filter is
    * rank ≤ k over a per-source window — WindowGroupLimit keeps it
    * top-k-shaped, never a full sort. All counts exact longs; the
    * score is one mirrored product-ratio of exact longs (< 2⁵³ at any
    * swept scale; a 100-TB corpus upgrades the products to
    * DECIMAL(38,0) before the double boundary — the v5 discipline). */
  def distinctiveTerms(docs: DataFrame, k: Int = 10): DataFrame = {
    val st = spreadSmallScan(docs)
      .select(col("source"), explode(toksCol).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("a"))
      .persist()
    val tokTot = st.groupBy(col("token")).agg(sum(col("a")).as("t"))
    val srcTot = st.groupBy(col("source"))
      .agg(sum(col("a")).as("src_total"))
    val bounds = st.agg(sum(col("a")).as("tt"),
      countDistinct(col("token")).as("v"))
    val d = (c: Column) => c.cast("double")
    val scored = st.join(tokTot, Seq("token")).join(srcTot, Seq("source"))
      .crossJoin(broadcast(bounds))
      .select(col("source"), col("token"), col("a").as("n_in_source"),
        (col("t") - col("a")).as("n_rest"),
        (d(col("a") + 1) * d(col("tt") - col("src_total") + col("v")) /
          (d(col("t") - col("a") + 1) *
            d(col("src_total") + col("v")))).as("score"))
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rnk",
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("token").asc)).cast("long"))
      .where(col("rnk") <= k)
  }

  /** T19 oracle: the identical smoothed rate ratio and window. */
  def distinctiveTermsSql(k: Int = 10): String = s"""
    WITH st AS (
      SELECT source, token, count(*)::BIGINT AS a
      FROM (SELECT source, unnest($toksT) AS token FROM documents)
      GROUP BY 1, 2),
    tok AS (SELECT token, sum(a)::BIGINT AS t FROM st GROUP BY 1),
    src AS (SELECT source, sum(a)::BIGINT AS src_total FROM st GROUP BY 1),
    bounds AS (SELECT sum(a)::BIGINT AS tt,
      count(DISTINCT token)::BIGINT AS v FROM st),
    scored AS (
      SELECT st.source, st.token, st.a AS n_in_source,
        (t - a)::BIGINT AS n_rest,
        ((a + 1)::DOUBLE * (tt - src_total + v)::DOUBLE) /
          ((t - a + 1)::DOUBLE * (src_total + v)::DOUBLE) AS score
      FROM st JOIN tok USING (token) JOIN src USING (source)
      CROSS JOIN bounds),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source
        ORDER BY score DESC, token ASC) AS rn
      FROM scored)
    SELECT source, token, n_in_source, n_rest, score, rn::BIGINT AS rnk
    FROM r WHERE rn <= $k"""

  def topTokensSql(k: Int = 50): String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(${tokensSql(normSql("text"))}))
        AS token
      FROM documents)
    SELECT token, count(*) AS n_docs
    FROM tok GROUP BY 1
    ORDER BY n_docs DESC, token ASC LIMIT $k"""

  /** C1 (E46): benchmark decontamination — per-source contamination rate
    * against an eval-set fingerprint list. The join is a broadcast LEFT
    * SEMI on the content fingerprint (the eval set is small by nature),
    * then one per-source aggregate; at 100 TB the corpus is scanned once
    * and never shuffled on anything wider than the source key. The eval
    * set here is derived deterministically (doc_id % 97 == 0) so the
    * oracle can name the same rows; production passes its own
    * fingerprint table. */
  def contaminationBySource(docs: DataFrame,
      evalFps: DataFrame): DataFrame = {
    val fp = docFp(col("text")).as("fp")
    val flagged = docs.select(col("doc_id"), col("source"), fp)
      .join(broadcast(evalFps.select(col("fp"))), Seq("fp"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_contaminated"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          col("n_docs")).as("contamination_rate"))
  }

  /** The deterministic eval-set fingerprints used by the c1 driver query. */
  def evalSetFps(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(docFp(col("text")).as("fp"))

  def contaminationBySourceSql: String = s"""
    WITH fps AS (
      SELECT doc_id, source, md5(${normSql("text")}) AS fp FROM documents),
    eval AS (
      SELECT DISTINCT md5(${normSql("text")}) AS fp FROM documents
      WHERE doc_id % 97 = 0),
    flagged AS (
      SELECT source, count(*) AS n_contaminated
      FROM fps WHERE EXISTS (SELECT 1 FROM eval WHERE eval.fp = fps.fp)
      GROUP BY 1),
    totals AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
    SELECT t.source, t.n_docs,
      coalesce(f.n_contaminated, 0) AS n_contaminated,
      coalesce(f.n_contaminated, 0)::DOUBLE / t.n_docs
        AS contamination_rate
    FROM totals t LEFT JOIN flagged f ON f.source = t.source"""

  /** MIX1 (E47): source-weighted deterministic sampling — the data-MIXING
    * op of a training pipeline: each source gets a target rate and docs
    * are kept when their content-stable hash bucket falls under the
    * source's cutoff. Same hash-cutoff machinery as t5 (rerun/retry
    * stable, no global count, no rand()), extended with a per-source
    * rate. Rates here derive from the source suffix (n%4 → 25/50/75/100%)
    * so the oracle can reproduce them; production passes a weights table.
    * Output is the per-source audit row (kept vs total vs target) — what
    * a mixing run reports. */
  /** The mix1 per-source hash cutoff: 0x40/0x80/0xc0 on the first 2 hex
    * chars of md5(doc_id) ≈ 25/50/75%; "zz" compares above every hex
    * pair = keep all. Source's rate index = (source number % 4) + 1. */
  private def mixCut: Column = {
    val srcN = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    element_at(
      array(lit("40"), lit("80"), lit("c0"), lit("zz")),
      pmod(srcN, lit(4)) + 1)
  }

  /** MIX1's keep predicate as a corpus filter — the sampled corpus itself
    * (the audit row form is [[weightedSampleAudit]]); feeds [[
    * temperatureMixAudit]] so mix2 re-balances a genuinely skewed mix. */
  def weightedKeep(docs: DataFrame): DataFrame =
    docs.filter(substring(docIdHash(col("doc_id")), 1, 2) < mixCut)

  def weightedKeepSql: String = s"""
    SELECT * FROM documents
    WHERE substr(${docIdHashSql("doc_id")}, 1, 2) <
      (CASE ((CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4) + 1)
        WHEN 1 THEN '40' WHEN 2 THEN '80' WHEN 3 THEN 'c0'
        ELSE 'zz' END)"""

  // ---- S6 (E171): weighted reservoir sampling ------------------------------

  val ReservoirK = 100
  /** Tokens per weight unit: weight = 1 + n_tokens DIV 64, so a doc's
    * selection probability is ~proportional to its token mass at unit
    * granularity while Σweights (the draw volume) stays ~n_docs-scale. */
  val ReservoirUnit = 64L
  /** Odd multipliers for the unit-draw hash (Knuth/Fibonacci-style);
    * arithmetic stays under 2^63: (HashP−1)·RaceA ≈ 1.3e18. */
  val RaceA = 1315423911L
  val RaceB = 2654435761L

  /** S6 (E171): WEIGHTED reservoir sampling — probability-proportional-
    * to-size without replacement, the bounded-memory sibling of the
    * hash samplers (t5/s1/mix1 sample at fixed RATES; training-data
    * curation more often needs a fixed BUDGET k with long documents
    * favored by their token mass). The Efraimidis–Spirakis scheme ranks
    * items by a weight-tempered random key; its float form
    * (`u^(1/w)` / exponential clocks via `ln`) would fork the oracle
    * hash on libm-vs-JVM transcendentals (the t19/t10 rule: no log in
    * compared output), so the race runs on INTEGER unit draws instead:
    * weight w = 1 + tokens DIV [[ReservoirUnit]] explodes into w unit
    * draws, each draw hashes to `(doc_id % P)·A + j·B mod P`, the doc's
    * race key is its MINIMUM draw, and the k smallest keys win. By
    * draw-level symmetry P(doc holds the global minimum) = w/Σw
    * exactly, and ranking by per-doc minima IS the sequential race —
    * successive-sampling PPS-WOR — up to hash collisions (P = 1e9+7;
    * ties break on doc_id, both engines).
    *
    * Scale shape: the explode is Σw ≈ n_docs·(mean_tokens/64) narrow
    * integer rows; the min is a map-side-combined doc-grain aggregate;
    * the selection is top-k by (key, doc_id) — TakeOrderedAndProject
    * (plan-pinned): every partition keeps at most k rows, the driver
    * merges P·k — the textbook distributed reservoir, never a global
    * sort. Deterministic: same inputs, same sample, any partitioning. */
  def weightedReservoir(docs: DataFrame, k: Int = ReservoirK): DataFrame =
    raceKeyed(docs)
      .select(col("doc_id"), col("weight"), col("race_key"))
      .orderBy(col("race_key").asc, col("doc_id").asc)
      .limit(k)

  /** The shared race core (ONE definition for s6/s7): per-doc weight,
    * unit-draw explode, min-hash race key; `source` carried through for
    * the stratified consumer. */
  private def raceKeyed(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        // NULL-robust token count (review item): Spark's size() is -1
        // or NULL on a NULL array depending on dialect flags, and the
        // DuckDB oracle's len() is NULL — fold BOTH to 0 so an empty or
        // NULL doc races with weight 1 on every surface instead of
        // silently dropping out of (or forking) the sample
        greatest(coalesce(size(toksCol), lit(0)), lit(0))
          .cast("long").as("n_tokens"))
      .select(col("doc_id"), col("source"),
        (lit(1L) + expr(s"n_tokens DIV $ReservoirUnit")).as("weight"))
      .select(col("doc_id"), col("source"), col("weight"),
        explode(sequence(lit(1L), col("weight"))).as("j"))
      .groupBy(col("doc_id"), col("source"), col("weight"))
      .agg(min(pmod(pmod(col("doc_id"), lit(HashP)) * lit(RaceA) +
        col("j") * lit(RaceB), lit(HashP))).as("race_key"))

  /** S7 (E172): STRATIFIED weighted reservoir — the per-stratum budget
    * form of [[weightedReservoir]] (one race-key definition, two
    * consumers): each `source` keeps its own k smallest race keys, so
    * every stratum lands exactly min(k, |stratum|) docs regardless of
    * corpus skew — the "cap the giant source, keep the tail sources
    * whole" primitive of corpus mixing, here as a sample. Within a
    * stratum the race is the same PPS-WOR; across strata budgets are
    * independent (that's the point — s6's GLOBAL race lets a heavy
    * source crowd everyone out, this one doesn't).
    *
    * Scale shape: the rank is a source-partitioned window with a
    * rank ≤ k filter — WindowGroupLimit (plan-pinned): each shuffle
    * partition pre-truncates to k rows per stratum before the sort,
    * never a full per-source sort, never a global one. */
  def stratifiedReservoir(docs: DataFrame,
      kPerStratum: Int = StratumK): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("race_key").asc, col("doc_id").asc)
    raceKeyed(docs)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= kPerStratum)
      .select(col("source"), col("rk"), col("doc_id"), col("weight"),
        col("race_key"))
  }

  val StratumK = 20

  /** S7 oracle: the same race CTEs + a per-source QUALIFY. */
  def stratifiedReservoirSql(kPerStratum: Int = StratumK): String = s"""
    WITH w AS (
      SELECT doc_id, source,
        1 + greatest(coalesce(len(${tokensSql(normSql("text"))}), 0), 0)::BIGINT
          // $ReservoirUnit
          AS weight
      FROM documents),
    draws AS (
      SELECT doc_id, source, weight,
        unnest(generate_series(1, weight)) AS j
      FROM w),
    keys AS (
      SELECT doc_id, source, weight,
        min(((doc_id % $HashP) * $RaceA + j * $RaceB) % $HashP)
          AS race_key
      FROM draws GROUP BY 1, 2, 3)
    SELECT source, rk, doc_id, weight, race_key FROM (
      SELECT source, doc_id, weight, race_key,
        row_number() OVER (PARTITION BY source
          ORDER BY race_key ASC, doc_id ASC)::BIGINT AS rk
      FROM keys)
    WHERE rk <= $kPerStratum"""

  /** S6 oracle: the identical integer race in DuckDB. */
  def weightedReservoirSql(k: Int = ReservoirK): String = s"""
    WITH w AS (
      SELECT doc_id,
        1 + greatest(coalesce(len(${tokensSql(normSql("text"))}), 0), 0)::BIGINT
          // $ReservoirUnit
          AS weight
      FROM documents),
    draws AS (
      SELECT doc_id, weight,
        unnest(generate_series(1, weight)) AS j
      FROM w),
    keys AS (
      SELECT doc_id, weight,
        min(((doc_id % $HashP) * $RaceA + j * $RaceB) % $HashP)
          AS race_key
      FROM draws GROUP BY 1, 2)
    SELECT doc_id, weight, race_key
    FROM keys ORDER BY race_key ASC, doc_id ASC LIMIT $k"""

  def weightedSampleAudit(docs: DataFrame): DataFrame = {
    val cut = mixCut
    val bucket = substring(docIdHash(col("doc_id")), 1, 2)
    val kept = docs
      .select(col("source"), bucket.as("bucket"), cut.as("cut"))
      .filter(col("bucket") < col("cut"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("target_rate",
        (pmod(regexp_extract(col("source"), "(\\d+)", 1).cast("int"),
          lit(4)) + 1).cast("double") / 4.0)
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("target_rate"))
  }

  def weightedSampleAuditSql: String = s"""
    WITH base AS (
      SELECT source,
        substr(${docIdHashSql("doc_id")}, 1, 2) AS bucket,
        (CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4) + 1 AS q
      FROM documents),
    kept AS (
      SELECT source, count(*) AS n_kept FROM base
      WHERE bucket < (CASE q WHEN 1 THEN '40' WHEN 2 THEN '80'
                             WHEN 3 THEN 'c0' ELSE 'zz' END)
      GROUP BY 1),
    totals AS (
      SELECT source, count(*) AS n_docs, q::DOUBLE / 4.0 AS target_rate
      FROM base GROUP BY 1, q)
    SELECT t.source, t.n_docs, coalesce(k.n_kept, 0) AS n_kept,
      t.target_rate
    FROM totals t LEFT JOIN kept k ON k.source = t.source"""

  val PackBudget = 1024L
  val PackShards = 16

  /** PK1 (E48): sequence packing — assign docs to fixed-token-budget
    * training sequences. Fully distributed form: docs are sharded by a
    * content-stable hash (so each shard packs independently — the global
    * greedy packing is inherently sequential and would serialize 100 TB
    * through one task), then within a shard a running token total in
    * doc_id order buckets docs into sequences of ≈ `PackBudget` tokens.
    * The window is per-shard: parallelism = shard count, each shard's
    * state is one running sum. Assignment is `floor(tokens_before /
    * budget)`: no doc is split, and the doc that CROSSES the budget
    * boundary stays in its running sequence — a sequence can therefore
    * exceed the budget by up to one doc's tokens (and an oversized doc
    * makes the following seq_no values skip). Consumers with a hard
    * context cap chunk docs to ≤ the window length first (ch1), which
    * bounds the overshoot to one chunk; a strict never-exceed packing
    * would need a sequential per-shard fold, not a window formula. */
  def packSequences(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTok = docs.select(col("doc_id"),
      shardOf(col("doc_id")).as("shard"),
      size(toksCol).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withTok
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w),
        lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("cum_before") / lit(PackBudget)).as("seq_no"))
  }

  def packSequencesSql: String = s"""
    WITH toks AS (
      SELECT doc_id,
        ${shardOfSql("doc_id")} AS shard_raw,
        len(${tokensSql(normSql("text"))})::BIGINT AS n_tokens
      FROM documents)
    SELECT doc_id, shard_raw::BIGINT AS shard, n_tokens,
      CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard_raw
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        0) / $PackBudget) AS BIGINT) AS seq_no
    FROM toks"""

  /** R1 (E49): repetition removal — collapse consecutive duplicate
    * tokens (the cheap tier of C4/RefinedWeb-style repetition cleaning).
    * Token-array formulation, NOT a regex: backreference patterns
    * (`(\w+)( \1)+`) don't exist in RE2, so a regex form could never be
    * oracle-mirrored; the indexed-lambda filter is expressed identically
    * in both engines. One narrow per-row pass (interpreted HOF — fine
    * off the join hot path; a native Expression is the upgrade if a
    * profile ever shows it hot). */
  def collapseRepeats(docs: DataFrame): DataFrame = {
    val toks = toksCol
    val kept = filter(toks, (t, i) =>
      (i === lit(0)) || element_at(toks, i) =!= t)
    docs.select(col("doc_id"),
      array_join(kept, " ").as("clean_text"),
      (size(toks) - size(kept)).cast("long").as("removed_tokens"))
  }

  def collapseRepeatsSql: String = {
    val toks = tokensSql(normSql("text"))
    s"""
    WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
    SELECT doc_id,
      array_to_string(
        list_filter(toks, (x, i) -> i = 1 OR toks[i - 1] <> x), ' ')
        AS clean_text,
      (len(toks) - len(
        list_filter(toks, (x, i) -> i = 1 OR toks[i - 1] <> x)))::BIGINT
        AS removed_tokens
    FROM t"""
  }

  /** T7 (E54): corpus-statistics join-back — token rarity scoring, the
    * cheap LM-proxy quality signal (documents made of globally common
    * tokens are boilerplate-ish; a very low rarest-token DF marks docs
    * carrying unique content). Two-phase shape that recurs all over a
    * data pipeline: (1) build a corpus-level statistic keyed by token
    * (document frequency — partial-aggregated map-side, one shuffle whose
    * width is the VOCABULARY), (2) join it back onto the token stream and
    * re-aggregate per doc. The join is token-keyed and hot tokens are
    * REAL skew (stopword DF ≈ corpus size) — at 100 TB that join runs
    * under AQE skew splitting, or broadcasts the DF table outright when
    * the vocabulary fits (it usually does: vocab grows sub-linearly in
    * corpus size). Scoring avoids log() deliberately: libm vs JVM log
    * may differ in the last ulp, while integer-ratio arithmetic is
    * bitwise-identical cross-engine. */
  def tokenRarity(docs: DataFrame): DataFrame = {
    val tok = spreadSmallScan(docs)
      .select(col("doc_id"), explode(toksCol).as("token"))
    val dfreq = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    // the DF table is VOCABULARY-width (sub-linear in corpus size) —
    // broadcast it like t9's vocabulary join-back, so the corpus-width
    // token stream never shuffles on the (genuinely skewed) token key.
    // If a vocabulary ever outgrows executor memory, drop the hint and
    // let AQE skew-split the shuffled join — the documented fallback.
    tok.join(broadcast(dfreq), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("df")).cast("double") / count(lit(1)))
          .as("mean_token_df"),
        min(col("df")).as("rarest_df"))
  }

  def tokenRaritySql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(${tokensSql(normSql("text"))}) AS token
      FROM documents),
    dfreq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df
      FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1)
    SELECT doc_id, count(*) AS n_tokens,
      CAST(sum(df) AS DOUBLE) / count(*) AS mean_token_df,
      min(df) AS rarest_df
    FROM tok JOIN dfreq USING (token)
    GROUP BY 1"""

  /** T12 (E76) model geometry: hashed-feature bucket count and the seeded
    * integer weight table. In production the weights are the TRAINED
    * parameters of a fastText/logistic quality classifier (the DCLM /
    * FineWeb-Edu filtering stage), loaded from a model file and broadcast;
    * here they derive deterministically from the bucket index so the
    * oracle can rebuild the identical table. Weights are SMALL INTEGERS
    * (a quantized model, the v3 int8 convention) deliberately: the per-doc
    * margin is then an exact integer sum — order-independent, bitwise
    * cross-engine — where float weights would make the fold order part of
    * the answer. */
  val ClfBuckets = 64
  val ClfWeights: Seq[Long] = (0 until ClfBuckets).map { b =>
    ((b.toLong * 2654435761L + 987654321L) % HashP) % 17L - 8L
  }

  /** T12 (E76): hashed-feature linear classifier INFERENCE — the
    * model-based quality-filter stage of a training-data pipeline
    * (score every document with a trained classifier, keep the positive
    * margin side). The feature map is the standard hashing trick: token →
    * rolling hash → bucket (mod [[ClfBuckets]]), so the model is a dense
    * weight vector with no vocabulary dictionary to ship — the property
    * that makes this the published shape for corpus-scale filtering.
    * Execution is ONE narrow codegen'd pass: native per-token hashes
    * ([[tokenHashes]]) folded through an `aggregate` HOF against a
    * literal weight array (broadcast to every executor inside the plan) —
    * no shuffle, no join, column-pruned to (doc_id, text); at 100 TB this
    * runs at scan speed exactly like t1–t4. Margin is an exact integer;
    * the only double is the final per-doc normalization. */
  def classifierScore(docs: DataFrame, carry: Seq[String] = Nil)
      : DataFrame = {
    val wts = typedlit(ClfWeights)
    val keep = carry.map(col)
    docs.select(col("doc_id") +: keep :+ tokenHashes(toksCol).as("th"): _*)
      .select(col("doc_id") +: keep :+
        size(col("th")).cast("long").as("n_tokens") :+
        aggregate(col("th"), lit(0L),
          (a, h) => a + element_at(wts,
            pmod(h, lit(ClfBuckets.toLong)).cast("int") + 1))
          .as("margin"): _*)
      .select(col("doc_id") +: keep :+ col("n_tokens") :+ col("margin") :+
        (col("margin").cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double")).as("score") :+
        (col("margin") > 0).as("keep"): _*)
  }

  /** E123 (T17): per-source quality CALIBRATION — the classifier score is
    * source-biased by construction (vocabulary and register differ per
    * source), so a single global threshold systematically starves some
    * sources (the failure mode FineWeb-style pipelines fix by normalizing
    * within source before the cut). Each doc's score becomes its
    * percent_rank WITHIN its source (deterministic total order: score,
    * then doc_id — both engines rank identically; percent_rank is
    * (rank−1)/(n−1), a ratio of exact longs), and `selected` keeps the
    * top half of EVERY source — contrast sel1's global budget cut, which
    * this op is the fairness-adjusted alternative to.
    *
    * One scan (the t12 codegen'd fold) + one window shuffle keyed on
    * source. Source grain can be skewed at 100 TB (one dominant source =
    * one huge window partition) — the documented swap is the t13x
    * convention per source: approx per-source score quantiles broadcast
    * back as thresholds, no sort. */
  def sourceCalibratedQuality(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("score").asc, col("doc_id").asc)
    classifierScore(docs, Seq("source"))
      .withColumn("pct_rank", percent_rank().over(w))
      .select(col("doc_id"), col("source"), col("score"), col("pct_rank"),
        (col("pct_rank") >= 0.5).as("selected"))
  }

  /** Pairs per source for the driver's `pp1` query. */
  val PrefPairsK = 5

  /** E125 (PP1): preference-PAIR construction — the reward-model /
    * DPO data-prep stage: within each group (source = the prompt-group
    * proxy here), the k best-scoring docs pair with the k worst
    * (best-1 ↔ worst-1, …), margin = score gap, degenerate pairs
    * (no actual gap) dropped. ONE ranking window per source — the
    * bottom rank derives as n−top+1 from the same sort (the reversed
    * order's tiebreak is the exact mirror, so a second sort pass would
    * buy nothing), and the pair assembly is a self-join of two
    * k-bounded slices on (source, pair_rank). Margin is a difference
    * of two deterministic ratios of exact longs — bitwise
    * cross-engine. Scales like t17: one t12 scan + one source-keyed
    * window; output is ≤ k rows per source whatever the corpus size. */
  def preferencePairs(docs: DataFrame, k: Int = PrefPairsK): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wTop = W.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val ranked = classifierScore(docs, Seq("source"))
      .select(col("doc_id"), col("source"), col("score"))
      .withColumn("top_r", row_number().over(wTop).cast("long"))
      .withColumn("n", count(lit(1)).over(W.partitionBy(col("source"))))
    val chosen = ranked.filter(col("top_r") <= k)
      .select(col("source"), col("top_r").as("pair_rank"),
        col("doc_id").as("chosen_id"), col("score").as("chosen_score"))
    val rejected = ranked
      .withColumn("pair_rank", col("n") - col("top_r") + 1)
      .filter(col("pair_rank") <= k)
      .select(col("source"), col("pair_rank"),
        col("doc_id").as("rejected_id"), col("score").as("rejected_score"))
    chosen.join(rejected, Seq("source", "pair_rank"))
      .filter(col("chosen_score") > col("rejected_score"))
      .select(col("source"), col("pair_rank"), col("chosen_id"),
        col("rejected_id"), col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  def preferencePairsSql(k: Int = PrefPairsK): String = {
    val wlit = ClfWeights.mkString("[", ", ", "]")
    s"""
    WITH t AS (
      SELECT doc_id, source,
        ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    m AS (
      SELECT doc_id, source, len(th)::BIGINT AS n_tokens,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(th, h -> w.wts[(h % $ClfBuckets)::INT + 1])),
          (a, x) -> a + x) AS margin
      FROM t, (SELECT $wlit::BIGINT[] AS wts) w),
    sc AS (
      SELECT doc_id, source,
        CAST(margin AS DOUBLE) / greatest(n_tokens, 1) AS score
      FROM m),
    r AS (
      SELECT doc_id, source, score,
        row_number() OVER (PARTITION BY source
          ORDER BY score DESC, doc_id ASC)::BIGINT AS top_r,
        count(*) OVER (PARTITION BY source)::BIGINT AS n
      FROM sc),
    ch AS (
      SELECT source, top_r AS pair_rank, doc_id AS chosen_id,
        score AS chosen_score
      FROM r WHERE top_r <= $k),
    rj AS (
      SELECT source, n - top_r + 1 AS pair_rank, doc_id AS rejected_id,
        score AS rejected_score
      FROM r WHERE n - top_r + 1 <= $k)
    SELECT ch.source, ch.pair_rank, chosen_id, rejected_id,
      chosen_score, rejected_score,
      chosen_score - rejected_score AS margin
    FROM ch JOIN rj ON ch.source = rj.source
      AND ch.pair_rank = rj.pair_rank
    WHERE chosen_score > rejected_score"""
  }

  def sourceCalibratedQualitySql: String = {
    val wlit = ClfWeights.mkString("[", ", ", "]")
    s"""
    WITH t AS (
      SELECT doc_id, source,
        ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    m AS (
      SELECT doc_id, source, len(th)::BIGINT AS n_tokens,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(th, h -> w.wts[(h % $ClfBuckets)::INT + 1])),
          (a, x) -> a + x) AS margin
      FROM t, (SELECT $wlit::BIGINT[] AS wts) w),
    sc AS (
      SELECT doc_id, source,
        CAST(margin AS DOUBLE) / greatest(n_tokens, 1) AS score
      FROM m)
    SELECT doc_id, source, score,
      percent_rank() OVER (PARTITION BY source
        ORDER BY score ASC, doc_id ASC) AS pct_rank,
      percent_rank() OVER (PARTITION BY source
        ORDER BY score ASC, doc_id ASC) >= 0.5 AS selected
    FROM sc"""
  }

  // ---- TRN1 (E163): distributed deterministic perceptron training ---------

  /** Hashed-feature space for the trainable classifier — matches
    * [[ClfBuckets]] so the distillation target is EXACTLY linear in
    * the features; bucket [[PtronBuckets]] itself is the always-on
    * BIAS feature (one mechanism, no special-casing). The weight
    * vector is driver-bounded metadata (the ANN centroid-collect
    * convention). */
  val PtronBuckets = 64
  /** Fixed round count — the halving learning rate has converged by
    * round 8 at every measured SF (accuracy plateaus; see the spec). */
  val PtronIters = 8
  /** Weight grid: updates land on a ×2²⁰ fixed-point grid so the
    * geometrically-decaying integer steps stay nonzero — the g1
    * PrScale discipline applied to learning. */
  val PtronScale = 1L << 20

  /** TRN1 (E163): train a classifier IN the engine — a batch
    * PERCEPTRON with geometrically decaying step over hashed token
    * count features, closing the loop t12 left open: t12 SCORES with
    * fixed hash weights, this LEARNS weights from labels. The label
    * here is t12's own keep decision (margin > 0) — the published
    * DISTILLATION shape (train a cheap model to mimic an expensive
    * labeling function; FineWeb-style classifier distillation), and
    * with count features over the SAME bucketing the target is exactly
    * linear, so the measured accuracy curve is a property of the
    * optimizer alone. (The first cut labeled on the corpus's `lang`
    * column — unlearnable: the synthetic generator draws every
    * language from one shared vocabulary, and the spec caught 0.39
    * accuracy. The distillation label is the honest, separable task.)
    *
    * Why this exact optimizer: everything stays in EXACT INTEGER
    * arithmetic — scores are long dot products (occurrence-weighted:
    * the score folds the raw hash array, never materializing count
    * vectors), the mistake set is y·s ≤ 0 (ties are mistakes), and the
    * batch update is an associative long sum of per-mistake ±count,
    * scaled onto the [[PtronScale]] grid with step S/(m·2ᵏ) — the
    * plain sum-of-all-mistakes batch perceptron OSCILLATES (measured:
    * a 2-cycle pinned at the class share), while the halving step
    * damps it to a stable fixpoint (0.89/0.93 train accuracy at
    * sf0.001/sf0.01, plateau by round 8). Any partitioning trains
    * bit-identical weights (spec-pinned); logistic's exp() (not
    * correctly rounded — engine-forking) never enters; integer DIV
    * truncates toward zero in BOTH engines (Spark DIV, DuckDB //).
    *
    * Scale shape: the (y, token-hash-array) relation builds once and
    * persists; each of the K fixed rounds is ONE scan — the current
    * weights broadcast as a 65-entry map LITERAL inside codegen (never
    * a join), mistakes filter and per-bucket deltas map-side-combine,
    * and the only driver traffic is the ≤65-row delta whose bias row
    * doubles as the mistake count (bias occurs exactly once per doc).
    * Weight state lives on the driver between rounds exactly like
    * BPE's merge table. Released in-method (computeKpis lifecycle). */
  def perceptronTrain(docs: DataFrame,
      iters: Int = PtronIters): DataFrame = {
    val spark = docs.sparkSession
    val b = PtronBuckets.toLong
    val clfW = typedlit(ClfWeights)
    val feats = docs.select(tokenHashes(toksCol).as("th"))
      .select(col("th"),
        when(aggregate(col("th"), lit(0L), (a, h) => a + element_at(clfW,
          pmod(h, lit(ClfBuckets.toLong)).cast("int") + 1)) > 0L, 1L)
          .otherwise(-1L).as("y"))
      .persist()
    try {
      var w: Map[Long, Long] = (0L to b).map(_ -> 0L).toMap
      for (k <- 1 to iters) {
        val wlit = typedlit(w)
        val deltas = feats
          .withColumn("s",
            aggregate(col("th"), lit(0L),
              (a, h) => a + element_at(wlit, pmod(h, lit(b)))) +
              element_at(wlit, lit(b)))
          .where(col("y") * col("s") <= 0L)
          .select(explode(concat(
              transform(col("th"), h => pmod(h, lit(b))),
              array(lit(b)))).as("bucket"), col("y"))
          .groupBy(col("bucket")).agg(sum(col("y")).as("delta"),
            count(lit(1)).as("occ"))
          .collect() // bounded: ≤ PtronBuckets+1 rows of metadata
        // the bias bucket occurs exactly once per mistake doc — its occ
        // IS the mistake count, no second job
        val m = deltas.find(_.getLong(0) == b).map(_.getLong(2))
          .getOrElse(0L)
        if (m > 0L) {
          val div = m * (1L << k)
          w = w ++ deltas.map { r =>
            val q = r.getLong(1) * PtronScale / div // Long / truncates
            r.getLong(0) -> (w(r.getLong(0)) + q)
          }
        }
      }
      spark.createDataFrame(
          (0L to b).map(bk => (bk, w(bk))).sortBy(_._1))
        .toDF("bucket", "weight")
    } finally { feats.unpersist(); () }
  }

  /** trn1 oracle: the identical K rounds unrolled as CTE stages over a
    * bucket spine (the g1/t8 unrolled-loop convention) — per round one
    * occurrence-grain score join, the exact y·s ≤ 0 mistake set, and
    * the scaled truncating-division update (DuckDB's `//` truncates
    * toward zero exactly like Spark's DIV — verified, negatives
    * included). The chained CTEs are MATERIALIZED: w/mist are each
    * referenced twice per round, and DuckDB's default inlining
    * re-expands the whole chain per reference — 4ᴷ plan paths, a
    * measured multi-minute hang at K = 8 (the g1/t8 chains dodge this
    * with single references; this oracle can't). */
  def perceptronTrainSql(iters: Int = PtronIters): String = {
    val b = PtronBuckets
    val wlit = ClfWeights.mkString("[", ", ", "]")
    val rounds = (1 to iters).map { k =>
      s"""s$k AS MATERIALIZED (
      SELECT o.rid, o.y, sum(w.weight)::BIGINT AS s
      FROM occ o JOIN w${k - 1} w ON w.bucket = o.bucket
      GROUP BY 1, 2),
    mist$k AS MATERIALIZED (SELECT rid, y FROM s$k WHERE y * s <= 0),
    mc$k AS MATERIALIZED (SELECT count(*)::BIGINT AS m FROM mist$k),
    d$k AS MATERIALIZED (
      SELECT o.bucket, sum(o.y)::BIGINT AS delta
      FROM occ o JOIN mist$k t ON t.rid = o.rid
      GROUP BY 1),
    w$k AS MATERIALIZED (
      SELECT w.bucket,
        (w.weight + coalesce(
          (d.delta * $PtronScale) // (greatest(mc.m, 1) * ${1L << k}),
          0))::BIGINT AS weight
      FROM w${k - 1} w
      CROSS JOIN mc$k mc
      LEFT JOIN d$k d ON d.bucket = w.bucket)"""
    }.mkString(",\n    ")
    s"""
    WITH raw AS (
      SELECT row_number() OVER (ORDER BY doc_id) AS rid,
        ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    lab AS (
      SELECT rid, th,
        CASE WHEN list_reduce(list_prepend(0::BIGINT,
            list_transform(th, h -> cw.wts[(h % $ClfBuckets)::INT + 1])),
            (a, x) -> a + x) > 0 THEN 1 ELSE -1 END::BIGINT AS y
      FROM raw, (SELECT $wlit::BIGINT[] AS wts) cw),
    occ AS MATERIALIZED (
      SELECT rid, y, unnest(list_append(
        list_transform(th, h -> h % $b), $b::BIGINT)) AS bucket
      FROM lab),
    spine AS (SELECT range::BIGINT AS bucket FROM range(0, ${b + 1})),
    w0 AS (SELECT bucket, 0::BIGINT AS weight FROM spine),
    $rounds
    SELECT bucket, weight FROM w$iters"""
  }

  def classifierScoreSql: String =
    classifierScoreSqlOver("SELECT * FROM documents")

  /** The t12 scoring SQL over an arbitrary corpus subquery — the same
    * single definition the plain-`documents` twin delegates to, so a
    * composed consumer (d16's survivor selection over the twinned
    * corpus) can never fork from the standalone t12 oracle. */
  def classifierScoreSqlOver(corpus: String): String = {
    val wlit = ClfWeights.mkString("[", ", ", "]")
    s"""
    WITH t AS (
      SELECT doc_id, ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM ($corpus)),
    m AS (
      SELECT doc_id, len(th)::BIGINT AS n_tokens,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(th, h -> w.wts[(h % $ClfBuckets)::INT + 1])),
          (a, x) -> a + x) AS margin
      FROM t, (SELECT $wlit::BIGINT[] AS wts) w)
    SELECT doc_id, n_tokens, margin,
      CAST(margin AS DOUBLE) / greatest(n_tokens, 1) AS score,
      margin > 0 AS keep
    FROM m"""
  }

  /** LM1 (E98): bigram language-model quality scoring — the CCNet/KenLM
    * stage of a curation pipeline: train an n-gram LM on the corpus,
    * score every document by how probable its token sequence is, filter
    * the improbable tail. The LM here is the corpus's own bigram
    * conditional-frequency table (production would train on a trusted
    * reference corpus and broadcast the table — same join shape);
    * deliberately integer-deterministic instead of log-prob floats: a
    * summed log-likelihood would make the fold order part of the answer,
    * so the score is the RATIO of two exact integer sums
    * (Σ C(w1,w2) / Σ C(w1) over the doc's bigrams — a frequency-weighted
    * mean conditional probability) and the weakest-link signal is a MIN
    * of per-bigram doubles (order-independent). Low `min_cond_prob` =
    * the doc contains a token transition the corpus has (almost) never
    * seen — the improbable-sequence detector.
    *
    * Scale: one narrow pass builds the doc bigram stream; the pair and
    * left-unigram count tables are vocabulary²-/vocabulary-bounded
    * aggregates (the t7/t10 statistics shape). The join-backs carry NO
    * hard broadcast hint: AQE sees the count tables' actual post-shuffle
    * size at runtime and converts to broadcast joins when the vocabulary
    * is small (here), degrading to plain shuffle joins on a vocabulary
    * too large to ship — a forced hint would instead collect the
    * vocabulary² table onto the driver and OOM exactly when the corpus
    * is at its largest. */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), tokenHashes(toksCol).as("th"))
    val emptyPairs = array().cast("array<struct<a:bigint,b:bigint>>")
    val bi = tok.select(col("doc_id"),
      explode(when(size(col("th")) < 2, emptyPairs)
        .otherwise(transform(sequence(lit(1), size(col("th")) - 1), i =>
          struct(element_at(col("th"), i).as("a"),
            element_at(col("th"), i + lit(1)).as("b"))))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val cPair = bi.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    val cLeft = bi.groupBy(col("a")).agg(count(lit(1)).as("n_a"))
    bi.join(cPair, Seq("a", "b"))
      .join(cLeft, Seq("a"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("n_ab")).as("sum_pair_freq"),
        sum(col("n_a")).as("sum_left_freq"),
        min(col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("min_cond_prob"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_pair_freq").cast("double") /
          col("sum_left_freq").cast("double")).as("lm_score"),
        col("min_cond_prob"))
  }

  def bigramLmScoreSql: String = s"""
    WITH t AS (
      SELECT doc_id, ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    bi AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(th)), i -> th[i])) AS a,
        unnest(list_transform(range(1, len(th)), i -> th[i + 1])) AS b
      FROM t WHERE len(th) >= 2),
    cpair AS (
      SELECT a, b, count(*)::BIGINT AS n_ab FROM bi GROUP BY 1, 2),
    cleft AS (
      SELECT a, count(*)::BIGINT AS n_a FROM bi GROUP BY 1)
    SELECT bi.doc_id, count(*)::BIGINT AS n_bigrams,
      sum(cpair.n_ab)::DOUBLE / sum(cleft.n_a)::DOUBLE AS lm_score,
      min(cpair.n_ab::DOUBLE / cleft.n_a::DOUBLE) AS min_cond_prob
    FROM bi
    JOIN cpair ON bi.a = cpair.a AND bi.b = cpair.b
    JOIN cleft ON bi.a = cleft.a
    GROUP BY 1"""

  /** T20 (E151): corpus COLLOCATIONS — the Manning–Schütze bigram
    * association screen: which adjacent token pairs co-occur far more
    * often than their parts predict ("new york", not "of the")? The
    * phrase-mining stage a tokenizer-vocabulary or stopword review
    * reads. Association is the RATIONAL lift
    * n_ab·N / (n_a··n_·b) — the pointwise-mutual-information
    * EXPONENTIAL (rank-equivalent to PMI, no log: the libm rule), with
    * marginals taken over the bigram table itself (left-slot and
    * right-slot counts, so numerator and denominator sum to the same N
    * — self-consistent probabilities). All counts are exact longs; the
    * single division of exact long products is correctly rounded on
    * both engines (n_ab·N ≤ N², inside int64 at any swept scale).
    *
    * Scale shape: ONE narrow pass builds the bigram stream; pair and
    * marginal tables are vocabulary²-/vocabulary-bounded aggregates
    * (the lm1 statistics shape, readable tokens instead of hashes —
    * this op's output is for human review). The min-count filter (d7
    * DF-cap) prunes the pair table BEFORE the marginal join-backs (no
    * broadcast hints — AQE sizes them, the lm1 convention); N rides
    * the broadcast 1-row bounds frame; the top-k is a bounded
    * TakeOrdered on (lift desc, pair) — never a full sort kept. */
  def collocations(docs: DataFrame, k: Int = 25,
      minCount: Long = 5L): DataFrame = {
    val tok = docs.select(col("doc_id"), toksCol.as("tk"))
    val emptyPairs = array().cast("array<struct<a:string,b:string>>")
    val bi = tok.select(
      explode(when(size(col("tk")) < 2, emptyPairs)
        .otherwise(transform(sequence(lit(1), size(col("tk")) - 1), i =>
          struct(element_at(col("tk"), i).as("a"),
            element_at(col("tk"), i + lit(1)).as("b"))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .persist() // four consumers: pairs, two marginals, total (mb1 rule)
    val pairs = bi.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val left = bi.groupBy(col("a")).agg(count(lit(1)).as("n_left"))
    val right = bi.groupBy(col("b")).agg(count(lit(1)).as("n_right"))
    val total = bi.agg(count(lit(1)).as("n_total"))
    pairs.join(left, Seq("a")).join(right, Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a").as("w1"), col("b").as("w2"), col("n_pair"),
        ((col("n_pair") * col("n_total")).cast("double") /
          (col("n_left") * col("n_right")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** T20 oracle: same bigram stream, marginals, DF-cap, and the same
    * deterministic (lift desc, pair) top-k. */
  def collocationsSql(k: Int = 25, minCount: Long = 5L): String = s"""
    WITH t AS (
      SELECT doc_id, ${tokensSql(normSql("text"))} AS tk FROM documents),
    bi AS (
      SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS a,
        unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS b
      FROM t WHERE len(tk) >= 2),
    n AS (SELECT count(*)::BIGINT AS n_total FROM bi),
    pc AS (SELECT a, b, count(*)::BIGINT AS n_pair FROM bi
      GROUP BY 1, 2 HAVING count(*) >= $minCount),
    lf AS (SELECT a, count(*)::BIGINT AS n_left FROM bi GROUP BY 1),
    rt AS (SELECT b, count(*)::BIGINT AS n_right FROM bi GROUP BY 1)
    SELECT pc.a AS w1, pc.b AS w2, pc.n_pair,
      (pc.n_pair * n.n_total)::DOUBLE
        / (lf.n_left * rt.n_right)::DOUBLE AS lift
    FROM pc JOIN lf USING (a) JOIN rt USING (b) CROSS JOIN n
    ORDER BY lift DESC, w1, w2 LIMIT $k"""

  // ---- T15 (E105): BM25 ranked retrieval ----------------------------------

  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Queries = 5
  val Bm25TopK = 5

  /** T15 (E105): BM25 ranked retrieval — the inverted-index search stage
    * (dense retrieval's sparse sibling, and the standard "find training
    * docs like these seeds" / retrieval-augmented curation primitive):
    * each query document's distinct terms score every other document that
    * shares a term, summed per (query, doc) and ranked top-k.
    *
    * Deterministic BM25 with the lm1 discipline: the usual `ln` idf would
    * put each engine's libm in the answer (Math.log and DuckDB's ln may
    * differ in the last ulp), so idf is the RAW ODDS ratio
    * `(N - df + ½)/(df + ½)` — the exact rational inside Robertson's log,
    * same relevance ordering force (monotone in df), every arithmetic op
    * IEEE-correctly-rounded identically on both engines. The per-(q,d)
    * term-score sum is a SEQUENTIAL fold in term-hash order
    * (`sort_array` + `aggregate` ≙ DuckDB `list(… ORDER BY term)` +
    * `list_reduce`), so fold order is part of the contract, not the
    * scheduler's mood.
    *
    * Scale (100 TB): `tf` IS the inverted index — a token-grain aggregate
    * (one shuffle, bucketable/persistable by term, exactly the t11 DF
    * store's maintenance shape); corpus stats are a 1-row broadcast
    * bounds frame (the jc1/v4x convention); the query side is tiny and
    * broadcast, so the candidate join shuffles nothing but postings for
    * terms the queries actually contain; the per-pair fold's lists are
    * bounded by the query's term count. */
  def bm25TopKRetrieval(docs: DataFrame,
      numQueries: Int = Bm25Queries, k: Int = Bm25TopK): DataFrame = {
    val k1 = Bm25K1
    // corpus-width tokenization parallelized across cores (the
    // spreadSmallScan input-skew remedy; no-op on a many-split corpus)
    val tok = spreadSmallScan(docs)
      .select(col("doc_id"), tokenHashes(toksCol).as("th"))
    // ONE corpus tokenization: postings persist (the d7 convention —
    // released by the runner's per-query cache clear) and serve all four
    // consumers (df table, corpus stats, candidate join); N/avgdl are
    // defined over TOKENIZED docs (empty docs are unmatchable and carry
    // no length mass — the IR convention), so stats derive from the
    // postings instead of a second corpus scan.
    val tf = tok
      .select(col("doc_id"), size(col("th")).cast("long").as("dl"),
        explode(col("th")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = tf.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("tot_dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val q = tok.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(col("th"))).as("term"))
    val scored = broadcast(q)
      .join(tf.as("p"), col("p.term") === q("term") &&
        col("p.doc_id") =!= col("query_id"))
      .join(dfT.as("d"), col("d.term") === q("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("p.doc_id").as("doc_id"), q("term"),
        (((col("n_docs") - col("d.df") + lit(0.5)) /
            (col("d.df") + lit(0.5))) *
          (col("p.tf") * lit(k1 + 1.0)) /
          (col("p.tf") + lit(k1) * (lit(1.0 - Bm25B) + lit(Bm25B) *
            col("p.dl").cast("double") /
            (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
          .as("s"))
    scored.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        collect_list(struct(col("term"), col("s"))).as("ts"))
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        aggregate(sort_array(col("ts")), lit(0.0),
          (a, x) => a + x.getField("s")).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_terms"), col("score"))
  }

  def bm25TopKRetrievalSql(numQueries: Int = Bm25Queries,
      k: Int = Bm25TopK, corpus: String = "documents"): String = {
    val k1 = Bm25K1
    s"""
    WITH t AS (
      SELECT doc_id, ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM $corpus),
    tf AS (
      SELECT doc_id, dl, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, len(th)::BIGINT AS dl, unnest(th) AS term
            FROM t)
      GROUP BY 1, 2, 3),
    stats AS (
      -- over TOKENIZED docs (docs with ≥1 token), mirroring the engine
      SELECT count(*)::BIGINT AS n_docs,
        coalesce(sum(dl), 0)::BIGINT AS tot_dl
      FROM (SELECT DISTINCT doc_id, dl FROM tf)),
    dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    q AS (
      SELECT doc_id AS query_id, unnest(list_distinct(th)) AS term
      FROM t WHERE doc_id < $numQueries),
    scored AS (
      -- every fractional literal is ::DOUBLE: DuckDB parses bare 2.2 as
      -- DECIMAL and computes tf * 2.2 EXACTLY, which rounds differently
      -- from the double multiply Spark does (0.5/0.25/0.75 are dyadic so
      -- the distinction is invisible elsewhere; 1.2/2.2 are not)
      SELECT q.query_id, p.doc_id, q.term,
        ((s.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)) *
          (p.tf * ${k1 + 1.0}::DOUBLE) /
          (p.tf + $k1::DOUBLE * (${1.0 - Bm25B}::DOUBLE + $Bm25B::DOUBLE *
            p.dl::DOUBLE / (s.tot_dl::DOUBLE / s.n_docs::DOUBLE))) AS s
      FROM q
      JOIN tf p ON p.term = q.term AND p.doc_id <> q.query_id
      JOIN dft d ON d.term = q.term
      CROSS JOIN stats s),
    pair AS (
      SELECT query_id, doc_id, count(*)::BIGINT AS n_terms,
        list(s ORDER BY term) AS ss
      FROM scored GROUP BY 1, 2),
    summed AS (
      SELECT query_id, doc_id, n_terms,
        list_reduce(list_prepend(0.0::DOUBLE, ss), (a, x) -> a + x)
          AS score
      FROM pair),
    ranked AS (
      SELECT query_id, doc_id, n_terms, score,
        row_number() OVER (PARTITION BY query_id
          ORDER BY score DESC, doc_id ASC) AS rank
      FROM summed)
    SELECT query_id, rank::BIGINT AS rank, doc_id, n_terms, score
    FROM ranked WHERE rank <= $k"""
  }

  // ---- REP1 (E113): per-source contamination report -----------------------

  /** REP1 (E113): the decontamination DASHBOARD — the three contamination
    * grains the pipeline already computes (c1 exact fingerprints, c2
    * shared word-5-grams, c3 MinHash near-dups), joined to one per-source
    * report with a single `flagged` verdict. This is the artifact a
    * curation run actually publishes: one row per source, every signal's
    * own convention preserved (c1 counts all docs incl. the eval rows
    * themselves; c2/c3 count training-side docs against the eval set —
    * the report JOINS the operators' outputs, it does not re-derive
    * them, so each column stays hash-identical to its standalone query).
    *
    * Scale: three already-scoped passes (each broadcast-joins the tiny
    * eval side and aggregates to source grain) + a \|sources\|-row join.
    * Nothing new shuffles wider than the source key. */
  def contaminationReport(docs: DataFrame): DataFrame = {
    val exact = contaminationBySource(docs, evalSetFps(docs))
      .select(col("source"), col("n_docs"),
        col("n_contaminated").as("exact_contaminated"),
        col("contamination_rate").as("exact_rate"))
    // c2/c3 run over the SAME corpus their standalone queries use (the
    // sourced-twin convention, which plants the positives) — the report
    // joins the operators' outputs, so the inputs must be the
    // operators' inputs or the hash-identity claim is vacuous
    val twinned = withSourcedTwins(docs)
    val ngram = ngramContamination(twinned)
      .select(col("source"),
        col("n_contaminated").as("ngram_contaminated"),
        col("max_overlap").as("ngram_max_overlap"))
    val near = graft.dedup.Dedup.crossCorpusNearDups(twinned)
      .join(twinned.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("neardup_docs"))
    // exact covers every source (it counts ALL docs), so it anchors the
    // left joins; absent signals coalesce to 0, never drop a source
    exact.join(ngram, Seq("source"), "left")
      .join(near, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("exact_contaminated"),
        col("exact_rate"),
        coalesce(col("ngram_contaminated"), lit(0L))
          .as("ngram_contaminated"),
        coalesce(col("ngram_max_overlap"), lit(0L))
          .as("ngram_max_overlap"),
        coalesce(col("neardup_docs"), lit(0L)).as("neardup_docs"),
        (col("exact_contaminated") +
          coalesce(col("ngram_contaminated"), lit(0L)) +
          coalesce(col("neardup_docs"), lit(0L)) > 0).as("flagged"))
  }

  def contaminationReportSql: String = {
    // the standalone c2/c3 corpus (sourced twins), exactly as registered
    val corpus = withSourcedTwinsSql("documents")
    s"""
    WITH exact AS (
      SELECT source, n_docs, n_contaminated AS exact_contaminated,
        contamination_rate AS exact_rate
      FROM ($contaminationBySourceSql)),
    ngram AS (
      SELECT source, n_contaminated AS ngram_contaminated,
        max_overlap AS ngram_max_overlap
      FROM (${ngramContaminationSql(corpus)})),
    near AS (
      SELECT d.source, count(DISTINCT n.doc_id)::BIGINT AS neardup_docs
      FROM (${graft.dedup.Dedup.crossCorpusNearDupsSql(corpus)}) n
      JOIN ($corpus) d ON d.doc_id = n.doc_id
      GROUP BY 1)
    SELECT e.source, e.n_docs, e.exact_contaminated, e.exact_rate,
      coalesce(g.ngram_contaminated, 0)::BIGINT AS ngram_contaminated,
      coalesce(g.ngram_max_overlap, 0)::BIGINT AS ngram_max_overlap,
      coalesce(r.neardup_docs, 0)::BIGINT AS neardup_docs,
      e.exact_contaminated + coalesce(g.ngram_contaminated, 0)
        + coalesce(r.neardup_docs, 0) > 0 AS flagged
    FROM exact e
    LEFT JOIN ngram g ON g.source = e.source
    LEFT JOIN near r ON r.source = e.source"""
  }

  // ---- IR1 (E131): retrieval evaluation metrics ----------------------------

  /** E131 (IR1): retrieval EVALUATION — the harness that closes the
    * retrieval family (t15 BM25 / rrf1 fusion / the ANN ladder produce
    * rankings; this scores one): per query, the rank of the first
    * relevant hit, reciprocal rank (MRR's per-query term), and
    * precision@k. Ranking runs over the PLANTED-TWIN corpus (the dedup
    * convention) and relevance = "is the query's twin" (id mod the twin
    * offset) — deterministic qrels with a known answer: at sf0.01+ the
    * full-token-overlap twin is retrieved within k for every query
    * (oracle-hash-pinned values; MRR reads 0.6 at sf0.01 — rank 1 is
    * not guaranteed, a competitor matching only the query's RAREST
    * terms can outscore the twin, exactly the idf behavior the metric
    * measures; at the 500-doc smoke SF the shared synthetic vocabulary
    * crowds some twins out, which the metric duly reports — the spec
    * pins the arithmetic, not a recall the corpus doesn't support);
    * a real qrels table swaps in as a join
    * without touching the metric arithmetic. rr for a query with no
    * relevant hit is 0 (the IR convention); rr and p@k are single
    * divisions of exact longs (the lm1 discipline — no mean row, so no
    * cross-row float fold; the caller averages). */
  def retrievalMetrics(docs: DataFrame, numQueries: Int = Bm25Queries,
      k: Int = Bm25TopK): DataFrame = {
    val j = bm25TopKRetrieval(graft.dedup.Dedup.withNearDups(docs),
        numQueries, k)
      .withColumn("rel",
        (pmod(col("doc_id"), lit(graft.dedup.Dedup.TwinOffset)) ===
          col("query_id")).cast("long"))
    j.groupBy(col("query_id"))
      .agg(min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"),
        sum(col("rel")).as("n_rel_at_k"),
        count(lit(1)).as("n_ranked"))
      .select(col("query_id"), col("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank").cast("double"),
          lit(0.0)).as("rr"),
        col("n_rel_at_k"), col("n_ranked"),
        (col("n_rel_at_k").cast("double") /
          col("n_ranked").cast("double")).as("p_at_k"))
  }

  def retrievalMetricsSql(numQueries: Int = Bm25Queries,
      k: Int = Bm25TopK): String = s"""
    WITH ranked AS (${bm25TopKRetrievalSql(numQueries, k,
      s"(${graft.dedup.Dedup.withNearDupsSql("documents")})")}),
    j AS (
      SELECT query_id, rank,
        (doc_id % ${graft.dedup.Dedup.TwinOffset} = query_id)::BIGINT
          AS rel
      FROM ranked)
    SELECT query_id,
      min(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank,
      coalesce(1.0::DOUBLE
        / min(CASE WHEN rel = 1 THEN rank END)::DOUBLE, 0.0::DOUBLE) AS rr,
      coalesce(sum(rel), 0)::BIGINT AS n_rel_at_k,
      count(*)::BIGINT AS n_ranked,
      coalesce(sum(rel), 0)::DOUBLE / count(*)::DOUBLE AS p_at_k
    FROM j GROUP BY 1"""

  // ---- MIX3 (E130): data-constrained epoch allocation ----------------------

  /** Repeat cap (epochs) per source — the data-constrained-scaling
    * finding that repeating past ~4 epochs stops buying quality. */
  val MaxEpochs = 4L

  /** Token budget as a ratio of the corpus: 3/2 (kept integer-exact via
    * DIV — Spark's `/` on longs is true division) — large enough that
    * good sources repeat, small enough that the tail gets cut, so every
    * allocation regime is exercised. */

  /** E130 (MIX3): data-constrained EPOCH allocation — given a token
    * budget, how many times does each source repeat? The
    * data-constrained-scaling recipe: sources fill the budget in
    * quality order (t12's frequency-weighted mean, the card1 column),
    * each capped at [[MaxEpochs]] repeats of its own tokens; when the
    * budget runs out mid-source that source gets the remainder and
    * everything after gets zero. Greedy-with-caps collapses to a PREFIX
    * SUM (allocated = min(want, max(0, B − Σ want before)) — earlier
    * sources always take their full want until exhaustion), so the
    * whole allocation is one window pass over the |sources|-row frame
    * in EXACT LONG arithmetic; `epochs` is the only double (ratio of
    * exact longs). One t12 scan + a source aggregate feed it. */
  def epochAllocation(docs: DataFrame): DataFrame = {
    val src = classifierScore(docs, Seq("source"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tokens"),
        sum(col("margin")).as("sum_margin"))
      .select(col("source"), col("tokens"),
        (col("sum_margin").cast("double") /
          greatest(col("tokens"), lit(1L)).cast("double"))
          .as("mean_quality"))
    allocate(src).select(col("source"), col("rank"), col("tokens"),
      col("mean_quality"), col("want"), col("allocated"), col("epochs"))
  }

  /** The prefix-sum allocation core mix3 and mix4 share (ONE definition
    * — the rep1 composition rule): input is a per-source stats frame
    * with (`source`, `tokens`, `mean_quality`); appends rank / want /
    * allocated / epochs via the exact-long greedy-with-caps collapse
    * documented on [[epochAllocation]]. Passthrough columns survive. */
  private def allocate(src: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byQuality = W.orderBy(col("mean_quality").desc, col("source").asc)
    src
      .withColumn("rank", row_number().over(byQuality).cast("long"))
      .withColumn("want", col("tokens") * MaxEpochs)
      .withColumn("total3",
        sum(col("tokens")).over(W.partitionBy()) * lit(3L))
      .withColumn("budget", expr("(total3 - pmod(total3, 2)) DIV 2"))
      .withColumn("prefix_want", coalesce(
        sum(col("want")).over(byQuality
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("allocated", least(col("want"),
        greatest(col("budget") - col("prefix_want"), lit(0L))))
      .withColumn("epochs", col("allocated").cast("double") /
        greatest(col("tokens"), lit(1L)).cast("double"))
  }

  /** MIX4 (E158): DEDUP-AWARE epoch allocation — "repeat unique data,
    * not duplicates" (the data-constrained-scaling refinement of mix3):
    * a source's claim on the token budget is its UNIQUE mass — each
    * near-dup cluster counted once, through its quality-elected
    * survivor — not its raw volume, so a source that is 80% boilerplate
    * copies can't buy 80% more epochs with them. Composes two existing
    * tiers by their single definitions: the deduped corpus is EXACTLY
    * d16's survivor relation ([[graft.dedup.Dedup.dedupSurvivors]] over
    * the twin-planted corpus — quality-elected per d9 cluster,
    * singletons pass), and the allocation is mix3's [[allocate]] core
    * over the survivor-grain stats; `raw_tokens` reports the undeduped
    * mass so the dup discount is visible per source.
    *
    * Scale shape: the corpus never shuffles whole (d16's split-election
    * property); the two stats passes are narrow codegen scans; the
    * allocation is a |sources|-row window. Dup mass being source-LOCAL
    * here (the twins plant same-source) doesn't narrow the operator:
    * keeper attribution is by the SURVIVOR's source, so cross-source
    * duplicates shift mass exactly as they should. */
  def uniqueEpochAllocation(docs: DataFrame): DataFrame = {
    val corpus = withSourcedTwins(docs)
    uniqueEpochAllocationFromLabels(corpus,
      graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.minhashLshPairs(corpus)
          .select(col("doc_a"), col("doc_b"))))
  }

  /** The label-parameterized form (the [[graft.dedup.Dedup
    * .dedupSurvivorsFromLabels]] convention, round-10 verdict item):
    * a curation run that already ran the pair+CC stage feeds its
    * `(doc_id, cluster_id)` relation here AND to d16/s4, paying the d3
    * pair graph and the d9 CC loop ONCE for all three cluster-grain
    * consumers (the shared-labels measurement in BASELINE.md quantifies
    * the saving). `corpus` is the already-prepared (twinned) relation —
    * the same frame the labels were derived from. Hash-identical to
    * [[uniqueEpochAllocation]] when fed its own self-derived labels
    * (spec-pinned, ExperimentAuditSpec). */
  def uniqueEpochAllocationFromLabels(corpus: DataFrame,
      labels: DataFrame): DataFrame = {
    val survivors = graft.dedup.Dedup
      .dedupSurvivorsFromLabels(corpus, labels)
      .select(col("doc_id"))
    val unique = corpus.join(survivors, Seq("doc_id"), "left_semi")
    val raw = corpus
      .select(col("source"), size(toksCol).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("raw_tokens"))
    val uniq = classifierScore(unique, Seq("source"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tokens"),
        sum(col("margin")).as("sum_margin"))
      .select(col("source"), col("tokens"),
        (col("sum_margin").cast("double") /
          greatest(col("tokens"), lit(1L)).cast("double"))
          .as("mean_quality"))
    // a source may be ENTIRELY duplicates of other sources' docs (zero
    // survivors — no uniq row): it still appears, wants nothing, gets
    // nothing; quality pins to 0.0 for a deterministic rank
    val src = raw.join(uniq, Seq("source"), "left")
      .select(col("source"), col("raw_tokens"),
        coalesce(col("tokens"), lit(0L)).as("tokens"),
        coalesce(col("mean_quality"), lit(0.0)).as("mean_quality"))
    allocate(src).select(col("source"), col("rank"), col("raw_tokens"),
      col("tokens"), col("mean_quality"), col("want"), col("allocated"),
      col("epochs"))
  }

  /** mix4 oracle: the d16 survivor pipeline (recursive-CTE CC + the
    * identical election) over the twinned corpus, then mix3's inline
    * margin/allocation arithmetic over survivor-grain stats. */
  def uniqueEpochAllocationSql: String = {
    val wlit = ClfWeights.mkString("[", ", ", "]")
    val korpus = withSourcedTwinsSql("documents")
    s"""
    WITH korpus AS ($korpus),
    survivors AS (
      SELECT doc_id FROM (${graft.dedup.Dedup.dedupSurvivorsSql(korpus)})),
    raw AS (
      SELECT source,
        sum(len(${tokensSql(normSql("text"))}))::BIGINT AS raw_tokens
      FROM korpus GROUP BY 1),
    ud AS (
      SELECT k.source, ${tokenHashesSql(tokensSql(normSql("k.text")))} AS th
      FROM korpus k JOIN survivors s USING (doc_id)),
    um AS (
      SELECT source, len(th)::BIGINT AS n_tokens,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(th, h -> w.wts[(h % $ClfBuckets)::INT + 1])),
          (a, x) -> a + x) AS margin
      FROM ud, (SELECT $wlit::BIGINT[] AS wts) w),
    uniq AS (
      SELECT source, sum(n_tokens)::BIGINT AS tokens,
        CAST(sum(margin) AS DOUBLE)
          / greatest(sum(n_tokens)::BIGINT, 1) AS mean_quality
      FROM um GROUP BY 1),
    src AS (
      SELECT r.source, r.raw_tokens,
        coalesce(u.tokens, 0)::BIGINT AS tokens,
        coalesce(u.mean_quality, 0.0::DOUBLE) AS mean_quality
      FROM raw r LEFT JOIN uniq u USING (source)),
    ranked AS (
      SELECT source, raw_tokens, tokens, mean_quality,
        row_number() OVER (ORDER BY mean_quality DESC, source ASC)::BIGINT
          AS rank,
        tokens * $MaxEpochs AS want,
        (sum(tokens) OVER () * 3) // 2 AS budget,
        coalesce(sum(tokens * $MaxEpochs) OVER (
          ORDER BY mean_quality DESC, source ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS prefix_want
      FROM src)
    SELECT source, rank, raw_tokens, tokens, mean_quality, want,
      least(want, greatest(budget - prefix_want, 0))::BIGINT AS allocated,
      least(want, greatest(budget - prefix_want, 0))::DOUBLE
        / greatest(tokens, 1)::DOUBLE AS epochs
    FROM ranked"""
  }

  def epochAllocationSql: String = {
    val wlit = ClfWeights.mkString("[", ", ", "]")
    s"""
    WITH t AS (
      SELECT doc_id, source,
        ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    m AS (
      SELECT doc_id, source, len(th)::BIGINT AS n_tokens,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(th, h -> w.wts[(h % $ClfBuckets)::INT + 1])),
          (a, x) -> a + x) AS margin
      FROM t, (SELECT $wlit::BIGINT[] AS wts) w),
    src AS (
      SELECT source, sum(n_tokens)::BIGINT AS tokens,
        CAST(sum(margin) AS DOUBLE)
          / greatest(sum(n_tokens)::BIGINT, 1) AS mean_quality
      FROM m GROUP BY 1),
    ranked AS (
      SELECT source, tokens, mean_quality,
        row_number() OVER (ORDER BY mean_quality DESC, source ASC)::BIGINT
          AS rank,
        tokens * $MaxEpochs AS want,
        (sum(tokens) OVER () * 3) // 2 AS budget,
        coalesce(sum(tokens * $MaxEpochs) OVER (
          ORDER BY mean_quality DESC, source ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS prefix_want
      FROM src)
    SELECT source, rank, tokens, mean_quality, want,
      least(want, greatest(budget - prefix_want, 0))::BIGINT AS allocated,
      least(want, greatest(budget - prefix_want, 0))::DOUBLE
        / greatest(tokens, 1)::DOUBLE AS epochs
    FROM ranked"""
  }

  // ---- CARD1 (E127): per-source data card ----------------------------------

  /** E127 (CARD1): the per-source DATA CARD — the datasheet a curation
    * run publishes alongside the corpus (the "dataset card" convention):
    * one row per source with volume (docs, tokens), quality
    * (frequency-weighted mean t12 classifier score — Σ margin / Σ tokens,
    * the lm1 ratio-of-exact-sums discipline), language composition (t4's
    * langId mode with share, deterministic tie-break), and the exact-dup
    * rate (docs whose d1 fingerprint repeats ANYWHERE in the corpus —
    * the corpus-wide count rides a window over the fingerprint-grain
    * aggregate, no self-join). Every column reuses its operator's single
    * definition (the rep1 composition rule), so each number stays
    * hash-identical to its standalone query.
    *
    * Cost: two scan-shaped passes (classifier fold, lang markers), one
    * fingerprint-grain aggregate + window, then |sources|-row joins —
    * nothing shuffles wider than d1 already does. A fused single-scan
    * variant (quality + language in one select, aggregated at
    * (source, predicted_lang) grain) was MEASURED SLOWER at ×100 (9.2 s
    * vs 7.5, +2 jobs): the combined projection re-evaluates the
    * tokenizer per consuming expression and the barrier it needs costs
    * more than the second columnar scan saves — the split form keeps
    * each pass inside one codegen stage. */
  def dataCard(docs: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val q = classifierScore(docs, Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_words"),
        sum(col("margin")).as("sum_margin"))
    val lt = langId(docs, Seq("source"))
      .groupBy(col("source"), col("predicted_lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(W.partitionBy(col("source"))
        .orderBy(col("c").desc, col("predicted_lang").asc)))
      .filter(col("r") === 1)
    val fg = docs.select(col("source"), docFp(col("text")).as("fp"))
      .groupBy(col("fp"), col("source")).agg(count(lit(1)).as("n"))
    val du = fg
      .withColumn("tot", sum(col("n")).over(W.partitionBy(col("fp"))))
      .filter(col("tot") >= 2)
      .groupBy(col("source")).agg(sum(col("n")).as("n_dup"))
    q.join(lt.select(col("source"), col("predicted_lang").as("top_lang"),
        col("c")), Seq("source"))
      .join(du, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_words"),
        (col("sum_margin").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"))
          .as("mean_quality"),
        col("top_lang"),
        (col("c").cast("double") / col("n_docs").cast("double"))
          .as("top_lang_share"),
        (coalesce(col("n_dup"), lit(0L)).cast("double") /
          col("n_docs").cast("double")).as("dup_rate"))
  }

  def dataCardSql: String = {
    val wlit = ClfWeights.mkString("[", ", ", "]")
    val scoreCols = LangMarkers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toksT, t -> t IN ($list)))::BIGINT AS score_$lang"
    }.mkString(",\n        ")
    val best = LangMarkers.map(m => s"score_${m._1}")
      .mkString("greatest(", ", ", ")")
    val pick = LangMarkers.map { case (lang, _) =>
      s"WHEN score_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString("\n          ")
    s"""
    WITH t AS (
      SELECT doc_id, source,
        ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    m AS (
      SELECT doc_id, source, len(th)::BIGINT AS n_tokens,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(th, h -> w.wts[(h % $ClfBuckets)::INT + 1])),
          (a, x) -> a + x) AS margin
      FROM t, (SELECT $wlit::BIGINT[] AS wts) w),
    q AS (
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(n_tokens)::BIGINT AS n_words,
        sum(margin)::BIGINT AS sum_margin
      FROM m GROUP BY 1),
    ls AS (
      SELECT source,
        $scoreCols
      FROM documents),
    lp AS (
      SELECT source, CASE $pick ELSE 'und' END AS predicted_lang FROM ls),
    lc AS (
      SELECT source, predicted_lang, count(*)::BIGINT AS c
      FROM lp GROUP BY 1, 2),
    lt AS (
      SELECT source, predicted_lang, c,
        row_number() OVER (PARTITION BY source
          ORDER BY c DESC, predicted_lang ASC) AS r
      FROM lc),
    fg AS (
      SELECT ${docFpSql("text")} AS fp, source, count(*)::BIGINT AS n
      FROM documents GROUP BY 1, 2),
    du AS (
      SELECT source, sum(n)::BIGINT AS n_dup
      FROM (SELECT *, sum(n) OVER (PARTITION BY fp) AS tot FROM fg)
      WHERE tot >= 2 GROUP BY 1)
    SELECT q.source, q.n_docs, q.n_words,
      CAST(q.sum_margin AS DOUBLE) / greatest(q.n_words, 1) AS mean_quality,
      lt.predicted_lang AS top_lang,
      lt.c::DOUBLE / q.n_docs::DOUBLE AS top_lang_share,
      coalesce(du.n_dup, 0)::DOUBLE / q.n_docs::DOUBLE AS dup_rate
    FROM q
    JOIN lt ON lt.source = q.source AND lt.r = 1
    LEFT JOIN du ON du.source = q.source"""
  }

  // ---- IMP1 (E107): DSIR-style targeted data selection --------------------

  /** Hashed-bigram feature space (the DSIR paper's hashed n-gram model). */
  val DsirBuckets = 1024L
  val DsirTargetSources = Seq("src0", "src1")
  val DsirTopK = 50

  /** IMP1 (E107): targeted data selection, the DSIR shape (Xie et al.
    * 2023: importance resampling on hashed n-gram features) — given a
    * small TARGET corpus (the distribution you want more of) and the raw
    * pool, score every raw document by how target-like its content is
    * and keep the top-k. Features are hashed bigrams (the native
    * [[spanHashesFromTh]] Horner kernel, mod [[DsirBuckets]] — the
    * hashing trick, no vocabulary to ship).
    *
    * Where DSIR computes a log-likelihood ratio (a float fold whose order
    * would become part of the answer), the score here is the
    * integer-exact lm1 discipline: `affinity = Σ ct(b) / Σ (ct(b)+cr(b))`
    * over the doc's bigram occurrences — the frequency-weighted posterior
    * that a random corpus-wide occurrence of this doc's content came
    * from the target corpus. A RATIO OF TWO EXACT LONG SUMS: associative,
    * order-free, bitwise identical on both engines, same
    * "target-content-mass" ordering force as the likelihood ratio.
    *
    * Scale: one narrow pass builds the bigram stream; the count table is
    * [[DsirBuckets]]-bounded state (mergeable across batches — the
    * t11/t14 statistics shape) with NO broadcast hint (AQE converts the
    * join-back when small, the lm1 convention); the top-k is a bounded
    * rank over per-doc scores. */
  def dsirSelect(docs: DataFrame,
      targetSources: Seq[String] = DsirTargetSources,
      k: Int = DsirTopK): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
      tokenHashes(toksCol).as("th"))
    // ONE corpus tokenize+hash pass: both consumers (the bucket counts
    // and the raw-side scoring join) read the persisted bigram stream —
    // the t15 postings convention, released by the runner's cache clear
    val bg = tok.select(col("doc_id"), col("source"),
      explode(spanHashesFromTh(col("th"), 2)).as("h2"))
      .select(col("doc_id"), col("source"),
        pmod(col("h2"), lit(DsirBuckets)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isT = col("source").isin(targetSources: _*)
    val counts = bg.groupBy(col("b")).agg(
      sum(when(isT, lit(1L)).otherwise(lit(0L))).as("ct"),
      sum(when(isT, lit(0L)).otherwise(lit(1L))).as("cr"))
    val scored = bg.filter(!isT)
      .join(counts, Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("ct")).as("target_mass"),
        sum(col("ct") + col("cr")).as("total_mass"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        (col("target_mass").cast("double") /
          col("total_mass").cast("double")).as("affinity"))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("affinity").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("source"), col("n_bigrams"), col("affinity"))
  }

  def dsirSelectSql(targetSources: Seq[String] = DsirTargetSources,
      k: Int = DsirTopK): String = {
    val tlist = targetSources.map(s => s"'$s'").mkString(", ")
    s"""
    WITH t AS (
      SELECT doc_id, source,
        ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM documents),
    bg AS (
      SELECT doc_id, source,
        unnest(${spanHashesFromThSql("th", 2)}) % $DsirBuckets AS b
      FROM t),
    counts AS (
      SELECT b,
        sum(CASE WHEN source IN ($tlist) THEN 1 ELSE 0 END)::BIGINT AS ct,
        sum(CASE WHEN source IN ($tlist) THEN 0 ELSE 1 END)::BIGINT AS cr
      FROM bg GROUP BY 1),
    scored AS (
      SELECT doc_id, source, count(*)::BIGINT AS n_bigrams,
        sum(ct)::BIGINT AS target_mass,
        sum(ct + cr)::BIGINT AS total_mass
      FROM bg JOIN counts USING (b)
      WHERE source NOT IN ($tlist)
      GROUP BY 1, 2),
    ranked AS (
      SELECT doc_id, source, n_bigrams,
        target_mass::DOUBLE / total_mass::DOUBLE AS affinity,
        row_number() OVER (
          ORDER BY target_mass::DOUBLE / total_mass::DOUBLE DESC,
            doc_id ASC) AS rank
      FROM scored)
    SELECT rank::BIGINT AS rank, doc_id, source, n_bigrams, affinity
    FROM ranked WHERE rank <= $k"""
  }

  // ---- RRF1 (E106): hybrid sparse+dense retrieval fusion ------------------

  /** Standard RRF damping constant (Cormack et al.'s 60). */
  val RrfC = 60L
  val RrfInnerK = 10

  /** RRF1 (E106): hybrid retrieval — Reciprocal Rank Fusion of the
    * BM25 (sparse, [[bm25TopKRetrieval]]) and dense-cosine
    * ([[graft.sim.Similarity.bruteForceTopK]]) rankings over the shared
    * document id space: `rrf(d) = Σ_systems 1/(C + rank_s(d))`, the
    * fusion every production RAG/search stack runs because rank-space
    * combination needs no score calibration between systems.
    *
    * Determinism: each term is one exact double division; a document
    * ranked by only one system contributes that single term (FULL OUTER
    * join + coalesce-to-0 — never a NULL-poisoned sum); the two-term add
    * is a single IEEE rounding identical on both engines. Ranks, not
    * scores, cross the system boundary — the reason this needs no
    * cross-engine score normalization at all.
    *
    * Scale: both inputs are already top-k-bounded per query (k·Q rows
    * each), so the fusion join, scoring, and final rank are
    * driver-trivial at ANY corpus size — the expensive parts are the
    * upstream retrievals, each already scoped by its own scale ladder
    * (inverted index / ANN tiers). */
  def hybridRrf(docs: DataFrame, emb: DataFrame,
      numQueries: Int = Bm25Queries, innerK: Int = RrfInnerK,
      k: Int = Bm25TopK): DataFrame = {
    val bm = bm25TopKRetrieval(docs, numQueries, innerK)
      .select(col("query_id"), col("doc_id"),
        col("rank").as("bm25_rank"))
    val dn = graft.sim.Similarity.bruteForceTopK(emb, numQueries, innerK)
      .select(col("query_id").as("d_query_id"),
        col("neighbor_id").as("d_doc_id"), col("rank").as("dense_rank"))
    val fused = bm.join(dn,
        col("query_id") === col("d_query_id") &&
          col("doc_id") === col("d_doc_id"), "full_outer")
      .select(
        coalesce(col("query_id"), col("d_query_id")).as("query_id"),
        coalesce(col("doc_id"), col("d_doc_id")).as("doc_id"),
        col("bm25_rank"), col("dense_rank"),
        (coalesce(lit(1.0) / (lit(RrfC) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + col("dense_rank")), lit(0.0)))
          .as("rrf"))
    fused.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("bm25_rank"), col("dense_rank"), col("rrf"))
  }

  def hybridRrfSql(numQueries: Int = Bm25Queries,
      innerK: Int = RrfInnerK, k: Int = Bm25TopK): String = s"""
    WITH bm AS (
      SELECT query_id, doc_id, rank AS bm25_rank
      FROM (${bm25TopKRetrievalSql(numQueries, innerK)})),
    dn AS (
      SELECT query_id AS d_query_id, neighbor_id AS d_doc_id,
        rank AS dense_rank
      FROM (${graft.sim.Similarity.bruteForceTopKSql(numQueries, innerK)})),
    fused AS (
      SELECT coalesce(bm.query_id, dn.d_query_id) AS query_id,
        coalesce(bm.doc_id, dn.d_doc_id) AS doc_id,
        bm.bm25_rank, dn.dense_rank,
        coalesce(1.0::DOUBLE / ($RrfC + bm.bm25_rank), 0.0::DOUBLE) +
          coalesce(1.0::DOUBLE / ($RrfC + dn.dense_rank), 0.0::DOUBLE)
          AS rrf
      FROM bm FULL OUTER JOIN dn
        ON bm.query_id = dn.d_query_id AND bm.doc_id = dn.d_doc_id),
    ranked AS (
      SELECT query_id, doc_id, bm25_rank, dense_rank, rrf,
        row_number() OVER (PARTITION BY query_id
          ORDER BY rrf DESC, doc_id ASC) AS rank
      FROM fused)
    SELECT query_id, rank::BIGINT AS rank, doc_id, bm25_rank, dense_rank,
      rrf
    FROM ranked WHERE rank <= $k"""

  /** SEL1 (E94) token budget for the driver query — sized so the cut
    * lands strictly inside the corpus at every SF (the sf0.01 corpus
    * carries ~15k whitespace tokens): the selection must be a real
    * prefix, not all-docs or nothing. */
  val SelBudget = 5000L

  /** SEL1 (E94): budget-constrained quality selection — the data-curation
    * cut that closes the classifier loop: rank the corpus by t12's
    * quality score and keep the best documents until a GLOBAL TOKEN
    * BUDGET is spent (the published "train on the top-X tokens by
    * classifier" recipe). Selection is deterministic end to end: score
    * ties break on doc_id, the cumulative token count is an exact integer
    * prefix sum, and a doc is kept iff its running total fits the budget.
    *
    * The single-partition ordered prefix sum is the VERIFIABLE BASELINE
    * (the x5/t13 convention — exact global order, honest cost). The
    * 100-TB swap is the t13x path: approx_percentile on the score finds
    * the budget's cutoff threshold (one mergeable narrow pass, no global
    * sort), then a narrow `score >= τ` filter selects — join-free,
    * sort-free, off by at most the sketch's rank error around the
    * boundary. */
  def budgetSelect(docs: DataFrame, budget: Long = SelBudget): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Long.MinValue, 0)
    classifierScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("score"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  def budgetSelectSql(budget: Long = SelBudget): String = s"""
    WITH scored AS (${classifierScoreSql})
    SELECT doc_id, n_tokens, score, cum_tokens FROM (
      SELECT doc_id, n_tokens, score,
        sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
          AS cum_tokens
      FROM scored)
    WHERE cum_tokens <= $budget"""

  /** T14 (E86) count-min sketch geometry: 3 hash rows × 256 buckets.
    * The multipliers are the public Knuth/xxHash/FNV-family odd constants;
    * every bucket index is exact integer arithmetic below 2^63
    * (h < P ≈ 1e9, A < 3.3e9 ⇒ h·A + B < 4e18), so both engines build the
    * IDENTICAL sketch and the estimates compare exactly — no probabilistic
    * bound needed in the gate. */
  val CmsRows = 3
  val CmsWidth = 256L
  val CmsA = Seq(2654435761L, 2246822519L, 3266489917L)
  val CmsB = Seq(374761393L, 668265263L, 2147483647L)

  private def cmsBucket(h: Column, r: Int): Column =
    pmod(pmod(h * lit(CmsA(r)) + lit(CmsB(r)), lit(HashP)), lit(CmsWidth))

  /** T14 (E86): heavy hitters via COUNT-MIN sketch, checked against exact
    * counts — the frequency-estimation member of the sketch family (HLL
    * a2x, KLL x5x, bloom-filter join pruning): est(t) = min over rows of
    * cell(r, h_r(t)), never an underestimate, overestimate bounded by
    * bucket collisions. The sketch is the 100-TB path for "what are the
    * hot tokens / keys / URLs" when the key space is unbounded: FIXED
    * 3×256 integer state, mergeable across partitions/batches (cells are
    * counts — they add), one narrow pass to build. The exact side (t6's
    * vocabulary-width aggregate) exists here to make the estimates
    * hash-verifiable: both engines build the identical deterministic
    * sketch, so `n_est` compares exactly, and `overestimate` SHOWS the
    * collision cost instead of hiding it behind a probability bound. */
  private def cmsRowBuckets(h: Column): Column =
    explode(array((0 until CmsRows).map(r =>
      struct(lit(r).as("r"), cmsBucket(h, r).as("bucket"))): _*))

  /** The count-min cell table as a standalone build: (r, bucket, cell_n)
    * from a corpus batch. Mergeable by construction — cells are COUNTS,
    * so per-batch tables union + re-sum to exactly the one-shot table
    * (CorpusOpsSpec pins it), the additive twin of the bloom word
    * table's bit_or fold: the streaming/incremental heavy-hitters store
    * never rescans history. */
  def cmsCells(docs: DataFrame): DataFrame =
    docs.select(explode(toksCol).as("token"))
      .select(charHash(col("token")).as("h"))
      .select(cmsRowBuckets(col("h")).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell_n"))

  /** Merge per-batch count-min cell tables (counts add). */
  def cmsMerge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cell_n")).as("cell_n"))

  /** EAGER (the Kpi.computeKpis lifecycle, round-9 verdict): both
    * consumers of the shared token-grain base are BOUNDED (the cell
    * table is ≤ CmsRows×CmsWidth rows, the top list k rows), so they
    * are materialized off the cache at call time and the corpus-scale
    * persist is released before this returns — no caller contract, no
    * leaked cached relation on a long-lived driver. Cluster caveat as
    * in computeKpis: localCheckpoint blocks live only on executors, so
    * an executor loss after this call makes the frames unrecoverable;
    * acceptable for bounded reporting frames a caller can re-run. */
  def heavyHitters(docs: DataFrame, k: Int = 20): DataFrame = {
    // ONE corpus pass (the T14 docstring's claim, kept true): the
    // token-grain (token, h, n_exact) aggregate is the shared base for
    // BOTH consumers — the cell table re-derives from it by summing
    // occurrence counts per (r, bucket), which reproduces [[cmsCells]]'
    // occurrence-grain counts exactly because h is functionally
    // determined by token. Persisted so the second consumer's
    // materialization reads the cache instead of re-running the scan;
    // the first eager checkpoint below is what fills it.
    val counts = docs.select(explode(toksCol).as("token"))
      .select(col("token"), charHash(col("token")).as("h"))
      .groupBy(col("token"), col("h"))
      .agg(count(lit(1)).as("n_exact"))
      .persist()
    def rbs(h: Column) = cmsRowBuckets(h)
    try {
      val cells = counts
        .select(col("n_exact"), cmsRowBuckets(col("h")).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
        .agg(sum(col("n_exact")).as("cell_n"))
        .localCheckpoint(true)
      val top = counts.select(col("token"), col("n_exact"), col("h"))
        .orderBy(col("n_exact").desc, col("token").asc).limit(k)
        .localCheckpoint(true)
      top.select(col("token"), col("n_exact"), rbs(col("h")).as("rb"))
        .select(col("token"), col("n_exact"),
          col("rb.r").as("r"), col("rb.bucket").as("bucket"))
        .join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("token"), col("n_exact"))
        .agg(min(col("cell_n")).as("n_est"))
        .select(col("token"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overestimate"))
    } finally { counts.unpersist(); () }
  }

  def heavyHittersSql(k: Int = 20): String = {
    val aLit = CmsA.mkString("[", ", ", "]")
    val bLit = CmsB.mkString("[", ", ", "]")
    val bucket = s"((tk.h * cst.ca[t.r + 1] + cst.cb[t.r + 1]) % $HashP) % $CmsWidth"
    val bucketTop = s"((top.h * cst.ca[t.r + 1] + cst.cb[t.r + 1]) % $HashP) % $CmsWidth"
    s"""
    WITH cst AS (SELECT $aLit::BIGINT[] AS ca, $bLit::BIGINT[] AS cb),
    tok AS (
      SELECT unnest(${tokensSql(normSql("text"))}) AS token FROM documents),
    tk AS (SELECT token, ${charHashSql("token")} AS h FROM tok),
    rs AS (SELECT unnest([0, 1, 2]) AS r),
    cells AS (
      SELECT t.r, $bucket AS bucket, count(*)::BIGINT AS cell_n
      FROM tk, rs t, cst GROUP BY 1, 2),
    top AS (
      SELECT token, n_exact, h FROM (
        SELECT token, count(*)::BIGINT AS n_exact, min(h) AS h,
          row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
        FROM tk GROUP BY token)
      WHERE rn <= $k),
    probes AS (
      SELECT top.token, top.n_exact, t.r, $bucketTop AS bucket
      FROM top, rs t, cst)
    SELECT p.token, p.n_exact, min(c.cell_n) AS n_est,
      min(c.cell_n) - p.n_exact AS overestimate
    FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
    GROUP BY 1, 2"""
  }

  /** B1 (E92) bloom-filter geometry: 3 hash rows into 2048 bits stored as
    * 64 words × 32 bits. Same public hash family as the count-min sketch
    * ([[CmsA]]/[[CmsB]] over the rolling fingerprint, all arithmetic
    * < 2^63), masks come from a literal 32-entry power-of-two table so
    * neither engine evaluates a variable shift — both build the IDENTICAL
    * filter and the probe results hash-compare exactly. 32-bit words keep
    * every mask ≤ 2^31: no sign-bit cases in either engine's BIGINT. */
  val BloomBits = 2048L
  val BloomWordBits = 32L
  private val BloomMasks: Seq[Long] = (0 until BloomWordBits.toInt).map(1L << _)

  private def bloomPos(fp: Column, r: Int): Column =
    pmod(pmod(fp * lit(CmsA(r)) + lit(CmsB(r)), lit(HashP)), lit(BloomBits))

  /** B1 (E92): bloom-filter membership pruning — the set-MEMBERSHIP member
    * of the sketch family (HLL a2x = cardinality, KLL x5x/t13x = rank,
    * count-min t14 = frequency): summarize a block list (here the c1 eval
    * fingerprints; in production a benchmark registry or an opt-out list)
    * into a FIXED 64-long bit array and answer "definitely not in the
    * set / maybe in the set" per corpus doc without ever joining the
    * corpus against the list. Guarantees by construction: NO false
    * negatives (every exact hit is bloom-maybe — visible in the output),
    * false positives bounded by load factor (3 rows × |eval| bits set in
    * 2048). The 100-TB role is JOIN PRUNING, the hand-rolled analog of
    * Spark's own runtime bloom filters
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): a corpus-sized
    * scan checks a broadcast ≤64-row word table with narrow integer
    * arithmetic and only the maybe-sliver pays the exact (shuffling)
    * membership join. The word table is bit_or-mergeable across
    * partitions AND batches — the incremental form needs no rescan, the
    * k1/t11 accumulation convention. */
  private def bloomMask(pos: Column): Column =
    element_at(typedlit(BloomMasks),
      pmod(pos, lit(BloomWordBits)).cast("int") + 1)

  // word index = pos DIV 32 — as a shift (32 = 2^5) so it stays in
  // integer arithmetic in one codegen'd expression
  private def bloomWord(pos: Column): Column = shiftright(pos, 5)

  private def bloomPositions(df: DataFrame): DataFrame =
    df.select(df.columns.map(col) :+
      explode(array((0 until CmsRows).map(r => bloomPos(col("fp"), r)): _*))
        .as("pos"): _*)

  /** The bloom word table as a standalone build: (word, bits) rows from a
    * set of member fingerprints. Mergeable by construction — `bit_or` is
    * associative/commutative/idempotent, so per-batch tables union +
    * re-aggregate to exactly the one-shot table (CorpusOpsSpec pins it);
    * the incremental block-list store never rescans history. */
  def bloomWords(memberFps: DataFrame): DataFrame =
    bloomPositions(memberFps)
      .groupBy(bloomWord(col("pos")).as("word"))
      .agg(bit_or(bloomMask(col("pos"))).as("bits"))

  /** Merge per-batch word tables into one filter (the k1 hll_union_agg
    * analog for membership). */
  def bloomMerge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("word")).agg(bit_or(col("bits")).as("bits"))

  def bloomPrune(docs: DataFrame): DataFrame = {
    def mask(pos: Column) = bloomMask(pos)
    def word(pos: Column) = bloomWord(pos)
    def positions(df: DataFrame) = bloomPositions(df)
    val fps = docs.select(col("doc_id"),
      charHash(norm(col("text"))).as("fp"))
    val evalFps = fps.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("fp")).distinct()
    val words = bloomWords(evalFps)
    val probed = positions(fps)
      .join(broadcast(words), word(col("pos")) === words("word"), "left")
      .groupBy(col("doc_id"), col("fp"))
      .agg(bool_and((coalesce(col("bits"), lit(0L))
        .bitwiseAND(mask(col("pos")))) =!= 0).as("bloom_maybe"))
    probed
      .join(broadcast(evalFps.withColumn("hit", lit(true))), Seq("fp"), "left")
      .select(col("doc_id"), col("bloom_maybe"),
        coalesce(col("hit"), lit(false)).as("exact_hit"),
        (col("bloom_maybe") && !coalesce(col("hit"), lit(false)))
          .as("false_positive"))
  }

  def bloomPruneSql: String = {
    val aLit = CmsA.mkString("[", ", ", "]")
    val bLit = CmsB.mkString("[", ", ", "]")
    val mLit = BloomMasks.mkString("[", ", ", "]")
    def pos(fp: String) =
      s"(($fp * cst.ca[t.r + 1] + cst.cb[t.r + 1]) % $HashP) % $BloomBits"
    s"""
    WITH cst AS (SELECT $aLit::BIGINT[] AS ca, $bLit::BIGINT[] AS cb,
      $mLit::BIGINT[] AS mk),
    rs AS (SELECT unnest([0, 1, 2]) AS r),
    fps AS (
      SELECT doc_id, ${charHashSql(normSql("text"))} AS fp FROM documents),
    eval AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
    words AS (
      SELECT pos // $BloomWordBits AS word,
        bit_or(cst.mk[(pos % $BloomWordBits)::INT + 1]) AS bits
      FROM (SELECT ${pos("e.fp")} AS pos FROM eval e, rs t, cst), cst
      GROUP BY 1),
    probes AS (
      SELECT f.doc_id, f.fp, ${pos("f.fp")} AS pos FROM fps f, rs t, cst),
    hits AS (
      SELECT p.doc_id, p.fp,
        bool_and((coalesce(w.bits, 0) &
          cst.mk[(p.pos % $BloomWordBits)::INT + 1]) <> 0) AS bloom_maybe
      FROM probes p LEFT JOIN words w ON w.word = p.pos // $BloomWordBits,
        cst
      GROUP BY 1, 2)
    SELECT h.doc_id, h.bloom_maybe, e.fp IS NOT NULL AS exact_hit,
      h.bloom_maybe AND e.fp IS NULL AS false_positive
    FROM hits h LEFT JOIN eval e ON e.fp = h.fp"""
  }

  /** C2 (E62): n-gram-level decontamination — the stronger form of C1's
    * fingerprint check: a training doc is contaminated when it SHARES
    * WORD N-GRAMS with the eval set, not only when it is byte-identical
    * to an eval doc (the published LM-eval hygiene standard is 8–13-gram
    * overlap; 5 here because the synthetic docs are short). Same scale
    * shape as C1 one tier down: the eval side collapses to a DISTINCT
    * shingle set (eval sets are small by nature → broadcast), the corpus
    * explodes its distinct shingles ONCE (narrow), hits aggregate
    * doc-keyed then source-keyed — the corpus never shuffles on the
    * shingle key. Eval membership is the same deterministic doc_id % 97
    * convention as C1 so the oracle names the same rows — in production
    * the eval shingle set arrives as its own TINY table (the benchmark
    * suite), so the corpus is scanned once; deriving it from the corpus
    * here (an extra eval-filtered pass) is oracle scaffolding, not the
    * operator's scale shape. */
  /** The dedup family's twin-planting convention ([[graft.dedup.Dedup
    * .withNearDups]]) with `source` carried through — the synthetic
    * word-soup corpus contains no real eval overlap (the generator plants
    * no duplicates), so C2 plants perturbed twins the same way d2–d9 do:
    * a twin of an eval doc shares all interior 5-grams with it and MUST
    * be flagged. Same role as the PII planting for pii1. */
  def withSourcedTwins(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("text"))
      .unionByName(docs.select(
        (col("doc_id") + graft.dedup.Dedup.TwinOffset).as("doc_id"),
        col("source"),
        concat(col("text"), lit(" spark")).as("text")))

  def withSourcedTwinsSql(docs: String): String = s"""
    SELECT doc_id, source, text FROM $docs
    UNION ALL
    SELECT doc_id + ${graft.dedup.Dedup.TwinOffset} AS doc_id, source,
      text || ' spark' AS text FROM $docs"""

  def ngramContamination(docs: DataFrame, n: Int = 5): DataFrame = {
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val sh = docs.select(col("doc_id"), col("source"), isEval.as("is_eval"),
      explode(array_distinct(shingles(toksCol, n))).as("sh"))
    val evalSh = sh.filter(col("is_eval")).select(col("sh")).distinct()
    ngramContaminationAgainst(docs.filter(!isEval), evalSh, n)
  }

  /** The PRODUCTION form of C2: contamination of `docs` against an
    * external eval shingle table (one column `sh` of word n-grams — the
    * benchmark suite's own shingles, tiny by nature). One corpus scan:
    * explode distinct shingles (narrow), broadcast-join the eval set,
    * aggregate doc-keyed then source-keyed. The driver query derives
    * `evalShingles` from the corpus only so the DuckDB oracle can name
    * the same rows. */
  def ngramContaminationAgainst(docs: DataFrame, evalShingles: DataFrame,
      n: Int = 5): DataFrame = {
    val sh = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(shingles(toksCol, n))).as("sh"))
    // distinct defensively: a duplicate shingle row in the caller's eval
    // table would fan the join out and inflate n_overlap/max_overlap —
    // free on the tiny broadcast side, removes an unstated input invariant
    val perDoc = sh
      .join(broadcast(evalShingles.select(col("sh")).distinct()), Seq("sh"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_overlap"))
    val flagged = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"),
        max(col("n_overlap")).as("max_overlap"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("max_overlap"), lit(0L)).as("max_overlap"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          col("n_docs")).as("contamination_rate"))
  }

  /** C5 (E186): SPAN-level decontamination — the excision report the
    * doc-level ladder (c1 exact → c2 n-gram → c3 near-dup → c4
    * semantic) stops short of: c2 says WHICH train docs overlap the
    * eval set, this says WHERE — the maximal contiguous token spans of
    * each train doc whose [[graft.functions.TextFunctions
    * .spanHashesFromTh]] n-gram hashes appear among the eval docs'
    * grams. That is the span-grain decontamination a release report
    * actually publishes (quote the benchmark → cut the quote, keep the
    * doc): flag-the-doc wastes the 99 % of a long doc that is clean,
    * and token offsets are what the excision step needs.
    *
    * Plan: r2's positioned-hash machinery with c2's eval scoping in
    * place of the corpus-frequency flag — one narrow pass per side
    * builds positioned Horner hashes (8 bytes/position, no shingle
    * strings), the eval side collapses to a DISTINCT hash set and is
    * broadcast — an explicit SIZE ASSUMPTION, not a law: real benchmark
    * suites are tiny, but THIS repo's derived eval set (doc_id % 97)
    * grows with the corpus, so at broadcast-threshold scale the hint
    * must come off and the optimizer pick the join (the c2/c3 caveat;
    * ScaleSweep's c5 comment carries the same note), the train
    * stream equi-joins it, and flagged positions merge into maximal
    * spans by r2's per-doc island windows (positions p, p' merge when
    * p' − p ≤ n). Offsets are 1-based token indexes, end = last
    * flagged start + n − 1. Eval docs themselves are excluded from the
    * report (they are the benchmark, not the training corpus). */
  def contaminationSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    def positioned(d: DataFrame) = spreadSmallScan(d)
      .select(col("doc_id"), tokenHashes(toksCol).as("th"))
      .select(col("doc_id"),
        posexplode(spanHashesFromTh(col("th"), n)).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("h"))
    val evalH = positioned(docs.filter(isEval)).select(col("h")).distinct()
    val flagged = positioned(docs.filter(!isEval))
      .join(broadcast(evalH), Seq("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(w))
      .withColumn("news",
        when(col("gap").isNull || col("gap") > n, 1L).otherwise(0L))
      .withColumn("span_no", sum(col("news")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_no"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_grams"))
  }

  /** C5 oracle: the identical positioned-hash/island pipeline in
    * DuckDB (r2's oracle with the eval-set join in place of the
    * frequency flag). */
  def contaminationSpansSql(corpus: String, n: Int = 5): String = s"""
    WITH corpus2 AS ($corpus),
    th AS (
      SELECT doc_id, ${tokenHashesSql(tokensSql(normSql("text")))} AS th
      FROM corpus2),
    shl AS (
      SELECT doc_id, ${spanHashesFromThSql("th", n)} AS shl FROM th),
    shp AS (
      SELECT doc_id, unnest(range(1, len(shl) + 1)) AS pos, shl FROM shl),
    sh2 AS (
      SELECT doc_id, pos::BIGINT AS pos, shl[pos::INT] AS h FROM shp),
    evalh AS (SELECT DISTINCT h FROM sh2 WHERE doc_id % 97 = 0),
    flagged AS (
      SELECT s.doc_id, s.pos FROM sh2 s JOIN evalh e ON e.h = s.h
      WHERE s.doc_id % 97 <> 0),
    isl AS (
      SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER w IS NULL
          OR pos - lag(pos) OVER w > $n THEN 1 ELSE 0 END AS news
      FROM flagged WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    sp AS (
      SELECT doc_id, pos,
        sum(news) OVER (PARTITION BY doc_id ORDER BY pos) AS span_no
      FROM isl)
    SELECT doc_id, min(pos)::BIGINT AS span_start,
      (max(pos) + ${n - 1})::BIGINT AS span_end,
      count(*)::BIGINT AS n_grams
    FROM sp GROUP BY doc_id, span_no"""

  def ngramContaminationSql(corpus: String, n: Int = 5): String = s"""
    WITH corpus2 AS ($corpus),
    sh AS (
      SELECT doc_id, source, doc_id % 97 = 0 AS is_eval,
        unnest(list_distinct(${shinglesSql(tokensSql(normSql("text")), n)}))
          AS sh
      FROM corpus2),
    evalsh AS (SELECT DISTINCT sh FROM sh WHERE is_eval),
    perdoc AS (
      SELECT doc_id, source, count(*)::BIGINT AS n_overlap
      FROM sh WHERE NOT is_eval AND sh IN (SELECT sh FROM evalsh)
      GROUP BY 1, 2),
    flagged AS (
      SELECT source, count(*)::BIGINT AS n_contaminated,
        max(n_overlap) AS max_overlap
      FROM perdoc GROUP BY 1),
    totals AS (
      SELECT source, count(*)::BIGINT AS n_docs FROM corpus2
      WHERE doc_id % 97 <> 0 GROUP BY 1)
    SELECT t.source, t.n_docs,
      coalesce(f.n_contaminated, 0)::BIGINT AS n_contaminated,
      coalesce(f.max_overlap, 0)::BIGINT AS max_overlap,
      coalesce(f.n_contaminated, 0)::DOUBLE / t.n_docs
        AS contamination_rate
    FROM totals t LEFT JOIN flagged f ON f.source = t.source"""

  /** T10 (E63): per-doc tf-idf top terms — keyword extraction, the
    * per-document twin of T7's corpus join-back: tf from one (doc, token)
    * aggregate, df from a vocabulary-width re-aggregate of THAT result
    * (no second corpus pass), idf as the rational N/df (log() avoided for
    * cross-engine bitwise parity, same rationale as T7 — rank order is
    * identical since log is monotone), then a per-doc top-k. The ranking
    * shuffle is doc-keyed with doc-vocabulary-sized groups — at 100 TB
    * each group is a few hundred rows, so the per-group sort is trivial
    * and there is no global sort anywhere. Tie-break: token ASC, so ties
    * at equal (tf, df) rank identically in both engines. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spreadSmallScan: the tokenize+explode partial ran on the raw
    // corpus's single input split
    val tok = spreadSmallScan(docs)
      .select(col("doc_id"), explode(toksCol).as("token"))
    // tf feeds BOTH the df re-aggregate and the scored join — materialize
    // it once (disk-backed, the pipe1/d7 persist policy; released by the
    // caller's cache clear), or the scan→explode→aggregate subtree runs
    // twice over the corpus (measured 1.9× on the ×10 sweep corpus)
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    val scored = tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf").cast("double") *
          (col("n_corpus").cast("double") / col("df").cast("double")))
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("tfidf"))
  }

  def tfidfTopTermsSql(k: Int = 3): String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(${tokensSql(normSql("text"))}) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (
      SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*)::BIGINT AS n_corpus FROM documents),
    scored AS (
      SELECT doc_id, token, tf, df,
        tf::DOUBLE * (n_corpus::DOUBLE / df::DOUBLE) AS tfidf
      FROM tf JOIN dfreq USING (token), n),
    ranked AS (
      SELECT doc_id, token, tf, df, tfidf,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY tfidf DESC, token ASC) AS rank
      FROM scored)
    SELECT doc_id, rank::BIGINT AS rank, token, tf, df, tfidf
    FROM ranked WHERE rank <= $k"""

  /** MIX2 (E64): temperature-based mixture reweighting — the OTHER data-
    * mixing primitive beside MIX1's fixed weights: target source shares
    * ∝ n^τ (τ = 0.5 — sqrt is exactly rounded in IEEE, so the shares are
    * bitwise cross-engine; published multilingual/multi-source training
    * mixes use exactly this family to upweight small sources). The only
    * subtle part is the global normalizer Σ√n_s: a plain double SUM
    * aggregates in partition order and is NOT deterministic, so the
    * sources fold SEQUENTIALLY in source order over a sorted collected
    * list — the deterministic-global-reduce pattern (source count is
    * mixture-width, a few dozen rows; the corpus itself contributes one
    * count aggregate). Output is the per-source audit: raw share, tempered
    * share, and the up/down-sampling boost a mixing run would apply. */
  def temperatureMixAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    // the normalizers ride a whole-frame window over the source-grain
    // counts (mixture-width, a few dozen rows in one partition) instead
    // of a second aggregate branch — the corpus is scanned exactly ONCE;
    // Σ√n folds over the source-sorted collected list, not a plain SUM,
    // because double addition in partition order is not deterministic
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("total_docs", sum(col("n_docs")).over(w))
      .withColumn("z", aggregate(
        array_sort(collect_list(struct(col("source"), col("n_docs")))
          .over(w)),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_docs").cast("double"))))
      .select(col("source"), col("n_docs"),
        (col("n_docs").cast("double") / col("total_docs").cast("double"))
          .as("raw_share"),
        (sqrt(col("n_docs").cast("double")) / col("z")).as("temp_share"),
        ((sqrt(col("n_docs").cast("double")) / col("z")) /
          (col("n_docs").cast("double") / col("total_docs").cast("double")))
          .as("boost"))
  }

  def temperatureMixAuditSql(
      corpus: String = "SELECT * FROM documents"): String = s"""
    WITH corpus2 AS ($corpus),
    counts AS (
      SELECT source, count(*)::BIGINT AS n_docs FROM corpus2 GROUP BY 1),
    z AS (
      SELECT sum(n_docs)::BIGINT AS total_docs,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list(n_docs ORDER BY source),
            x -> sqrt(x::DOUBLE))),
          (acc, x) -> acc + x) AS z
      FROM counts)
    SELECT source, n_docs,
      n_docs::DOUBLE / total_docs::DOUBLE AS raw_share,
      sqrt(n_docs::DOUBLE) / z AS temp_share,
      (sqrt(n_docs::DOUBLE) / z)
        / (n_docs::DOUBLE / total_docs::DOUBLE) AS boost
    FROM counts, z"""

  /** SH1 (E65): deterministic output sharding audit — the writer tier's
    * balance check: every doc lands in a content-stable shard (first hex
    * digit of the t5/mix1/pk1 hash convention → 16 shards; rerun- and
    * retry-stable, so a re-executed write task produces the identical
    * shard file). The audit reports per-shard doc and token totals — what
    * a sharded-output job emits to prove its shards are balanced before
    * 16 downstream trainers each read one. The actual write is
    * [[graft.io.Sources.writeSharded]] (partitionBy on this key);
    * CorpusOpsSpec verifies layout, round-trip, and balance. */
  def shardAudit(docs: DataFrame): DataFrame =
    docs.select(shardOf(col("doc_id")).as("shard"), col("doc_id"),
        size(toksCol).cast("long").as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))

  /** The 16-way content-stable shard key — ONE definition shared by
    * [[shardAudit]], [[packSequences]] (pk1's shard), and
    * [[graft.io.Sources.writeSharded]], so the shared-key invariant
    * (pk1 sequences and sh1 shards agree for the same doc) can't drift. */
  def shardOf(id: Column): Column =
    conv(substring(docIdHash(id), 1, 1), 16, 10).cast("long")

  /** SQL twin of [[shardOf]] (shared by the pk1 and sh1 oracles). */
  def shardOfSql(id: String): String =
    s"""(strpos('0123456789abcdef',
       |  substr(${docIdHashSql(id)}, 1, 1)) - 1)""".stripMargin

  def shardAuditSql: String = s"""
    WITH t AS (
      SELECT doc_id,
        ${shardOfSql("doc_id")}::BIGINT AS shard,
        len(${tokensSql(normSql("text"))})::BIGINT AS n_tokens
      FROM documents)
    SELECT shard, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT
        AS n_tokens,
      min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM t GROUP BY 1"""

  /** E69: incremental corpus-statistics maintenance — the token document-
    * frequency table that T7 (rarity) and T10 (tf-idf) score against,
    * maintained as a mergeable STORE instead of recomputed per run: a
    * new batch contributes its own vocabulary-width (token, df)
    * aggregate, merged by additive full-outer coalesce. Per-batch cost,
    * vocabulary-width state and shuffle (sub-linear in corpus size,
    * Heaps' law), no corpus rescan — the d8/upsertStore philosophy
    * applied to the statistics tier (k1's HLL sketches cover the
    * DISTINCT-style stats; this covers the additive ones). NOT
    * idempotent per batch by construction (df is additive) — exactly-
    * once application is the store swap layer's job
    * ([[graft.pipeline.Pipeline.upsertStore]] epoch manifest), the same
    * contract as every additive KPI there. CorpusOpsSpec proves folding
    * batches ≡ the one-shot corpus aggregate. */
  def dfStoreUpdate(store: DataFrame, batch: DataFrame): DataFrame = {
    val b = batch
      .select(explode(array_distinct(toksCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df_new"))
    store.select(col("token"), col("df").as("df_old"))
      .join(b, Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_new"), lit(0L)))
          .as("df"))
  }

  /** An empty DF store with the right schema (the bootstrap read-or-init
    * twin of `Pipeline.readOrInit` for this store). */
  def emptyDfStore(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("token", StringType),
        StructField("df", LongType))))
  }

  // PII patterns: shared Java-regex/RE2 subset only (char classes,
  // bounded quantifiers, \b word boundaries) — no backreferences or
  // lookaround, so Spark and DuckDB compile the identical automaton.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Deterministic PII-planted corpus: the synthetic word soup contains no
    * PII, so the operator plants an email / phone / IP derived from doc_id
    * (on 1/2, 1/3, 1/5 of docs respectively — counts vary, including 0) —
    * the same role `withNearDups` plays for the dedup family. The oracle
    * builds the identical corpus. */
  /** The deterministic doc_id-keyed PII planting as a text→text Column
    * (shared by [[withPii]] and [[corpusPrep]]). */
  private def piiPlantedTextExpr: Column = concat(col("text"),
    when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit(" contact user"), col("doc_id"),
        lit("@mail-"), pmod(col("doc_id"), lit(7)),
        lit(".example.com"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit(" call 555-0"),
        lpad(pmod(col("doc_id"), lit(900)).cast("string"), 3, "0")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit(" host 10.0."), pmod(col("doc_id"), lit(256)),
        lit("."), pmod(col("doc_id"), lit(250)))).otherwise(lit("")))

  def withPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), piiPlantedTextExpr.as("text"))

  /** SQL twin of [[piiPlantedTextExpr]]. */
  val piiPlantedTextSqlExpr: String = """text
      || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || doc_id
           || '@mail-' || (doc_id % 7) || '.example.com' ELSE '' END
      || CASE WHEN doc_id % 3 = 0 THEN ' call 555-0'
           || lpad((doc_id % 900)::VARCHAR, 3, '0') ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || (doc_id % 256)
           || '.' || (doc_id % 250) ELSE '' END"""

  def withPiiSql: String = s"""
    SELECT doc_id, $piiPlantedTextSqlExpr AS text
    FROM documents"""

  /** PII1 (E51): PII detection + redaction — the compliance pass every
    * training corpus runs before anything else. One narrow per-row
    * projection: three codegen'd regexp_replace stages applied in a FIXED
    * order (email → phone → IP), with each category COUNTED on the text
    * as it stands when that category's replace runs. The staging matters:
    * the classes can overlap on adversarial input (an IP-shaped email
    * local part like `1.2.3.4@x.example.com` matches both EmailRe and
    * IpRe), and counting every pattern against the raw text would
    * double-count the span AND report an `n_ips` with no `<IP>` in the
    * output — staged counts equal exactly what each replace redacted.
    * Shuffle-free at any scale; patterns live in the shared
    * RE2-compatible subset so the oracle redacts byte-identically. */
  /** The three staged redactions fused into one text→text Column (shared
    * by [[piiRedact]] and [[corpusPrep]]; same fixed order). */
  private def redactedTextExpr: Column =
    regexp_replace(regexp_replace(regexp_replace(col("text"),
      EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")

  def piiRedact(piiDocs: DataFrame): DataFrame = {
    val t = col("text")
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    val clean = regexp_replace(afterPhone, IpRe, "<IP>")
    piiDocs.select(col("doc_id"), clean.as("clean_text"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).cast("long")
        .as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(IpRe), lit(0))).cast("long")
        .as("n_ips"))
  }

  def piiRedactSql: String = s"""
    WITH pii AS ($withPiiSql),
    staged AS (
      SELECT doc_id, text,
        regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS after_email,
        regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g') AS after_phone
      FROM pii)
    SELECT doc_id,
      regexp_replace(after_phone, '$IpRe', '<IP>', 'g') AS clean_text,
      len(regexp_extract_all(text, '$EmailRe'))::BIGINT AS n_emails,
      len(regexp_extract_all(after_email, '$PhoneRe'))::BIGINT AS n_phones,
      len(regexp_extract_all(after_phone, '$IpRe'))::BIGINT AS n_ips
    FROM staged"""

  val ChunkSize = 32
  val ChunkStride = 24

  /** CH1 (E52): overlapping token-window chunking — split each document
    * into fixed-size training windows (size [[ChunkSize]], stride
    * [[ChunkStride]] ⇒ 8-token overlap), the doc→sequence fan-out step
    * between cleaning and packing. Pure columnar: sequence + explode +
    * slice with a column start — every expression codegen'd, no
    * interpreted lambda, narrow end to end (the chunk explosion never
    * shuffles; only whatever consumes it might). Chunk identity is the
    * md5 of the joined window, so downstream chunk-level dedup composes
    * directly with d1. */
  def chunkOverlap(docs: DataFrame, w: Int = ChunkSize,
      s: Int = ChunkStride): DataFrame =
    chunkCore(docs, w, s, Seq("doc_id"))

  /** Chunk expansion carrying arbitrary passthrough columns — the
    * [[corpusPrep]] chain threads `source` through so the final audit
    * needs no corpus-width join back to `documents`. */
  private def chunkCore(docs: DataFrame, w: Int, s: Int,
      carry: Seq[String]): DataFrame = {
    val n = size(toksCol)
    val nChunks = (lit(1) +
      ceil(greatest(n - lit(w), lit(0)).cast("double") / lit(s))).cast("int")
    // a zero-token doc yields ZERO chunks, not one empty chunk — phantom
    // empty windows would all collide on md5("") and feed a degenerate
    // mega-cluster into chunk-level dedup (and sequence(0, -1) would
    // descend, not empty out)
    val chunkNos = when(n === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nChunks - 1))
    val c = carry.map(col)
    docs.select(c ++ Seq(toksCol.as("t"),
        explode(chunkNos).as("chunk_no")): _*)
      .select(c ++ Seq(col("chunk_no").cast("long").as("chunk_no"),
        slice(col("t"), (col("chunk_no") * s + 1).cast("int"), lit(w))
          .as("ct")): _*)
      .select(c ++ Seq(col("chunk_no"),
        size(col("ct")).cast("long").as("n_tokens"),
        md5(array_join(col("ct"), " ").cast("binary")).as("chunk_md5")): _*)
  }

  def chunkOverlapSql(w: Int = ChunkSize, s: Int = ChunkStride,
      from: String = "documents"): String = s"""
    WITH t AS (
      SELECT doc_id, ${tokensSql(normSql("text"))} AS toks FROM $from),
    n AS (
      SELECT doc_id, toks,
        CASE WHEN len(toks) = 0 THEN 0
          ELSE 1 + CAST(ceil(greatest(len(toks) - $w, 0) / $s.0) AS INT)
        END AS nc
      FROM t),
    c AS (
      SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_no FROM n)
    SELECT doc_id, chunk_no::BIGINT AS chunk_no,
      len(list_slice(toks, chunk_no * $s + 1, chunk_no * $s + $w))::BIGINT
        AS n_tokens,
      md5(array_to_string(
        list_slice(toks, chunk_no * $s + 1, chunk_no * $s + $w), ' '))
        AS chunk_md5
    FROM c"""

  // ---- PIPE2 (E115): retrieval-corpus prep capstone -----------------------

  val Pipe2QueryDocs = 2
  val Pipe2K = 3
  val StubDims = 16

  /** PIPE2 (E115): the RETRIEVAL twin of pipe1's cleaning capstone — the
    * end-to-end corpus prep a RAG stack runs, composed from stages that
    * each carry their own oracle: PII-redact (E51's staged rules) →
    * overlapping chunking (E52's windows, chunk identity = window md5) →
    * per-chunk embedding → cross-doc top-k retrieval for the query docs'
    * chunks (the n1 broadcast/rank shape over chunk grain).
    *
    * The EMBEDDING IS A STUB — no embedding model exists in this
    * container — derived deterministically from the chunk's own md5 (hex
    * pair d → byte → [-0.5, 0.5), the multimodal-codec convention:
    * deterministic fake, real plumbing). The semantics that survive the
    * stub are exactly the ones worth verifying: identical chunks embed
    * identically (cosine 1.0 — duplicate-chunk retrieval works end to
    * end), every stage's schema/fan-out/rank plumbing is real, and a
    * real encoder plugs in by replacing ONE projection.
    *
    * Scale: redact+chunk+embed is one narrow chain (no shuffle until
    * ranking); the query side broadcasts; ranking is per-query-chunk
    * bounded. */
  def retrievalPrep(docs: DataFrame, numQueryDocs: Int = Pipe2QueryDocs,
      k: Int = Pipe2K): DataFrame = {
    import graft.sim.Similarity.{dot, norm2}
    val clean = docs.select(col("doc_id"), redactedTextExpr.as("text"))
    val chunks = chunkOverlap(clean)
    // float32 stub vectors (the embeddings-table element type), so the
    // native fvec_dot kernel scores them like every other ANN path;
    // DuckDB mirrors the float rounding with ::REAL
    val vec = array((0 until StubDims).map { d =>
      (conv(substring(col("chunk_md5"), d * 2 + 1, 2), 16, 10)
        .cast("double") / lit(255.0) - lit(0.5)).cast("float")
    }: _*)
    // Persist BEFORE any expression consumes `v`: CollapseProject
    // inlines the 16-dim array constructor into every reference — the
    // norm's fvec_dot(v, v) alone would re-evaluate the whole
    // redact→chunk→md5→conv chain ~32× per row (measured 0.5 s → 25 s
    // on the sf0.1 chunk relation). The cache is the plan barrier: v is
    // computed once per chunk, and the norm, both join sides, and the
    // scoring dot all read the tiny cached relation (chunks × 16
    // floats).
    val wc = chunks.select(col("doc_id"), col("chunk_no"), vec.as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .withColumn("n2", norm2(col("v")))
      .filter(col("n2") > 0.0)
    val q = wc.filter(col("doc_id") < numQueryDocs)
      .select(col("doc_id").as("query_doc"),
        col("chunk_no").as("query_chunk"),
        col("v").as("qv"), col("n2").as("qn"))
    val cand = wc.filter(col("doc_id") >= numQueryDocs)
    val scored = broadcast(q)
      .join(cand.as("c"), col("c.doc_id") =!= col("query_doc"))
      .select(col("query_doc"), col("query_chunk"),
        col("c.doc_id").as("doc_id"), col("c.chunk_no").as("chunk_no"),
        (dot(col("qv"), col("c.v")) /
          (col("qn") * col("c.n2"))).as("cosine"))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_doc"), col("query_chunk"))
          .orderBy(col("cosine").desc, col("doc_id").asc,
            col("chunk_no").asc)))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("query_chunk"),
        col("rank").cast("long").as("rank"), col("doc_id"),
        col("chunk_no"), col("cosine"))
  }

  def retrievalPrepSql(numQueryDocs: Int = Pipe2QueryDocs,
      k: Int = Pipe2K): String = {
    val cleanCorpus = s"""
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(text,
          '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g'),
          '$IpRe', '<IP>', 'g') AS text
      FROM documents"""
    val vecExpr = (0 until StubDims).map { d =>
      s"""(((strpos('0123456789abcdef',
         |    substr(chunk_md5, ${d * 2 + 1}, 1)) - 1) * 16
         |  + strpos('0123456789abcdef',
         |      substr(chunk_md5, ${d * 2 + 2}, 1)) - 1)::DOUBLE
         |  / 255.0::DOUBLE - 0.5::DOUBLE)::REAL""".stripMargin
    }.mkString("[", ",\n        ", "]")
    val dotQ = graft.sim.Similarity.dotSql("qv", "c.v")
    s"""
    WITH chunks AS (
      ${chunkOverlapSql(from = s"($cleanCorpus)")}),
    wc AS (
      SELECT doc_id, chunk_no, $vecExpr AS v
      FROM chunks),
    wc2 AS (
      SELECT doc_id, chunk_no, v,
        sqrt(${graft.sim.Similarity.dotSql("v", "v")}) AS n2
      FROM wc),
    live AS (SELECT * FROM wc2 WHERE n2 > 0),
    q AS (
      SELECT doc_id AS query_doc, chunk_no AS query_chunk, v AS qv,
        n2 AS qn
      FROM live WHERE doc_id < $numQueryDocs),
    cand AS (SELECT * FROM live WHERE doc_id >= $numQueryDocs),
    scored AS (
      SELECT query_doc, query_chunk, c.doc_id, c.chunk_no,
        $dotQ / (qn * c.n2) AS cosine
      FROM q JOIN cand c ON c.doc_id <> query_doc),
    ranked AS (
      SELECT query_doc, query_chunk, doc_id, chunk_no, cosine,
        row_number() OVER (PARTITION BY query_doc, query_chunk
          ORDER BY cosine DESC, doc_id ASC, chunk_no ASC) AS rank
      FROM scored)
    SELECT query_doc, query_chunk, rank::BIGINT AS rank, doc_id,
      chunk_no, cosine
    FROM ranked WHERE rank <= $k"""
  }

  /** Fixed merge-iteration count for [[bpeMerges]] — bounded like the CC
    * loop's round cap and n5's Lloyd iterations, and the unroll depth of
    * the oracle SQL. */
  val BpeMergeIters = 8

  /** Greedy left-to-right single-pair merge over a symbol array, as a
    * codegen'd sequential fold: append each symbol, but when the
    * previously-emitted symbol equals `l` and the current one equals `r`,
    * replace that last emission with the merged symbol `l||r`.
    *
    * This fold IS the classic greedy scan (`i += 2` on a match): after a
    * replacement the last emission becomes `l||r`, which can never equal
    * `l` again (`r` is non-empty), so a just-merged token is never merged
    * twice in one pass — and within a run of equal symbols (`l == r`) the
    * alternation falls out for free (BpeSpec checks the fold against an
    * imperative greedy reference on randomized runs). `get` (0-based,
    * null-on-out-of-bounds) keeps the first step ANSI-safe: on an empty
    * accumulator the probe is NULL, never an index error. */
  private[graft] def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(get(acc, size(acc) - 1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** T8 (E58): BPE-merge vocabulary TRAINING — learn the first `iters`
    * byte-pair merges of the corpus: repeatedly count adjacent symbol
    * pairs (weighted by word frequency), take the most frequent pair
    * (ties: count desc, then left/right symbol ascending — binary ASCII
    * order in both engines), and merge it everywhere. Output is the merge
    * table `(merge_rank, left_sym, right_sym, pair_count)` — the artifact
    * a tokenizer trainer ships.
    *
    * Scale shape (the reason real BPE trainers are feasible at all): the
    * corpus is scanned ONCE to build the word-frequency table; the merge
    * loop runs entirely over the VOCABULARY, which grows sub-linearly in
    * corpus size. Per iteration: one vocabulary-width pair aggregation
    * ending in a bounded TakeOrderedAndProject(1), whose single argmax row
    * is the only driver-side collect (bounded metadata, the n5-Lloyd
    * rationale), then one narrow per-word fold projection. Each round is
    * persisted and the previous unpersisted — same iterative-loop
    * discipline as [[graft.dedup.Dedup.connectedComponents]]. The oracle
    * unrolls the identical iterations as CTE stages, reconstructing the
    * greedy merge with windowed run-parity (a match is taken iff it holds
    * an odd position within its run of consecutive matches). */
  /** Pair-agg rows per shuffle partition inside the merge loop — the
    * loop's width clamp (the CC loop's CcRowsPerPartition rationale). */
  val BpeRowsPerPartition = 2L * 1000 * 1000

  def bpeMerges(docs: DataFrame, iters: Int = BpeMergeIters): DataFrame = {
    val spark = docs.sparkSession
    // The loop's per-round data is VOCABULARY-width, but under the caller's
    // session every round costs full-width shuffles plus AQE's job-per-
    // stage scheduling — 28 jobs for 8 rounds at bench scale, pure
    // scheduling. Same cure as the CC loop: run the loop on a conf-
    // isolated newSession() clone (SessionBridge — shared cache, separate
    // confs) with a width adapted to the measured vocabulary and AQE off;
    // the caller session is never touched.
    val words0 = spreadSmallScan(docs)
      .select(explode(toksCol).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", regexp_extract_all(col("word"), lit("."), lit(0)))
      .persist()
    // the one corpus-width job; also materializes the word table's cache
    val vocabRows = words0.count()
    val width = math.max(1L, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toLong,
      vocabRows * 8 / BpeRowsPerPartition + 1L)).toInt
    val loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", width.toString)
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    var words =
      org.apache.spark.sql.graft.SessionBridge.rebase(words0, loop)
    // one-round unpersist lag: each round's single job (the argmax) both
    // reads the PARENT's cache and fills the current round's — so the
    // parent cache may only be dropped one round later. An eager count()
    // per round would also work but doubles the loop's job count, and job
    // scheduling is this loop's entire cost (the data is vocabulary-width).
    var lagged: DataFrame = null
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    try {
      var it = 1
      var exhausted = false
      while (it <= iters && !exhausted) {
        val top = words
          .filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1)
          .collect() // bounded: exactly the 1-row argmax of this round
        if (top.isEmpty) exhausted = true // every word fully merged
        else {
          val (l, r, cnt) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((it.toLong, l, r, cnt))
          if (lagged != null) lagged.unpersist()
          lagged = words
          words = words
            .withColumn("syms", mergePair(col("syms"), l, r)).persist()
          it += 1
        }
      }
    } finally {
      words.unpersist()
      if (lagged != null) lagged.unpersist()
    }
    spark.createDataFrame(merges.result())
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Oracle for [[bpeMerges]]: the SAME deterministic merge loop unrolled
    * as CTE stages (the n5-Lloyd pattern). Each stage re-derives pair
    * counts with a windowed lead over per-word symbol positions, picks the
    * argmax with the identical tie-break, and rebuilds the merged words
    * via greedy run-parity: consecutive-match runs (only possible when
    * left = right) take every odd-positioned match, the position after a
    * taken match is consumed, everything else passes through. */
  def bpeMergesSql(iters: Int = BpeMergeIters): String = s"""
    WITH ${bpeStagesSql(iters)}
    SELECT merge_rank, l AS left_sym, r AS right_sym, cnt AS pair_count
    FROM (${(0 until iters).map(k => s"SELECT * FROM best$k")
      .mkString(" UNION ALL ")})
    ORDER BY merge_rank"""

  /** The shared CTE pipeline of the BPE oracles: `words0` (char-split
    * word-frequency table) through `words{iters}` (fully merged), with
    * each round's argmax in `best{k}`. */
  private def bpeStagesSql(iters: Int): String = {
    def stage(k: Int): String = s"""
    ex$k AS (
      SELECT word, freq, unnest(syms) AS s,
             unnest(range(1, len(syms) + 1)) AS i
      FROM words$k),
    agg$k AS (
      SELECT l, r, sum(freq)::BIGINT AS cnt FROM (
        SELECT word, freq, s AS l,
          lead(s) OVER (PARTITION BY word ORDER BY i) AS r
        FROM ex$k)
      WHERE r IS NOT NULL GROUP BY 1, 2),
    best$k AS (
      SELECT ${k + 1}::BIGINT AS merge_rank, l, r, cnt
      FROM agg$k ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    mt$k AS (
      SELECT e.word, e.freq, e.i, e.s, b.l AS bl, b.r AS br,
        coalesce(e.s = b.l AND
          lead(e.s) OVER (PARTITION BY e.word ORDER BY e.i) = b.r, FALSE)
          AS m
      -- LEFT JOIN, not CROSS: when merges exhaust before the unroll depth
      -- (best$k empty), a cross join would wipe words${k + 1} to zero rows,
      -- while the Spark loop leaves words unchanged — the left join keeps
      -- every row with m = FALSE, a pure pass-through stage
      FROM ex$k e LEFT JOIN best$k b ON TRUE),
    isl$k AS (
      SELECT *, sum(CASE WHEN m THEN 0 ELSE 1 END)
        OVER (PARTITION BY word ORDER BY i) AS island
      FROM mt$k),
    tk$k AS (
      SELECT *, m AND (row_number()
        OVER (PARTITION BY word, island, m ORDER BY i) % 2 = 1) AS taken
      FROM isl$k),
    em$k AS (
      SELECT word, freq, i,
        CASE WHEN taken THEN bl || br
             WHEN lag(taken, 1, FALSE) OVER (PARTITION BY word ORDER BY i)
               THEN NULL
             ELSE s END AS s2
      FROM tk$k),
    words${k + 1} AS (
      SELECT word, freq, list(s2 ORDER BY i) FILTER (s2 IS NOT NULL) AS syms
      FROM em$k GROUP BY 1, 2)"""
    s"""words0 AS (
      SELECT word, count(*)::BIGINT AS freq,
        regexp_extract_all(word, '.') AS syms
      FROM (SELECT unnest(${tokensSql(normSql("text"))}) AS word
            FROM documents)
      GROUP BY 1),
    ${(0 until iters).map(stage).mkString(",")}"""
  }

  /** T9 (E58b): BPE tokenization APPLY — re-tokenize the corpus with the
    * merges [[bpeMerges]] learned: per doc, the whitespace token count and
    * the subword count after the trained merges (the number a packing/
    * budgeting pass actually needs). Scale shape: the merge folds run once
    * per VOCABULARY WORD (the trained merge loop's own word table, tiny),
    * never per occurrence — the corpus-width work is one broadcast
    * join-back of `word → n_subtokens` onto the token stream plus a
    * per-doc sum (the t7 join-back shape; broadcast because a vocabulary
    * that fit in the training loop fits in an executor). The oracle joins
    * the unrolled pipeline's final `words{iters}` table the same way. */
  def bpeTokenize(docs: DataFrame, iters: Int = BpeMergeIters): DataFrame = {
    // re-derive the merge table (16 vocabulary-width jobs — t9 stands
    // alone as a query; a production pipeline passes bpeMerges' output in)
    val merges = bpeMerges(docs, iters).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val sd = spreadSmallScan(docs)
    val vocabSyms = merges.foldLeft(
      sd.select(explode(toksCol).as("word")).distinct()
        .withColumn("syms",
          regexp_extract_all(col("word"), lit("."), lit(0)))) {
      case (v, (l, r)) => v.withColumn("syms", mergePair(col("syms"), l, r))
    }.select(col("word"), size(col("syms")).cast("long").as("n_sub"))
    sd.select(col("doc_id"), explode(toksCol).as("word"))
      .join(broadcast(vocabSyms), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_sub")).as("n_bpe_tokens"))
  }

  def bpeTokenizeSql(iters: Int = BpeMergeIters): String = s"""
    WITH ${bpeStagesSql(iters)},
    tok AS (
      SELECT doc_id, unnest(${tokensSql(normSql("text"))}) AS word
      FROM documents)
    SELECT doc_id, count(*) AS n_tokens,
      sum(len(w.syms))::BIGINT AS n_bpe_tokens
    FROM tok JOIN words$iters w USING (word)
    GROUP BY 1"""

  // ---- T22/T23: unigram-LM (SentencePiece-family) tokenizer ----------------

  /** Longest candidate piece in characters — bounds the Viterbi fan-in
    * (≤ [[UniMaxPieceLen]] candidates per position) and the seed
    * substring volume. */
  val UniMaxPieceLen = 4

  /** Multi-character seed pieces kept (by corpus frequency) beside the
    * ALWAYS-kept single characters — the trainer's working vocabulary. */
  val UniSeedMulti = 64

  /** Fixed EM iterations — bounded like [[BpeMergeIters]] and the
    * oracle's unroll depth. */
  val UniEmIters = 3

  /** Multi-character pieces surviving the final prune (single characters
    * always survive — the SentencePiece required-character rule). */
  val UniFinalMulti = 32

  /** T22/T23's shared Viterbi segmentation under piece-count map `m`
    * with Laplace-smoothed probabilities p = (cnt + 1) / `tpv` (tpv =
    * total count + vocabulary size — smoothing keeps zero-count pieces
    * usable, the required-character guarantee): best(j) = max over
    * piece lengths s of best(j−s) · p(word[j−s+1..j]), ties to the
    * LONGER piece (one candidate per s, so (score, s) is a total order
    * and the inner max is fold-order-independent — the two engines may
    * fold differently). The outer fold appends one best struct per
    * position; multiplication associates as score · (p) with p divided
    * first, mirrored with explicit parentheses in [[uniViterbiSql]] so
    * the double chains are bit-identical. Hard-EM (Viterbi counts, the
    * tractable deterministic variant of Kudo 2018's E-step) is what the
    * trainer folds over this. Words containing a character absent from
    * `m` would yield a NULL best struct (empty candidate set) — not
    * reachable from the trainer or the apply (the seed holds every
    * corpus character and the prune never drops singles). */
  private[graft] def viterbiSeg(word: Column, m: Column, tpv: Double)
      : Column = {
    val len = length(word)
    val init = array(struct(lit(1.0).as("score"), lit(0).as("s"),
      array().cast("array<string>").as("seg")))
    val nullBest =
      lit(null).cast("struct<score:double,s:int,seg:array<string>>")
    val dp = aggregate(sequence(lit(1), len), init, (acc, j) => {
      val cands = filter(
        transform(sequence(lit(1), least(lit(UniMaxPieceLen), j)), s => {
          val prev = element_at(acc, j - s + 1)
          val piece = word.substr(j - s + 1, s)
          struct(
            (prev.getField("score") *
              ((try_element_at(m, piece) + lit(1L)).cast("double") /
                lit(tpv))).as("score"),
            s.as("s"),
            concat(prev.getField("seg"), array(piece)).as("seg"))
        }),
        c => c.getField("score").isNotNull)
      val best = aggregate(cands, nullBest, (b, c) =>
        when(b.isNull, c)
          .when(c.getField("score") > b.getField("score") ||
            (c.getField("score") === b.getField("score") &&
              c.getField("s") > b.getField("s")), c)
          .otherwise(b))
      concat(acc, array(best))
    })
    element_at(dp, len + 1).getField("seg")
  }

  /** T22's driver loop — the t8 shape for the OTHER public tokenizer
    * family (unigram LM, Kudo 2018 — what SentencePiece/Llama/T5
    * actually ship): the corpus is scanned ONCE into the word-frequency
    * table; everything after runs at VOCABULARY grain (sub-linear in
    * corpus size). Seed = every single character + the [[UniSeedMulti]]
    * most frequent multi-character substrings (≤ [[UniMaxPieceLen]]
    * chars, occurrence-weighted by word frequency, ties piece-ascending
    * — a bounded TakeOrderedAndProject, then a bounded collect: the
    * t9/codebook convention). Each EM iteration is ONE vocabulary-width
    * job: Viterbi-segment every distinct word under the current counts
    * (hard EM), fold usage back to counts (unused pieces drop to 0 but
    * stay in the vocabulary — Laplace keeps them reachable; the SET is
    * fixed through EM, the PRUNE picks the output). Returns the pruned
    * vocabulary ordered by (count desc, piece asc): all single
    * characters + the top [[UniFinalMulti]] multi-char pieces. */
  private[graft] def unigramVocab(docs: DataFrame,
      iters: Int = UniEmIters,
      seedMulti: Int = UniSeedMulti): Seq[(String, Long)] = {
    // spread so the one corpus-width cache build parallelizes past the
    // raw scan's single input split (the persist below already serves
    // the seed build and every EM iteration)
    val words = spreadSmallScan(docs)
      .select(explode(toksCol).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val subs = words.select(col("freq"),
        explode(flatten(transform(
          sequence(lit(1), length(col("word"))), st =>
            transform(sequence(lit(1),
              least(lit(UniMaxPieceLen), length(col("word")) - st + 1)),
              l => col("word").substr(st, l))))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seed0 = try {
        val singles = subs.filter(length(col("piece")) === 1)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val multis = subs.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece").asc).limit(seedMulti)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (singles ++ multis).toSeq
      } finally { subs.unpersist(); () }
      val seedPieces = seed0.map(_._1)
      val vocabV = seedPieces.size
      var counts = seed0.toMap
      for (_ <- 1 to iters) {
        val tpv = (counts.valuesIterator.sum + vocabV).toDouble
        val usage = words.select(col("freq"),
            explode(viterbiSeg(col("word"), typedlit(counts), tpv))
              .as("piece"))
          .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        counts = seedPieces.map(p => p -> usage.getOrElse(p, 0L)).toMap
      }
      val fin = counts.toSeq
      val kept = fin.filter(_._1.length == 1) ++
        fin.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }.take(UniFinalMulti)
      kept.sortBy { case (p, c) => (-c, p) }
    } finally { words.unpersist(); () }
  }

  /** T22: unigram-LM tokenizer TRAINING — the trained-vocabulary
    * artifact `(rank, piece, piece_len, cnt)` a SentencePiece-family
    * trainer ships, ranked by final Viterbi count (ties piece-asc).
    * See [[unigramVocab]] for the scale argument; the oracle unrolls
    * the identical seed + EM iterations as CTE stages (the
    * unrolled-Lloyd/BPE convention) with the Viterbi DP as a DuckDB
    * list fold mirroring [[viterbiSeg]] operation for operation. */
  def unigramTrain(docs: DataFrame, iters: Int = UniEmIters): DataFrame = {
    val vocab = unigramVocab(docs, iters)
    docs.sparkSession.createDataFrame(
      vocab.zipWithIndex.map { case ((p, c), i) =>
        (i + 1L, p, p.length.toLong, c) })
      .toDF("rank", "piece", "piece_len", "cnt")
  }

  /** T23: unigram tokenization APPLY — t9's join-back shape under the
    * T22 vocabulary: every DISTINCT word Viterbi-segments ONCE under
    * the pruned vocabulary (vocabulary grain, broadcast back — never
    * per-occurrence), then the per-source fertility report (the t16
    * columns for the unigram family; ratios of exact long sums).
    *
    * The `broadcast(wordSubs)` hint below is an explicit SIZE
    * ASSUMPTION, not a law (the c5 caveat at this call site): the
    * DISTINCT-word relation grows with the corpus under an open
    * vocabulary, so at broadcast-threshold scale the hint must come off
    * and the optimizer pick the join — the segmentation stays
    * vocabulary-grain either way; only the join-back strategy changes. */
  def unigramTokenize(docs: DataFrame, iters: Int = UniEmIters)
      : DataFrame = {
    val vocab = unigramVocab(docs, iters)
    val tpv = (vocab.map(_._2).sum + vocab.size).toDouble
    val m = typedlit(vocab.toMap)
    val sd = spreadSmallScan(docs)
    val wordSubs = sd.select(explode(toksCol).as("word")).distinct()
      .select(col("word"),
        size(viterbiSeg(col("word"), m, tpv)).cast("long").as("n_sub"))
    sd.select(col("doc_id"), col("source"), explode(toksCol).as("word"))
      .join(broadcast(wordSubs), Seq("word"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_uni_tokens"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_uni_tokens"),
        (col("n_uni_tokens").cast("double") /
          col("n_words").cast("double")).as("fertility"))
  }

  /** The DuckDB mirror of [[viterbiSeg]]: the DP as a list fold whose
    * accumulator is a list of (score, s, seg) structs — one entry per
    * position — with the position recovered as len(acc) (DuckDB's
    * list_reduce takes no zero element, so the fold runs over
    * same-typed dummy elements with the init prepended). Candidate
    * probability parenthesized exactly as the Spark fold multiplies. */
  private def uniViterbiSql(word: String, m: String, tpv: String)
      : String = s"""
    list_reduce(
      list_prepend([{'score': 1.0::DOUBLE, 's': 0, 'seg': []::VARCHAR[]}],
        list_transform(range(1, length($word) + 1),
          i -> [{'score': 0.0::DOUBLE, 's': 0, 'seg': []::VARCHAR[]}])),
      (acc, x) -> list_append(acc,
        list_reduce(
          list_filter(
            list_transform(range(1, least($UniMaxPieceLen, len(acc)) + 1),
              s -> {'score': acc[len(acc) - s + 1].score *
                      (($m[substr($word, (len(acc) - s + 1)::INT, s::INT)][1]
                        + 1)::DOUBLE / $tpv),
                    's': s::INT,
                    'seg': list_append(acc[len(acc) - s + 1].seg,
                      substr($word, (len(acc) - s + 1)::INT, s::INT))}),
            c -> c.score IS NOT NULL),
          (b, c) -> CASE WHEN c.score > b.score OR
              (c.score = b.score AND c.s > b.s) THEN c ELSE b END))
    )[length($word) + 1].seg"""

  /** Shared CTE pipeline of the unigram oracles: word table → seed
    * (singles + top multi substrings) → `vocab0..vocab{iters}` via the
    * unrolled EM, each stage's count map/total packed into a 1-row
    * `env{k}` frame, ending in the pruned `keep` + its `envp`. */
  private def uniStagesSql(iters: Int): String = {
    def envSql(k: Int) = s"""
    env$k AS (
      SELECT map(list(piece ORDER BY piece), list(cnt ORDER BY piece)) AS m,
        (sum(cnt) + count(*))::DOUBLE AS tpv
      FROM vocab$k)"""
    def stage(k: Int) = s"""
    use${k + 1} AS (
      SELECT piece, sum(freq)::BIGINT AS cnt FROM (
        SELECT w.freq,
          unnest(${uniViterbiSql("w.word", "e.m", "e.tpv")}) AS piece
        FROM words w CROSS JOIN env$k e)
      GROUP BY 1),
    vocab${k + 1} AS (
      SELECT v.piece, coalesce(u.cnt, 0)::BIGINT AS cnt
      FROM vocab$k v LEFT JOIN use${k + 1} u ON u.piece = v.piece)"""
    s"""words AS (
      SELECT word, count(*)::BIGINT AS freq
      FROM (SELECT unnest(${tokensSql(normSql("text"))}) AS word
            FROM documents)
      GROUP BY 1),
    st AS (
      SELECT word, freq, unnest(range(1, length(word) + 1)) AS st
      FROM words),
    pc AS (
      SELECT freq, substr(word, st::INT, l::INT) AS piece
      FROM (SELECT word, freq, st,
              unnest(range(1,
                least($UniMaxPieceLen, length(word) - st + 1) + 1)) AS l
            FROM st)),
    subs AS (SELECT piece, sum(freq)::BIGINT AS cnt FROM pc GROUP BY 1),
    vocab0 AS (
      SELECT piece, cnt FROM subs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM subs WHERE length(piece) > 1
        ORDER BY cnt DESC, piece ASC LIMIT $UniSeedMulti)),
    ${(0 until iters).map(k => envSql(k) + "," + stage(k)).mkString(",")},
    keep AS (
      SELECT piece, cnt FROM vocab$iters WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM vocab$iters WHERE length(piece) > 1
        ORDER BY cnt DESC, piece ASC LIMIT $UniFinalMulti))"""
  }

  def unigramTrainSql(iters: Int = UniEmIters): String = s"""
    WITH ${uniStagesSql(iters)}
    SELECT row_number() OVER (ORDER BY cnt DESC, piece ASC)::BIGINT AS rank,
      piece, length(piece)::BIGINT AS piece_len, cnt
    FROM keep"""

  def unigramTokenizeSql(iters: Int = UniEmIters): String = s"""
    WITH ${uniStagesSql(iters)},
    envp AS (
      SELECT map(list(piece ORDER BY piece), list(cnt ORDER BY piece)) AS m,
        (sum(cnt) + count(*))::DOUBLE AS tpv
      FROM keep),
    wsub AS (
      SELECT w.word,
        len(${uniViterbiSql("w.word", "e.m", "e.tpv")})::BIGINT AS n_sub
      FROM words w CROSS JOIN envp e),
    tok AS (
      SELECT doc_id, source, unnest(${tokensSql(normSql("text"))}) AS word
      FROM documents)
    SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
      count(*)::BIGINT AS n_words,
      sum(w.n_sub)::BIGINT AS n_uni_tokens,
      sum(w.n_sub)::DOUBLE / count(*)::DOUBLE AS fertility
    FROM tok JOIN wsub w USING (word)
    GROUP BY 1"""

  // ---- T16 (E116): tokenizer fertility audit -------------------------------

  /** T16 (E116): tokenizer FERTILITY audit — the tokenizer-quality
    * number every LLM data card reports: subword tokens per word and
    * characters per subword token, per source. High fertility on a
    * source means the trained vocabulary serves it badly (its text
    * fragments into many pieces — the signal that drives vocabulary
    * rebalancing or per-source token budgeting, since training cost is
    * paid in SUBWORD tokens while content is measured in words).
    *
    * Rides t8/t9's machinery unchanged: the trained merge table applies
    * per DISTINCT WORD (vocabulary grain, broadcast back — never
    * per-occurrence), and both metrics are ratios of exact long sums
    * (the lm1 discipline). Char mass is the words' own characters
    * (whitespace excluded — the per-word grain the merges operate on). */
  def fertilityAudit(docs: DataFrame, iters: Int = BpeMergeIters)
      : DataFrame = {
    val merges = bpeMerges(docs, iters).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val sd = spreadSmallScan(docs)
    val vocabSyms = merges.foldLeft(
      sd.select(explode(toksCol).as("word")).distinct()
        .withColumn("syms",
          regexp_extract_all(col("word"), lit("."), lit(0)))) {
      case (v, (l, r)) => v.withColumn("syms", mergePair(col("syms"), l, r))
    }.select(col("word"), length(col("word")).cast("long").as("n_chars"),
      size(col("syms")).cast("long").as("n_sub"))
    sd.select(col("doc_id"), col("source"), explode(toksCol).as("word"))
      .join(broadcast(vocabSyms), Seq("word"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_chars"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double")).as("fertility"),
        (col("n_chars").cast("double") /
          col("n_bpe_tokens").cast("double")).as("chars_per_token"))
  }

  def fertilityAuditSql(iters: Int = BpeMergeIters): String = s"""
    WITH ${bpeStagesSql(iters)},
    tok AS (
      SELECT doc_id, source, unnest(${tokensSql(normSql("text"))}) AS word
      FROM documents)
    SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
      count(*)::BIGINT AS n_words,
      sum(len(word))::BIGINT AS n_chars,
      sum(len(w.syms))::BIGINT AS n_bpe_tokens,
      sum(len(w.syms))::DOUBLE / count(*)::DOUBLE AS fertility,
      sum(len(word))::DOUBLE / sum(len(w.syms))::DOUBLE
        AS chars_per_token
    FROM tok JOIN words$iters w USING (word)
    GROUP BY 1"""

  // ---- T21 (E159): tokenizer round-trip validation -------------------------

  /** T21 (E159): tokenizer ROUND-TRIP validation — the data-card column
    * t8/t9/t16 don't cover: what share of each source survives
    * encode→decode IDENTICALLY, and how many characters per document
    * the tokenizer stack loses where it doesn't? The lossy stage is
    * pinned analytically: the BPE layer is round-trip-exact BY
    * CONSTRUCTION (every merge concatenates adjacent symbols, so the
    * symbol sequence always concatenates back to its word —
    * BpeSpec/TokenizerRoundTripSpec verify the invariant on the trained
    * vocabulary), so decode(encode(text)) collapses to
    * `array_join(tokens(norm(text)), " ")` = norm(text), and the
    * identity rate measures exactly what normalization (case folding,
    * whitespace collapse, trim) destroys — the number that decides
    * whether a source can be regenerated from its tokens or must keep
    * raw bytes alongside.
    *
    * Per source: docs, exact round-trips, identity rate, and the
    * char-level edit rate (Σ levenshtein(text, decoded) / Σ chars — the
    * graded loss; exact long sums, ANSI-guarded double boundary;
    * levenshtein is unit-cost Wagner–Fischer in BOTH engines, the er1
    * parity precedent). One narrow codegen scan + a |sources|-row
    * aggregate — linear at any corpus size. */
  def tokenizerRoundTrip(docs: DataFrame): DataFrame = {
    val decoded = array_join(toksCol, " ")
    docs.select(col("source"),
        when(decoded === col("text"), lit(1L)).otherwise(lit(0L)).as("ok"),
        levenshtein(col("text"), decoded).cast("long").as("edits"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ok")).as("n_roundtrip"),
        sum(col("edits")).as("sum_edits"),
        sum(col("n_chars")).as("sum_chars"))
      .select(col("source"), col("n_docs"), col("n_roundtrip"),
        (col("n_roundtrip").cast("double") / col("n_docs").cast("double"))
          .as("roundtrip_rate"),
        when(col("sum_chars") === 0L, lit(null).cast("double"))
          .otherwise(col("sum_edits").cast("double") /
            col("sum_chars").cast("double"))
          .as("char_edit_rate"))
  }

  def tokenizerRoundTripSql: String = s"""
    WITH d AS (
      SELECT source, text,
        array_to_string(${tokensSql(normSql("text"))}, ' ') AS decoded
      FROM documents),
    a AS (
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(CASE WHEN decoded = text THEN 1 ELSE 0 END)::BIGINT
          AS n_roundtrip,
        sum(levenshtein(text, decoded))::BIGINT AS sum_edits,
        sum(len(text))::BIGINT AS sum_chars
      FROM d GROUP BY 1)
    SELECT source, n_docs, n_roundtrip,
      n_roundtrip::DOUBLE / n_docs::DOUBLE AS roundtrip_rate,
      CASE WHEN sum_chars = 0 THEN NULL
        ELSE sum_edits::DOUBLE / sum_chars::DOUBLE END AS char_edit_rate
    FROM a"""

  /** PIPE1 (E61): the cleaning tier composed END-TO-END as one DataFrame
    * chain — PII redaction → repetition collapse → quality filter
    * (keep medium+) → exact dedup (min doc_id per content fingerprint) →
    * overlapping chunking — summarized per source (docs in, docs kept,
    * chunks, chunk tokens). This is the shape a real corpus-prep run has;
    * every stage is the already-verified operator, so the composition
    * proves the tier actually pipelines: narrow projections end to end,
    * with exactly three shuffles (the dedup groupBy+semi-join — the d1
    * form, no window sort — and the final per-source aggregates).
    * The oracle composes the same stages as CTEs from the same SQL
    * fragments. */
  def corpusPrep(docs: DataFrame): DataFrame = {
    // one narrow chain, `source` threaded through every projection: the
    // plant→redact→collapse→score-filter stages are per-row expressions
    // (NOT operator-output joins — a join against qualityScore's output
    // would be an avoidable corpus-width shuffle at scale)
    // Staged projections with multi-referenced intermediates as NAMED
    // columns: CollapseProject inlines single-referenced aliases (plant →
    // redact fuse, evaluated once) but keeps a projection whose alias is
    // referenced more than once (normed×2 in tokens, toks×2 in the
    // collapse lambda) — so each stage evaluates exactly once per row
    // instead of re-expanding its upstream tree at every reference.
    val cleaned = docs
      .select(col("doc_id"), col("source"), piiPlantedTextExpr.as("text"))
      .select(col("doc_id"), col("source"), redactedTextExpr.as("text"))
      .select(col("doc_id"), col("source"), norm(col("text")).as("normed"))
      .select(col("doc_id"), col("source"), tokens(col("normed")).as("tk"))
      .select(col("doc_id"), col("source"),
        array_join(filter(col("tk"), (t, i) =>
          (i === lit(0)) || element_at(col("tk"), i) =!= t), " ")
          .as("text"))
      // Materialize the cleaned corpus ONCE (disk-backed, the d7 persist
      // policy; released by the caller's cache clear). Two reasons, both
      // measured — without this barrier the composed query ran 90× slower:
      // (1) predicate pushdown substitutes the quality filter's ~8 `text`
      // references EACH with the whole plant→redact→collapse expression
      // tree (interpreted HOF folds included), exploding per-row cost;
      // (2) the dedup's grouped-min and semi-join branches would re-run
      // the cleaning chain twice. A production corpus-prep run persists
      // the cleaned text between stages anyway — this is that checkpoint.
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val kept = cleaned.filter(qualityScoreExpr >= 0.4)
    // exact dedup, d1 form: grouped min + semi-join on the content hash —
    // the chain's only corpus-width shuffles besides the final audit
    val fp = kept.select(col("doc_id"), col("source"), col("text"),
      docFp(col("text")).as("fp"))
    val keepers = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = fp.join(keepers, Seq("fp", "doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("text"))
    val chunks = chunkCore(deduped, ChunkSize, ChunkStride,
      Seq("doc_id", "source"))
    // LEFT join from totals (the mix1/c1 audit convention): a source whose
    // docs are ALL dropped must still report n_docs with zero kept — total
    // loss is the one case an audit exists to surface, and an inner join
    // would silently erase it
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    totals
      .join(chunks
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs_kept"),
          count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("n_chunk_tokens")),
        Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_chunk_tokens"), lit(0L)).as("n_chunk_tokens"))
  }

  def corpusPrepSql(w: Int = ChunkSize, s: Int = ChunkStride): String = {
    val toksOf = (c: String) => tokensSql(normSql(c))
    s"""
    WITH pii AS (
      SELECT doc_id, source, $piiPlantedTextSqlExpr AS text
      FROM documents),
    red AS (
      SELECT doc_id, source,
        regexp_replace(regexp_replace(regexp_replace(text,
          '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g'),
          '$IpRe', '<IP>', 'g') AS text
      FROM pii),
    colt AS (SELECT doc_id, source, ${toksOf("text")} AS toks FROM red),
    colr AS (
      SELECT doc_id, source,
        array_to_string(
          list_filter(toks, (x, i) -> i = 1 OR toks[i - 1] <> x), ' ')
          AS text
      FROM colt),
    qbase AS (
      SELECT doc_id, source, text,
        len(${toksOf("text")})::BIGINT AS word_count,
        length(text)::BIGINT AS n_chars_actual,
        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS punct,
        len(list_filter(${toksOf("text")}, t -> t IN (${LangMarkers.toMap
        .apply("en").map(x => s"'$x'").mkString(", ")})))::BIGINT
          AS stop_hits,
        length(replace(${normSql("text")}, ' ', ''))::BIGINT AS alpha_chars
      FROM colr),
    q AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
          least(n_chars_actual::DOUBLE / 500.0, 1.0) * 0.4
            + (stop_hits::DOUBLE / greatest(word_count, 1)) * 0.3
            + (1.0 - punct::DOUBLE / greatest(n_chars_actual, 1)) * 0.2
            + least((alpha_chars::DOUBLE / greatest(word_count, 1)) / 8.0,
                1.0) * 0.1 AS score
        FROM qbase)
      WHERE score >= 0.4),
    fps AS (
      SELECT doc_id, source, text, md5(${normSql("text")}) AS fp FROM q),
    keep AS (SELECT fp, min(doc_id) AS doc_id FROM fps GROUP BY 1),
    ded AS (
      SELECT f.doc_id, f.source, f.text FROM fps f
      JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id),
    dt AS (SELECT doc_id, source, ${toksOf("text")} AS toks FROM ded),
    dn AS (
      SELECT doc_id, source, toks,
        CASE WHEN len(toks) = 0 THEN 0
          ELSE 1 + CAST(ceil(greatest(len(toks) - $w, 0) / $s.0) AS INT)
        END AS nc
      FROM dt),
    ch AS (
      SELECT doc_id, source,
        len(list_slice(toks, chunk_no * $s + 1, chunk_no * $s + $w))::BIGINT
          AS n_tokens
      FROM (SELECT doc_id, source, toks, unnest(range(0, nc)) AS chunk_no
            FROM dn)),
    tot AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents
            GROUP BY 1),
    audit AS (
      SELECT source,
        count(DISTINCT doc_id) AS n_docs_kept,
        count(*) AS n_chunks,
        sum(n_tokens)::BIGINT AS n_chunk_tokens
      FROM ch GROUP BY 1)
    SELECT t.source, t.n_docs,
      coalesce(a.n_docs_kept, 0) AS n_docs_kept,
      coalesce(a.n_chunks, 0) AS n_chunks,
      coalesce(a.n_chunk_tokens, 0) AS n_chunk_tokens
    FROM tot t LEFT JOIN audit a ON a.source = t.source"""
  }

  // ---- DuckDB oracle twins -------------------------------------------------

  private val normT = normSql("text")
  private val toksT = tokensSql(normT)

  val tokenStatsSql: String = s"""
    SELECT doc_id,
      len($toksT)::BIGINT AS ws_tokens,
      len(regexp_extract_all(text, '$BpePattern'))::BIGINT AS bpe_tokens,
      length(text)::BIGINT AS chars,
      length(replace($normT, ' ', ''))::DOUBLE
        / greatest(len($toksT), 1) AS mean_word_len
    FROM documents"""

  /** T18 oracle: the same single conditional-aggregate pass, reshaped
    * to rows by a literal UNION ALL (DuckDB's unpivot of a 1-row frame). */
  val truncationAuditSql: String = {
    val condCols = CtxLens.map { l =>
      s"""coalesce(sum(CASE WHEN n > $l THEN 1 ELSE 0 END), 0)::BIGINT
          AS docs_over_$l,
        coalesce(sum(greatest(n - $l, 0)), 0)::BIGINT AS lost_$l"""
    }.mkString(",\n      ")
    val rows = CtxLens.map { l =>
      s"""SELECT ${l}::BIGINT AS ctx_len, n_docs, tokens_total,
        docs_over_$l AS docs_over, lost_$l AS tokens_lost,
        CASE WHEN tokens_total = 0 THEN NULL
          ELSE lost_$l::DOUBLE / tokens_total::DOUBLE END AS loss_rate
      FROM a"""
    }.mkString("\n    UNION ALL\n    ")
    s"""
    WITH t AS (
      SELECT len(regexp_extract_all(text, '$BpePattern'))::BIGINT AS n
      FROM documents),
    a AS (
      SELECT count(*)::BIGINT AS n_docs,
        coalesce(sum(n), 0)::BIGINT AS tokens_total,
      $condCols
      FROM t)
    $rows"""
  }

  val langIdSql: String = {
    val scoreCols = LangMarkers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toksT, t -> t IN ($list)))::BIGINT AS score_$lang"
    }.mkString(",\n      ")
    val best = LangMarkers.map(m => s"score_${m._1}").mkString("greatest(", ", ", ")")
    val pick = LangMarkers.map { case (lang, _) =>
      s"WHEN score_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString("\n        ")
    s"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
      $scoreCols
      FROM documents)
    SELECT doc_id, actual_lang,
      ${LangMarkers.map(m => s"score_${m._1}").mkString(", ")},
      CASE $pick ELSE 'und' END AS predicted_lang
    FROM scored"""
  }

  val qualityScoreSql: String = {
    val en = LangMarkers.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    s"""
    WITH base AS (
      SELECT doc_id,
        len($toksT)::BIGINT AS word_count,
        length(text)::BIGINT AS n_chars_actual,
        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS punct,
        len(list_filter($toksT, t -> t IN ($en)))::BIGINT AS stop_hits,
        length(replace($normT, ' ', ''))::BIGINT AS alpha_chars
      FROM documents),
    ratios AS (
      SELECT doc_id, word_count, n_chars_actual,
        punct::DOUBLE / greatest(n_chars_actual, 1) AS punct_ratio,
        stop_hits::DOUBLE / greatest(word_count, 1) AS stopword_ratio,
        alpha_chars::DOUBLE / greatest(word_count, 1) AS mean_word_len,
        least(n_chars_actual::DOUBLE / 500.0, 1.0) AS len_score
      FROM base)
    SELECT doc_id, word_count, n_chars_actual, punct_ratio, stopword_ratio,
      mean_word_len,
      len_score * 0.4 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2
        + least(mean_word_len / 8.0, 1.0) * 0.1 AS quality_score,
      CASE WHEN len_score * 0.4 + stopword_ratio * 0.3
             + (1.0 - punct_ratio) * 0.2
             + least(mean_word_len / 8.0, 1.0) * 0.1 >= 0.6 THEN 'high'
           WHEN len_score * 0.4 + stopword_ratio * 0.3
             + (1.0 - punct_ratio) * 0.2
             + least(mean_word_len / 8.0, 1.0) * 0.1 >= 0.4 THEN 'medium'
           ELSE 'low' END AS quality_bucket
    FROM ratios"""
  }

  val fingerprintSql: String = s"""
    SELECT doc_id, md5($normT) AS fp_md5,
      ${charHashSql(normT)} AS fp_roll
    FROM documents"""

  // ---- PK2 (E184): context-window packing ---------------------------------

  /** Tokens per packed context window — the pretraining sequence length
    * this exhibit packs against (a real run packs at 2k–8k; the packing
    * arithmetic is budget-independent). Distinct from [[PackBudget]]:
    * E48 assigns whole DOCS to sequences (never splits, may overshoot),
    * this cuts the concatenated stream at EXACT window boundaries. */
  val CtxWindowTokens = 256

  /** PK2 (E184): CONTEXT-WINDOW PACKING — the concat-and-chunk step a
    * pretraining run applies after curation: per source, documents are
    * concatenated in a deterministic order (doc_id — the rerun-stable
    * convention) into one token stream that is cut into fixed
    * [[CtxWindowTokens]]-token windows; documents straddle cuts (the GPT-style
    * packing semantics — no padding, a window may start mid-document).
    * The report is at WINDOW grain: how many documents each window
    * touches, how many of its tokens it actually holds (only the stream
    * tail window is short), and the leading document (provenance).
    *
    * Decomposition: token offsets are a per-source running sum — START =
    * cumsum(n_tok) − n_tok, END = cumsum(n_tok), BOTH framed in the one
    * window projection (two stacked withColumns would plan two Window
    * nodes); a document's token span [start, end) intersects windows
    * start DIV B .. (end−1) DIV B, emitted by one sequence-explode; the
    * per-window token share is the interval overlap — pure integer
    * arithmetic, exactly mirrored in DuckDB. Zero-token documents hold
    * no span and pack into no window (sequence(a, a−1) would be an
    * illegal range — the mm3/sampleFrames guard, applied here as a
    * filter).
    *
    * Scale: one narrow token-count scan; ONE source-partitioned window
    * (each source shard packs its own stream — the distributed packing
    * scheme; never a global sort); the explode emits ~total_tokens/B
    * window rows (+1 per straddle); the final aggregate runs at window
    * grain. At 100 TB each source's cumsum is a range-partitioned
    * prefix sum — the plan carries no corpus-wide ordering anywhere. */
  def contextPacking(docs: DataFrame, budget: Int = CtxWindowTokens)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val spans = docs
      .select(col("source"), col("doc_id"),
        size(toksCol).cast("long").as("n_tok"))
      // both offsets from ONE running sum in ONE projection
      .select(col("source"), col("doc_id"), col("n_tok"),
        (sum(col("n_tok")).over(w) - col("n_tok")).as("tok_start"),
        sum(col("n_tok")).over(w).as("tok_end"))
      .where(col("n_tok") > 0)
    spans
      .select(col("source"), col("doc_id"), col("tok_start"),
        col("tok_end"),
        explode(sequence(expr(s"tok_start DIV $budget"),
          expr(s"(tok_end - 1) DIV $budget"))).as("window_id"))
      .groupBy(col("source"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("tok_end"), (col("window_id") + 1) * budget) -
          greatest(col("tok_start"), col("window_id") * budget))
          .as("win_tokens"),
        min(col("doc_id")).as("first_doc"))
  }

  /** PK2 oracle: the identical integer packing in DuckDB. */
  def contextPackingSql(budget: Int = CtxWindowTokens): String = s"""
    WITH t AS (
      SELECT source, doc_id,
        coalesce(len(${tokensSql(normSql("text"))}), 0)::BIGINT AS n_tok
      FROM documents),
    spans AS (
      -- DuckDB's windowed sum over BIGINT is HUGEINT: cast back so
      -- range()/arithmetic stay in the engines' common BIGINT plane
      SELECT source, doc_id, n_tok,
        (sum(n_tok) OVER w - n_tok)::BIGINT AS tok_start,
        (sum(n_tok) OVER w)::BIGINT AS tok_end
      FROM t WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
    spanned AS (
      SELECT source, doc_id, tok_start, tok_end,
        unnest(range(tok_start // $budget, (tok_end - 1) // $budget + 1))
          AS window_id
      FROM spans WHERE n_tok > 0)
    SELECT source, window_id, count(*)::BIGINT AS n_docs,
      sum(least(tok_end, (window_id + 1) * $budget) -
          greatest(tok_start, window_id * $budget))::BIGINT AS win_tokens,
      min(doc_id) AS first_doc
    FROM spanned GROUP BY 1, 2"""
}
