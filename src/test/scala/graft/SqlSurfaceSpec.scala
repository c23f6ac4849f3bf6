package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.reflect.ClassTag

/** SQL-surface parity: every query so far executes through the DataFrame
  * API, but the library's deployment contract for SQL-only users is
  * `GraftExtensions` (`spark.sql.extensions`). This spec runs a
  * representative sample across the tiers — a1 (KPI joins), t7 (corpus
  * stats), d3 (MinHash-LSH), n6 (SQ8 ANN), x8 (CUBE) — as `spark.sql`
  * TEXT on a session built through the extensions, and pins:
  *
  *  1. identical results to the DataFrame query on the same session;
  *  2. identical optimized-plan operator shape (node-name sequence) —
  *     the SQL entry path must not plan extra shuffles/joins;
  *  3. the SQL plan evaluates the same native codegen'd Expressions
  *     (`FloatVectorDot`, `Int8Quant`, `TokenRollHashes`,
  *     `HashedShingles`) — NOT an interpreted fallback; resolution goes
  *     through the injected function registry, which only the extensions
  *     provide.
  *
  * Multi-referenced relations are textually inlined (not CTEs) so the
  * SQL logical graph duplicates subtrees exactly like the DataFrame
  * self-joins do — Spark keeps multi-referenced CTEs as `WithCTE`, which
  * would make shapes incomparable while planning the same work.
  */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val ext: SparkSession = SqlSurfaceSpec.session

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Optimized-plan operator sequence with Project and
    * RepartitionByExpression nodes dropped: whether CollapseProject
    * inlines stacked projections is cost-guard-sensitive (alias reuse
    * of non-cheap expressions) and differed between otherwise identical
    * runs under the concurrent suite, and spreadSmallScan's repartition
    * — a pure layout hint that moves no semantics — leaves a pruning
    * Project over non-Project children (Union) on the DataFrame side
    * only. Both are free nodes the pin must not be sensitive to.
    * Joins, filters, windows, generates, aggregates, unions and scan
    * COUNTS stay strictly compared. */
  private def shapeOf(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case n => n.nodeName }
      .filterNot(n => n == "RepartitionByExpression" || n == "Project")

  private def usesNative[T](df: DataFrame)(implicit ct: ClassTag[T]): Boolean =
    df.queryExecution.optimizedPlan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case e if ct.runtimeClass.isInstance(e) => e
      })
    }.flatten.nonEmpty

  /** Core pin: same rows, same optimized shape. */
  private def assertParity(name: String, sqlText: String): DataFrame = {
    val api = SparkEntry.queries(name)(ext, sf0001)
    val viaSql = ext.sql(sqlText)
    assert(shapeOf(viaSql) === shapeOf(api),
      s"$name: SQL plan shape diverged from the DataFrame plan")
    assert(rowsOf(viaSql) === rowsOf(api), s"$name: SQL results diverged")
    viaSql
  }

  // -- reference-shaped inputs as SQL text (RefShape mirror) ----------------
  private val oSql =
    """SELECT o_orderkey AS order_id, o_custkey AS user_id,
      |  o_orderstatus AS status, CAST(o_orderdate AS STRING) AS created_at,
      |  o_totalprice AS total_price FROM orders""".stripMargin
  private val oiSql =
    """SELECT l_orderkey * 10 + l_linenumber AS id, l_orderkey AS order_id,
      |  l_partkey AS product_id,
      |  CASE WHEN l_returnflag = 'R' THEN 'returned'
      |       ELSE l_returnflag END AS status,
      |  CAST(l_shipdate AS STRING) AS created_at,
      |  l_extendedprice AS sale_price FROM lineitem""".stripMargin
  private val pSql =
    """SELECT p_partkey AS id, p_type AS category, p_retailprice AS cost,
      |  p_name AS name, p_brand AS brand FROM part""".stripMargin

  private val money = "DECIMAL(18,2)"

  test("a1 via spark.sql: same rows, same plan shape, broadcast join survives") {
    val viaSql = assertParity("a1_category_kpi", s"""
      WITH o AS ($oSql), oi AS ($oiSql), p AS ($pSql)
      SELECT /*+ BROADCAST(p) */ p.category AS category,
        CAST(sum(CAST(oi.sale_price AS $money)) AS DOUBLE) AS daily_revenue,
        CASE WHEN count(oi.sale_price) = 0 THEN CAST(NULL AS DOUBLE)
          ELSE CAST(sum(CAST(oi.sale_price AS $money)) AS DOUBLE)
               / count(oi.sale_price) END AS avg_order_value,
        CASE WHEN count(oi.id) = 0 THEN CAST(NULL AS DOUBLE)
          ELSE CAST(count(CASE WHEN oi.status = 'returned' THEN true END)
                    AS DOUBLE) / count(oi.id) END AS avg_return_rate
      FROM o JOIN oi ON o.order_id = oi.order_id
             JOIN p ON oi.product_id = p.id
      GROUP BY p.category""")
    val plan = viaSql.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("x8 via spark.sql: CUBE plans the same single-scan Expand") {
    val viaSql = assertParity("x8_cube_revenue", s"""
      WITH o AS ($oSql), oi AS ($oiSql), p AS ($pSql)
      SELECT /*+ BROADCAST(p) */
        substring(o.created_at, 1, 7) AS order_month,
        p.category AS category,
        CAST(sum(CAST(oi.sale_price AS $money)) AS DOUBLE) AS revenue,
        count(1) AS n_items, grouping_id() AS gid
      FROM o JOIN oi ON o.order_id = oi.order_id
             JOIN p ON oi.product_id = p.id
      GROUP BY CUBE(substring(o.created_at, 1, 7), p.category)""")
    assert(viaSql.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("x12 via spark.sql: the 6-way dim chain keeps every broadcast") {
    val viaSql = assertParity("x12_local_supplier_revenue", """
      SELECT n_name AS nation,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2))
             - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(1) AS n_items
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      GROUP BY n_name""")
    // assertParity executed the query, so the AQE string carries BOTH the
    // final and the initial plan — count joins in the final section only
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 5, plan.take(2000))
  }

  // tokens-of-normalized-text as SQL text (TextFunctions.norm/tokens mirror)
  private def toksSql(text: String): String = {
    val normed = s"lower(trim(regexp_replace($text, '[\\\\t-\\\\r ]+', ' ')))"
    s"""CASE WHEN $normed = '' THEN CAST(array() AS ARRAY<STRING>)
       |     ELSE split($normed, ' ', -1) END""".stripMargin
  }

  test("pk2 via spark.sql: one running-sum window feeds the span explode; no global sort") {
    import graft.text.TextAnalysis.CtxWindowTokens
    val b = CtxWindowTokens
    val cums = s"sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id)"
    val viaSql = assertParity("pk2_context_windows", s"""
      SELECT source, window_id, count(1) AS n_docs,
        sum(least(tok_end, (window_id + 1) * $b) -
            greatest(tok_start, window_id * $b)) AS win_tokens,
        min(doc_id) AS first_doc
      FROM (
        SELECT source, doc_id, tok_start, tok_end,
          explode(sequence(tok_start DIV $b, (tok_end - 1) DIV $b))
            AS window_id
        FROM (
          SELECT source, doc_id, n_tok,
            $cums - n_tok AS tok_start,
            $cums AS tok_end
          FROM (
            SELECT source, doc_id,
              CAST(size(${toksSql("text")}) AS BIGINT) AS n_tok
            FROM documents) t) spans
        WHERE n_tok > 0) spanned
      GROUP BY source, window_id""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // per-source streams: the cumsum partitions by source, never a
    // corpus-wide range sort
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(1500))
    assert("Window".r.findAllIn(plan).size >= 1, plan.take(1500))
  }

  test("t7 via spark.sql: corpus-stats join-back keeps the broadcast DF side") {
    // `tok` is consumed twice (df-count + join-back) — inlined twice, as
    // the DataFrame plan duplicates the subtree.
    val tokSql =
      s"SELECT doc_id, explode(${toksSql("text")}) AS token FROM documents"
    val viaSql = assertParity("t7_token_rarity", s"""
      SELECT /*+ BROADCAST(dfreq) */ doc_id,
        count(1) AS n_tokens,
        CAST(sum(df) AS DOUBLE) / count(1) AS mean_token_df,
        min(df) AS rarest_df
      FROM ($tokSql) tok
      JOIN (SELECT token, count(1) AS df
            FROM (SELECT DISTINCT doc_id, token FROM ($tokSql) t2)
            GROUP BY token) dfreq
        USING (token)
      GROUP BY doc_id""")
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(usesNative[org.apache.spark.sql.graft.StringRollHash](viaSql)
      === false) // t7 is pure built-ins on both paths
  }

  test("n6 via spark.sql: fvec_quant8/fvec_dot resolve to the native expressions") {
    // `live` (quantized + norm-filtered vectors) feeds both the query side
    // and the candidate side — inlined twice.
    val liveSql = s"""
      SELECT vec_id, codes, sqrt(fvec_dot(codes, codes)) AS n2
      FROM (SELECT vec_id, embedding, fvec_quant8(embedding) AS codes
            FROM embeddings) wc
      WHERE sqrt(fvec_dot(codes, codes)) > 0.0D"""
    val viaSql = assertParity("n6_ann_sq8", s"""
      SELECT query_id, rank, neighbor_id, approx_cosine
      FROM (
        SELECT query_id, neighbor_id, approx_cosine,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY approx_cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM (
          SELECT /*+ BROADCAST(q) */ q.query_id,
            c.vec_id AS neighbor_id,
            fvec_dot(q.qc, c.codes) / (q.qn * c.n2) AS approx_cosine
          FROM (SELECT vec_id AS query_id, codes AS qc, n2 AS qn
                FROM ($liveSql) lq WHERE vec_id < 5) q
          JOIN ($liveSql) c ON c.vec_id <> q.query_id) scored) ranked
      WHERE rank <= 5""")
    assert(usesNative[org.apache.spark.sql.graft.FloatVectorDot](viaSql))
    assert(usesNative[org.apache.spark.sql.graft.Int8Quant](viaSql))
  }

  test("d3 via spark.sql: token_hashes/hashed_shingles resolve native; banded self-join shape holds") {
    import graft.dedup.Dedup
    val nh = Dedup.NumHashes
    val r = nh / Dedup.NumBands
    val corpusSql = s"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + ${Dedup.TwinOffset}L AS doc_id,
        concat(text, ' spark') AS text FROM documents"""
    val minCols = (0 until nh).map { i =>
      val (a, b) = Dedup.perm(i)
      s"min(pmod(h * ${a}L + ${b}L, ${graft.functions.TextFunctions.HashP}L))"
    }.mkString(", ")
    val bandStructs = (0 until Dedup.NumBands).map { b =>
      val key = (b * r until b * r + r)
        .map(i => s"CAST(element_at(sig, ${i + 1}) AS STRING)")
        .mkString(", ")
      s"named_struct('band', $b, 'key', concat_ws('|', $key))"
    }.mkString(",\n          ")
    // shingle relation → signature array; `banded` feeds the self-join
    // twice — inlined twice like the DataFrame's banded.as("x")/as("y").
    val bandedSql = s"""
      SELECT doc_id, sig, bk.band AS band, bk.key AS key
      FROM (
        SELECT doc_id, sig, explode(array(
          $bandStructs)) AS bk
        FROM (
          SELECT doc_id, array($minCols) AS sig
          FROM (
            SELECT doc_id,
              explode(array_distinct(hashed_shingles(th))) AS h
            FROM (SELECT doc_id, token_hashes(${toksSql("text")}) AS th
                  FROM ($corpusSql) corpus) hashed) sh
          GROUP BY doc_id) sig) bx"""
    val est = s"""CAST(aggregate(zip_with(x.sig, y.sig,
        (a, b) -> CASE WHEN a = b THEN 1 ELSE 0 END),
        0, (acc, v) -> acc + v) AS DOUBLE) / ${nh.toDouble}D"""
    val viaSql = assertParity("d3_minhash_lsh", s"""
      SELECT doc_a, doc_b, est_jaccard FROM (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
          $est AS est_jaccard
        FROM ($bandedSql) x JOIN ($bandedSql) y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id) cand
      WHERE est_jaccard >= ${Dedup.MinhashEstThreshold}D""")
    assert(usesNative[org.apache.spark.sql.graft.TokenRollHashes](viaSql))
    assert(usesNative[org.apache.spark.sql.graft.HashedShingles](viaSql))
  }

  test("dq1 via spark.sql: the generated fused-agg + stack shape holds as SQL text") {
    // the rules-as-data operator's generated plan, hand-rendered as the
    // SQL a config-driven DQ harness would emit: ONE conditional
    // aggregate (uniqueness riding the same pass's exact NDV), stack()
    // to the rule grain, the pass flag on top
    val viaSql = assertParity("dq1_expectations", """
      SELECT rule_id, rule, n_violations, n_violations = 0L AS pass
      FROM (
        SELECT stack(6,
            1L, 'totalprice_not_null',  v_0,
            2L, 'totalprice_positive',  v_1,
            3L, 'status_in_domain',     v_2,
            4L, 'orderkey_unique',      v_3,
            5L, 'orderdate_in_range',   v_4,
            6L, 'priority_format',      v_5
          ) AS (rule_id, rule, n_violations)
        FROM (
          SELECT
            CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1L ELSE 0L END)
              AS BIGINT) AS v_0,
            CAST(sum(CASE WHEN o_totalprice IS NOT NULL
              AND o_totalprice <= 0.0D THEN 1L ELSE 0L END)
              AS BIGINT) AS v_1,
            CAST(sum(CASE WHEN NOT coalesce(
              o_orderstatus IN ('F', 'O', 'P'), false)
              THEN 1L ELSE 0L END) AS BIGINT) AS v_2,
            CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
              AS BIGINT) AS v_3,
            CAST(sum(CASE WHEN NOT coalesce(
              o_orderdate >= to_timestamp('1990-01-01 00:00:00') AND
              o_orderdate < to_timestamp('2030-01-01 00:00:00'), false)
              THEN 1L ELSE 0L END) AS BIGINT) AS v_4,
            CAST(sum(CASE WHEN NOT coalesce(
              o_orderpriority RLIKE '^[1-5]-', false)
              THEN 1L ELSE 0L END) AS BIGINT) AS v_5
          FROM orders) fused) stacked""")
    // the whole suite is ONE scan — a per-rule pass would show here
    // (assertParity executed the query, so the AQE string carries both
    // the final and initial plans — count in the final section only)
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(plan).size === 1, plan.take(2000))
  }

  test("t23 via spark.sql: the literal-vocab Viterbi apply holds as SQL text") {
    import graft.text.TextAnalysis
    // the SQL-only user's form of the t8-family trainer boundary: the
    // trained vocabulary arrives as a literal map (trn1's convention —
    // the driver loop itself is not one SQL statement), the Viterbi DP
    // is the same aggregate/filter/transform fold as the Column version
    val vocab = TextAnalysis.unigramVocab(
      graft.io.Sources.table(ext, sf0001, "documents"))
    val tpvStr = new java.math.BigDecimal(
      (vocab.map(_._2).sum + vocab.size).toDouble).toPlainString
    val mlit =
      s"map(${vocab.map { case (p, c) => s"'$p', ${c}L" }.mkString(", ")})"
    val p = TextAnalysis.UniMaxPieceLen
    val vit = s"""
      element_at(aggregate(sequence(1, length(word)),
        array(named_struct('score', CAST(1.0 AS DOUBLE), 's', 0,
          'seg', CAST(array() AS ARRAY<STRING>))),
        (acc, j) -> concat(acc, array(
          aggregate(
            filter(transform(sequence(1, least($p, j)), s ->
              named_struct(
                'score', element_at(acc, j - s + 1).score *
                  (CAST(try_element_at($mlit, substr(word, j - s + 1, s))
                      + 1L AS DOUBLE)
                    / CAST($tpvStr AS DOUBLE)),
                's', s,
                'seg', concat(element_at(acc, j - s + 1).seg,
                  array(substr(word, j - s + 1, s))))),
              c -> c.score IS NOT NULL),
            CAST(NULL AS STRUCT<score: DOUBLE, s: INT, seg: ARRAY<STRING>>),
            (b, c) -> CASE WHEN b IS NULL THEN c
              WHEN c.score > b.score OR
                (c.score = b.score AND c.s > b.s) THEN c
              ELSE b END)))),
        length(word) + 1).seg"""
    val viaSql = assertParity("t23_unigram_tokenize", s"""
      SELECT source, n_docs, n_words, n_uni_tokens,
        CAST(n_uni_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility
      FROM (
        SELECT /*+ BROADCAST(ws) */ source,
          count(DISTINCT doc_id) AS n_docs, count(1) AS n_words,
          sum(n_sub) AS n_uni_tokens
        FROM (SELECT doc_id, source, explode(${toksSql("text")}) AS word
              FROM documents) tok
        JOIN (SELECT word, CAST(size($vit) AS BIGINT) AS n_sub
              FROM (SELECT DISTINCT explode(${toksSql("text")}) AS word
                    FROM documents) w) ws
          USING (word)
        GROUP BY source) agg""")
    // vocabulary-sized side broadcasts; no window anywhere in the apply
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1000))
    assert(!plan.contains("Window"), "t23 must not plan a window")
  }

  test("trn1 via spark.sql: the literal-weight-map training loop runs as SQL text") {
    import graft.text.TextAnalysis._
    val b = PtronBuckets.toLong
    val clfArr = s"array(${ClfWeights.mkString("L, ")}L)"
    // feats: hashed tokens + the t12-distilled label — token_hashes is
    // the NATIVE TokenRollHashes expression, resolved via the extensions
    val featsSql = s"""
      SELECT th,
        CASE WHEN aggregate(th, 0L, (a, h) -> a + element_at($clfArr,
          CAST(pmod(h, ${ClfBuckets}L) AS INT) + 1)) > 0L
        THEN 1L ELSE -1L END AS y
      FROM (SELECT token_hashes(${toksSql("text")}) AS th
            FROM documents) hashed"""
    assert(usesNative[org.apache.spark.sql.graft.TokenRollHashes](
      ext.sql(s"SELECT * FROM ($featsSql)")))
    // the SQL-only user's loop: each round inlines the CURRENT weights
    // as a literal map in the round's mistake-aggregation SQL (exactly
    // the typedlit map the DataFrame operator builds), updates driver-
    // side with the identical truncating-division rule, repeats
    var w: Map[Long, Long] = (0L to b).map(_ -> 0L).toMap
    for (k <- 1 to PtronIters) {
      val wlit = s"map(${
        (0L to b).map(bk => s"${bk}L, ${w(bk)}L").mkString(", ")})"
      val deltas = ext.sql(s"""
        SELECT bucket, CAST(sum(y) AS BIGINT) AS delta,
          count(1) AS occ
        FROM (
          SELECT explode(concat(transform(th, h -> pmod(h, ${b}L)),
            array(${b}L))) AS bucket, y
          FROM ($featsSql) feats
          WHERE y * (aggregate(th, 0L,
              (a, h) -> a + element_at($wlit, pmod(h, ${b}L)))
            + element_at($wlit, ${b}L)) <= 0L) mistakes
        GROUP BY bucket""").collect()
      val m = deltas.find(_.getLong(0) == b).map(_.getLong(2))
        .getOrElse(0L)
      if (m > 0L) {
        val div = m * (1L << k)
        w = w ++ deltas.map { r =>
          val q = r.getLong(1) * PtronScale / div
          r.getLong(0) -> (w(r.getLong(0)) + q)
        }
      }
    }
    // the SQL loop trains the EXACT weights the DataFrame operator does
    val api = SparkEntry.queries("trn1_perceptron")(ext, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(api === w)
  }

  test("s6 via spark.sql: the integer race keeps its TakeOrderedAndProject reservoir") {
    import graft.text.TextAnalysis._
    import graft.functions.TextFunctions.HashP
    val viaSql = assertParity("s6_weighted_reservoir", s"""
      SELECT doc_id, weight, race_key FROM (
        SELECT doc_id, source, weight,
          min(pmod(pmod(doc_id, ${HashP}L) * ${RaceA}L + j * ${RaceB}L,
            ${HashP}L)) AS race_key
        FROM (
          SELECT doc_id, source, weight,
            explode(sequence(1L, weight)) AS j
          FROM (
            SELECT doc_id, source,
              1L + (n_tokens DIV $ReservoirUnit) AS weight
            FROM (
              SELECT doc_id, source,
                CAST(greatest(coalesce(size(${toksSql("text")}), 0), 0)
                AS BIGINT) AS n_tokens
              FROM documents) t) w) d
        GROUP BY doc_id, source, weight) keys
      ORDER BY race_key ASC, doc_id ASC LIMIT $ReservoirK""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the SQL path must keep the distributed-reservoir selection: each
    // partition retains <= k rows, never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(1500))
  }

  test("s7 via spark.sql: the stratified race keeps its WindowGroupLimit") {
    import graft.text.TextAnalysis._
    import graft.functions.TextFunctions.HashP
    val viaSql = assertParity("s7_stratified_reservoir", s"""
      SELECT source, rk, doc_id, weight, race_key FROM (
        SELECT source, doc_id, weight, race_key,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY race_key ASC, doc_id ASC) AS BIGINT) AS rk
        FROM (
          SELECT doc_id, source, weight,
            min(pmod(pmod(doc_id, ${HashP}L) * ${RaceA}L + j * ${RaceB}L,
              ${HashP}L)) AS race_key
          FROM (
            SELECT doc_id, source, weight,
              explode(sequence(1L, weight)) AS j
            FROM (
              SELECT doc_id, source,
                1L + (n_tokens DIV $ReservoirUnit) AS weight
              FROM (
                SELECT doc_id, source,
                  CAST(greatest(coalesce(size(${toksSql("text")}), 0), 0)
                  AS BIGINT) AS n_tokens
                FROM documents) t) w) d
          GROUP BY doc_id, source, weight) keys) ranked
      WHERE rk <= $StratumK""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the SQL path must keep the per-stratum pre-truncation: each
    // shuffle partition retains <= k rows per source BEFORE the sort —
    // never a full per-source sort, never a global one
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(1500))
  }

  test("e8 via spark.sql: the outer interval join stays an equi-join, never a nested loop") {
    val viaSql = assertParity("e8_attribution_outer", s"""
      WITH p AS (SELECT event_id AS purchase_id, user_id AS p_user,
          timestamp_seconds(unix_seconds(CAST(ts AS TIMESTAMP))) AS p_ts
        FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS click_id, user_id AS c_user,
          timestamp_seconds(unix_seconds(CAST(ts AS TIMESTAMP))) AS c_ts
        FROM events WHERE event_type = 'click')
      SELECT purchase_id, p_user AS user_id, click_id,
        unix_timestamp(p_ts) AS p_epoch, unix_timestamp(c_ts) AS c_epoch
      FROM p LEFT JOIN c ON p_user = c_user AND c_ts <= p_ts
        AND c_ts >= p_ts - INTERVAL 1800 SECONDS""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the user-key equality must drive the join (the interval bounds
    // ride as a residual) — a nested-loop/cartesian form would pay
    // |purchases|·|clicks| at any scale
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("g4 via spark.sql: K unrolled vote rounds with the shuffled-hash hint elect the same communities") {
    import graft.operators.LabelPropagation.LpaIters
    // the SQL-only user's form: the DataFrame loop's per-round
    // localCheckpoint is a lifecycle choice (lineage truncation), not a
    // semantic one, so plan SHAPES are incomparable by construction —
    // the pin is result identity plus the scale feature that closed the
    // ×100 heap wall: every vote round joins SHUFFLE_HASH on the
    // node-grain label side (SMJ's edge-grain sorts were the OOM)
    val rounds = (1 to LpaIters).map { k =>
      s"""l$k AS (
        SELECT src AS node, -(vmax.nl) AS label FROM (
          SELECT src, max(named_struct('cnt', cnt, 'nl', nl)) AS vmax
          FROM (
            SELECT /*+ SHUFFLE_HASH(p) */ e.src, -p.label AS nl,
              count(1) AS cnt
            FROM edges e JOIN l${k - 1} p ON e.dst = p.node
            GROUP BY e.src, p.label) v
          GROUP BY src) a)"""
    }.mkString(",\n      ")
    val viaSql = ext.sql(s"""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
      $rounds
      SELECT node AS product_id, label AS community FROM l$LpaIters""")
    val api = SparkEntry.queries("g4_lpa_communities")(ext, sf0001)
    assert(rowsOf(viaSql) === rowsOf(api),
      "g4 SQL-text communities diverged from the DataFrame path")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("ShuffledHashJoin".r.findAllIn(plan).size >= LpaIters,
      plan.take(2000))
  }

  test("x21 via spark.sql: both quantifiers stay ONE window; bounded top-100") {
    val viaSql = assertParity("x21_waiting_suppliers", s"""
      WITH o AS (SELECT o_orderkey, o_orderdate FROM orders
                 WHERE o_orderstatus = 'F'),
      l AS (SELECT l_orderkey, l_suppkey,
              l_shipdate > o_orderdate + INTERVAL 60 DAYS AS late
            FROM lineitem JOIN o ON l_orderkey = o_orderkey),
      q AS (SELECT l_suppkey, count(1) AS numwait FROM (
              SELECT l_suppkey, late,
                size(collect_set(l_suppkey)
                  OVER (PARTITION BY l_orderkey)) AS ns,
                size(collect_set(CASE WHEN late THEN l_suppkey END)
                  OVER (PARTITION BY l_orderkey)) AS nl
              FROM l) t
            WHERE late AND ns > 1 AND nl = 1
            GROUP BY l_suppkey)
      SELECT /*+ BROADCAST(sn) */ s_name, numwait
      FROM q JOIN (SELECT s_suppkey, s_name FROM supplier
                   JOIN nation ON s_nationkey = n_nationkey
                     AND n_regionkey = 0) sn
        ON l_suppkey = s_suppkey
      ORDER BY numwait DESC, s_name ASC LIMIT 100""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the Q21 rewrite's whole point: three correlated self-join passes
    // collapsed into one orderkey window + a bounded top-k
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("x22 via spark.sql: the correlated min rides the part window; dims broadcast") {
    val viaSql = assertParity("x22_mincost_supplier", s"""
      SELECT l_partkey AS partkey, p_brand AS brand, s_name, nation,
        CAST(cost AS DOUBLE) AS cost
      FROM (
        SELECT /*+ BROADCAST(sn), BROADCAST(pt) */
          ps.l_partkey, pt.p_brand, sn.s_name, sn.nation, ps.cost,
          min(ps.cost) OVER (PARTITION BY ps.l_partkey) AS min_cost
        FROM (SELECT l_partkey, l_suppkey,
                min(CAST(l_extendedprice AS $money)) AS cost
              FROM lineitem GROUP BY l_partkey, l_suppkey) ps
        JOIN (SELECT s_suppkey, s_name, n_name AS nation
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
                AND n_regionkey = 1) sn
          ON ps.l_suppkey = sn.s_suppkey
        JOIN (SELECT p_partkey, p_brand FROM part
              WHERE p_size <= 10 AND p_type = 'SMALL') pt
          ON ps.l_partkey = pt.p_partkey) t
      WHERE cost = min_cost""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(1500))
  }

  test("x23 via spark.sql: the zero-preserving double aggregate holds as SQL text") {
    assertParity("x23_order_count_histogram", """
      SELECT c_count, count(1) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                   WHERE o_orderpriority <> '1-URGENT') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey) per_cust
      GROUP BY c_count""")
    ()
  }

  test("x24 via spark.sql: the correlated half-sum rides the part window; the semi-join binds last") {
    val viaSql = assertParity("x24_dominant_supplier", s"""
      SELECT s_name, n_name AS nation
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 2
      LEFT SEMI JOIN (
        SELECT DISTINCT l_suppkey FROM (
          SELECT l_suppkey, qty,
            sum(qty) OVER (PARTITION BY l_partkey) AS part_total
          FROM (
            SELECT /*+ BROADCAST(pt) */ l_partkey, l_suppkey,
              sum(CAST(l_quantity AS $money)) AS qty
            FROM lineitem
            JOIN (SELECT p_partkey FROM part
                  WHERE p_name LIKE 'small%') pt
              ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey) ps) t
        WHERE qty * 2 > part_total) dom
      ON s_suppkey = dom.l_suppkey
      ORDER BY s_name ASC""")
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the part scope reaches the fact scan as a broadcast, and the
    // output sort runs on the post-semi-join supplier grain only
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("r4 via spark.sql: span_hashes resolves native; the integer window-min selection holds") {
    import graft.dedup.Dedup
    val corpusSql = s"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + ${Dedup.TwinOffset}L AS doc_id,
        array_join(slice(${toksSql("text")}, 1, 15), ' ') AS text
      FROM documents WHERE doc_id % 10 = 0"""
    // fp feeds the df cap AND both sides of the pair join — inlined
    // three times, as the DataFrame plan duplicates the subtree; the
    // double distinct ((doc,h,pos) then (doc,h)) mirrors the DataFrame's
    // winnowFingerprints → winnowPairs composition exactly
    val fpSql = s"""
      SELECT DISTINCT doc_id, h FROM (
        SELECT DISTINCT doc_id, sel DIV ${Dedup.WinnowEnc} AS h,
          ${Dedup.WinnowEnc - 1}L - pmod(sel, ${Dedup.WinnowEnc}L) AS pos
        FROM (
          SELECT doc_id,
            min(h * ${Dedup.WinnowEnc}L + (${Dedup.WinnowEnc - 1}L - pos))
              OVER fr AS sel,
            count(1) OVER fr AS nwin
          FROM (
            SELECT doc_id, CAST(pos0 + 1 AS BIGINT) AS pos, h FROM (
              SELECT doc_id,
                posexplode(span_hashes(token_hashes(${toksSql("text")}),
                  ${Dedup.SpanN})) AS (pos0, h)
              FROM ($corpusSql) corpus) px) sh
          WINDOW fr AS (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND ${Dedup.WinnowW - 1} FOLLOWING)) w
        WHERE nwin = ${Dedup.WinnowW}) fpd"""
    val prunedSql = s"""
      SELECT fp.doc_id, fp.h FROM ($fpSql) fp
      JOIN (SELECT h FROM ($fpSql) f2 GROUP BY h
            HAVING count(1) <= ${Dedup.WinnowDfCap}) rare
        ON fp.h = rare.h"""
    val viaSql = assertParity("r4_winnow_pairs", s"""
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        count(1) AS n_shared
      FROM ($prunedSql) a JOIN ($prunedSql) b
        ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id""")
    assert(usesNative[org.apache.spark.sql.graft.SpanHashes](viaSql))
    assert(usesNative[org.apache.spark.sql.graft.TokenRollHashes](viaSql))
  }

  test("r5 via spark.sql: one fingerprint groupBy elects keepers; no pair join, no window") {
    import graft.dedup.Dedup
    val p = Dedup.ParaTokens
    val enc = 1L << Dedup.ParaNoBits
    val corpusSql = s"""
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + ${Dedup.ParaOffset}L AS doc_id,
        array_join(concat(slice(t, 1, $p),
          reverse(slice(t, ${p + 1}, greatest(size(t) - $p, 0)))), ' ')
          AS text, source
      FROM (SELECT doc_id, ${toksSql("text")} AS t, source
            FROM documents) b0
      WHERE doc_id % 5 = 0"""
    val keyedSql = s"""
      SELECT source, fp, doc_id * ${enc}L + para_no AS k FROM (
        SELECT doc_id, source,
          posexplode(transform(sequence(0, (size(tk) - 1) DIV $p),
            b -> md5(CAST(array_join(slice(tk, b * $p + 1, $p), ' ')
              AS BINARY)))) AS (para_no, fp)
        FROM (SELECT doc_id, source, ${toksSql("text")} AS tk
              FROM ($corpusSql) c) tkd
        WHERE size(tk) > 0) px"""
    val viaSql = assertParity("r5_paragraph_dedup", s"""
      SELECT d.source, d.n_docs, coalesce(st.n_paras, 0L) AS n_paras,
        coalesce(st.dup_paras, 0L) AS dup_paras,
        CASE WHEN coalesce(st.n_paras, 0L) = 0 THEN CAST(NULL AS DOUBLE)
          ELSE CAST(coalesce(st.dup_paras, 0L) AS DOUBLE) /
            CAST(st.n_paras AS DOUBLE) END AS dup_para_rate
      FROM (SELECT source, count(1) AS n_docs FROM ($corpusSql) cc
            GROUP BY source) d
      LEFT JOIN (
        SELECT source, count(1) AS n_paras,
          sum(CASE WHEN k != keeper THEN 1L ELSE 0L END) AS dup_paras
        FROM ($keyedSql) ky
        JOIN (SELECT fp, min(k) AS keeper FROM ($keyedSql) k2 GROUP BY fp) kp
          ON ky.fp = kp.fp
        GROUP BY source) st ON st.source = d.source""")
    // the whole dedup is groupBy machinery: keeper election must carry
    // NO pair self-join and NO window — the d1-at-paragraph-grain claim
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "r5 must not plan a window")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "r5 keeper election degenerated into a pair join: " + plan.take(1000))
  }

  test("c5 via spark.sql: the positioned-hash island merge holds; the eval hash set broadcasts") {
    import graft.dedup.Dedup
    val n = 5
    val corpusSql = s"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + ${Dedup.TwinOffset}L AS doc_id,
        concat(text, ' spark') AS text FROM documents"""
    def posSql(pred: String) = s"""
      SELECT doc_id, CAST(pos0 + 1 AS BIGINT) AS pos, h FROM (
        SELECT doc_id,
          posexplode(span_hashes(token_hashes(${toksSql("text")}), $n))
            AS (pos0, h)
        FROM ($corpusSql) corpus WHERE $pred) px"""
    val viaSql = assertParity("c5_contamination_spans", s"""
      SELECT doc_id, min(pos) AS span_start,
        max(pos) + ${n - 1}L AS span_end, count(1) AS n_grams
      FROM (
        SELECT doc_id, pos,
          sum(news) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_no
        FROM (
          SELECT doc_id, pos,
            CASE WHEN gap IS NULL OR gap > $n THEN 1L ELSE 0L END AS news
          FROM (
            SELECT /*+ BROADCAST(e) */ t.doc_id, t.pos,
              t.pos - lag(t.pos, 1) OVER (PARTITION BY t.doc_id
                ORDER BY t.pos) AS gap
            FROM (${posSql("pmod(doc_id, 97) <> 0")}) t
            JOIN (SELECT DISTINCT h
                  FROM (${posSql("pmod(doc_id, 97) = 0")}) ev) e
              ON t.h = e.h) g) ns) sp
      GROUP BY doc_id, span_no""")
    assert(usesNative[org.apache.spark.sql.graft.SpanHashes](viaSql))
    assert(usesNative[org.apache.spark.sql.graft.TokenRollHashes](viaSql))
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  // -- mm3/mm3x shared SQL text (the hex-grain perceptual pipeline) --------
  // the synthesized media corpus at the hex grain (mediaCorpus ∘
  // mediaHex, mirrored op for op), then the +8-mod-16 twin arm
  private def mm3CorpusSql: String = {
    import graft.multimodal.Multimodal._
    val mediaSql = s"""
      SELECT doc_id,
        lower(hex(substr(to_binary(repeat(md5(CAST(text AS BINARY)), 8),
          'hex'), 1, CAST(pmod(doc_id, 97) + 32 AS INT)))) AS ph
      FROM documents"""
    s"""
      SELECT doc_id, ph FROM ($mediaSql) m0
      UNION ALL
      SELECT doc_id + $MediaTwinOffset AS doc_id,
        concat(substr('0123456789abcdef',
          CAST(pmod(CAST(conv(substring(ph, 1, 1), 16, 10) AS BIGINT)
            + 8, 16) + 1 AS INT), 1),
          substr(ph, 2, length(ph))) AS ph
      FROM ($mediaSql) m1 WHERE pmod(doc_id, 10) = 0"""
  }

  /** The banded frame-signature relation as SQL text at either width
    * (`sigFold` = the per-frame fold over `fh`, `bandMod` = half-key
    * modulus). */
  private def mm3BandedSql(sigFold: String, bandMod: Long): String = {
    import graft.multimodal.Multimodal._
    val fhx = 2 * FrameSize
    s"""
      SELECT doc_id, frame_no, sig, bk.band AS band, bk.key AS key
      FROM (
        SELECT doc_id, frame_no, sig, explode(array(
          named_struct('band', 0L, 'key', sig DIV $bandMod),
          named_struct('band', 1L, 'key', pmod(sig, $bandMod)))) AS bk
        FROM (
          SELECT doc_id, frame_no, $sigFold AS sig
          FROM (
            SELECT doc_id, frame_no,
              substr(ph, CAST(frame_no * $fhx + 1 AS INT), $fhx) AS fh
            FROM (
              SELECT doc_id, ph, explode(
                CASE WHEN CAST(length(ph) AS BIGINT) DIV $fhx = 0
                  THEN CAST(array() AS ARRAY<BIGINT>)
                  ELSE sequence(0L, CAST(length(ph) AS BIGINT)
                    DIV $fhx - 1) END) AS frame_no
              FROM ($mm3CorpusSql) media) fx) sh) sg) bx"""
  }

  private def mm3PairsSql(bandedSql: String): String = {
    import graft.multimodal.Multimodal._
    s"""
      SELECT doc_a, doc_b, count(1) AS n_frame_pairs,
        min(hamming) AS min_hamming
      FROM (
        SELECT DISTINCT x.doc_id AS doc_a, x.frame_no AS frame_a,
          y.doc_id AS doc_b, y.frame_no AS frame_b,
          CAST(bit_count(x.sig ^ y.sig) AS BIGINT) AS hamming
        FROM ($bandedSql) x JOIN ($bandedSql) y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        WHERE CAST(bit_count(x.sig ^ y.sig) AS BIGINT) <= $Mm3MaxHamming)
      GROUP BY doc_a, doc_b"""
  }

  test("mm3 via spark.sql: the hex-grain perceptual pipeline holds as SQL text") {
    import graft.multimodal.Multimodal._
    val sigFold = s"""aggregate(sequence(1, $SigBits), 0L, (acc, j) ->
              acc * 2 + CASE WHEN substr(fh, CAST(j AS INT), 1) >= '8'
                THEN 1L ELSE 0L END)"""
    val viaSql = assertParity("mm3_frame_neardup",
      mm3PairsSql(mm3BandedSql(sigFold, Mm3BandMod)))
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // candidates meet on the banded equi-join — never a nested loop
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("mm3x via spark.sql: the 60-bit default width holds as SQL text") {
    import graft.multimodal.Multimodal._
    // the wide fold: top TWO bits per nibble (value DIV 4) over the
    // first 30 digits, base-4 MSB-first — conv + shiftright, exactly
    // the DataFrame expressions
    val sigFold = s"""aggregate(sequence(1, $SigNibblesWide), 0L,
              (acc, j) -> acc * 4 + shiftright(CAST(conv(
                substr(fh, CAST(j AS INT), 1), 16, 10) AS BIGINT), 2))"""
    val viaSql = assertParity("mm3x_frame_neardup60",
      mm3PairsSql(mm3BandedSql(sigFold, 1L << (SigBitsWide / 2))))
    val plan = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("cdc2 via spark.sql: the signed maintenance fold and null-safe key join hold as SQL text") {
    // the incremental-maintenance consumer as the SQL a warehouse job
    // would ship: the cdf1 feed inlined, the signed churn aggregate,
    // and the NULL-SAFE (<=>) group-key full outer against the base
    val snapA = """SELECT o_orderkey AS order_id,
        o_orderstatus AS status, o_totalprice AS total_price
      FROM orders WHERE o_orderkey % 5 <> 4"""
    val snapB = """SELECT o_orderkey AS order_id, o_orderstatus AS status,
        CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0D
             ELSE o_totalprice END AS total_price
      FROM orders WHERE o_orderkey % 7 <> 2"""
    val feed = s"""
      SELECT b.order_id, b.status, b.total_price,
        'insert' AS change_type
      FROM ($snapB) b LEFT ANTI JOIN ($snapA) a USING (order_id)
      UNION ALL
      SELECT a.order_id, a.status, a.total_price,
        'delete' AS change_type
      FROM ($snapA) a LEFT ANTI JOIN ($snapB) b USING (order_id)
      UNION ALL
      SELECT a.order_id, a.status, a.total_price,
        'update_preimage' AS change_type
      FROM ($snapA) a JOIN ($snapB) b USING (order_id)
      WHERE NOT (a.status <=> b.status)
         OR NOT (a.total_price <=> b.total_price)
      UNION ALL
      SELECT b.order_id, b.status, b.total_price,
        'update_postimage' AS change_type
      FROM ($snapA) a JOIN ($snapB) b USING (order_id)
      WHERE NOT (a.status <=> b.status)
         OR NOT (a.total_price <=> b.total_price)"""
    val viaSql = ext.sql(s"""
      WITH base AS (
        SELECT status, count(1) AS n_orders,
          count(total_price) AS n_vals,
          sum(CAST(total_price AS DECIMAL(18,2))) AS sum_total
        FROM ($snapA) GROUP BY status),
      delta AS (
        SELECT status,
          sum(sg) AS d_n,
          sum(CASE WHEN m IS NOT NULL THEN sg ELSE 0L END) AS d_vals,
          sum(sg * m) AS d_sum
        FROM (
          SELECT status,
            CASE WHEN change_type IN ('insert', 'update_postimage')
              THEN 1L ELSE -1L END AS sg,
            CAST(total_price AS DECIMAL(18,2)) AS m
          FROM ($feed) f) signed
        GROUP BY status)
      SELECT status, n_orders, n_vals,
        CASE WHEN n_vals = 0L THEN CAST(NULL AS DOUBLE)
             ELSE CAST(sum_dec AS DOUBLE) END AS sum_total
      FROM (
        SELECT coalesce(b.status, d.status) AS status,
          coalesce(b.n_orders, 0L) + coalesce(d.d_n, 0L) AS n_orders,
          coalesce(b.n_vals, 0L) + coalesce(d.d_vals, 0L) AS n_vals,
          coalesce(b.sum_total, CAST(0 AS DECIMAL(18,2))) +
            coalesce(d.d_sum, CAST(0 AS DECIMAL(18,2))) AS sum_dec
        FROM base b FULL OUTER JOIN delta d ON b.status <=> d.status)
      WHERE n_orders > 0L""")
    val api = SparkEntry.queries("cdc2_incremental_agg")(ext, sf0001)
    assert(rowsOf(viaSql) === rowsOf(api),
      "cdc2 SQL-text results diverged from the DataFrame path")
    // and both reproduce the direct aggregate of snapshot B — the
    // invariant, readable straight off the SQL text
    val direct = ext.sql(s"""
      SELECT status, count(1) AS n_orders, count(total_price) AS n_vals,
        CAST(sum(CAST(total_price AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_total
      FROM ($snapB) GROUP BY status""")
    assert(rowsOf(viaSql) === rowsOf(direct))
  }

  test("dom1 via spark.sql: suffix rule + domain-partitioned cap window; no global sort") {
    import graft.text.DomainCuration
    val urlSql = s"""
      SELECT doc_id,
        'https://' ||
        CASE WHEN doc_id % 5 = 0 THEN ''
             WHEN doc_id % 5 = 1 THEN 'www.'
             WHEN doc_id % 5 = 2 THEN 'cdn.static.'
             WHEN doc_id % 5 = 3 THEN 'm.'
             ELSE 'a.b.' END ||
        CASE WHEN doc_id % 89 = 0 THEN 'spamden'
             WHEN doc_id % 97 < 40 THEN 'megafarm'
             ELSE 'dom' || CAST(doc_id % 37 AS STRING) END ||
        '.' ||
        CASE WHEN doc_id % 3 = 0 THEN 'co.uk'
             WHEN doc_id % 3 = 1 THEN 'com'
             ELSE 'org' END ||
        '/p/' || CAST(doc_id AS STRING) AS url,
        CAST(coalesce(size(${toksSql("text")}), 0) AS BIGINT) AS n_tokens
      FROM documents"""
    val perDocSql = s"""
      SELECT doc_id, n_tokens,
        CASE WHEN size(labels) >= 3 AND array_join(slice(labels, -2, 2), '.')
              IN ('co.uk', 'com.au', 'co.jp')
          THEN array_join(slice(labels, -3, 3), '.')
          ELSE array_join(slice(labels, -2, 2), '.') END AS domain
      FROM (SELECT doc_id, n_tokens,
              split(regexp_extract(url, '^https?://([^/]+)', 1), '\\\\.')
                AS labels
            FROM ($urlSql) u) l"""
    // the corpus total is a driver-side scalar in the API plan (the
    // bounded-collect convention), so the SQL twin interpolates the
    // same number as a literal — the t23 literal-vocab discipline
    val total = ext.sql(s"SELECT sum(n_tokens) AS t FROM ($urlSql) t")
      .head().getLong(0)
    val cap = total / DomainCuration.CapDenom
    val blockSql = "('spamden.com', 'spamden.org', 'spamden.co.uk')"
    val viaSql = assertParity("dom1_domain_audit", s"""
      SELECT domain, count(1) AS n_docs, sum(n_tokens) AS n_tokens,
        CAST(sum(n_tokens) AS DOUBLE) / CAST(${total}L AS DOUBLE)
          AS token_share,
        max(CASE WHEN domain IN $blockSql THEN 1L ELSE 0L END)
          AS blocklisted,
        sum(CASE WHEN kept THEN 1L ELSE 0L END) AS kept_docs,
        sum(CASE WHEN kept THEN n_tokens ELSE 0L END) AS kept_tokens
      FROM (
        SELECT domain, n_tokens,
          (NOT domain IN $blockSql) AND
            sum(n_tokens) OVER (PARTITION BY domain ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= ${cap}L
            AS kept
        FROM ($perDocSql) p) f
      GROUP BY domain""")
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "the cap must run in a window")
    assert(!plan.contains("Exchange rangepartitioning"),
      "the cap window partitions by domain — never a global sort")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("extensions registry: functions resolve ONLY through GraftExtensions") {
    // the base test session never injected them — proves resolution rides
    // the extension, not some global registry side effect
    val err = intercept[Exception] {
      spark.sql("SELECT fvec_dot(array(1.0F), array(1.0F))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("fvec_dot"))
    assert(ext.sql("SELECT fvec_dot(array(3.0F), array(4.0F)) AS d")
      .head().getDouble(0) === 12.0)
    assert(ext.sql("SELECT roll_hash('ab') AS h").head().getLong(0) ===
      (('a'.toLong * 31 + 'b') % graft.functions.TextFunctions.HashP))
    assert(ext.sql(
      "SELECT span_hashes(array(1L, 2L, 3L), 2) AS sh").head()
      .getSeq[Long](0).length === 2)
  }
}

object SqlSurfaceSpec {
  /** One extensions-built session for the suite, sharing TestSpark's
    * SparkContext. Built under the TestSpark lock with active/default
    * cleared so `getOrCreate` constructs a NEW session through
    * `GraftExtensions` (the deployment path), then both globals are
    * restored so concurrent suites keep seeing the base session. */
  lazy val session: SparkSession = TestSpark.synchronized {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions()(_))
        .getOrCreate()
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  } match { case s =>
    Seq("orders", "lineitem", "part", "documents", "embeddings",
      "customer", "supplier", "nation", "region", "events").foreach { t =>
      s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW $t USING parquet
                OPTIONS (path '/root/testdata/sf0.001/$t.parquet')""")
    }
    s
  }
}
