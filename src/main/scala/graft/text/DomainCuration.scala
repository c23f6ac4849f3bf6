package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DOM1 (E194): URL/REGISTRABLE-DOMAIN-grain curation — the CCNet/
  * RefinedWeb/FineWeb filtering grain the corpus tier lacked: web-scale
  * curation does not filter at the coarse `source` label, it audits,
  * blocklists, and caps at the REGISTRABLE DOMAIN (example.co.uk, not
  * cdn.static.example.co.uk and not .co.uk), because that is the unit a
  * crawl's mass concentrates in (content farms, mirrors, boilerplate
  * hosts). One row per domain: mass audit (docs, tokens, corpus share),
  * blocklist verdict, and the survivor set under a per-domain token cap
  * — s7's cap-the-giant philosophy at domain grain.
  *
  * The pieces, each deterministic and exactly mirrored in DuckDB:
  *
  *  - **URL fixture** ([[withUrl]]): the documents table carries no URL,
  *    so one is derived deterministically from `doc_id` (the repo's
  *    fixture convention — the planted-twin analogue for the web tier):
  *    a rotating subdomain prefix (none/www/cdn.static/m/a.b — depth
  *    must vary or the extraction rule is untested), a base domain with
  *    two planted adversaries — `spamden` (doc_id % 89 = 0, the
  *    blocklist target) and `megafarm` (~40 % of all docs, the
  *    oversized giant every crawl has) — over a 37-domain long tail,
  *    and a rotating TLD including the TWO-LEVEL suffix `co.uk` (so
  *    "last two labels" is measurably wrong and the suffix rule earns
  *    its keep).
  *  - **Public-suffix-lite rule** ([[registrableDomain]]): registrable
  *    domain = last two host labels, or last three when the last two
  *    form a known two-level public suffix ([[TwoLevelSuffixes]] — a
  *    documented inline stand-in for the Mozilla Public Suffix List;
  *    the real list is data, not code, and swaps in as a broadcast
  *    lookup without touching the plan).
  *  - **Blocklist** ([[Blocklist]]): domains erased outright (kept
  *    mass 0) — the manual-denylist rung every production curation
  *    stack runs before any statistical filter.
  *  - **Per-domain token cap**: cap = corpus tokens DIV [[CapDenom]]
  *    (a RELATIVE 5 % share — scale-free, so the giant is over it at
  *    every SF; an absolute cap would stop biting under fan-out).
  *    Within a capped domain docs survive in doc_id order while the
  *    running token prefix-sum stays ≤ cap — deterministic, and the
  *    same doc_id-orderd greedy the pk2/s7 primitives use.
  *
  * Scale shape: token counting is one narrow scan (no explode — the
  * count is `size(tokens)`); the audit is ONE domain-keyed aggregate;
  * the cap is ONE window partitioned BY DOMAIN (never a global sort)
  * over the doc-grain (domain, doc_id, n_tokens) relation, then a
  * domain-keyed survivor rollup joined back to the audit — two
  * shuffles on the domain key end to end, both map-side combined. The
  * corpus total is a scalar aggregate broadcast into the plan. Skewed
  * domains (megafarm IS the skew) concentrate one window partition;
  * at 100 TB the doc-grain rows are (domain, id, count) triples —
  * lineitem-width, not payload-width — so the skewed partition holds
  * integers, and AQE's skew split handles the rollup side. */
object DomainCuration {

  /** Two-level public suffixes the lite rule knows — the inline
    * stand-in for the Public Suffix List (documented boundary). */
  val TwoLevelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")

  /** Registrable domains erased outright. */
  val Blocklist: Seq[String] = Seq("spamden.com", "spamden.org",
    "spamden.co.uk")

  /** cap = corpus tokens DIV CapDenom — the 5 % per-domain share cap. */
  val CapDenom = 20L

  /** Deterministic per-doc URL (fixture convention; see scaladoc). */
  def withUrl(docs: DataFrame): DataFrame = {
    val sub = when(pmod(col("doc_id"), lit(5)) === 0, "")
      .when(pmod(col("doc_id"), lit(5)) === 1, "www.")
      .when(pmod(col("doc_id"), lit(5)) === 2, "cdn.static.")
      .when(pmod(col("doc_id"), lit(5)) === 3, "m.")
      .otherwise("a.b.")
    val base = when(pmod(col("doc_id"), lit(89)) === 0, "spamden")
      .when(pmod(col("doc_id"), lit(97)) < 40, "megafarm")
      .otherwise(concat(lit("dom"),
        pmod(col("doc_id"), lit(37)).cast("string")))
    val tld = when(pmod(col("doc_id"), lit(3)) === 0, "co.uk")
      .when(pmod(col("doc_id"), lit(3)) === 1, "com")
      .otherwise("org")
    docs.withColumn("url",
      concat(lit("https://"), sub, base, lit("."), tld,
        lit("/p/"), col("doc_id").cast("string")))
  }

  /** Public-suffix-lite registrable-domain extraction from a URL. */
  def registrableDomain(url: Column): Column = {
    val host = regexp_extract(url, "^https?://([^/]+)", 1)
    val labels = split(host, "\\.")
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val lastThree = array_join(slice(labels, -3, 3), ".")
    when(size(labels) >= 3 && lastTwo.isInCollection(TwoLevelSuffixes),
      lastThree).otherwise(lastTwo)
  }

  /** The audit: one row per registrable domain — (domain, n_docs,
    * n_tokens, token_share, blocklisted, kept_docs, kept_tokens). */
  def domainAudit(docs: DataFrame): DataFrame = {
    val perDoc = withUrl(docs).select(
      registrableDomain(col("url")).as("domain"),
      col("doc_id"),
      coalesce(size(TextFunctions.tokens(TextFunctions.norm(col("text")))),
        lit(0)).cast("long").as("n_tokens"))
    // scalar corpus total → the relative cap (broadcast literal join:
    // one row, never a shuffle). first() on the 1-row agg is the n1
    // bounded-collect convention.
    val total = perDoc.agg(sum(col("n_tokens"))).head().getLong(0)
    val cap = total / CapDenom
    val blocked = col("domain").isInCollection(Blocklist)
    // doc_id-ordered greedy prefix sum WITHIN each domain — the cap's
    // deterministic survivor rule; window partitions by domain (never a
    // global sort)
    val running = sum(col("n_tokens")).over(
      Window.partitionBy(col("domain")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val flagged = perDoc.select(col("domain"), col("n_tokens"),
      (!blocked && running <= cap).as("kept"))
    flagged.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (sum(col("n_tokens")).cast("double") / lit(total.toDouble))
          .as("token_share"),
        // 0/1 BIGINT, not boolean — the driver-compare surface's
        // established column-type set (constant per domain by
        // construction: the flag derives from the group key)
        max(when(blocked, 1L).otherwise(0L)).as("blocklisted"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
  }

  /** DuckDB oracle: identical URL synthesis, suffix rule, cap
    * arithmetic, and greedy window. */
  def domainAuditSql: String = {
    val twoLevel = TwoLevelSuffixes.map(s => s"'$s'").mkString("[", ", ", "]")
    val blocklist = Blocklist.map(s => s"'$s'").mkString("[", ", ", "]")
    val nTokens = "greatest(coalesce(len(" +
      TextFunctions.tokensSql(TextFunctions.normSql("text")) + "), 0), 0)"
    s"""
    WITH urls AS (
      SELECT doc_id,
        'https://' ||
        CASE WHEN doc_id % 5 = 0 THEN ''
             WHEN doc_id % 5 = 1 THEN 'www.'
             WHEN doc_id % 5 = 2 THEN 'cdn.static.'
             WHEN doc_id % 5 = 3 THEN 'm.'
             ELSE 'a.b.' END ||
        CASE WHEN doc_id % 89 = 0 THEN 'spamden'
             WHEN doc_id % 97 < 40 THEN 'megafarm'
             ELSE 'dom' || (doc_id % 37) END ||
        '.' ||
        CASE WHEN doc_id % 3 = 0 THEN 'co.uk'
             WHEN doc_id % 3 = 1 THEN 'com'
             ELSE 'org' END ||
        '/p/' || doc_id AS url,
        $nTokens::BIGINT AS n_tokens
      FROM documents),
    perdoc AS (
      SELECT doc_id, n_tokens,
        CASE WHEN len(labels) >= 3 AND list_contains($twoLevel,
            array_to_string(labels[-2:], '.'))
          THEN array_to_string(labels[-3:], '.')
          ELSE array_to_string(labels[-2:], '.') END AS domain
      FROM (
        SELECT doc_id, n_tokens,
          string_split(regexp_extract(url, '^https?://([^/]+)', 1),
            '.') AS labels
        FROM urls)),
    tot AS (SELECT sum(n_tokens) AS total FROM perdoc),
    flagged AS (
      SELECT domain, n_tokens,
        list_contains($blocklist, domain) AS blocked,
        (NOT list_contains($blocklist, domain)) AND
          sum(n_tokens) OVER (PARTITION BY domain ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          <= (SELECT total // $CapDenom FROM tot) AS kept
      FROM perdoc)
    SELECT domain, count(*)::BIGINT AS n_docs,
      sum(n_tokens)::BIGINT AS n_tokens,
      sum(n_tokens)::DOUBLE / (SELECT total::DOUBLE FROM tot)
        AS token_share,
      max(CASE WHEN blocked THEN 1 ELSE 0 END)::BIGINT AS blocklisted,
      sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS kept_docs,
      sum(CASE WHEN kept THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens
    FROM flagged
    GROUP BY 1"""
  }
}
