package graft

import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.text.DomainCuration

/** DOM1 semantics: the public-suffix-lite extraction rule on every
  * fixture subdomain depth, the planted adversaries (blocklisted +
  * oversized domains) behaving as designed, and the cap's accounting
  * invariants (the driver oracle hash-verifies the full relation). */
class DomainCurationSpec extends SparkSpec {

  private lazy val docs = Sources.table(spark, sf0001, "documents")
  private lazy val audit = DomainCuration.domainAudit(docs).collect()
    .map(r => r.getString(0) -> r).toMap

  test("registrable-domain rule: last two labels, or three over a two-level suffix") {
    import spark.implicits._
    val cases = Seq(
      "https://cdn.static.dom3.co.uk/p/5" -> "dom3.co.uk",
      "https://www.megafarm.com/p/1" -> "megafarm.com",
      "https://dom1.org/p/2" -> "dom1.org",
      "https://a.b.spamden.com.au/p/3" -> "spamden.com.au",
      // exactly three labels over a two-level suffix: all three ARE the
      // registrable domain
      "https://dom9.co.uk/p/4" -> "dom9.co.uk",
      "http://m.dom2.co.jp/p/6" -> "dom2.co.jp")
    val got = cases.map(_._1).toDF("url")
      .select(DomainCuration.registrableDomain(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("planted adversaries: blocklisted domains erased, giants capped, tail kept whole") {
    val total = audit.values.map(_.getLong(2)).sum
    val cap = total / DomainCuration.CapDenom
    val spam = audit.filter(_._1.startsWith("spamden."))
    assert(spam.nonEmpty)
    spam.values.foreach { r =>
      assert(r.getLong(4) === 1L, s"$r not blocklisted")
      assert(r.getLong(5) === 0L && r.getLong(6) === 0L,
        s"blocklisted domain kept mass: $r")
    }
    val farms = audit.filter(_._1.startsWith("megafarm."))
    assert(farms.nonEmpty)
    farms.values.foreach { r =>
      assert(r.getDouble(3) > 0.05, s"giant under the cap share: $r")
      assert(r.getLong(6) <= cap, s"capped domain over cap: $r")
      assert(r.getLong(5) < r.getLong(1), s"giant not actually capped: $r")
    }
    // the long tail (~37 domains × 3 TLDs, ≪ 5 % each) survives whole
    val tail = audit.filter(_._1.startsWith("dom"))
    assert(tail.size > 50)
    tail.values.foreach { r =>
      assert(r.getLong(4) === 0L)
      assert(r.getLong(5) === r.getLong(1) && r.getLong(6) === r.getLong(2),
        s"under-cap tail domain lost docs: $r")
    }
    // accounting closes: domain doc counts partition the corpus
    assert(audit.values.map(_.getLong(1)).sum === docs.count())
  }
}
