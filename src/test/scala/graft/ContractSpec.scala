package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the gate compares `SparkEntry.queries` results
  * against `SparkEntry.oracleSql` by NAME, and the README documents the
  * surface — a key drifting out of either silently weakens the gate (a
  * query without an oracle degrades to rows-only; an oracle without a
  * query is dead weight; an undocumented id fails the self-serve
  * inventory check). No Spark session needed. */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same ids") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty[String],
      s"queries with no oracle (would degrade to rows-only): ${q -- o}")
    assert((o -- q) === Set.empty[String],
      s"oracles with no query (dead weight): ${o -- q}")
  }

  test("bench overrides and phase decompositions name real queries") {
    // a bench-only body for a query id that doesn't exist would silently
    // bench nothing (overrides are looked up per selected query)
    val q = SparkEntry.queries.keySet
    assert((SparkEntry.benchOverrides.keySet -- q) === Set.empty[String])
    assert((SparkEntry.benchPhases.keySet -- q) === Set.empty[String])
    // a query can't be both substituted and phase-decomposed — the
    // phased path wins in Bench and the override would be dead weight
    assert((SparkEntry.benchOverrides.keySet &
      SparkEntry.benchPhases.keySet) === Set.empty[String])
  }

  test("README documents every driver query id") {
    val readme = Files.readString(Paths.get("README.md"))
    val missing = SparkEntry.queries.keySet
      .filterNot(id => readme.contains(s"`$id`"))
    assert(missing === Set.empty[String],
      s"query ids missing from the README surface table: $missing")
    val count = SparkEntry.queries.size
    assert(readme.contains(s"($count queries"),
      s"README header count must say ($count queries ...)")
  }
}
