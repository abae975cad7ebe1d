package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Inventory-completeness meta-gate: rounds 10 and 11 both ended with
 * tail-of-round gate debt (queries registered on the driver surface with
 * no oracle, no spec, and no SURVEY row). This spec makes that state
 * un-committable: every key in [[SparkEntry.queries]] must
 *
 *  1. appear in a SURVEY.md §2 capability row (the coverage contract:
 *     "Every row must end up with a SparkEntry.queries entry"), and
 *  2. either carry a DuckDB oracle in [[SparkEntry.oracleSql]] or sit in
 *     a §2 row that DECLARES it rows-only (the word "rows-only" on the
 *     same table row), so a weaker gate is always a documented decision,
 *     never an accident.
 *
 * The reverse direction is also pinned: every oracle key must have a
 * query (an orphaned oracle is dead SQL the driver would flag).
 */
class InventorySpec extends AnyFunSuite {

  private lazy val section2: Seq[String] = {
    val text = scala.io.Source.fromFile("SURVEY.md")("UTF-8").mkString
    val start = text.indexOf("## §2 ")
    val end = text.indexOf("## §3 ")
    assert(start >= 0 && end > start, "SURVEY.md must have §2 and §3")
    text.substring(start, end).split('\n').toSeq
  }

  test("every driver query key has a SURVEY §2 row") {
    val missing = SparkEntry.queries.keys.toSeq.sorted.filterNot(k =>
      section2.exists(_.contains(k)))
    assert(missing.isEmpty,
      s"queries with no SURVEY §2 row (add the row or revert the " +
      s"query): ${missing.mkString(", ")}")
  }

  test("every driver query key is oracle-gated or declared rows-only " +
    "in its SURVEY row") {
    val oracles = SparkEntry.oracleSql.keySet
    val undeclared = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(oracles.contains)
      .filterNot(k => section2.exists(l =>
        l.contains(k) && l.contains("rows-only")))
    assert(undeclared.isEmpty,
      s"queries with neither an oracle nor a declared rows-only SURVEY " +
      s"row: ${undeclared.mkString(", ")}")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(SparkEntry.queries.contains)
    assert(orphans.isEmpty, s"orphaned oracles: ${orphans.mkString(", ")}")
  }
}
