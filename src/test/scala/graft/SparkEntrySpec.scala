package graft

/** The driver contract itself: entry() must return rows on sf0.001 (the
  * driver's smoke check), and every query must have its oracle key
  * aligned — a rename on one side silently downgrades the gate to a
  * rows-only check.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query carries an oracle (no silent rows-only downgrades)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (driver falls back to rows-only): $missing")
  }
}
