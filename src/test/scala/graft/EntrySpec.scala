package graft

/** Driver-contract smoke: entry() answers the flagship query on sf0.001 with
  * rows > 0, and every registered query has either an oracle or a documented
  * rows-only exemption.
  */
class EntrySpec extends SparkTestBase {

  test("entry() returns ranked rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length.toLong)) // dense ranks
  }

  test("oracle coverage: every query has an oracle unless rows-only by design") {
    val rowsOnly = Set("q_code_postings") // identifier splitting not SQL-expressible
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("every query runs non-empty on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
