package graft

/** Every registered query runs end-to-end at sf0.001 (the DuckDB oracle gate
  * at sf0.01 is the value check; this catches runtime regressions fast). */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("every registered query carries an oracle (full coverage invariant)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracle SQL: $rowsOnly")
    assert(SparkEntry.queries.size >= 163, "registry shrank — a query was dropped")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
