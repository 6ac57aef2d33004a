package graft

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySpec extends SparkSpecBase {
  test("entry flagship query returns rows") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
    df.columns should contain allOf ("n_name", "revenue_c", "n_orders")
  }

  test("every declared oracle key has a query") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe
      empty
  }
}
