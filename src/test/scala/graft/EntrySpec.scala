package graft

/** Driver-contract smoke: entry() returns rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry flagship query returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has either oracle SQL or a documented approximate nature") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // only the approximate (sketch / sublinear-recall) queries lack oracles
    assert(noOracle === Set("q26_approx_distinct", "q28_knn_lsh", "q34_knn_ivf"))
  }

  test("oracle SQL keys all correspond to registered queries") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
