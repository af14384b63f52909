package graft

/** Driver-contract smoke: entry() returns rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry flagship query returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every registered query is oracle-checked") {
    // since round 2 the approximate queries ship self-check gates
    // (violations vs the exact operator, oracle: empty set), so the
    // registry has NO unchecked entries
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("oracle SQL keys all correspond to registered queries") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
