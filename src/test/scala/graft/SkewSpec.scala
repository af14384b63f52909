package graft

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals plain sum, spread over salt buckets") {
    // one hot key (90% of rows) + long tail; CONSTANT hot value — the
    // salt must not be value-derived or the hot key stays one bucket
    val rows = (1 to 2000).map(i =>
      if (i % 10 == 0) (s"k${i % 7}", i.toLong) else ("hot", 1L))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").sum("v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain join for a skewed fact side") {
    val fact = ((1 to 500).map(_ => ("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
      .toDF("key", "v")
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B")).toDF("key", "name")
    val salted = Skew.saltedJoin(fact, dim, "key")
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = fact.join(dim, "key")
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("H") === 500L)
  }
}
