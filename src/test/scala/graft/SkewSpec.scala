package graft

import graft.ops.Skew
import org.apache.spark.sql.functions.col

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

  test("bloomPrunedJoin equals the plain join, null and unmatched keys dropped") {
    val fact = Seq(
      (java.lang.Long.valueOf(1L), "a"), (java.lang.Long.valueOf(1L), "b"),
      (java.lang.Long.valueOf(2L), "c"), (java.lang.Long.valueOf(9L), "d"),
      (null.asInstanceOf[java.lang.Long], "e")
    ).toDF("fk", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("dk", "name")
    val pruned = Skew.bloomPrunedJoin(fact, dim, "fk", "dk")
      .select("fk", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(pruned === plain)
    assert(pruned.length === 3) // key 9 and the null row never join
  }
}
