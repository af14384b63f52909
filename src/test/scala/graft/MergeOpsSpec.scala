package graft

import graft.ops.MergeOps

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win on matched keys, inserts land, untouched rows survive") {
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "price")
    val updates = Seq((2L, "b2", 21.0), (9L, "new", 90.0))
      .toDF("k", "name", "price")
    val out = MergeOps.upsert(existing, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out === Map(
      1L -> ("a", 10.0), 2L -> ("b2", 21.0), 3L -> ("c", 30.0),
      9L -> ("new", 90.0)))
  }

  test("upsert with duplicate update keys keeps every update row (caller dedups)") {
    val existing = Seq((1L, "a", 1.0)).toDF("k", "name", "price")
    val updates = Seq((1L, "x", 2.0), (1L, "y", 3.0)).toDF("k", "name", "price")
    val out = MergeOps.upsert(existing, updates, Seq("k"))
    assert(out.count() === 2) // both update rows, zero stale existing
    assert(out.filter($"name" === "a").count() === 0)
  }

  test("snapshotDiff classifies added/removed/changed and omits unchanged") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, null.asInstanceOf[String], 4.0))
      .toDF("k", "name", "price")
    val neu = Seq((1L, "a", 1.0), (2L, "b!", 2.0), (5L, "e", 5.0), (4L, null.asInstanceOf[String], 4.0))
      .toDF("k", "name", "price")
    val out = MergeOps.snapshotDiff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (omitted), 4 null-valued unchanged (null-safe compare)
    assert(out === Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }
}
