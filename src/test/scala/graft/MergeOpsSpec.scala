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

  test("scd2 collapses runs, closes intervals, flags the current row") {
    // key 1: A A B A  → intervals A[10,30) B[30,40) A[40,∞)
    // key 2: X        → X[10,∞)
    val feed = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L), (2L, "X", 10L, 5L))
      .toDF("k", "status", "t", "id")
    val out = MergeOps.scd2(feed, "k", "status", "t", "id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
      .toSet
    assert(out === Set(
      (1L, "A", 10L, Some(30L), 0), (1L, "B", 30L, Some(40L), 0),
      (1L, "A", 40L, None, 1), (2L, "X", 10L, None, 1)))
  }

  test("scd2 breaks equal-timestamp ties deterministically by the tie column") {
    val feed = Seq((1L, "A", 10L, 2L), (1L, "B", 10L, 1L))
      .toDF("k", "status", "t", "id")
    // order is (t, id): B then A — so B closes at 10, A is current
    val out = MergeOps.scd2(feed, "k", "status", "t", "id")
      .collect().map(r => (r.getString(1), r.getInt(4))).toSet
    assert(out === Set(("B", 0), ("A", 1)))
  }

  test("scd2 drops null-status runs instead of opening intervals on them") {
    val feed = Seq((1L, null.asInstanceOf[String], 5L, 1L), (1L, "A", 10L, 2L))
      .toDF("k", "status", "t", "id")
    val out = MergeOps.scd2(feed, "k", "status", "t", "id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(4)))
    assert(out.toSeq === Seq(("A", 10L, 1)))
  }

  test("joinViewDelta: stored view + delta equals the full join, exactly once") {
    val oldL = Seq((1L, "a"), (2L, "b")).toDF("lk", "lv")
    val dL = Seq((2L, "b2"), (3L, "c")).toDF("lk", "lv")
    val oldR = Seq((1L, 10), (3L, 30)).toDF("rk", "rv")
    val dR = Seq((2L, 20), (3L, 31)).toDF("rk", "rv")
    val delta = MergeOps.joinViewDelta(oldL, dL, oldR, dR, "lk", "rk")
    val maintained = delta
      .unionByName(oldL.join(oldR, $"lk" === $"rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSeq
    val full = oldL.unionByName(dL)
      .join(oldR.unionByName(dR), $"lk" === $"rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSeq
    // multiset equality — IVM must neither drop nor duplicate a pair
    assert(maintained.groupBy(identity).view.mapValues(_.size).toMap ===
      full.groupBy(identity).view.mapValues(_.size).toMap)
    // and the delta never re-derives an old⋈old pair
    val oldPairs = oldL.join(oldR, $"lk" === $"rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    val deltaPairs = delta
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    assert(deltaPairs.intersect(oldPairs).isEmpty)
  }
}
