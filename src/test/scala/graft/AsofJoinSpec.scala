package graft

import java.sql.Timestamp

import graft.ops.Relational

/** Semantics of the composed interval operators: the as-of join
  * (union + running window — latest right time ≤ left time per key,
  * inclusive on equal timestamps, null when nothing precedes) and the
  * binned range join (exact window counts, boundary in/exclusion).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest preceding right row, inclusive of equality") {
    // key 1: orders at 10:00 and 12:00; events at 09:00 (none), 10:00
    // (equal → inclusive), 11:30 (→10:00), 13:00 (→12:00)
    val orders = Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
      (51L, ts("2024-01-05 00:00:00"))) // key 1 again via % 50 (51 % 50 = 1)
      .toDF("o_custkey", "o_orderdate")
    val events = Seq(
      (100L, 1L, ts("2024-01-01 09:00:00")),
      (101L, 1L, ts("2024-01-01 10:00:00")),
      (102L, 1L, ts("2024-01-01 11:30:00")),
      (103L, 1L, ts("2024-01-01 13:00:00")),
      (104L, 1L, ts("2024-02-01 00:00:00")), // after the % 50 merged order
      (105L, 2L, ts("2024-01-01 09:00:00"))) // key with no orders at all
      .toDF("event_id", "user_id", "ts")
    val out = Relational.eventOrderAsof(events, orders).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(100L) === None)
    assert(out(101L) === Some("2024-01-01"))
    assert(out(102L) === Some("2024-01-01"))
    assert(out(103L) === Some("2024-01-01"))
    assert(out(104L) === Some("2024-01-05")) // custkey 51 folded into key 1
    assert(out(105L) === None)
  }

  test("native as-of operator matches the planted semantics incl. no-match and null time") {
    graft.plans.AsOf // touch
    val right = Seq(
      (1L, Some(1000L), "r-a"),
      (1L, Some(3000L), "r-b"),
      (2L, Some(500L), "r-c"),
      (3L, None: Option[Long], "r-null")) // null time: matches nothing
      .toDF("key", "t", "tag")
    val left = Seq(
      (100L, 1L, Some(999L)),   // before everything → null
      (101L, 1L, Some(1000L)),  // equality is inclusive → r-a
      (102L, 1L, Some(2999L)),  // → r-a
      (103L, 1L, Some(3000L)),  // → r-b
      (104L, 2L, Some(9999L)),  // → r-c
      (105L, 3L, Some(9999L)),  // only a null-time right row → null
      (106L, 4L, Some(1L)),     // key with no right rows → null
      (107L, 1L, None: Option[Long])) // null left time → null
      .toDF("event_id", "key", "t")
    val out = graft.plans.AsOf.join(left, right, "key", "t",
        Seq("tag" -> "asof_tag")).collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("asof_tag")))
      .toMap
    assert(out === Map(
      100L -> None, 101L -> Some("r-a"), 102L -> Some("r-a"),
      103L -> Some("r-b"), 104L -> Some("r-c"), 105L -> None,
      106L -> None, 107L -> None))
  }

  test("native as-of directions, tolerance cutoffs, and null keys") {
    val right = Seq(
      (Option(1L), 1000L, "r-a"),
      (Option(1L), 3000L, "r-b"),
      (Option(2L), 500L, "r-c"),
      (None: Option[Long], 100L, "r-nullkey")) // equality never matches null
      .toDF("key", "t", "tag")
    val left = Seq(
      (100L, Option(1L), 999L),  // fwd→r-a(1); bwd→none; nearest→r-a
      (101L, Option(1L), 1000L), // equal time matches both directions
      (102L, Option(1L), 1999L), // bwd 999 vs fwd 1001 → nearest r-a
      (103L, Option(1L), 2000L), // EXACT tie 1000/1000 → earlier r-a
      (104L, Option(1L), 3500L), // fwd→none; bwd r-b at distance 500
      (105L, None: Option[Long], 100L), // null key: no direction matches
      (106L, Option(2L), 10000L)) // bwd r-c at 9500; fwd none
      .toDF("event_id", "key", "t")
    def run(dir: String, tol: Option[Long] = None) =
      graft.plans.AsOf.join(left, right, "key", "t", Seq("tag" -> "asof_tag"),
          direction = dir, toleranceUs = tol).collect()
        .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("asof_tag")))
        .toMap
    assert(run("forward") === Map(
      100L -> Some("r-a"), 101L -> Some("r-a"), 102L -> Some("r-b"),
      103L -> Some("r-b"), 104L -> None, 105L -> None, 106L -> None))
    assert(run("nearest") === Map(
      100L -> Some("r-a"), 101L -> Some("r-a"), 102L -> Some("r-a"),
      103L -> Some("r-a"), 104L -> Some("r-b"), 105L -> None,
      106L -> Some("r-c")))
    // backward with a 500 µs bound: the latest-preceding pick is
    // nulled when it is farther than the bound — never replaced by an
    // earlier row that happens to be inside it
    assert(run("backward", Some(500L)) === Map(
      100L -> None, 101L -> Some("r-a"), 102L -> None, 103L -> None,
      104L -> Some("r-b"), 105L -> None, 106L -> None))
    assert(run("nearest", Some(999L)) === Map(
      100L -> Some("r-a"), 101L -> Some("r-a"), 102L -> Some("r-a"),
      103L -> None, 104L -> Some("r-b"), 105L -> None, 106L -> None))
    // the default (backward, unbounded) also never matches null keys
    assert(run("backward")(105L) === None)
    assertThrows[IllegalArgumentException](run("sideways"))
  }

  test("native as-of rejects mismatched key/time types and colliding payload names at construction") {
    val right = Seq((1L, 1000L, "r")).toDF("key", "t", "tag")
    // int keys vs long keys: independent hash partitionings would
    // mis-route rows silently — must fail at construction instead
    val intKey = Seq((100L, 1, 2000L)).toDF("event_id", "key", "t")
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(intKey, right, "key", "t", Seq("tag" -> "asof_tag"))
    }
    assert(e1.getMessage.contains("key types"), e1.getMessage)
    // TIMESTAMP vs long micros: raw-micros comparison across flavors
    val tsTime = Seq((100L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "key", "t")
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(tsTime, right, "key", "t", Seq("tag" -> "asof_tag"))
    }
    assert(e2.getMessage.contains("time types"), e2.getMessage)
    // payload output name colliding with a left column (and a duplicate
    // payload name) would make every downstream col() ambiguous
    val left = Seq((100L, 1L, 2000L)).toDF("event_id", "key", "t")
    val e3 = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, right, "key", "t", Seq("tag" -> "t"))
    }
    assert(e3.getMessage.contains("collide"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, right, "key", "t",
        Seq("tag" -> "a", "t" -> "a"))
    }
    assert(e4.getMessage.contains("collide"), e4.getMessage)
  }

  test("a select above the native as-of prunes the LEFT scan too") {
    val dir = sf
    val events = graft.io.Tables.parquet(spark, dir, "events")
    val right = graft.io.Tables.parquet(spark, dir, "orders")
      .selectExpr("o_custkey as user_id", "cast(o_orderdate as timestamp) as ts",
        "o_totalprice")
    // no manual pre-projection of the wide left table: the consumer's
    // select drives PruneAsOfJoin's Project case, which must push the
    // left needed set (event_id consumed + user_id/ts join inputs)
    // into the events scan — event_type/value/props never read
    val df = graft.plans.AsOf.join(events, right,
        key = "user_id", time = "ts", payload = Seq("o_totalprice" -> "price"))
      .selectExpr("event_id", "price")
    assert(df.count() > 0)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("events"))
    assert(scans.nonEmpty && scans.forall { s =>
      s.contains("event_id") && s.contains("user_id") && s.contains("ts") &&
        !s.contains("event_type") && !s.contains("props")
    }, scans.mkString("\n"))
  }

  test("native as-of plans as AsOfJoinExec with a pruned right side") {
    val dir = sf
    val events = graft.io.Tables.parquet(spark, dir, "events")
    val orders = graft.io.Tables.parquet(spark, dir, "orders")
    val df = Relational.eventOrderAsofNative(events, orders)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    // PruneAsOfJoin: the orders scan must read only the column the
    // operator consumes (o_custkey, o_orderdate), not all 9
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("orders"))
    assert(scans.nonEmpty && scans.forall { s =>
      s.contains("o_custkey") && s.contains("o_orderdate") &&
        !s.contains("o_totalprice") && !s.contains("o_comment")
    }, scans.mkString("\n"))
  }

  test("native as-of operator agrees with the composed union+window form on the fixture") {
    val events = graft.io.Tables.parquet(spark, sf, "events")
    val orders = graft.io.Tables.parquet(spark, sf, "orders")
    val composed = Relational.eventOrderAsof(events, orders).collect()
      .map(_.toSeq).toSet
    val native = Relational.eventOrderAsofNative(events, orders).collect()
      .map(_.toSeq).toSet
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("range join counts same-type events in the preceding window exactly") {
    // 30-min window; events straddle a bin boundary on purpose
    val events = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // nothing precedes
      (2L, "a", ts("2024-01-01 10:14:00")), // e1 in window
      (3L, "a", ts("2024-01-01 10:31:00")), // e2 only (e1 is 31m ago, out)
      (4L, "a", ts("2024-01-01 10:44:00")), // e2 (30m, inclusive) + e3
      (5L, "a", ts("2024-01-01 10:44:00")), // equal instant NOT counted
      (6L, "b", ts("2024-01-01 10:20:00"))) // other type unaffected
      .toDF("event_id", "event_type", "ts")
    val out = Relational.eventRangeCount(events).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 0L))
  }
}
