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
