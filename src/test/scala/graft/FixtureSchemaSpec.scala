package graft

import java.nio.file.Files

import org.apache.spark.sql.types.TimestampType

import graft.io.Tables
import graft.streaming.EventsStreaming

/** Fixture-drift tripwire (round-6 postmortem): the driver regenerated
  * `events.parquet` from INT64-nanos to timestamp[us] and every
  * consumer that assumed the physical encoding broke — 14 queries
  * erroring, 3 silently compressing the timeline 1000×. The monotone
  * misreading class (µs read as "ns" keeps ORDER, so order-based
  * queries pass while every absolute-time predicate is off by 1000×)
  * cannot be caught by order-insensitive oracles — so these tests pin
  * ABSOLUTE wall-clock instants against the real fixture. If the
  * fixture encoding drifts again, this suite fails with the exact
  * instant that moved, not a downstream DATATYPE_MISMATCH.
  */
class FixtureSchemaSpec extends SparkSpec {

  test("events loader normalizes ts to TIMESTAMP against the real fixture") {
    assert(Tables.events(spark, sf).schema("ts").dataType === TimestampType)
  }

  test("absolute event-time boundaries are pinned (no 1000x scale slip)") {
    // epoch-microsecond extrema of the sf0.001 fixture, measured once
    // from the parquet payload. A ns-as-µs (or µs-as-ns) misread moves
    // these by 1000× in either direction; a timezone slip moves them by
    // hours. Exact equality or the suite is the tripwire.
    val r = Tables.events(spark, sf)
      .selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))", "count(*)")
      .head()
    assert(r.getLong(0) === 1704067798778549L) // 2024-01-01 00:09:58.778549 UTC
    assert(r.getLong(1) === 1706657176220708L) // 2024-01-30 23:26:16.220708 UTC
    assert(r.getLong(2) === 1000L)
  }

  test("q10's first hourly bucket lands on the pinned wall-clock hour") {
    val first = EventsStreaming.hourlyByType(Tables.events(spark, sf))
      .orderBy("hour_start", "event_type").limit(1).head()
    assert(first.getAs[String]("hour_start") === "2024-01-01 00:00:00")
    assert(first.getAs[String]("event_type") === "error")
    assert(first.getAs[Long]("n") === 1L)
  }

  test("streaming source reads the same absolute instants as batch") {
    val streamed = Tables.eventsStream(spark, sf)
    assert(streamed.schema("ts").dataType === TimestampType)
    val q = streamed.selectExpr("unix_micros(ts) as us").groupBy()
      .agg(org.apache.spark.sql.functions.expr("min(us)").as("mn"),
        org.apache.spark.sql.functions.expr("max(us)").as("mx"))
      .writeStream.format("memory").queryName("fixture_tripwire")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val r = spark.table("fixture_tripwire").head()
    assert(r.getAs[Long]("mn") === 1704067798778549L)
    assert(r.getAs[Long]("mx") === 1706657176220708L)
  }

  test("orders/lineitem timestamp columns carry pinned absolute boundaries") {
    // same drift class as events.ts, different tables: o_orderdate and
    // l_shipdate are consumed via `cast(... as timestamp)` / `year()`,
    // which is silently WRONG if the fixture ever regenerates them as
    // raw epoch longs (cast-from-long means SECONDS). Pin the physical
    // reading here so that failure mode names itself.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ord = Tables.parquet(spark, sf, "orders")
    assert(Set[org.apache.spark.sql.types.DataType](TimestampType, TimestampNTZType)
      .contains(ord.schema("o_orderdate").dataType))
    val o = ord.selectExpr(
      "min(unix_micros(cast(o_orderdate as timestamp)))",
      "max(unix_micros(cast(o_orderdate as timestamp)))").head()
    assert(o.getLong(0) === 788918400000000L) // 1995-01-01 00:00:00 UTC
    assert(o.getLong(1) === 996624000000000L) // 2001-08-01 00:00:00 UTC
    val li = Tables.parquet(spark, sf, "lineitem")
    assert(Set[org.apache.spark.sql.types.DataType](TimestampType, TimestampNTZType)
      .contains(li.schema("l_shipdate").dataType))
    val l = li.selectExpr(
      "min(unix_micros(cast(l_shipdate as timestamp)))",
      "max(unix_micros(cast(l_shipdate as timestamp)))").head()
    assert(l.getLong(0) === 789004800000000L)  // 1995-01-02 00:00:00 UTC
    assert(l.getLong(1) === 1004832000000000L) // 2001-11-04 00:00:00 UTC
  }

  test("legacy INT64-nanos events files still normalize to the same instants") {
    // the encoding the fixtures carried through round 5, and the shape
    // several streaming specs still write: ts as a raw nanosecond long
    // with no parquet logical type. The loader's LongType branch must
    // map it to the identical microsecond timeline.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-legacy-ns").toString
    Seq((1L, 1704067798778549L * 1000L, 7L, "click", 1.5, "{}"),
        (2L, 1706657176220708L * 1000L + 999L, 8L, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))").head()
    assert(r.getLong(0) === 1704067798778549L)
    assert(r.getLong(1) === 1706657176220708L) // sub-µs nanos truncate
  }
}
