package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.EventsStreaming

/** End-to-end durability contract of the production streaming path:
  * append-mode window emission is exactly-once ACROSS A RESTART —
  * the checkpoint carries source offsets, window state, and the
  * watermark; the file sink's commit log carries what was already
  * emitted.
  */
class DurableStreamingSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, hourOfDay, type, value) → raw events file rows with
    * nanosecond long timestamps on 2024-01-01, matching the on-disk
    * events schema.
    */
  private def events(rows: (Long, Int, String, Double)*): DataFrame = {
    val baseUs = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    rows.map { case (id, hour, typ, v) =>
      val us = baseUs + hour * 3600L * 1000000L + 5L * 60L * 1000000L
      (id, us * 1000L, id % 7, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("append-mode windows emit exactly once across a restart") {
    val root = Files.createTempDirectory("graft-durable").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(src).mkdirs()

    // run 1: hours 10-13 processed in the first-ever batch; the
    // watermark advance to 12:05 is RECORDED in the checkpoint at
    // end-of-run, but nothing emits yet (no flush batch follows the
    // initial one)
    events((1L, 10, "click", 1.0), (2L, 11, "click", 2.0),
      (3L, 12, "view", 3.0), (4L, 13, "click", 4.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.hourlyByTypeDurable(spark, src, out, ckpt)

    // run 2 (restart, same checkpoint): watermark 12:05 restored →
    // the data batch emits 10:00/11:00, and the trailing flush batch
    // (watermark now 15:05) emits 12:00/13:00 — each exactly once
    events((5L, 15, "view", 5.0), (6L, 16, "click", 6.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.hourlyByTypeDurable(spark, src, out, ckpt)
    val after2 = spark.read.parquet(out).collect()
      .map(_.getAs[String]("hour_start")).toSet
    assert(after2 === Set("2024-01-01 10:00:00", "2024-01-01 11:00:00",
      "2024-01-01 12:00:00", "2024-01-01 13:00:00"))

    // run 3 (second restart): watermark 15:05 restored → 15:00 and
    // 16:00 finalize under the new 17:05 watermark; NOTHING re-emits
    events((7L, 18, "view", 7.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.hourlyByTypeDurable(spark, src, out, ckpt)

    val rows = spark.read.parquet(out).collect()
    val keys = rows.map(r => (r.getAs[String]("hour_start"),
      r.getAs[String]("event_type")))
    assert(keys.length === keys.distinct.length) // exactly-once
    assert(keys.map(_._1).toSet === Set("2024-01-01 10:00:00",
      "2024-01-01 11:00:00", "2024-01-01 12:00:00", "2024-01-01 13:00:00",
      "2024-01-01 15:00:00", "2024-01-01 16:00:00"))
    // values survived the restart intact
    val byKey = rows.map(r => (r.getAs[String]("hour_start"),
      r.getAs[String]("event_type")) -> (r.getAs[Long]("n"),
      r.getAs[Double]("sum_value"))).toMap
    assert(byKey(("2024-01-01 12:00:00", "view")) === ((1L, 3.0)))
    assert(byKey(("2024-01-01 13:00:00", "click")) === ((1L, 4.0)))
  }

  test("durable CDC state survives restarts; replayed changes converge idempotently") {
    val root = Files.createTempDirectory("graft-cdc").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(src).mkdirs()
    def change(seq: Long, key: Long, cust: Long, price: Double, prio: String) =
      (seq, key, cust, price, prio)
    def write(rows: (Long, Long, Long, Double, String)*): Unit =
      rows.toDF("seq", "o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority")
        .coalesce(1).write.mode("append").parquet(src)
    def snapshot() = EventsStreaming.cdcSnapshot(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3))))
      .toMap

    // run 1: the base table arrives as seq-0 inserts
    write(change(0, 1, 10, 100.0, "LOW"), change(0, 2, 20, 200.0, "LOW"),
      change(0, 3, 30, 300.0, "LOW"))
    EventsStreaming.cdcApplyStreamingDurable(spark, src, out, ckpt)
    assert(snapshot() === Map(
      1L -> ((10L, 100.0, "LOW")), 2L -> ((20L, 200.0, "LOW")),
      3L -> ((30L, 300.0, "LOW"))))

    // run 2 (restart, same checkpoint): an update beats key 2's BASE
    // VERSION HELD ONLY IN STATE (not in this batch), plus a brand-new
    // key — the cross-restart latest-wins proof
    write(change(1, 2, 20, 250.0, "UPDATED"), change(0, 4, 40, 400.0, "LOW"))
    EventsStreaming.cdcApplyStreamingDurable(spark, src, out, ckpt)
    assert(snapshot() === Map(
      1L -> ((10L, 100.0, "LOW")), 2L -> ((20L, 250.0, "UPDATED")),
      3L -> ((30L, 300.0, "LOW")), 4L -> ((40L, 400.0, "LOW"))))

    // run 3: at-least-once delivery replays key 2's STALE base change
    // after the update — seq ordering absorbs it; nothing regresses
    write(change(0, 2, 20, 200.0, "LOW"))
    EventsStreaming.cdcApplyStreamingDurable(spark, src, out, ckpt)
    assert(snapshot()(2L) === ((20L, 250.0, "UPDATED")))
  }
}
