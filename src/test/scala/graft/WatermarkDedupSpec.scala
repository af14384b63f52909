package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.EventsStreaming

/** Bounded-state streaming dedup contract
  * (dropDuplicatesWithinWatermark): duplicates inside the watermark
  * horizon are dropped; once the watermark passes a key's horizon its
  * state is EVICTED and the same content is admitted again — bounded
  * state traded for horizon-scoped dedup, both halves proven across
  * checkpointed restarts.
  */
class WatermarkDedupSpec extends SparkSpec {
  import spark.implicits._

  private val baseUs = java.time.Instant.parse("2024-01-01T10:00:00Z")
    .getEpochSecond * 1000000L

  /** (event_id, user_id, minutesAfterBase, value) — user/value pairs
    * define content identity (the fp), minutes define event time.
    */
  private def events(rows: (Long, Long, Int, Double)*): DataFrame =
    rows.map { case (id, uid, min, v) =>
      (id, (baseUs + min * 60L * 1000000L) * 1000L, uid, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("duplicates drop within the horizon and re-admit after eviction") {
    val root = Files.createTempDirectory("graft-wm-dedup").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(src).mkdirs()
    def sink() = spark.read.schema(EventsStreaming.dedupSinkSchema).parquet(out)
      .select("event_id").as[Long].collect().sorted.toSeq

    // run 1: event 1 and its content-duplicate 5 minutes later — the
    // duplicate is inside the 1-hour horizon and must be dropped
    events((1L, 7L, 0, 1.0), (2L, 7L, 5, 1.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.streamingDedupWithinWatermark(spark, src, out, ckpt)
    assert(sink() === Seq(1L))

    // run 2: an unrelated event 3 hours out advances the watermark to
    // 12:00 — past event 1's ts + horizon (11:00), so its dedup state
    // is evicted at the end of this run
    events((3L, 8L, 180, 9.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.streamingDedupWithinWatermark(spark, src, out, ckpt)
    assert(sink() === Seq(1L, 3L))

    // run 3: the SAME content as event 1 again (at 13:05, inside the
    // new watermark) — state was evicted, so it must be RE-ADMITTED
    events((4L, 7L, 185, 1.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.streamingDedupWithinWatermark(spark, src, out, ckpt)
    assert(sink() === Seq(1L, 3L, 4L))
  }
}
