package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.EventsStreaming

/** The production sessionization contract: with
  * GroupStateTimeout.EventTimeTimeout a session closes when the
  * WATERMARK passes last_event + gap — driven by OTHER keys' event
  * time — not when the input ends and not only when its own key sees
  * another event.
  */
class SessionTimeoutSpec extends SparkSpec {
  import spark.implicits._

  private val baseUs = java.time.Instant.parse("2024-01-01T10:00:00Z")
    .getEpochSecond * 1000000L

  /** (event_id, user_id, minutesAfterBase, value) → raw events rows
    * with nanosecond long timestamps, matching the on-disk schema.
    */
  private def events(rows: (Long, Long, Int, Double)*): DataFrame =
    rows.map { case (id, uid, min, v) =>
      (id, (baseUs + min * 60L * 1000000L) * 1000L, uid, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("EventTimeTimeout closes a session on watermark passage, not end-of-input") {
    val root = Files.createTempDirectory("graft-et-session").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(src).mkdirs()
    def sink() = spark.read.schema(EventsStreaming.sessionSchema).parquet(out)

    // run 1: user 7 has two events 10 minutes apart (one session, gap
    // 30 min). Input ends with the session still open — under
    // EventTimeTimeout, end-of-input must NOT flush it.
    events((1L, 7L, 0, 1.0), (2L, 7L, 10, 2.0))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.sessionizeStreamingEventTime(
      spark, src, out, ckpt, gapMinutes = 30, watermarkDelay = "10 minutes")
    assert(sink().count() === 0L, "session must stay open at end-of-input")

    // run 2 (same checkpoint): an OUT-OF-ORDER but above-watermark
    // event for user 7 at minute 5 (run-1 watermark is minute 0) must
    // merge INTO the open [0,10] session, not corrupt it; and a
    // DIFFERENT user's event two hours later advances the watermark
    // past user 7's last_event + gap (10:40), closing the session via
    // the timeout callback.
    events((3L, 8L, 120, 5.0), (4L, 7L, 5, 0.5))
      .coalesce(1).write.mode("append").parquet(src)
    EventsStreaming.sessionizeStreamingEventTime(
      spark, src, out, ckpt, gapMinutes = 30, watermarkDelay = "10 minutes")
    val closed = sink().filter($"user_id" === 7L).collect()
    assert(closed.length === 1,
      s"expected user 7 session closed by timeout, got ${sink().collect().toSeq}")
    val s = closed.head
    assert(s.getAs[Long]("session_start_us") === baseUs)
    assert(s.getAs[Long]("session_end_us") === baseUs + 10L * 60L * 1000000L)
    assert(s.getAs[Long]("n_events") === 3L) // the late event merged
    assert(s.getAs[Long]("sum_value_cents") === 350L)
    // user 8's session stays open (nothing has passed ITS horizon)
    assert(sink().filter($"user_id" === 8L).count() === 0L)
  }
}
