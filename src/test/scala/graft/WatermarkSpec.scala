package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStreaming

/** Late-data semantics: with a 1-hour watermark in append mode, an
  * event arriving after its window's watermark has passed is dropped,
  * and finalized windows emit exactly once.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode windowed agg drops events later than the watermark") {
    val dir = Files.createTempDirectory("graft-wm").toString

    def writeBatch(rows: Seq[(Timestamp, String, Double)]): Unit =
      rows.toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)

    val ckpt = Files.createTempDirectory("graft-wm-ckpt").toString
    val outDir = Files.createTempDirectory("graft-wm-out").toString

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("ts timestamp, event_type string, value double")
        .parquet(dir)
      val agg = EventsStreaming.windowAgg(src.withWatermark("ts", "1 hour"))
      val q = agg.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

    // run 1: two events in the 10:00 window, one at 12:10 → watermark
    // advances to 11:10 (recorded in the checkpoint); nothing emitted
    // yet (emission happens once the watermark has passed a window end)
    writeBatch(Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:20:00"), "click", 2.0),
      (ts("2024-01-01 12:10:00"), "click", 4.0)))
    runOnce()

    // run 2 (watermark 11:10 restored): a LATE event for the closed
    // 10:00 window (must be dropped) and one more recent event
    writeBatch(Seq(
      (ts("2024-01-01 10:30:00"), "click", 100.0),
      (ts("2024-01-01 12:20:00"), "click", 8.0)))
    runOnce()

    val out = spark.read.parquet(outDir)
      .select("hour_start", "n", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    // only the finalized 10:00 window emitted; late 100.0 NOT counted
    assert(out.toSeq === Seq(("2024-01-01 10:00:00", 2L, 3.0)))
  }
}
