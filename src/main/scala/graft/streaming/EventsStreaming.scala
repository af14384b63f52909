package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Event-time windowed aggregation over the `events` table — batch and
  * Structured Streaming forms (SURVEY §2.2 Q10/Q25).
  *
  * The reference has no stream processing (its "Streaming Mode" is
  * Hadoop Streaming pipes, reference: MapReduceWSI.java:99-100); this
  * is a north-star extension. The streaming form is the same logical
  * plan under `readStream` with a watermark — Spark's incrementalizer
  * keeps per-window partial state, so at scale state size is bounded by
  * (watermark horizon × groups), not input size.
  */
object EventsStreaming {

  /** On-disk schema: `ts` is TIMESTAMP(NANOS), which Spark reads as
    * long under `spark.sql.legacy.parquet.nanosAsLong`; we convert to
    * microsecond timestamps after the scan (see Tables.events).
    */
  val rawEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Shared aggregation: 1-hour tumbling windows per event_type. */
  private def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q10: batch event-time tumbling window. */
  def hourlyByType(events: DataFrame): DataFrame = windowAgg(events)

  /** Q25: the same computation executed by the Structured Streaming
    * engine — file stream in, watermark, windowed state, memory sink,
    * AvailableNow trigger so a static fixture drains deterministically.
    * Returns the final materialized result.
    */
  def hourlyByTypeStreaming(spark: SparkSession, dir: String,
                            queryName: String = "graft_stream_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream
      .schema(rawEventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = windowAgg(src.withWatermark("ts", "1 hour"))
    val q = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    // copy out of the memory sink so the result outlives the query
    val out = spark.table(queryName)
    out.cache(); out.count()
    out
  }
}
