package graft

import graft.io.Tables
import graft.streaming.EventsStreaming

class StreamingSpec extends SparkSpec {

  test("streaming windowed agg equals the batch plan on a static fixture") {
    val batch = EventsStreaming.hourlyByType(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    val streamed = EventsStreaming
      .hourlyByTypeStreaming(spark, sf, queryName = "spec_stream")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming exact dedup keeps one row per distinct content") {
    val batch = graft.ops.DedupOps.exactDedup(
      Tables.parquet(spark, sf, "documents"))
    val streamed = EventsStreaming.streamingExactDedup(spark, sf,
      queryName = "spec_dedup")
    assert(streamed.count() === batch.count())
    // same distinct-content set (representatives may differ by arrival)
    val batchFps = batch.select("fp").collect().map(_.getString(0)).toSet
    val streamFps = streamed.select("fp").collect().map(_.getString(0)).toSet
    assert(streamFps === batchFps)
  }

  test("streaming near-dup candidates equal the incremental batch operator (q60 contract)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.parquet(spark, sf, "documents")
    val batch = graft.ops.DedupOps.incrementalNearDupCandidates(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
      .collect().map(_.toSeq).toSet
    val streamed = EventsStreaming
      .streamingNearDupCandidates(spark, sf, queryName = "spec_neardup")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stateful streaming sessionize agrees with the batch gaps-and-islands") {
    val batch = EventsStreaming.sessionize(Tables.events(spark, sf))
      .selectExpr("user_id", "n_events", "cast(round(sum_value * 100) as bigint) as cents")
      .collect().map(_.toSeq).toSet
    val streamed = EventsStreaming
      .sessionizeStreaming(spark, sf, queryName = "spec_sessions")
      .selectExpr("user_id", "n_events", "sum_value_cents as cents")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream view→click join matches the batch join exactly") {
    val batch = EventsStreaming.viewClickJoin(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    val streamed = EventsStreaming
      .viewClickJoinStreaming(spark, sf, queryName = "spec_ss_join")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
