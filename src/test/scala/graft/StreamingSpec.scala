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
}
