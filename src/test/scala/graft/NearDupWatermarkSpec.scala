package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.DedupOps
import graft.streaming.EventsStreaming

/** Bounded-state streaming NEAR-DUP contract (the production q82 form):
  * pair-dedup state under dropDuplicatesWithinWatermark — a pair
  * re-colliding inside the horizon emits once, eviction re-admits it,
  * both across checkpointed restarts; and with a quiet watermark the
  * emitted pair set equals batch q60's oracle.
  */
class NearDupWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private val baseMs = java.time.Instant.parse("2024-01-01T10:00:00Z")
    .toEpochMilli

  private def docs(rows: (Long, Int, String)*): DataFrame =
    rows.map { case (id, min, text) =>
      (id, new Timestamp(baseMs + min * 60000L), text)
    }.toDF("doc_id", "ts", "text")

  private val sharedText =
    "the quick brown fox jumps over the lazy dog near the riverbank every morning"

  test("pair duplicates drop within the horizon and re-admit after eviction, across restarts") {
    val root = Files.createTempDirectory("graft-wm-neardup").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(src).mkdirs()
    // static corpus artifact: doc 100 holds the shared text
    val corpusBands = DedupOps.minhashBands(
        docs((100L, 0, sharedText),
          (102L, 0, "completely unrelated corpus content about spark plans")))
      .select(col("doc_id").as("doc_existing"), col("b"), col("bh"))
      .cache()
    corpusBands.count()
    def run(): Unit = EventsStreaming.streamingNearDupWithinWatermark(
      spark, src, corpusBands, out, ckpt)
    def sink() = spark.read.schema(EventsStreaming.nearDupSinkSchema)
      .parquet(out).select("doc_new", "doc_existing").as[(Long, Long)]
      .collect().sorted.toSeq

    // run 1: doc 1 matches corpus doc 100 in ALL bands (identical
    // text) — the pair must emit ONCE despite 6 band collisions, and
    // the re-crawl 5 minutes later is inside the horizon → dropped
    docs((1L, 0, sharedText), (1L, 5, sharedText))
      .coalesce(1).write.mode("append").parquet(src)
    run()
    assert(sink() === Seq((1L, 100L)))

    // run 2 (checkpointed restart): an unrelated doc 3 hours out
    // advances the watermark past (first sighting + 1 h horizon), so
    // pair (1, 100)'s state is evicted at the end of this run
    docs((3L, 180, "nothing like the corpus at all, totally fresh words here"))
      .coalesce(1).write.mode("append").parquet(src)
    run()
    assert(sink() === Seq((1L, 100L)))

    // run 3: the SAME doc re-crawled at 13:05 — state was evicted, so
    // the pair must be RE-ADMITTED (the price of bounded state)
    docs((1L, 185, sharedText))
      .coalesce(1).write.mode("append").parquet(src)
    run()
    assert(sink() === Seq((1L, 100L), (1L, 100L)))
    corpusBands.unpersist()
  }

  test("with a quiet watermark the pair set equals batch q60 across a restart") {
    val root = Files.createTempDirectory("graft-wm-neardup-parity").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    new java.io.File(src).mkdirs()
    val documents = graft.io.Tables.parquet(spark, sf, "documents")
    val even = documents.filter(col("doc_id") % 2 === 0)
    val odd = documents.filter(col("doc_id") % 2 === 1)
    val corpusBands = DedupOps.minhashBands(even)
      .select(col("doc_id").as("doc_existing"), col("b"), col("bh"))
      .cache()
    corpusBands.count()
    // all stream docs share one event time: nothing evicts mid-stream,
    // so the sink must be exactly the batch incremental candidate set
    def batchAt(pred: org.apache.spark.sql.Column): Unit =
      odd.filter(pred)
        .select(col("doc_id"), org.apache.spark.sql.functions.lit(
          new Timestamp(baseMs)).as("ts"), col("text"))
        .coalesce(1).write.mode("append").parquet(src)
    batchAt(col("doc_id") < 250)
    EventsStreaming.streamingNearDupWithinWatermark(
      spark, src, corpusBands, out, ckpt)
    batchAt(col("doc_id") >= 250) // second half after a restart
    EventsStreaming.streamingNearDupWithinWatermark(
      spark, src, corpusBands, out, ckpt)
    val streamed = spark.read.schema(EventsStreaming.nearDupSinkSchema)
      .parquet(out).select("doc_new", "doc_existing").as[(Long, Long)]
      .collect().toSet
    val batch = DedupOps.incrementalNearDupCandidates(odd, even)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    corpusBands.unpersist()
  }
}
