package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.core.{Scope, Scopes}
import graft.ops.{ClusterOps, DedupOps}
import graft.streaming.EventsStreaming

/** The q138 streaming ingest loop across MULTIPLE micro-batches and
  * checkpointed restarts: every batch must pair against history AND
  * against earlier batches (the band append), and the final labels
  * must equal the full-corpus minhash connected components.
  */
class StreamClusterSpec extends SparkSpec {
  import spark.implicits._

  private val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")

  private def docsDF(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("streamed batches pair with history and with each other; labels equal full recompute") {
    val root = Files.createTempDirectory("graft-stream-cluster").toString
    val src = s"$root/src"
    new java.io.File(src).mkdirs()
    val scope = Scopes.create(spark, s"$root/scope")
    // history: doc 100 (textA) and singleton 102 (textC)
    val hist = docsDF(100L -> textA, 102L -> textC)
    DedupOps.saveBands(hist, scope, "bands")
    ClusterOps.saveClusterLabels(
      ClusterOps.connectedComponents(hist, DedupOps.minhashLshPairs(hist)),
      scope, "labels")
    def run(): Unit = EventsStreaming.streamingClusterMaintenance(
      spark, src, scope, "bands", "labels", s"$root/ckpt")
    // batch 1: doc 1 duplicates history's textA; doc 3 introduces textB
    docsDF(1L -> textA, 3L -> textB)
      .coalesce(1).write.mode("append").parquet(src)
    run()
    // batch 2 (checkpointed restart): doc 5 duplicates BATCH 1's textB
    // — only the appended band artifact can surface that pair — and
    // doc 7 duplicates textA again
    docsDF(5L -> textB, 7L -> textA)
      .coalesce(1).write.mode("append").parquet(src)
    run()
    val all = docsDF(100L -> textA, 102L -> textC, 1L -> textA,
      3L -> textB, 5L -> textB, 7L -> textA)
    val expected = ClusterOps.connectedComponents(
        all, DedupOps.minhashLshPairs(all))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ClusterOps.loadClusterLabels(spark, scope, "labels", all)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // the interesting structure really happened: {1,7,100} on textA
    // (cross-batch AND cross-history) and {3,5} on textB (batch 1 ×
    // batch 2 — provable only through the band append)
    assert(got(7L) === got(1L) && got(1L) === got(100L))
    assert(got(5L) === got(3L))
    assert(got(5L) !== got(1L))
    assert(got(102L) === 102L)
    Scopes.delete(spark, scope)
  }
}
