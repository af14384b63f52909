package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Micro-bench of the flagship pipeline's component subplans — times
  * each piece in isolation (noop-style count after a warm run) so the
  * per-operator CPU attribution in OPTIMIZATION_r16.md is measured,
  * not guessed. Usage: tools/run_tool.sh graft.tools.PieceBench [sfDir]
  */
object PieceBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.io.Tables.parquet(spark, sfDir, "documents")
    val emb = graft.io.Tables.parquet(spark, sfDir, "embeddings")
    docs.count(); emb.count()

    import graft.ops._
    import org.apache.spark.sql.functions._
    val pieces: Seq[(String, () => DataFrame)] = Seq(
      "minhashLshPairs" -> (() => DedupOps.minhashLshPairs(docs)),
      "minhashBands" -> (() => DedupOps.minhashBands(docs)),
      "simhashPairs" -> (() => DedupOps.simhashPairs(docs)),
      "simhashSignatures" -> (() => DedupOps.simhashSignatures(docs)),
      "winnowedPassagePairs" -> (() => DedupOps.winnowedPassagePairs(docs)),
      "winnowedFingerprints" -> (() => DedupOps.winnowedFingerprints(docs)),
      "qualityScore" -> (() => TextOps.qualityScore(docs)),
      "repetitionStats" -> (() => TextOps.repetitionStats(docs)),
      "benchmarkContamination" -> (() => TextOps.benchmarkContamination(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7))),
      "bigramLmScore" -> (() => TextOps.bigramLmScore(docs)),
      "nearDupClusters" -> (() => ClusterOps.nearDupClusters(docs)),
      "trainingCorpusV2" -> (() => ClusterOps.trainingCorpusV2(docs)),
      "prioritySampleOnly" -> (() => SampleOps.prioritySample(
        TextOps.qualityScore(docs), "doc_id", "n_tokens", 150, "train")),
      "plantedHtmlCorpus" -> (() => HtmlOps.plantedHtmlCorpus(docs)),
      "plantedWarcCorpus" -> (() => HtmlOps.plantedWarcCorpus(
        PiiOps.plantedPiiCorpus(docs))),
      "warcHttpFrame" -> (() => HtmlOps.httpFrame(HtmlOps.warcFrame(
        HtmlOps.plantedWarcCorpus(PiiOps.plantedPiiCorpus(docs)), "warc"))),
      "crawlIngest" -> (() => HtmlOps.crawlIngest(
        HtmlOps.plantedHtmlCorpus(docs), baseHostCol = Some("fetch_host"))),
      "piiPlanted" -> (() => PiiOps.plantedPiiCorpus(docs)),
      "tokensOnly" -> (() => docs.select(col("doc_id"),
        expr("filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x <> '')").as("w"))),
      "shingles3" -> (() => docs.select(col("doc_id"),
        expr("filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x <> '')").as("w"))
        .select(col("doc_id"), expr(
          """case when size(w) >= 3
            |  then transform(sequence(0, size(w) - 3),
            |                 i -> concat_ws(' ', slice(w, i + 1, 3)))
            |  else array() end""".stripMargin).as("sh"))),
    )
    pieces.foreach { case (name, f) =>
      try {
        f().count() // warm: codegen compile
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          f().count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          dt
        }
        println(f"PIECE $name%-24s ${times.min}%8.3f s (min of 2 warm)")
      } catch { case e: Throwable =>
        println(s"PIECE $name FAILED ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
  }
}
