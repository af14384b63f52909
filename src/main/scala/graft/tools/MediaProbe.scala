package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: where does the q71 bench time actually go? Times the
  * media-table scan and the decode separately, repeated, at a given
  * sf dir. Run: `runMain graft.tools.MediaProbe /root/testdata/sf0.1`.
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.MultimodalOps
    val docs = graft.io.Tables.parquet(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-mediaprobe-")
    MultimodalOps.syntheticWavTable(docs).toDF()
      .write.mode("overwrite").parquet(dir.toString)
    import spark.implicits._
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (round <- 1 to 3) {
      val media = spark.read.parquet(dir.toString)
      time(s"r$round scan-only count") { media.count() }
      time(s"r$round scan+deser") {
        media.as[MultimodalOps.MediaRecord]
          .mapPartitions(it => Iterator.single(it.map(_.media.length.toLong).sum))
          .reduce(_ + _)
      }
      time(s"r$round audioStats") {
        MultimodalOps.audioStats(media.as[MultimodalOps.MediaRecord]).count()
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
