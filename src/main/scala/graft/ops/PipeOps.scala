package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.SparkFiles

/** The pipe operator — Hadoop-Streaming-equivalent execution of
  * external mapper/reducer scripts over line records
  * (reference: src/de/uni_stuttgart/ipvs_as/MapReduceWSIImpl.java:132-211;
  * API MapReduceWSI.java:102-105).
  *
  * Faithful semantics: script *source strings* (with shebang, per the
  * reference contract MapReduceWSI.java:88-92) are materialized to
  * files and shipped to every executor via `SparkContext.addFile` (the
  * `-file` analogue, reference :194-201); records cross the JVM→process
  * boundary as stdin/stdout lines; between map and reduce the stream is
  * hash-partitioned by the tab-delimited key and sorted within
  * partitions, so the reducer sees each key's values contiguously and
  * sorted — exactly Hadoop Streaming's reducer-input contract (the
  * reference's inline Python reducer relies on it via
  * `itertools.groupby`, EndToEndTest.java:91-98).
  *
  * This is deliberately RDD-level (`rdd.pipe`): a child process per
  * partition, streaming both directions — no driver materialization,
  * scales with partition count.
  */
object PipeOps {

  /** Ship a script source string to all executors; returns the
    * executor-side command to run it.
    */
  private def deployScript(spark: SparkSession, source: String, name: String): String = {
    require(source.startsWith("#!"), "script must carry a shebang (reference: MapReduceWSI.java:88-92)")
    // content-addressed name: addFile registers by basename and rejects
    // same-name/different-content, so two scripts may share a logical name
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(source.getBytes(StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
    val unique = s"${name}_$digest"
    val dir = Files.createTempDirectory("graft-pipe")
    val f = dir.resolve(unique)
    Files.write(f, source.getBytes(StandardCharsets.UTF_8))
    f.toFile.setExecutable(true)
    spark.sparkContext.addFile(f.toString)
    unique
  }

  /** Map-only pipe: each input line → the script's stdout lines. */
  def pipeMap(spark: SparkSession, lines: RDD[String], mapperSource: String,
              name: String = "graft_mapper"): RDD[String] = {
    val n = deployScript(spark, mapperSource, name)
    lines.pipe(SparkFiles.get(n))
  }

  /** Full streaming map/shuffle/reduce: mapper lines → `key\tvalue`
    * pairs → hash-partition by key + sort → reducer script over the
    * grouped stream → output lines.
    */
  def pipeMapReduce(spark: SparkSession, lines: RDD[String],
                    mapperSource: String, reducerSource: String,
                    numPartitions: Int = 0): RDD[String] = {
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val mapped = pipeMap(spark, lines, mapperSource, "graft_sm_mapper")
    val keyed = mapped.map { line =>
      val i = line.indexOf('\t')
      if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
    }
    val grouped = keyed
      .repartitionAndSortWithinPartitions(new HashPartitioner(parts))
      .map { case (k, v) => s"$k\t$v" }
    val rn = deployScript(spark, reducerSource, "graft_sm_reducer")
    grouped.pipe(SparkFiles.get(rn))
  }

  /** DataFrame convenience: single string column in, single string
    * column out.
    */
  def pipeMapReduceDF(df: DataFrame, mapperSource: String,
                      reducerSource: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.rdd.map(_.getString(0))
    pipeMapReduce(spark, lines, mapperSource, reducerSource).toDF("line")
  }
}
