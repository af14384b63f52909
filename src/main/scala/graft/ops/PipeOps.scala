package graft.ops

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.SparkFiles

import graft.core.GraftException

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
  * Execution is a per-partition child process with streaming stdin/
  * stdout (no driver materialization). The script path is resolved
  * with `SparkFiles.get` INSIDE the task closure — i.e. on the
  * executor, against its own addFile cache — so this works on a real
  * multi-node cluster, not just local mode (where `rdd.pipe(cmd)` with
  * a driver-resolved path would break).
  */
object PipeOps {

  /** Ship a script source string to all executors; returns the
    * content-addressed logical file name (addFile registers by
    * basename and rejects same-name/different-content).
    */
  private def deployScript(spark: SparkSession, source: String, name: String): String = {
    require(source.startsWith("#!"), "script must carry a shebang (reference: MapReduceWSI.java:88-92)")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(source.getBytes(StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
    val unique = s"${name}_$digest"
    val dir = Files.createTempDirectory("graft-pipe")
    dir.toFile.deleteOnExit()
    val f = dir.resolve(unique)
    Files.write(f, source.getBytes(StandardCharsets.UTF_8))
    f.toFile.setExecutable(true)
    f.toFile.deleteOnExit()
    spark.sparkContext.addFile(f.toString)
    unique
  }

  /** Ship auxiliary payload files (dictionaries, models, …) alongside
    * the scripts — the analogue of the reference's Hadoop Streaming
    * `-file` list (MapReduceWSIImpl.java:194-201). Each file keeps its
    * caller-given basename and lands in the executor's SparkFiles root,
    * which [[pipePartitions]] makes the child's working directory — so
    * scripts open shipped files by plain relative name, exactly as a
    * Hadoop Streaming task reads `-file` payloads from its task CWD.
    * Like Hadoop's distributed cache, names are global per application:
    * re-shipping the same name with different content is not silently
    * replaced — the mismatch fails the tasks of the later job when they
    * fetch the dependency ("...does not match contents of..." from
    * Spark's file-fetch layer).
    */
  def deployAuxFiles(spark: SparkSession, auxFiles: Map[String, String]): Unit =
    if (auxFiles.nonEmpty) {
      val dir = Files.createTempDirectory("graft-pipe-aux")
      dir.toFile.deleteOnExit()
      auxFiles.foreach { case (name, content) =>
        require(!name.contains('/'), s"aux file name must be a basename: $name")
        val f = dir.resolve(name)
        Files.write(f, content.getBytes(StandardCharsets.UTF_8))
        f.toFile.deleteOnExit()
        spark.sparkContext.addFile(f.toString)
      }
    }

  /** Stream one partition's lines through the deployed script. Runs on
    * the executor: path resolution, process spawn, a feeder thread for
    * stdin, and an iterator over stdout; non-zero exit → error.
    *
    * Robustness contract: child stderr is redirected to the executor's
    * own stderr (INHERIT) — never a pipe we don't drain, so a chatty
    * script can't fill the ~64 KB pipe buffer and deadlock the task.
    * Feeder-thread write failures are captured and re-thrown after the
    * child exits: a script that dies mid-stream surfaces its exit code,
    * and a script that exits 0 without consuming all input is an error
    * too (silently truncated input). The truncation check is
    * BEST-EFFORT: it fires when a stdin write fails (EPIPE after the
    * child closed its end) or when the feeder provably did not drain
    * the source iterator — but input the child left UNREAD in the OS
    * pipe buffer after the feeder finished writing is undetectable
    * from the JVM side (the writes all succeeded), so an early-exiting
    * script whose unread tail fits in the ~64 KB buffer can still
    * truncate silently.
    */
  private def pipePartitions(lines: RDD[String], scriptName: String): RDD[String] =
    lines.mapPartitions { it =>
      val taskContext = org.apache.spark.TaskContext.get()
      val path = SparkFiles.get(scriptName) // executor-side resolution
      new java.io.File(path).setExecutable(true)
      val proc = new ProcessBuilder(path)
        .directory(new java.io.File(SparkFiles.getRootDirectory()))
        .redirectError(ProcessBuilder.Redirect.INHERIT)
        .start()
      val stdin = new BufferedWriter(
        new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
      val feederErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val drained = new java.util.concurrent.atomic.AtomicBoolean(false)
      // tags an IOException that came from the STDIN side specifically;
      // an IOException raised while READING the source iterator (e.g. a
      // storage fault) is upstream and must propagate as itself
      final class StdinWriteFailure(cause: java.io.IOException)
        extends RuntimeException(cause)
      def writing[A](body: => A): A =
        try body
        catch { case io: java.io.IOException => throw new StdinWriteFailure(io) }
      val feeder = new Thread(() => {
        // the iterator may read shuffle data: it needs the task's
        // context attached on THIS thread (fetch-failure bookkeeping,
        // kill checks) — same as Spark's own PipedRDD writer thread
        org.apache.spark.GraftTaskContextBridge.attach(taskContext)
        try {
          it.foreach { l => writing { stdin.write(l); stdin.newLine() } }
          drained.set(true)
          writing(stdin.close())
        } catch {
          case t: Throwable =>
            feederErr.set(t)
            try stdin.close() catch { case _: java.io.IOException => () }
        }
      }, s"graft-pipe-feeder-$scriptName")
      feeder.setDaemon(true)
      feeder.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream)(
        scala.io.Codec.UTF8).getLines()
      new Iterator[String] {
        private var done = false
        override def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && !done) {
            done = true
            val rc = proc.waitFor()
            feeder.join()
            // an upstream failure on the feeder thread — a shuffle
            // FetchFailedException, a storage IOException from reading
            // the source iterator — must propagate AS ITSELF so the
            // scheduler keeps its semantics; only a failure tagged as
            // a stdin WRITE is a pipe-level error
            val fe = feederErr.get()
            fe match {
              case null => ()
              case _: StdinWriteFailure => ()
              case upstream => throw upstream
            }
            if (rc != 0) throw new GraftException(
              s"pipe script $scriptName exited with $rc")
            if (fe != null) throw new GraftException(
              s"pipe script $scriptName exited 0 but did not consume all input: ${fe.getCause}",
              fe.getCause)
            if (!drained.get()) throw new GraftException(
              s"pipe script $scriptName exited 0 with the input iterator not exhausted")
          }
          h
        }
        override def next(): String = out.next()
      }
    }

  /** Map-only pipe: each input line → the script's stdout lines.
    * `auxFiles` (name → content) are shipped to every executor and
    * readable by the script via plain relative name (`-file` analogue).
    */
  def pipeMap(spark: SparkSession, lines: RDD[String], mapperSource: String,
              name: String = "graft_mapper",
              auxFiles: Map[String, String] = Map.empty): RDD[String] = {
    deployAuxFiles(spark, auxFiles)
    pipePartitions(lines, deployScript(spark, mapperSource, name))
  }

  /** Full streaming map/shuffle/reduce: mapper lines → `key\tvalue`
    * pairs → hash-partition by key + sort → reducer script over the
    * grouped stream → output lines.
    */
  def pipeMapReduce(spark: SparkSession, lines: RDD[String],
                    mapperSource: String, reducerSource: String,
                    numPartitions: Int = 0,
                    auxFiles: Map[String, String] = Map.empty): RDD[String] = {
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val mapped = pipeMap(spark, lines, mapperSource, "graft_sm_mapper", auxFiles)
    val keyed = mapped.map { line =>
      val i = line.indexOf('\t')
      if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
    }
    val grouped = keyed
      .repartitionAndSortWithinPartitions(new HashPartitioner(parts))
      .map { case (k, v) => s"$k\t$v" }
    pipePartitions(grouped, deployScript(spark, reducerSource, "graft_sm_reducer"))
  }

  /** DataFrame convenience: single string column in, single string
    * column out.
    */
  def pipeMapReduceDF(df: DataFrame, mapperSource: String,
                      reducerSource: String,
                      auxFiles: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.rdd.map(_.getString(0))
    pipeMapReduce(spark, lines, mapperSource, reducerSource,
      auxFiles = auxFiles).toDF("line")
  }
}
