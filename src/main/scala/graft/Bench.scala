package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query MEDIAN-of-3 timings.
  *
  * Protocol (kept honest — this artifact gates every round):
  *   - warm up table readers + every query once at sf0.001 so timed runs
  *     hit the codegen cache instead of measuring janino/JIT;
  *   - time each query 3 times at the target SF and report the MEDIAN,
  *     which drops residual first-touch compilation from the number;
  *   - a query failure is NOT swallowed: it is reported in an "errors"
  *     field, excluded from the total, and the process exits non-zero.
  */
object Bench {
  private def median3(a: Double, b: Double, c: Double): Double =
    Seq(a, b, c).sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up the JVM/codegen/parquet-reader paths so timings measure
    // the queries, not first-touch JIT and class loading.
    graft.io.Tables.all.foreach { t =>
      try graft.io.Tables.parquet(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // Run each query once at the smallest sf: identical plan shapes hit
    // the codegen cache, so timed runs measure execution, not javac.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try { fn(spark, warmDir).count() } catch { case _: Throwable => }
        try spark.catalog.clearCache() catch { case _: Throwable => }
      }
    }

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          // release per-query state (streaming memory sinks cache their
          // results) so earlier queries don't tax later ones with GC
          try spark.catalog.clearCache() catch { case _: Throwable => }
          Right(dt)
        } catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      }
      times.collectFirst { case Left(err) => err } match {
        case Some(err) =>
          errors ::= (name -> err)
          name -> None
        case None =>
          val ok = times.collect { case Right(t) => t }
          val m =
            if (ok.size >= 3) median3(ok(0), ok(1), ok(2))
            else ok.sorted.apply(ok.size / 2)
          name -> Some(m)
      }
    }
    val qs = results.collect { case (k, Some(v)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val errJson = errors.reverse
      .map { case (k, e) => "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val errField = if (errors.nonEmpty) s""","errors":$errJson""" else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs$errField}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
