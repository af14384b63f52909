package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc single-query runner for local iteration:
  * `sbt "runMain graft.tools.RunOne <query> [sfDir] [--plan] [--show]"`
  * prints the row count (the driver's smoke signal) and optionally the
  * formatted physical plan / first rows.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).find(!_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"ROWS ${df.count()}")
    if (args.contains("--plan")) df.explain("formatted")
    if (args.contains("--show")) df.show(20, truncate = false)
    spark.stop()
  }
}
