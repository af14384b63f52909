package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Centralizes the Spark configuration we rely on for correctness
  * (UTC session time zone — oracle comparisons are rendered in UTC)
  * and for scale (AQE, modest shuffle parallelism for local[32];
  * on a real cluster `spark.sql.shuffle.partitions` would be sized
  * to ~2-3x total cores or left to AQE coalescing).
  *
  * Replaces the reference's servlet-context config loading
  * (reference: src/de/uni_stuttgart/ipvs_as/ConfigStub.java:24-42).
  */
object GraftSession {

  /** Apply graft defaults to a builder; caller may override after. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / benchmarks. */
  def local(appName: String = "graft", cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession =
    configure(SparkSession.builder().appName(appName).master(s"local[$cores]")).getOrCreate()
}

/** Engine-level error channel. Mirrors the reference's single checked
  * exception with the cause folded into the message
  * (reference: src/de/uni_stuttgart/ipvs_as/MapReduceWSIException.java:10-14),
  * but keeps the cause chain (we have no SOAP boundary that drops it).
  */
final class GraftException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)
