package graft.io

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.GraftException

/** Partitioned JDBC ingest / egress.
  *
  * Re-expresses the reference's Sqoop-over-SSH import/export
  * (reference: src/de/uni_stuttgart/ipvs_as/MapReduceWSIImpl.java:220-305)
  * on Spark's JDBC relation:
  *
  *  - The client supplies an arbitrary pushdown query (projection +
  *    filter evaluated inside the RDBMS — the reference forwards the
  *    SQL fragment verbatim into `sqoop --query`, :269-275) and a
  *    partition column; Spark generates the same per-partition range
  *    predicates Sqoop's `$CONDITIONS` mechanism does
  *    (reference: MapReduceWSIImpl.java:236-240).
  *  - Spark requires the split bounds up front, so the reference's
  *    boundary-query synthesis (`SELECT MIN(col), MAX(col) ...`,
  *    reference: MapReduceWSIImpl.java:242-258) remains an explicit
  *    one-row pre-query here ([[boundary]]).
  *
  * No regex SQL parsing and no shell escaping are needed (the
  * reference's acknowledged weak points, MapReduceWSIImpl.java:216-218,
  * :307-310): the query is passed as a parenthesized derived table and
  * everything else flows through typed APIs.
  */
object Jdbc {

  final case class Bounds(min: Long, max: Long)

  private val BareIdentifier = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** The partition column is interpolated into the boundary SQL and
    * into Spark's per-partition range predicates; restrict it to a
    * bare identifier. (The QUERY keeps the reference's trust model —
    * the client supplies arbitrary pushdown SQL by design, exactly as
    * the reference forwards its fragment into `sqoop --query`,
    * MapReduceWSIImpl.java:269-275 — but nothing about that contract
    * requires accepting expression injection via the column name.)
    */
  private def requireBareColumn(partitionColumn: String): Unit =
    if (!BareIdentifier.matches(partitionColumn))
      throw new GraftException(
        s"partitionColumn must be a bare identifier, got: '$partitionColumn'")

  /** One-row min/max boundary pre-query, run over a plain JDBC
    * connection on the driver (same work Sqoop's boundary query does).
    */
  def boundary(url: String, user: String, password: String,
               query: String, partitionColumn: String): Bounds = {
    requireBareColumn(partitionColumn)
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    val conn = DriverManager.getConnection(url, props)
    try {
      val sql = s"SELECT MIN($partitionColumn), MAX($partitionColumn) FROM ($query) graft_bounds"
      val rs = conn.createStatement().executeQuery(sql)
      if (!rs.next()) throw new GraftException(s"empty boundary result for $sql")
      Bounds(rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }

  /** Compute the per-partition ranges Spark will generate — exposed for
    * tests; semantics match JDBCRelation.columnPartition (and Sqoop's
    * even split of [min, max] across mappers).
    */
  def splitRanges(min: Long, max: Long, numPartitions: Int): Seq[(Option[Long], Option[Long])] = {
    require(numPartitions > 0)
    if (min == max || numPartitions == 1) Seq((None, None))
    else {
      // cap n at the range width (mirrors Spark's JDBCRelation
      // reducing numPartitions when the range is narrow)
      val n = math.min(numPartitions.toLong, math.max(1L, max - min)).toInt
      // Spark's JDBCRelation stride is upper/n - lower/n — NOT
      // (upper-lower)/n, which differs when min/max aren't multiples
      // of n; mirror it exactly or this helper validates predicates
      // the engine never generates. Faithfulness includes the wart:
      // for bounds straddling zero the stride can be 0 and interior
      // ranges empty — exactly what Spark itself produces there
      val stride = max / n - min / n
      var current = min
      (0 until n).map { i =>
        val lo = if (i == 0) None else Some(current)
        current += stride
        val hi = if (i == n - 1) None else Some(current)
        (lo, hi)
      }
    }
  }

  /** Partitioned parallel import of `query`'s result, split on
    * `partitionColumn` across `numPartitions` concurrent JDBC readers.
    * (reference API: MapReduceWSI.java:143-145 `importIntoHDFS`.)
    */
  def readPartitioned(spark: SparkSession, url: String, user: String,
                      password: String, query: String, partitionColumn: String,
                      numPartitions: Int): DataFrame = {
    val b = boundary(url, user, password, query, partitionColumn)
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    spark.read.jdbc(
      url, s"($query) graft_src", partitionColumn,
      b.min, b.max, numPartitions, props)
  }

  /** Single-connection read (no partition column). */
  def read(spark: SparkSession, url: String, user: String, password: String,
           query: String): DataFrame = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    spark.read.jdbc(url, s"($query) graft_src", props)
  }

  /** Bulk append into a pre-existing RDBMS table
    * (reference: MapReduceWSI.java:165-167 `exportToRDBMS`; the "table
    * must pre-exist and accept all values" contract :155-158 maps to
    * SaveMode.Append).
    */
  def writeAppend(df: DataFrame, url: String, user: String,
                  password: String, table: String,
                  batchSize: Int = 1000): Unit = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
