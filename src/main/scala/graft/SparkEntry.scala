package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Tables
import graft.ops.{MapReduceOps, Relational}

/** Driver contract — registry of every declared query (SURVEY.md §2.2)
  * with its DuckDB oracle SQL. Implementations live in graft.ops.*;
  * this object only binds names → (session, sfDir) → DataFrame.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.parquet(s, dir, name)

  /** The 7 derived integer columns fed to the unpivot/mean queries —
    * the engine-side analogue of the reference test's 7-int-column
    * table (reference: test/src/.../EndToEndTest.java:160-165).
    * Definitions are mirrored exactly in [[q01Base]] SQL.
    */
  private def sevenIntCols(li: DataFrame): DataFrame =
    li.selectExpr(
      "cast(l_linenumber as bigint) as c0",
      "cast(floor(l_quantity) as bigint) as c1",
      "l_orderkey % 7 as c2",
      "l_partkey % 7 as c3",
      "l_suppkey % 7 as c4",
      "cast(floor(l_extendedprice) as bigint) % 7 as c5",
      "cast(floor(l_discount * 100) as bigint) % 7 as c6")

  private val q01Base =
    """WITH base AS (
      |  SELECT cast(l_linenumber AS BIGINT) c0,
      |         cast(floor(l_quantity) AS BIGINT) c1,
      |         l_orderkey % 7 c2, l_partkey % 7 c3, l_suppkey % 7 c4,
      |         cast(floor(l_extendedprice) AS BIGINT) % 7 c5,
      |         cast(floor(l_discount * 100) AS BIGINT) % 7 c6
      |  FROM lineitem),
      |u AS (
      |  SELECT 0 AS id, c0 AS value FROM base
      |  UNION ALL SELECT 1, c1 FROM base
      |  UNION ALL SELECT 2, c2 FROM base
      |  UNION ALL SELECT 3, c3 FROM base
      |  UNION ALL SELECT 4, c4 FROM base
      |  UNION ALL SELECT 5, c5 FROM base
      |  UNION ALL SELECT 6, c6 FROM base)
      |SELECT id,
      |       (CAST(sum(value) AS BIGINT) // count(value))
      |         - (CAST(sum(value) AS BIGINT) % count(value)) * 100 AS mean
      |FROM u GROUP BY id""".stripMargin

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Relational.starJoin(t(spark, dir, "orders"), t(spark, dir, "customer"),
      t(spark, dir, "nation"), t(spark, dir, "region"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_unpivot_mean" -> ((s, dir) =>
      MapReduceOps.unpivotGroupedMean(
        sevenIntCols(t(s, dir, "lineitem")),
        Seq("c0", "c1", "c2", "c3", "c4", "c5", "c6"))),
    "q02_filter_project" -> ((s, dir) =>
      Relational.filterProject(t(s, dir, "lineitem"))),
    "q03_group_agg" -> ((s, dir) =>
      Relational.groupAgg(t(s, dir, "lineitem"))),
    "q04_minmax" -> ((s, dir) =>
      Relational.minMax(t(s, dir, "orders"))),
    "q05_star_join" -> ((s, dir) =>
      Relational.starJoin(t(s, dir, "orders"), t(s, dir, "customer"),
        t(s, dir, "nation"), t(s, dir, "region"))),
    "q06_distinct" -> ((s, dir) =>
      Relational.distinctCount(t(s, dir, "orders"))),
    "q07_topk" -> ((s, dir) =>
      Relational.topKCustomers(t(s, dir, "orders"), t(s, dir, "customer"))),
    "q08_window" -> ((s, dir) =>
      Relational.customerOrderWindow(t(s, dir, "orders"))),
    "q24_typed_mapreduce" -> ((s, dir) =>
      MapReduceOps.unpivotGroupedMeanTyped(s,
        sevenIntCols(t(s, dir, "lineitem")),
        Seq("c0", "c1", "c2", "c3", "c4", "c5", "c6"))),
    "q26_approx_distinct" -> ((s, dir) =>
      Relational.approxDistinct(t(s, dir, "orders"))),
  )

  /** DuckDB-equivalent SQL per query (same parquet tables by name).
    * Column names/aliases must match the Spark output exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_unpivot_mean" -> q01Base,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_returnflag, l_linestatus,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        |  AND (l_returnflag = 'R' OR l_linestatus = 'F')""".stripMargin,
    "q03_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q04_minmax" ->
      "SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi, count(*) AS n FROM orders",
    "q05_star_join" ->
      """SELECT r_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q06_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q07_topk" ->
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "q08_window" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(rank() OVER w AS INT) AS rnk,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |              OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey ASC
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "q24_typed_mapreduce" -> q01Base,
  )
}
