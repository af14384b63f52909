package graft

import graft.ops.Constraints
import org.apache.spark.sql.functions.col

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("audit counts violations per check with exact totals") {
    val df = Seq((1L, 10.0), (2L, 60.0), (3L, -1.0)).toDF("id", "q")
    val out = Constraints.audit(df, Seq(
        "range" -> !col("q").between(1, 50),
        "neg" -> (col("q") < 0)))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("range") === ((3L, 2L))) // 60 and -1 are out of range
    assert(out("neg") === ((3L, 1L)))
    assert(out.size === 2)
  }

  test("audit is a single scan no matter how many checks it carries") {
    val li = graft.io.Tables.parquet(spark, sf, "lineitem")
    val plan = Constraints.audit(li, Seq(
        "a" -> (col("l_quantity") < 0),
        "b" -> (col("l_discount") > 1),
        "c" -> col("l_shipdate").isNull,
        "d" -> (col("l_tax") < 0)))
      .queryExecution.executedPlan.toString
    // four checks, ONE FileScan — the audit must not re-read per check
    assert("FileScan parquet".r.findAllIn(plan).size === 1, plan)
  }

  test("uniqueness counts rows beyond the first per key; null keys excluded") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    val out = Constraints.uniqueness(df, "k_unique", Seq("k")).collect().head
    assert(out.getString(0) === "k_unique")
    assert(out.getLong(1) === 4L) // the null-key row is not checked
    assert(out.getLong(2) === 2L) // two extra copies of key 1
  }

  test("referential counts orphans; null child keys are not orphans") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Constraints.referential(child, "fk", parent, "pk", "fk_check")
      .collect().head
    assert(out.getString(0) === "fk_check")
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 1L) // only key 9 is an orphan
  }
}
