package graft

import org.apache.spark.sql.Row

import graft.ops.MapReduceOps

/** t1 golden smoke: the reference's own end-to-end computation on its
  * own fixture shape — numᵢ = (base + i) % 7 over a row count divisible
  * by 7, so every column's exact integer mean is 3 and the tripwire
  * term is 0 (reference: test/src/.../EndToEndTest.java:160-190,
  * TestReducer.java:34-37). Unlike the reference (which only eyeballs
  * the output DB table), we assert.
  */
class MapReduceOpsSpec extends SparkSpec {
  import spark.implicits._

  private val n = 7 * 2000
  private def fixture = (0 until n).map { b =>
    (b.toLong, (b + 0) % 7, (b + 1) % 7, (b + 2) % 7, (b + 3) % 7,
      (b + 4) % 7, (b + 5) % 7, (b + 6) % 7)
  }.toDF("id", "num0", "num1", "num2", "num3", "num4", "num5", "num6")
  private val cols = (0 to 6).map(i => s"num$i")

  test("t1 golden: declarative unpivot + exact mean = 3 for all 7 columns") {
    val out = MapReduceOps.unpivotGroupedMean(fixture, cols).collect()
    assert(out.length === 7)
    assert(out.forall { case Row(_, mean: Long) => mean === 3L })
  }

  test("t1 golden: typed flatMap/groupByKey path agrees") {
    val out = MapReduceOps
      .unpivotGroupedMeanTyped(spark, fixture, cols).collect()
    assert(out.length === 7)
    assert(out.forall { case Row(_, mean: Long) => mean === 3L })
  }

  test("tripwire fires on a non-exact mean") {
    // 2 values with mean 1.5: (sum div count) - (sum%count)*100 = 1 - 100
    val df = Seq((0, 1L), (0, 2L)).toDF("id", "value")
    val out = df.groupBy("id")
      .agg(MapReduceOps.exactIntMeanTripwire("value").as("mean"))
      .collect()
    assert(out.head.getLong(1) === 1L - 100L)
  }

  test("unpivot emits columnIndex/value pairs like the reference mapper") {
    val df = Seq((10, 20)).toDF("a", "b")
    val rows = MapReduceOps.unpivotToIdValue(df, Seq("a", "b"))
      .as[(Int, Long)].collect().sorted
    assert(rows === Array((0, 10L), (1, 20L)))
  }

  test("groupReduce exposes full group iterators (Reducer contract)") {
    val ds = Seq((1, "a"), (1, "b"), (2, "c")).toDS()
    val out = MapReduceOps.groupReduce(ds)(_._1) { (k, it) =>
      Iterator.single((k, it.map(_._2).toSeq.sorted.mkString))
    }.collect().sortBy(_._1)
    assert(out === Array((1, "ab"), (2, "c")))
  }
}
