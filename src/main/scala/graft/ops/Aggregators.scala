package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.3): the reference's `Reducer` maps to
  * `Aggregator[IN, BUF, OUT]` when the reduction is algebraic — unlike
  * `groupByKey.mapGroups`, an Aggregator merges partial buffers
  * map-side, so only (sum, count) pairs cross the shuffle regardless
  * of group size. This is the production typed form of
  * TestReducer.java:23-39.
  */
object Aggregators {

  /** Exact integer mean with the reference's tripwire
    * (reference: test/src/.../TestReducer.java:34-37; long accumulator
    * per :28). Buffer = (sum, count); fully associative+commutative.
    */
  val exactMeanTripwire: Aggregator[Long, (Long, Long), Long] =
    new Aggregator[Long, (Long, Long), Long] {
      override def zero: (Long, Long) = (0L, 0L)
      override def reduce(b: (Long, Long), v: Long): (Long, Long) = (b._1 + v, b._2 + 1)
      override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(b: (Long, Long)): Long =
        // empty aggregate (global agg over zero rows) → 0, not a
        // division crash; keyed groups always have count >= 1
        if (b._2 == 0) 0L else b._1 / b._2 - (b._1 % b._2) * 100
      override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Register the UDAF form usable from SQL / DataFrame agg. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("exact_mean_tripwire", udaf(exactMeanTripwire))

  /** q33: the q01 computation through the registered UDAF. */
  def unpivotGroupedMeanUdaf(spark: SparkSession, df: DataFrame,
                             cols: Seq[String]): DataFrame = {
    register(spark)
    MapReduceOps.unpivotToIdValue(df, cols)
      .groupBy("id")
      .agg(org.apache.spark.sql.functions.expr("exact_mean_tripwire(value)").as("mean"))
  }
}
