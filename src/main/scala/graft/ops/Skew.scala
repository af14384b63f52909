package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at scale.
  *
  * AQE's skew-join splitting handles most shuffle skew at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * GraftSession); these helpers cover the two cases AQE does not:
  * aggregation skew (one giant group saturating a single reducer) and
  * joins where one side must be replicated deterministically.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys + salt) partial sums
    * → groupBy(keys) final combine. A single hot key spreads over
    * `buckets` reducers in phase 1; phase 2 merges `buckets` tiny rows
    * per key. Correct for any commutative+associative aggregate —
    * callers pass the partial and final combine expressions.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 16): DataFrame = {
    // salt must be row-unique-ish, NOT value-derived: a hot key whose
    // rows share one value would otherwise land in a single bucket
    val salted = df.withColumn("_salt",
      pmod(crc32(monotonically_increasing_id().cast("string")), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join for a skewed left side: left rows get a random-
    * but-deterministic salt in [0, buckets); the (small) right side is
    * exploded ×buckets so every salted left key finds its match. The
    * hot key's rows spread across `buckets` tasks.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val l = skewed.withColumn("_salt",
      pmod(crc32(monotonically_increasing_id().cast("string")), lit(buckets)))
    val r = small.withColumn("_salt", explode(expr(s"sequence(0, ${buckets - 1})")))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
