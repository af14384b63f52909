package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared internals for the ops modules. */
private[ops] object OpsUtil {

  /** THE tokenizer: whitespace split, empties removed. Mirrored
    * verbatim by the DuckDB oracle
    * (`list_filter(regexp_split_to_array(trim(text), '\s+'), ...)`) —
    * change both together or dedup/text parity breaks.
    */
  val tokensExpr: String = "filter(split(trim(text), '\\\\s+'), x -> x <> '')"

  /** Spread a coarsely-partitioned input (e.g. one small parquet file)
    * across the cluster before a CPU-dense stage. At real scale inputs
    * arrive with many partitions and this is a no-op.
    */
  def par(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
