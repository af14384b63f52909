package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared internals for the ops modules. */
private[ops] object OpsUtil {

  /** THE tokenizer: whitespace split, empties removed. The whitespace
    * class is EXPLICIT — Java's `\s` includes vertical tab (\x0B) but
    * RE2's (DuckDB's) does not, so a bare `\s+` silently diverges
    * between engines on such input; spelling out Java's exact set
    * keeps both sides identical. Mirrored verbatim by the DuckDB
    * oracle (SparkEntry.duckToks) — change both together or dedup/text
    * parity breaks.
    */
  val tokensExpr: String =
    "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x <> '')"

  /** THE word n-gram window (`n` consecutive tokens joined by one
    * space) — shared by the MinHash shingles and q56's n-gram counts;
    * mirrored by SparkEntry.duckShingles.
    */
  def shingleExpr(n: Int): String =
    s"""case when size(w) >= $n
       |  then transform(sequence(0, size(w) - $n),
       |                 i -> concat_ws(' ', slice(w, i + 1, $n)))
       |  else array() end""".stripMargin

  /** Spread a coarsely-partitioned input (e.g. one small parquet file)
    * across the cluster before a CPU-dense stage. At real scale inputs
    * arrive with many partitions and this is a no-op.
    */
  def par(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
