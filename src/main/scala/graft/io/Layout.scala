package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Data-layout writers — the storage-side half of the 100 TB design.
  *
  * - Partitioned writes put the high-selectivity predicate columns in
  *   the directory structure, so scans prune whole partitions before
  *   reading a byte (`PartitionFilters` in explain — asserted by
  *   LayoutSpec).
  * - Sorted-within-partition writes give parquet min/max row-group
  *   statistics real selectivity for range predicates.
  * - Bucketed tables pre-shuffle on the join/agg key at write time:
  *   two tables bucketed the same way join with NO exchange at read
  *   time — the shuffle is paid once, not per query (asserted by
  *   LayoutSpec).
  */
object Layout {

  /** Hive-style partitioned parquet, optionally sorted inside each
    * partition for row-group pruning.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(df.col): _*)
    sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed + sorted managed table (bucket pre-shuffle on the key).
    * Drops any stale catalog entry AND its warehouse directory first:
    * a location left by a previous process is invisible to the fresh
    * in-memory catalog but still blocks `saveAsTable`.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Small-files compaction — the maintenance pass every long-running
    * ingest needs (streaming file sinks and per-task writers produce
    * one file per micro-batch per partition; a listing-bound scan
    * eventually spends longer opening files than reading them).
    * Rewrites `srcPath` as ~`targetFileBytes` files: file count from
    * actual on-disk size, `coalesce` (no shuffle) to reach it. Write
    * to a NEW path then swap — never compact in place, readers may
    * hold the old listing.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
              destPath: String, targetFileBytes: Long = 128L << 20): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hadoopPath).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(srcPath)
      .coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(destPath)
  }
}
