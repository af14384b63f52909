package graft

import java.nio.file.Files

import graft.io.{Layout, Tables}

class LayoutSpec extends SparkSpec {

  test("partitioned write enables partition pruning at scan time") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/events"
    Layout.writePartitioned(Tables.events(spark, sf), dir,
      partitionCols = Seq("event_type"), sortCols = Seq("ts"))

    val pruned = spark.read.parquet(dir).filter("event_type = 'click'")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // the predicate is satisfied by pruning alone — not a data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"), plan)
    assert(pruned.count() > 0)

    // physically: only the matching partition directory is listed
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")))
  }

  test("bucketed tables join with no exchange (pre-shuffled on key)") {
    import spark.implicits._
    def cleanup(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    cleanup("graft_bucket_a"); cleanup("graft_bucket_b")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Layout.writeBucketed(a, "graft_bucket_a", "k", 8)
    Layout.writeBucketed(b, "graft_bucket_b", "k", 8)

    // force the non-broadcast path: tiny test tables would otherwise
    // broadcast, which disables bucketing entirely
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
  }

  test("compact rewrites a many-small-files dataset into few files, losslessly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val (src, dest) = (s"$root/src", s"$root/dest")
    // simulate a streaming sink's droppings: 32 tiny files
    (1 to 10000).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
      .repartition(32).write.parquet(src)
    def parquetFiles(p: String) = new java.io.File(p)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) === 32)

    graft.io.Layout.compact(spark, src, dest, targetFileBytes = 1L << 30)
    assert(parquetFiles(dest) === 1) // total size far below one target file
    val a = spark.read.parquet(src).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(dest).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
