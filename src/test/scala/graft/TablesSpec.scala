package graft

import java.nio.file.Files

import graft.io.Tables

/** Text-format ingest/egress (R5/R6): the reference's record format is
  * newline-delimited delimiter-separated text (TestMapper.java:26-28
  * CSV in, Runner.java:39-40 TSV out). Round-trip parity with parquet.
  */
class TablesSpec extends SparkSpec {

  test("TSV sink + text scan round-trips the golden computation") {
    val li = Tables.parquet(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber", "cast(floor(l_quantity) as bigint) as qty")
    val dir = Files.createTempDirectory("graft-tsv").toString + "/li"
    Tables.writeTsv(li, dir)

    val back = Tables.csv(spark, dir, sep = "\t")
      .toDF("l_orderkey", "l_linenumber", "qty")
      .selectExpr("cast(l_orderkey as bigint) l_orderkey",
        "cast(l_linenumber as int) l_linenumber", "cast(qty as bigint) qty")

    assert(back.count() === li.count())
    val a = li.groupBy("l_linenumber").sum("qty").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = back.groupBy("l_linenumber").sum("qty").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("eventsStream on an empty source dir declares the canonical schema") {
    // a not-yet-populated stream directory has no footers to peek —
    // setup must fall back to TimestampType instead of failing with
    // 'Unable to infer schema' (normal for srcDirs fed over time)
    val dir = Files.createTempDirectory("graft-empty-stream").toString
    val ds = Tables.eventsStream(spark, dir)
    assert(ds.isStreaming)
    assert(ds.schema("ts").dataType
      === org.apache.spark.sql.types.TimestampType)
  }

  test("eventsStream on a MISSING source dir fails setup loudly") {
    // the empty-dir fallback must not swallow a typo'd path — that
    // would surface as a stream silently producing zero rows forever
    val missing = Files.createTempDirectory("graft-gone").toString + "/nope"
    intercept[org.apache.spark.sql.AnalysisException] {
      Tables.eventsStream(spark, missing)
    }
  }

  test("text scan reads raw lines with glob support") {
    val dir = Files.createTempDirectory("graft-text").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "l1\nl2\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.txt"), "l3\n")
    val lines = Tables.text(spark, s"$dir/*.txt")
    assert(lines.count() === 3)
  }

  test("jsonl round-trips documents with declared schema, plain and gzip") {
    import spark.implicits._
    val docs = Seq((1L, "hello world", Map("src" -> "web")),
      (2L, "zweites dokument", Map("src" -> "book")))
      .toDF("doc_id", "text", "meta")
    for (codec <- Seq("none", "gzip")) {
      val dir = Files.createTempDirectory(s"graft-jsonl-$codec").toString
      Tables.writeJsonl(docs, dir, compression = codec)
      if (codec == "gzip") // really compressed shards on disk
        assert(new java.io.File(dir).listFiles.exists(_.getName.endsWith(".json.gz")))
      val back = Tables.jsonl(spark, dir,
        "doc_id bigint, text string, meta map<string,string>")
      assert(back.count() === 2)
      val row = back.filter($"doc_id" === 1L).collect().head
      assert(row.getAs[String]("text") === "hello world")
      assert(row.getAs[Map[String, String]]("meta") === Map("src" -> "web"))
    }
  }

  test("orc round-trips with predicate pushdown reaching the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val li = Tables.parquet(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    Tables.writeOrc(li, dir)
    val back = Tables.orc(spark, dir)
    assert(back.count() === li.count())
    val filtered = back.filter("l_quantity > 25.0")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_quantity"), plan)
    assert(filtered.count() ===
      li.filter("l_quantity > 25.0").count())
  }

  test("parquetMerged reconciles producer generations into the union schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-merge").toString
    // v1 producer never had `score`; v2 added it
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/v1")
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score")
      .write.parquet(s"$dir/v2")
    val merged = Tables.parquetMerged(spark, s"$dir/v1", s"$dir/v2")
    assert(merged.columns.sorted === Array("id", "name", "score"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("score"))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty) // null-filled, not dropped
    assert(rows(3L).contains(0.5) && rows(4L).contains(0.7))
    // plain read (no mergeSchema) must NOT silently pick one footer
    // when asked for the union: selecting score there would fail
    val plain = spark.read.parquet(s"$dir/v1")
    assert(!plain.columns.contains("score"))
  }

  test("csv sink + typed source round-trips delimiter/quote/newline content exactly") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain", 3.25),
      (2L, "comma, inside", -0.5),
      (3L, "a \"quoted\" part", 1e-7),
      (4L, "line\nbreak", 12345.6789))
      .toDF("id", "s", "v")
    val dir = Files.createTempDirectory("graft-csv").toString
    Tables.writeCsv(nasty, dir)
    // embedded newlines need the non-splittable multiLine reader —
    // the splittable default would mis-parse row 4's quoted break
    val back = Tables.csvTyped(spark, dir, "id bigint, s string, v double",
        multiLine = true)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(back === Map(
      1L -> ("plain", 3.25), 2L -> ("comma, inside", -0.5),
      3L -> ("a \"quoted\" part", 1e-7), 4L -> ("line\nbreak", 12345.6789)))
    // newline-free data round-trips through the SPLITTABLE default
    val tame = nasty.filter($"id" =!= 4L)
    val dir2 = Files.createTempDirectory("graft-csv2").toString
    Tables.writeCsv(tame, dir2)
    val back2 = Tables.csvTyped(spark, dir2, "id bigint, s string, v double")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(back2 === Map(
      1L -> ("plain", 3.25), 2L -> ("comma, inside", -0.5),
      3L -> ("a \"quoted\" part", 1e-7)))
  }

  test("jsonl declared schema surfaces malformed lines instead of dropping them") {
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "x.json"),
      """{"doc_id": 1, "text": "ok"}
        |not json at all
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val back = Tables.jsonl(spark, dir,
      "doc_id bigint, text string, _corrupt_record string")
    back.cache() // Spark requires parsed-result caching before querying
    try {        // the corrupt-record column on its own
      assert(back.count() === 3)
      assert(back.filter("_corrupt_record is not null").count() === 1)
    } finally back.unpersist()
  }
}
