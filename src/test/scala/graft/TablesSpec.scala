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

  test("text scan reads raw lines with glob support") {
    val dir = Files.createTempDirectory("graft-text").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "l1\nl2\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.txt"), "l3\n")
    val lines = Tables.text(spark, s"$dir/*.txt")
    assert(lines.count() === 3)
  }
}
