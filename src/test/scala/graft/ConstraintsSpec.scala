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

  test("profile reports nulls, exact distincts, and typed min/max per column") {
    val df = Seq(
      (Some(5L), Some("b")), (Some(10L), None),
      (Some(5L), Some("a")), (None, Some("a")))
      .toDF("num", "str")
    val out = Constraints.profile(df, Seq("num", "str"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // numeric min/max compared as LONGS before the string render:
    // min 5 / max 10, not the lexicographic "10" < "5"
    assert(out("num") === ((3L, 1L, 2L, "5", "10")))
    assert(out("str") === ((3L, 1L, 2L, "a", "b")))
  }

  test("profile of k columns stays a single scan (one Expand, one FileScan)") {
    val orders = graft.io.Tables.parquet(spark, sf, "orders")
    val plan = Constraints.profile(orders,
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).size === 1, plan)
  }

  test("profile rejects non-identifier column names") {
    val df = Seq(1L).toDF("ok")
    intercept[IllegalArgumentException] {
      Constraints.profile(df.withColumnRenamed("ok", "bad name"), Seq("bad name"))
    }
  }

  test("contentDigest is row-order independent and value sensitive") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("k", "v") // shuffled
    val c = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("k", "v") // one value off
    def dig(df: org.apache.spark.sql.DataFrame) =
      Constraints.contentDigest(df, Seq("k", "v")).collect().head
    val (da, db, dc) = (dig(a), dig(b), dig(c))
    assert(da.getLong(0) === 3L && da === db)
    assert(da.getLong(1) !== dc.getLong(1))
  }

  test("contentDigest separator disambiguates value boundaries") {
    val ab = Seq(("ab", "c")).toDF("x", "y")
    val a_bc = Seq(("a", "bc")).toDF("x", "y")
    assert(Constraints.contentDigest(ab, Seq("x", "y")).collect().head.getLong(1)
      !== Constraints.contentDigest(a_bc, Seq("x", "y")).collect().head.getLong(1))
  }

  test("contentDigest of an empty table is (0, 0, 0), not null") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val r = Constraints.contentDigest(empty, Seq("k", "v")).collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L && r.getLong(2) === 0L)
  }

  test("contentDigest distinguishes which column is NULL") {
    // plain concat_ws would render ("a", NULL) and (NULL, "a")
    // identically — the length-prefixed canonicalization must not
    val an = Seq((Some("a"), Option.empty[String])).toDF("x", "y")
    val na = Seq((Option.empty[String], Some("a"))).toDF("x", "y")
    val ae = Seq((Some("a"), Some(""))).toDF("x", "y") // NULL vs empty
    def dig(df: org.apache.spark.sql.DataFrame) =
      Constraints.contentDigest(df, Seq("x", "y")).collect().head.getLong(1)
    assert(dig(an) !== dig(na))
    assert(dig(an) !== dig(ae))
  }

  test("contentDigest disambiguates separator-bearing values next to NULLs") {
    val sep = ""
    val a = Seq((Some(s"a${sep}1b"), Some(""))).toDF("x", "y")
    val b = Seq((Some("a"), Some(s"1b$sep"))).toDF("x", "y")
    def dig(df: org.apache.spark.sql.DataFrame) =
      Constraints.contentDigest(df, Seq("x", "y")).collect().head.getLong(1)
    assert(dig(a) !== dig(b))
  }

  test("contentDigestBy fingerprints per group, consistent with the global digest") {
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"))
      .toDF("k", "g", "v")
    val by = Constraints.contentDigestBy(df, Seq("g"), Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by("a").getAs[Long]("n_rows") === 2L)
    assert(by("b").getAs[Long]("n_rows") === 1L)
    // a single-group digest equals the global digest of that slice —
    // the grouped form is the same fingerprint, partition-granular
    val global = Constraints.contentDigest(
      df.filter(col("g") === "b"), Seq("k", "v")).collect().head
    assert(by("b").getAs[Long]("digest") === global.getLong(1))
    assert(by("b").getAs[Long]("digest_sum") === global.getLong(2))
    // group-local change moves only that group's digest
    val moved = Seq((1L, "a", "x"), (2L, "a", "Y"), (3L, "b", "z"))
      .toDF("k", "g", "v")
    val by2 = Constraints.contentDigestBy(moved, Seq("g"), Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by2("a").getAs[Long]("digest") !== by("a").getAs[Long]("digest"))
    assert(by2("b").getAs[Long]("digest") === by("b").getAs[Long]("digest"))
  }

  test("contentDigest sum catches even-multiplicity duplication XOR misses") {
    val once = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val twice = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"), (2L, "y"))
      .toDF("k", "v")
    val da = Constraints.contentDigest(once, Seq("k", "v")).collect().head
    val db = Constraints.contentDigest(twice, Seq("k", "v")).collect().head
    // same distinct rows, different multiset → digest_sum must differ
    assert(da.getLong(2) !== db.getLong(2))
  }

  test("audit rejects non-identifier check names") {
    val df = Seq(1L).toDF("ok")
    intercept[IllegalArgumentException] {
      Constraints.audit(df, Seq("bad'name" -> col("ok").isNull))
    }
  }
}
