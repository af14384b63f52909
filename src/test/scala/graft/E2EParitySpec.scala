package graft

import java.sql.DriverManager

import graft.io.Jdbc
import graft.ops.MapReduceOps

/** The reference's full end-to-end integration flow, re-expressed:
  * RDBMS table → partitioned import with projection pushdown → unpivot
  * → grouped exact integer mean (tripwire) → export to a pre-existing
  * RDBMS table → assert the golden values (7 means, each exactly 3).
  * (reference: test/src/de/uni_stuttgart/ipvs_as/test/EndToEndTest.java:17-55,
  * golden value :52-54 — which the reference never asserts; we do.)
  */
class E2EParitySpec extends SparkSpec {

  private val url = "jdbc:derby:memory:e2edb;create=true"

  test("reference workload scale: 1.4M x 7 golden computation") {
    // The reference's E2E test input is exactly 1,400,000 tuples x 7 INT
    // columns (EndToEndTest.java:81); its cluster round-trip took a
    // Hadoop job submission. Same computation here, generated
    // distributed (no driver materialization), asserted + timed.
    val rows = 1400000L
    val df = spark.range(rows).selectExpr(
      (0 to 6).map(i => s"cast((id + $i) % 7 as bigint) as num$i"): _*)
    val t0 = System.nanoTime()
    val out = MapReduceOps.unpivotGroupedMean(df, (0 to 6).map(i => s"num$i"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1.4M x 7 unpivot+mean in $secs%.2f s")
    assert(out.length === 7)
    assert(out.forall(_.getLong(1) === 3L))
  }

  test("reference E2E parity: import -> unpivot/mean -> export, golden 3s") {
    val rows = 7 * 500
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE MINITABLE") catch { case _: Exception => }
      st.execute("CREATE TABLE MINITABLE (id INT PRIMARY KEY, " +
        (0 to 6).map(i => s"num$i INT").mkString(", ") + ", extra INT)")
      val ps = conn.prepareStatement(
        "INSERT INTO MINITABLE VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)")
      // numᵢ = (base + i) % 7 → every column's exact mean is 3
      // (reference: EndToEndTest.java:160-190)
      (0 until rows).foreach { b =>
        ps.setInt(1, b)
        (0 to 6).foreach(i => ps.setInt(2 + i, (b + i) % 7))
        ps.setInt(9, 999999) // projected away by the import query
        ps.addBatch()
        if (b % 500 == 499) ps.executeBatch()
      }
      ps.executeBatch()
      try st.execute("DROP TABLE E2EOUT") catch { case _: Exception => }
      st.execute("CREATE TABLE E2EOUT (id INT, mean INT)")

      // projection+filter pushdown: drop pk and 'extra' inside the RDBMS
      val imported = Jdbc.readPartitioned(spark, url, "", "",
        "SELECT id, num0, num1, num2, num3, num4, num5, num6 FROM MINITABLE",
        "id", 4).drop("ID")

      val means = MapReduceOps.unpivotGroupedMean(
        imported, imported.columns.toSeq)

      Jdbc.writeAppend(means.selectExpr("cast(id as int) id", "cast(mean as int) mean"),
        url, "", "", "E2EOUT")

      val rs = conn.createStatement()
        .executeQuery("SELECT id, mean FROM E2EOUT ORDER BY id")
      val out = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getInt(2))).toList
      assert(out === (0 to 6).map((_, 3)).toList)
    } finally conn.close()
  }
}
