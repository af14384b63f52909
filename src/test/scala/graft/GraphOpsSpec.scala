package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("nationTradeRank reproduces hand-computed integer PageRank on a 3-node graph") {
    // edges via the 4-way derivation: 0→1, 0→2, 1→2 (order o maps to
    // customer c, lineitem pairs it with a supplier s)
    val lineitem = Seq((1L, 10L), (2L, 10L), (3L, 11L))
      .toDF("l_orderkey", "l_suppkey")
    val orders = Seq((1L, 100L), (2L, 101L), (3L, 101L))
      .toDF("o_orderkey", "o_custkey")
    val customer = Seq((100L, 1), (101L, 2)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq(0, 1, 2).toDF("n_nationkey")
    // scale 1000, 1 iteration: r0 = 333 each, base = (150)/3 = 50
    //   node1 inflow: 333 div 2 = 166      → 50 + (85·166) div 100 = 191
    //   node2 inflow: 166 + 333 = 499      → 50 + (85·499) div 100 = 474
    //   node0 inflow: none                 → 50
    val out = GraphOps.nationTradeRank(lineitem, orders, customer, supplier,
        nation, iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 50L, 1L -> 191L, 2L -> 474L))
  }

  test("domainRank reproduces hand-computed integer PageRank on a 3-domain graph") {
    // same closed form as the nation test, over VARCHAR nodes:
    // a→b, a→c, b→c; scale 1000, 1 iteration
    val edges = Seq(("a.example", "b.example"), ("a.example", "c.example"),
      ("b.example", "c.example")).toDF("src", "dst")
    val out = GraphOps.domainRank(edges, iters = 1, scale = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a.example" -> 50L, "b.example" -> 191L,
      "c.example" -> 474L))
  }

  test("domainRank over planted pages: dangling targets rank, mass bounded") {
    val docs = graft.io.Tables.parquet(spark, sf, "documents")
    val edges = graft.ops.HtmlOps.domainEdges(
      graft.ops.HtmlOps.plantedHtmlCorpus(docs))
    val e = edges.collect().map(r => (r.getString(0), r.getString(1)))
    // src domains are the five fetch hosts; dst cover s<0..12>.example
    assert(e.map(_._1).toSet === (0 to 4).map(i => s"s$i.example").toSet)
    assert(e.map(_._2).toSet === (0 to 12).map(i => s"s$i.example").toSet)
    val out = GraphOps.domainRank(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every domain on either end is a node (link-target-only domains
    // are exactly what the frontier wants ranked)
    assert(out.keySet === (0 to 12).map(i => s"s$i.example").toSet)
    assert(out.values.forall(_ > 0))
    assert(out.values.sum <= 1000000000000L)
    // a target-only domain (s >= 5: never a fetch host, in-degree
    // only) still accumulates rank beyond the teleport base
    val base = ((15L * 1000000000000L) / 100) / out.size
    assert((5 to 12).exists(i => out(s"s$i.example") > base))
  }

  test("domain-rank artifact (q188): save/load round-trips bit-identically, meta gates the reload") {
    val docs = graft.io.Tables.parquet(spark, sf, "documents")
    val edges = graft.ops.HtmlOps.domainEdges(
      graft.ops.HtmlOps.plantedHtmlCorpus(docs))
    val base = java.nio.file.Files.createTempDirectory("graft-rank-")
    try {
      val scope = graft.core.Scopes.create(spark, base.toString)
      GraphOps.saveDomainRank(edges, scope, "rank")
      // the reload is BIT-IDENTICAL to the direct computation — the
      // artifact changes where the ranks live, never what they are
      val direct = GraphOps.domainRank(edges).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val loaded = GraphOps.loadDomainRank(spark, scope, "rank").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(loaded === direct)
      // the meta gate: a reader expecting a different trajectory
      // (iters or scale) must fail loudly, not read wrong-scale ranks
      val e1 = intercept[IllegalArgumentException] {
        GraphOps.loadDomainRank(spark, scope, "rank", expectIters = 5)
      }
      assert(e1.getMessage.contains("iters=5"))
      val e2 = intercept[IllegalArgumentException] {
        GraphOps.loadDomainRank(spark, scope, "rank",
          expectScale = 1000000L)
      }
      assert(e2.getMessage.contains("scale_pow10=6"))
      // a non-power-of-ten scale is not meta-recordable — refused at
      // save time, before anything is written
      intercept[IllegalArgumentException] {
        GraphOps.saveDomainRank(edges, scope, "bad", scale = 999L)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    }
  }

  test("nationTradeRank conserves bounded mass and favors sink nations over sources") {
    val lineitem = graft.io.Tables.parquet(spark, sf, "lineitem")
    val orders = graft.io.Tables.parquet(spark, sf, "orders")
    val customer = graft.io.Tables.parquet(spark, sf, "customer")
    val supplier = graft.io.Tables.parquet(spark, sf, "supplier")
    val nation = graft.io.Tables.parquet(spark, sf, "nation")
    val out = GraphOps.nationTradeRank(lineitem, orders, customer, supplier,
      nation).collect()
    assert(out.length === nation.count())
    // every rank positive; total never exceeds the scale (floor
    // divisions only ever leak mass, never create it)
    assert(out.forall(_.getLong(1) > 0))
    assert(out.map(_.getLong(1)).sum <= 1000000000000L)
  }
}
