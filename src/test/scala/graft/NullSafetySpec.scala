package graft

import graft.ops.{DedupOps, TextOps}

/** NULL/empty-text hardening: a web-scale corpus always contains rows
  * with missing or empty text, and every text-family operator must
  * degrade per-row (skip or zero), never crash the job or poison a
  * whole partition's output.
  */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private val dirty = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "   \n\t  "),
    (5L, "the quick brown fox jumps over the lazy dog again and again"))
    .toDF("doc_id", "text")

  test("dedup family skips null/blank docs and still pairs the real duplicates") {
    val exact = DedupOps.exactDedup(dirty.filter($"text".isNotNull))
    assert(exact.count() > 0)

    val lsh = DedupOps.minhashLshPairs(dirty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === Set((1L, 5L))) // null/blank rows pair with nothing

    val jac = DedupOps.jaccardPairs(dirty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac === Set((1L, 5L)))

    val win = DedupOps.winnowedPassagePairs(dirty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(win === Set((1L, 5L)))

    val cont = DedupOps.overlapPairs(dirty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont === Set((1L, 5L)))
  }

  test("text analysis emits rows for null/blank docs with zeroed or null stats") {
    val toks = TextOps.tokenCounts(dirty).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_ws_tokens")).toMap
    assert(toks(3L) === 0 && toks(4L) === 0)

    // stripRepeatedLines: empty text cleans to zero lines; the
    // whitespace doc keeps its tab line (trim is SPACE-only in both
    // engines — the q62/q87 shared convention)
    val stripped = TextOps.stripRepeatedLines(dirty.filter($"text".isNotNull))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("n_lines")).toMap
    assert(stripped(3L) === 0 && stripped(4L) === 1)

    // fingerprints/collocations simply see no grams from blank docs
    assert(TextOps.collocations(dirty, minCount = 2, topK = 5).count() > 0)
  }
}
