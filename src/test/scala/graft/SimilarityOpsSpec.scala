package graft

import graft.ops.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("bruteForceKnn ranks an identical vector first with sim 1.0") {
    val v = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    val d = vecs(0L -> v, 10L -> v, 11L -> Seq(4.0f, 3.0f, 2.0f, 1.0f),
      12L -> Seq(-1.0f, -2.0f, -3.0f, -4.0f))
    val out = SimilarityOps.bruteForceKnn(d, nQueries = 1, k = 3).collect()
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.head.getAs[Long]("vec_id") === 10L)
    assert(out.head.getAs[Double]("sim") === 1.0)
    assert(out.last.getAs[Long]("vec_id") === 12L) // anti-parallel last
    assert(out.last.getAs[Double]("sim") === -1.0)
  }

  test("lshBuckets: identical vectors land in the same bucket") {
    val v = (0 until 64).map(_.toFloat)
    val d = vecs(0L -> v, 1L -> v, 2L -> v.map(x => -x))
    val b = SimilarityOps.lshBuckets(d).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b(0L) === b(1L))
    assert(b(0L) !== b(2L)) // antipodal vector flips every sign bit
  }

  test("lshKnn finds the identical vector in the same bucket") {
    val v = (0 until 64).map(_.toFloat + 1f)
    val d = vecs(0L -> v, 10L -> v, 11L -> v.map(x => -x))
    val out = SimilarityOps.lshKnn(d, nQueries = 1, k = 5).collect()
    assert(out.exists(r => r.getAs[Long]("vec_id") == 10L && r.getAs[Double]("sim") == 1.0))
    assert(!out.exists(r => r.getAs[Long]("vec_id") == 11L))
  }

  test("ivfKnn probes the query's own cell and finds its duplicate") {
    // 3 well-separated groups of near-identical 64-dim vectors
    def grp(center: Float, n: Int, from: Long) =
      (0 until n).map(i => (from + i,
        (0 until 64).map(d => center + (if (d == (i % 64)) 0.001f else 0f))))
    val d = vecs((grp(1f, 20, 0L) ++ grp(-1f, 20, 100L) ++ grp(5f, 20, 200L)): _*)
    val dup = vecs((0L, (0 until 64).map(d => 1f + (if (d == 0) 0.001f else 0f)))).collect()
    val out = SimilarityOps.ivfKnn(d, nQueries = 1, k = 5, nlist = 3, nprobe = 1)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(out.nonEmpty)
    // all neighbors come from the query's own (first) group
    assert(out.forall(r => r.getAs[Long]("vec_id") < 100L))
    assert(out.head.getAs[Double]("sim") > 0.999)
  }

  test("closestPairs returns the most similar pair first") {
    val d = vecs(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0.99f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f))
    val out = SimilarityOps.closestPairs(d, topN = 3).collect()
    assert((out.head.getLong(0), out.head.getLong(1)) === (0L, 1L))
  }
}
