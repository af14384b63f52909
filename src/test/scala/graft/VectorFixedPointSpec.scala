package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Round-16 optimization gate: the native fixed-point vector
  * expressions (vec_quantize_fx / vec_l2q / l2q_argmin) must be
  * BIT-IDENTICAL to the composable Catalyst chains they replaced —
  * reconstructed verbatim here and compared row-for-row on the fixture
  * embeddings plus adversarial values (negative halves, exact .5
  * boundaries, zero vectors).
  */
class VectorFixedPointSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private def emb: DataFrame =
    graft.io.Tables.parquet(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .unionByName(Seq(
        (900001L, 0, Seq.fill(64)(0.0f)),
        (900002L, 1, (0 until 64).map(i => (i - 32) * 0.5f / (1 << 20))),
        (900003L, 2, (0 until 64).map(i => -1.5f + i * 0.046875f))
      ).toDF("vec_id", "label", "embedding"))

  test("vec_quantize_fx equals transform(round(x*s) cast long)") {
    val s = 1L << 20
    val a = emb.select(col("vec_id"),
      expr("vec_quantize_fx(embedding, 20)").as("q"))
    val b = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> cast(round(cast(x as double) * ${s}L) as long))").as("q"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("l2q_argmin equals the array_sort(transform(zip_with)) argmin chain") {
    val s = 1L << 20
    val seedRows: Seq[(Int, Seq[Long])] = Seq(
      1 -> Seq.fill(64)(0L),
      2 -> (0 until 64).map(i => i.toLong * 100),
      3 -> (0 until 64).map(i => -i.toLong * 100),
      4 -> Seq.fill(64)(0L)) // duplicate of seed 1: exercises the cid tie
    val base = emb.withColumn("__seeds", typedlit(seedRows))
    val fused = base
      .withColumn("m", expr("l2q_argmin(embedding, __seeds, 20)"))
      .select(col("vec_id"), col("m.cid"), col("m.d2"))
    val legacy = base
      .withColumn("vq", expr(
        s"transform(embedding, x -> cast(round(cast(x as double) * ${s}L) as long))"))
      .withColumn("m", element_at(array_sort(expr(
        """transform(__seeds, s -> struct(
          |  aggregate(zip_with(vq, s._2, (a, b) -> (a - b) * (a - b)),
          |            0L, (acc, x) -> acc + x) AS d2,
          |  s._1 AS cid))""".stripMargin)), 1))
      .select(col("vec_id"), col("m.cid"), col("m.d2"))
    assert(fused.exceptAll(legacy).isEmpty && legacy.exceptAll(fused).isEmpty)
  }

  test("vec_l2q equals the zip_with/aggregate distance chain") {
    val s = 1L << 20
    val sq = (0 until 64).map(i => (i * 37 % 200 - 100).toLong)
    val base = emb.withColumn("__sq", typedlit(sq))
    val fused = base.select(col("vec_id"),
      expr("vec_l2q(embedding, __sq, 20)").as("d2"))
    val legacy = base
      .withColumn("vq", expr(
        s"transform(embedding, x -> cast(round(cast(x as double) * ${s}L) as long))"))
      .select(col("vec_id"), expr(
        """aggregate(zip_with(vq, __sq, (a, b) -> (a - b) * (a - b)),
          |          0L, (acc, x) -> acc + x)""".stripMargin).as("d2"))
    assert(fused.exceptAll(legacy).isEmpty && legacy.exceptAll(fused).isEmpty)
  }

  test("kmeansStep trajectory is unchanged by the fused assignment") {
    // end-to-end: one Lloyd step over the fixture must produce the
    // same centroids as composing the legacy-shaped stages (the oracle
    // replays this trajectory — any drift is a correctness break)
    val e = graft.io.Tables.parquet(spark, sf, "embeddings")
    val step = SimilarityOps.kmeansStep(e)
    val viaAssign = SimilarityOps.labelCentroids(
      SimilarityOps.kmeansAssign(e, SimilarityOps.kmeansSeeds(e, 8))
        .select(col("cluster"), col("embedding")),
      labelCol = "cluster")
    assert(step.exceptAll(viaAssign).isEmpty && viaAssign.exceptAll(step).isEmpty)
  }
}
