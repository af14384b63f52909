package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.2 Q13/Q16-Q17):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the 100 TB scale path.
  *
  * Cosine is computed with higher-order expressions (`zip_with` +
  * `aggregate` — sequential left fold, so results are bit-identical
  * to any in-order evaluation incl. the DuckDB oracle), entirely
  * inside codegen; no UDFs.
  */
object SimilarityOps {

  /** dot(a, b) in double, sequential fold over element pairs. */
  private def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)"

  /** Rounded cosine similarity column between two array<float> cols. */
  def cosine(a: String, b: String): Column =
    expr(s"round(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})), 6)")

  /** Q16: exact brute-force top-k cosine neighbors for each query
    * vector (vec_id < nQueries). The query side is tiny and broadcast;
    * the candidate scan is embarrassingly parallel — at scale this is
    * one pass over the corpus with a per-partition top-k heap folded
    * by TakeOrdered semantics via the window-rank below.
    */
  def bruteForceKnn(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val cands = embeddings.select(col("vec_id"), col("embedding"))
    val scored = cands.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine("q", "embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "sim")
  }

  /** Q17: closest pairs across the corpus — candidate near-duplicates
    * by embedding cosine. Exact over all pairs (small side broadcast);
    * at 100 TB one would first bucket with [[lshBuckets]] and run this
    * within buckets only.
    */
  def closestPairs(embeddings: DataFrame, topN: Int = 20): DataFrame = {
    val l = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val r = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("sim", cosine("ea", "eb"))
      .orderBy(col("sim").desc, col("id_a").asc, col("id_b").asc)
      .limit(topN)
      .select("id_a", "id_b", "sim")
  }

  /** Deterministic pseudo-random hyperplanes: component d of plane p is
    * derived from md5("p:d") mapped to [-1, 1). Engine-portable (no
    * RNG state); any executor recomputes the same planes.
    */
  private def planeComponent(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 31)) - 1.0
  }

  /** Sign-bucket id per vector under `numPlanes` random hyperplanes —
    * the LSH partitioning primitive. One narrow projection, no shuffle.
    */
  def lshBuckets(embeddings: DataFrame, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes: Seq[Seq[Double]] =
      (0 until numPlanes).map(p => (0 until dim).map(d => planeComponent(p, d)))
    val bucketExpr = planes.zipWithIndex.map { case (plane, p) =>
      val arr = plane.mkString("array(", ", ", ")")
      s"(case when ${s"aggregate(zip_with(embedding, $arr, (x, y) -> cast(x as double) * y), cast(0 as double), (acc, v) -> acc + v)"} >= 0 then ${1L << p} else 0 end)"
    }.mkString(" + ")
    embeddings.withColumn("bucket", expr(s"cast($bucketExpr as bigint)"))
  }

  /** Q16b: approximate top-k — queries only compare against vectors in
    * their own LSH bucket. Recall < 1 by construction; the join is on
    * the bucket key, so the candidate set (and the shuffle) shrinks by
    * ~2^numPlanes at scale.
    */
  def lshKnn(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
             numPlanes: Int = 4): DataFrame = {
    val bucketed = lshBuckets(embeddings, numPlanes)
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("bucket"))
    val scored = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine("q", "embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "sim")
  }
}
