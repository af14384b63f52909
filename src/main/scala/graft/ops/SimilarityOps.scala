package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (SURVEY §2.2 Q13/Q16-Q17):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the 100 TB scale path.
  *
  * The inner loop is the native codegen'd [[graft.functions.VecDot]]
  * expression; norms are computed once per vector *before* the pair
  * join, so per-pair work is a single dot product. Accumulation order
  * matches the DuckDB oracle bit-for-bit (sequential double fold).
  */
object SimilarityOps {

  /** cos(a,b) given precomputed norms — round to 6 for cross-engine
    * comparability.
    */
  private def sim(a: String, b: String, normA: String, normB: String) =
    expr(s"round(vec_dot($a, $b) / ($normA * $normB), 6)")

  import OpsUtil.par

  private def withNorm(df: DataFrame, vecCol: String, normCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    par(df).withColumn(normCol, expr(s"sqrt(vec_dot($vecCol, $vecCol))"))
  }

  /** Q16: exact brute-force top-k cosine neighbors for each query
    * vector (vec_id < nQueries). The query side is tiny and broadcast;
    * the candidate scan is embarrassingly parallel, one pass over the
    * corpus; the window-rank top-k shuffles only (query_id, k) rows.
    */
  def bruteForceKnn(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val cands = withNorm(embeddings, "embedding", "cn")
    val queries = cands.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("cn").as("qn"))
    val scored = cands.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim", sim("q", "embedding", "qn", "cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "sim")
  }

  /** Q17: closest pairs across the corpus — candidate near-duplicates
    * by embedding cosine. Exact over all pairs at test scale; at
    * 100 TB one would first bucket with [[lshBuckets]] and run this
    * within buckets only (see [[lshKnn]] for the pattern).
    */
  def closestPairs(embeddings: DataFrame, topN: Int = 20): DataFrame = {
    val n = withNorm(embeddings, "embedding", "n")
    val l = n.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("n").as("na"))
    val r = n.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("n").as("nb"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("sim", sim("ea", "eb", "na", "nb"))
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

  /** Q16c: IVF (inverted-file) approximate kNN — the other standard
    * scale path: a coarse k-means quantizer (MLlib, fixed seed)
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells only, shrinking the candidate set ~nlist/nprobe.
    * Cell assignment is one ML transform; probe selection is a tiny
    * broadcast cross-join (queries × centroids).
    */
  def ivfKnn(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
             nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)

    val withFv = par(embeddings).withColumn("fv", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(withFv)
    val assigned = model.transform(withFv)
      .select(col("vec_id"), col("embedding"), col("cell"),
        expr("sqrt(vec_dot(embedding, embedding))").as("cn"))

    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")

    // nprobe nearest cells per query: ||q-c||² = |q|² - 2q·c + |c|²
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("cn").as("qn"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("dist2",
        expr("qn * qn - 2 * vec_dot(q, centroid) + vec_dot(centroid, centroid)"))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist2").asc, col("cell").asc)))
      .filter(col("pr") <= nprobe)
      .select(col("query_id").as("p_qid"), col("cell"))

    val cands = assigned.join(
        broadcast(probes.join(queries, col("p_qid") === col("query_id"))), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", sim("q", "embedding", "qn", "cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "sim")
  }

  /** Q16b: approximate top-k — queries only compare against vectors in
    * their own LSH bucket. Recall < 1 by construction; the join is on
    * the bucket key, so the candidate set (and the shuffle) shrinks by
    * ~2^numPlanes at scale.
    */
  def lshKnn(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
             numPlanes: Int = 4): DataFrame = {
    val bucketed = withNorm(lshBuckets(embeddings, numPlanes), "embedding", "cn")
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("cn").as("qn"), col("bucket"))
    val scored = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", sim("q", "embedding", "qn", "cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "sim")
  }
}
