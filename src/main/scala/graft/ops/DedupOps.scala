package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface
  * (SURVEY §2.2 Q12): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB): every variant is shuffle-bounded —
  *  - exact: one hash-partitioned aggregation on a 128-bit digest
  *    (shuffle carries (digest, doc_id), never the text);
  *  - MinHash/LSH: signatures are computed partition-local from
  *    shingles (explode → partial min-agg map-side), candidate pairs
  *    come from a self-equi-join on (band, bandHash) — i.e. only
  *    near-collisions ever meet, no O(n²) anywhere;
  *  - SimHash: one pass to 64 signature rows/doc partials, banded
  *    byte-join for candidates, Hamming filter on a single long;
  *  - Jaccard: inverted-index equi-join on shingle (selective because
  *    shingles are n-grams, not unigrams), count-based exact Jaccard.
  *
  * Hashing is md5-based (not Spark's murmur `hash()`) so signatures
  * are engine-portable and the DuckDB oracle reproduces them exactly.
  */
object DedupOps {

  private val tokensExpr = "filter(split(trim(text), '\\\\s+'), x -> x <> '')"

  /** Word n-gram shingles; docs shorter than n shingle to nothing.
    * (Spark's `sequence` descends when start > stop, hence the guard.)
    */
  private def shingleExpr(n: Int): String =
    s"""case when size(w) >= $n
       |  then transform(sequence(0, size(w) - $n),
       |                 i -> concat_ws(' ', slice(w, i + 1, $n)))
       |  else array() end""".stripMargin

  /** Q12: exact dedup by content digest of the normalized text.
    * Emits one row per distinct content: representative (min) doc_id
    * + multiplicity. `dropDuplicates` gives the same via built-ins;
    * this form also reports group sizes.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "fp", "n_copies")

  /** MinHash signature rows: (doc_id, seed s, minhash h) where
    * h = min over shingles of md5("s:" || shingle). Partial min-agg
    * combines map-side; only (doc, seed, 32-byte hash) rows shuffle.
    */
  private def minhashRows(documents: DataFrame, numHashes: Int, shingleSize: Int): DataFrame =
    documents
      .withColumn("w", expr(tokensExpr))
      .select(col("doc_id"), explode(expr(shingleExpr(shingleSize))).as("g"))
      .select(col("doc_id"), explode(expr(s"sequence(0, ${numHashes - 1})")).as("s"), col("g"))
      .groupBy("doc_id", "s")
      .agg(min(md5(concat(col("s").cast("string"), lit(":"), col("g")))).as("h"))

  /** Q13: MinHash + LSH banding near-dup candidates. Bands of
    * `bandSize` consecutive signature slots are hashed; docs sharing
    * any (band, bandHash) bucket become a candidate pair.
    */
  def minhashLshPairs(documents: DataFrame, numHashes: Int = 12,
                      bandSize: Int = 2, shingleSize: Int = 3): DataFrame = {
    val bands = minhashRows(documents, numHashes, shingleSize)
      .groupBy(col("doc_id"), expr(s"s div $bandSize").as("b"))
      .agg(md5(concat_ws("|",
        expr("transform(array_sort(collect_list(struct(s, h))), x -> x.h)"))).as("bh"))
    val l = bands.select(col("doc_id").as("doc_a"), col("b"), col("bh"))
    val r = bands.select(col("doc_id").as("doc_b"), col("b"), col("bh"))
    l.join(r, Seq("b", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Q14: 32-bit SimHash signature per document: per-bit majority vote
    * over token hashes (token hash = first 8 hex chars of md5 →
    * uint32). One explode (tokens × 32 bits) + two aggregations.
    */
  def simhashSignatures(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(expr(tokensExpr)).as("tok"))
      .select(col("doc_id"),
        expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)").as("th"))
      .select(col("doc_id"), expr("explode(sequence(0, 31))").as("j"), col("th"))
      .groupBy("doc_id", "j")
      .agg(sum(expr("case when ((th >> j) & 1) = 1 then 1 else -1 end")).as("vote"))
      .groupBy("doc_id")
      .agg(sum(expr("case when vote > 0 then shiftleft(cast(1 as bigint), j) else cast(0 as bigint) end"))
        .as("simhash"))

  /** Q14b: SimHash near-dup candidate pairs — byte-banding (two docs
    * within Hamming distance ≤ 3 of a 32-bit signature share at least
    * one of the 4 bytes), verified with an exact popcount filter.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(documents)
    val banded = sig.select(col("doc_id"), col("simhash"),
      expr("explode(sequence(0, 3))").as("k"))
      .withColumn("byte", expr("(simhash >> (8 * k)) & 255"))
    val l = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"),
      col("k"), col("byte"))
    val r = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
      col("k"), col("byte"))
    l.join(r, Seq("k", "byte"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(sig_a ^ sig_b) as int)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Q15: exact n-gram Jaccard similarity via inverted-index equi-join
    * on shingles — only docs sharing ≥1 shingle are compared.
    */
  def jaccardPairs(documents: DataFrame, shingleSize: Int = 3,
                   threshold: Double = 0.3): DataFrame = {
    val sh = documents
      .withColumn("w", expr(tokensExpr))
      .select(col("doc_id"), explode(expr(shingleExpr(shingleSize))).as("g"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val l = sh.select(col("doc_id").as("doc_a"), col("g"))
    val r = sh.select(col("doc_id").as("doc_b"), col("g"))
    l.join(r, "g").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        expr("round(cast(common as double) / (sz_a + sz_b - common), 6)"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
