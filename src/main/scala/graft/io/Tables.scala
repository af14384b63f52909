package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture/table access. The engine's native storage is columnar parquet
  * (vs the reference's newline-delimited HDFS text,
  * reference: src/de/uni_stuttgart/ipvs_as/MapReduceWSI.java:93-96);
  * text/CSV readers are kept for reference-parity ingest.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and convert (truncating) to
    * microsecond timestamps — the same ns→µs truncation DuckDB applies.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Newline-delimited delimiter-separated text, the reference's record
    * format (reference: test/src/.../TestMapper.java:26-28 — CSV lines).
    */
  def csv(spark: SparkSession, path: String, sep: String = ",",
          header: Boolean = false): DataFrame =
    spark.read.option("sep", sep).option("header", header.toString)
      .option("inferSchema", "false").csv(path)

  /** Schema-typed CSV source — the typed counterpart of [[csv]]:
    * caller-declared schema (never inferred — inference is a full
    * extra pass at scale and type-drifts on partial data), header-aware.
    *
    * `multiLine` controls the splittability tradeoff: the default
    * (false) splits files at line boundaries — the 100 TB path — but
    * cannot parse quoted EMBEDDED newlines; set true only for data
    * that carries them (each file then parses as one unit). The sink
    * quotes newlines per RFC 4180 either way.
    */
  def csvTyped(spark: SparkSession, path: String, schemaDdl: String,
               header: Boolean = true, multiLine: Boolean = false): DataFrame =
    spark.read.schema(schemaDdl).option("header", header.toString)
      // actually header-aware: validate the file's header against the
      // declared schema instead of applying it positionally (the
      // default enforceSchema=true silently mis-assigns columns when
      // file order/arity drifts from the DDL)
      .option("enforceSchema", "false")
      .option("multiLine", multiLine.toString).csv(path)

  /** CSV sink (quoted as needed, so embedded delimiters round-trip). */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** Raw (offset-less) text lines; glob patterns supported like the
    * reference's TextInputFormat config (reference: test/src/.../Runner.java:36-37).
    */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Tab-separated key/value text sink, the reference's output format
    * (reference: test/src/.../Runner.java:39-40; MapReduceWSIImpl.java:298).
    */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)

  /** JSON-lines source — the de-facto interchange format of LLM
    * training-data pipelines (one JSON document per line, splittable,
    * append-friendly). Schema is caller-declared, not inferred: at
    * 100 TB an inference pass is a second full read of the corpus,
    * and silent schema drift across shards is exactly what a declared
    * schema catches. Pass DDL like
    * `"doc_id bigint, text string, meta map<string,string>"`.
    * Compressed shards (.gz/.zst) read transparently.
    *
    * Malformed lines: PERMISSIVE mode parses them to all-NULL rows —
    * to SEE them, include `_corrupt_record string` in the DDL and the
    * raw offending line lands in that column (TablesSpec demonstrates;
    * note Spark requires caching the parsed result before querying
    * that column alone). For ingest that should hard-stop on bad data,
    * read with `.option("mode", "FAILFAST")` instead.
    */
  def jsonl(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).option("mode", "PERMISSIVE").json(path)

  /** JSON-lines sink; `compression` e.g. "gzip" for archival shards,
    * "none" for downstream-streamable output.
    */
  def writeJsonl(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** ORC — the other built-in columnar format (schema embedded,
    * predicate pushdown and column pruning like parquet); for
    * interchange with Hive-era warehouses.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Q121: SCHEMA-EVOLUTION read — a lake dataset whose producer grew
    * a column mid-stream: old shards lack it, new shards carry it.
    * `mergeSchema` reconciles per-file footers into the UNION schema
    * (by name, not position), null-filling the missing column in old
    * shards — the semantics every long-lived 100 TB dataset needs the
    * day a field is added, without rewriting history. Per-shard
    * footers are merged in a distributed job, so reconciliation cost
    * scales with file COUNT, not data volume; pushdown and pruning
    * still reach each file with its own physical schema.
    */
  def parquetMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
