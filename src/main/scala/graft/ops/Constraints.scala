package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q126: DATA-QUALITY CONSTRAINT AUDIT — declarative expectations over
  * a table (the Delta-constraints / deequ-style contract check a
  * pipeline runs before promoting a batch): row predicates, key
  * uniqueness, and referential integrity, each reported as
  * (check_name, n_checked, n_violations) so a gate can fail the batch
  * on any non-zero violation row.
  *
  * Scale design: ALL row predicates fold into ONE aggregation pass —
  * a conditional count per check inside a single scan (naively
  * auditing k constraints as k queries re-reads the table k times;
  * this is the difference between an audit that costs one scan and
  * one that costs a day at 100 TB). Uniqueness is one key-grouped
  * count (map-side partials bound the shuffle at distinct keys);
  * referential integrity is one LEFT ANTI join, broadcast when the
  * parent's key set is dimension-sized. Everything is integer counts
  * — engine-exact by construction.
  */
object Constraints {

  /** All `checks` (name → violation predicate) in one scan: the agg
    * computes one conditional sum per check, then unpivots to rows.
    */
  def audit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    // names are interpolated into the stack() selectExpr below — hold
    // them to the same identifier-simple contract as profile()'s columns
    require(checks.forall(_._1.matches("[A-Za-z0-9_]+")),
      "audit check names must be identifier-simple")
    val aggs = count(lit(1)).as("n_checked") +:
      checks.map { case (name, pred) =>
        sum(pred.cast("long")).as(s"v_$name")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map { case (name, _) =>
      s"'$name', v_$name"
    }.mkString(", ")
    wide.selectExpr("n_checked",
        s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)")
      .select(col("check_name"), col("n_checked"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
  }

  /** Key uniqueness: rows beyond the first occurrence of each key
    * count as violations (n_rows − n_distinct_keys over non-null
    * keys; null keys are reported by a row predicate instead).
    */
  def uniqueness(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    df.filter(key.map(_.isNotNull).reduce(_ && _))
      .groupBy(key: _*)
      .agg(count(lit(1)).as("n"))
      .agg(sum("n").as("n_checked"), sum(col("n") - 1).as("n_violations"))
      .select(lit(name).as("check_name"),
        coalesce(col("n_checked"), lit(0L)).as("n_checked"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
  }

  /** Referential integrity: child rows whose key has no parent
    * (orphans). Null child keys are not orphans — SQL FK semantics —
    * and belong to a row predicate check.
    */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame = {
    val checked = child.filter(col(childKey).isNotNull)
    val orphans = checked
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
    checked.agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"))
  }

  /** Q132: COLUMN PROFILE — per-column non-null / null / exact
    * distinct counts and min/max (rendered as strings so one report
    * schema covers every column type), the schema-discovery companion
    * to `audit`: run it on an unfamiliar batch to LEARN the bounds,
    * then freeze them as audit predicates.
    *
    * Scale design: all columns profile in ONE scan — a single
    * aggregate carrying 4 expressions per column; the multiple exact
    * `count(distinct)` aggregates plan as one Expand (k row-copies,
    * each keeping one column) feeding one shuffle, never k separate
    * scans of the table. The wide single-row result then unpivots
    * with `stack` — driver-side cost is k rows, nothing else. Min/max
    * is computed natively per type and cast to string only at the end,
    * so numeric comparison semantics are preserved.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(_.matches("[A-Za-z0-9_]+")),
      "profile column names must be identifier-simple")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")) }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
      .mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Q134: CONTENT DIGEST — an order-independent fingerprint of a
    * table's content: row count plus TWO combines of a 60-bit per-row
    * hash (md5 over the canonicalized column values): the XOR and the
    * mod-2^60 SUM. Two replicas match iff (n_rows, digest, digest_sum)
    * match — the cheap way to validate a migration, replication, or
    * engine swap without sorting either side or moving any rows.
    *
    * Scale design: embarrassingly parallel — a per-row projection
    * into one partial-aggregated (count, xor, sum) triple per
    * partition, merged associatively; no shuffle of data, O(1) result.
    * The two combines cover each other's blind spot: XOR is blind to
    * rows appearing an EVEN number of times (a paired add+remove of
    * the same row set cancels), which the wrap-around SUM catches; the
    * sum accumulates in decimal(38,0) and reduces mod 2^60 at the end,
    * so it is overflow-exact on both engines up to ~10^18 rows. Use
    * `snapshotDiff` when per-row attribution matters.
    *
    * Row canonicalization is COLLISION-FREE by construction: every
    * column renders as `length ':' value` with NULL as `-1:` — the
    * length prefix makes the encoding prefix-unambiguous, so values
    * containing the field separator, empty strings, and NULLs in any
    * position all hash distinctly (plain concat_ws SKIPS null columns,
    * which would make ("a", NULL) and (NULL, "a") collide). Callers
    * pick columns whose string rendering is engine-portable (integers,
    * strings — not floats).
    */
  def contentDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "contentDigest needs at least one column")
    df.agg(count(lit(1)).as("n_rows"), digestAggs(cols): _*)
  }

  /** The GROUPED form of [[contentDigest]]: one (n_rows, digest,
    * digest_sum) triple PER GROUP — the partition-granular fingerprint
    * that turns a corpus-sized comparison into an O(partitions) one
    * (compare a partitioned artifact against its recompute shard by
    * shard instead of exceptAll'ing whole tables). Same canonical row
    * encoding, same partial-agg scale shape; the only shuffle carries
    * one triple per (group × map partition).
    */
  def contentDigestBy(df: DataFrame, groupCols: Seq[String],
                      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "contentDigestBy needs at least one value column")
    require(groupCols.nonEmpty, "contentDigestBy needs at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), digestAggs(cols): _*)
  }

  private def digestAggs(cols: Seq[String]): Seq[org.apache.spark.sql.Column] = {
    val canon = concat_ws("\u0001", cols.map { c =>
      val s = col(c).cast("string")
      concat(coalesce(length(s), lit(-1)).cast("string"), lit(":"),
        coalesce(s, lit("")))
    }: _*)
    // 15 hex chars = 60 bits: inside the positive BIGINT range on
    // every engine, so the hex->int parse can never overflow-diverge
    val rowHash = conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    Seq(
      coalesce(bit_xor(rowHash), lit(0L)).as("digest"),
      coalesce(pmod(sum(rowHash.cast("decimal(38,0)")),
          lit(1152921504606846976L).cast("decimal(38,0)")), lit(0))
        .cast("long").as("digest_sum"))
  }
}
