package graft

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: (Long, String, String, Long)*) =
    rows.toDF("k", "ts_s", "typ", "id")
      .select(col("k"), col("ts_s").cast("timestamp").as("ts"),
        col("typ"), col("id"))

  test("gapFillDaily emits zero-count gap days with the running state carried") {
    // key 1: events on d1 (×2) and d4 — d2/d3 are gaps
    val out = TimeSeriesOps.gapFillDaily(
        feed(
          (1L, "2024-01-01 10:00:00", "view", 1L),
          (1L, "2024-01-01 12:00:00", "click", 2L),
          (1L, "2024-01-04 09:00:00", "buy", 3L)),
        "k", "ts", "typ", "id")
      .orderBy("day")
      .collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L, 2L, "click"), // day's LATEST event (max id)
      ("2024-01-02", 0L, 2L, "click"), // gap: count 0, type carried
      ("2024-01-03", 0L, 2L, "click"),
      ("2024-01-04", 1L, 3L, "buy")))
  }

  test("gapFillDaily spans are per key — no cross-key calendar bleed") {
    val out = TimeSeriesOps.gapFillDaily(
        feed(
          (1L, "2024-01-01 00:00:01", "a", 1L),
          (1L, "2024-01-10 00:00:01", "a", 2L),
          (2L, "2024-02-05 00:00:01", "b", 3L)),
        "k", "ts", "typ", "id")
    // key 1 densifies to its own 10 days; key 2 to exactly 1
    assert(out.filter($"k" === 1L).count() === 10)
    assert(out.filter($"k" === 2L).count() === 1)
  }

  test("gapFillDaily on a single-day key is the identity row") {
    val out = TimeSeriesOps.gapFillDaily(
        feed((7L, "2024-03-01 05:00:00", "x", 1L)),
        "k", "ts", "typ", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq === Seq((7L, 1L, 1L, "x")))
  }
}
