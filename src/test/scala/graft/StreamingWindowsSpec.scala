package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming window semantics (SURVEY.md §2.9 extensions): tumbling window
  * aggregation and session windows with watermarks over a memory stream —
  * the streaming twins of the batch `events_tumbling` / `events_sessionize`
  * oracle queries.
  */
class StreamingWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("tumbling 10-minute windows with watermark over a stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0),
      (ts(11), "click", 5.0), (ts(12), "buy", 7.0))
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("tumbling_out")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 10:10:00", "click", 1L, 5.0),
      ("2024-01-01 10:10:00", "buy", 1L, 7.0)))
  }

  test("sliding 10/5-minute windows assign each event to two windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    mem.addData((ts(7), 2.0), (ts(12), 3.0))
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(sum(col("value")).as("v"))
    val q = agg.writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sliding_out")
      .select(col("window.start").cast("string"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSet
    // 10:07 → windows starting 10:00 and 10:05; 10:12 → 10:05 and 10:10
    assert(rows == Set(
      ("2024-01-01 10:00:00", 2.0),
      ("2024-01-01 10:05:00", 5.0),
      ("2024-01-01 10:10:00", 3.0)))
  }

  test("sliding windows, append mode: watermark finalizes windows and drops late data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(sum(col("value")).as("v"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sliding_late_out")
      .outputMode("append").start()

    // batch 1: on-time events at 10:07 and 10:12
    mem.addData((ts(7), 2.0), (ts(12), 3.0)); q.processAllAvailable()
    // batch 2: 10:40 advances the watermark to 10:30 — every window ending
    // at or before 10:30 is finalized and emitted (append semantics)
    mem.addData((ts(40), 1.0)); q.processAllAvailable()
    // batch 3: 10:02 is 28 minutes behind the watermark — its windows
    // ([09:55,10:05) and [10:00,10:10)) are already final; it must be
    // DROPPED, not re-opened and not re-emitted
    mem.addData((ts(2), 100.0)); q.processAllAvailable()
    q.stop()

    val rows = spark.table("sliding_late_out")
      .select(col("window.start").cast("string"), col("v"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // finalized windows only, with NO contribution from the late 100.0:
    // 10:07 → [10:00,10:10) and [10:05,10:15); 10:12 → [10:05,10:15) and
    // [10:10,10:20). The 10:40 windows are still open → not emitted.
    assert(rows == Set(
      ("2024-01-01 10:00:00", 2.0, 1L),
      ("2024-01-01 10:05:00", 5.0, 2L),
      ("2024-01-01 10:10:00", 3.0, 1L)))
    // the late row was dropped by the watermark, not merely unfinalized
    val dropped = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped >= 1)
  }

  test("stream-stream interval join: watermarked, time-bounded, state-bounded") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val v = views.toDF().toDF("view_ts", "ad")
      .withWatermark("view_ts", "10 minutes")
    val c = clicks.toDF().toDF("click_ts", "click_ad")
      .withWatermark("click_ts", "10 minutes")
    // attribution join: a click matches a view of the same ad within the
    // following 5 minutes — the time bound is what lets Spark EVICT state
    // once the watermark passes, so state never grows unboundedly
    val joined = v.join(c, expr(
      "ad = click_ad AND click_ts >= view_ts AND click_ts <= view_ts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    views.addData((ts(0), 1L), (ts(10), 2L))
    clicks.addData((ts(3), 1L), (ts(20), 2L)) // ad 2's click is 10 min late → no match
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssjoin_out")
      .select(col("ad"), col("view_ts").cast("string"), col("click_ts").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1L, "2024-01-01 10:00:00", "2024-01-01 10:03:00")))
  }

  test("session windows (5-minute gap) split on inactivity") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    // user 1: events at 10:01,10:03 (one session) then 10:20 (new session)
    mem.addData((ts(1), 1L), (ts(3), 1L), (ts(20), 1L))
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val ns = spark.table("session_out").select("n")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ns == Seq(1L, 2L))
  }
}
