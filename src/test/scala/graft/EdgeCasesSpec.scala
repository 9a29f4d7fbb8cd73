package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the shared operator kernels: empty edge
  * lists, empty join sides, under-length documents, single-event sessions.
  * These are the shapes a 100 TB pipeline hits on its FIRST day (an empty
  * ingest batch, a new source with one record) — they must return empty/
  * identity results, not loop, throw, or fabricate rows.
  */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("componentLabels on an empty edge list returns empty without looping or throwing") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(graft.operators.Dedup.componentLabels(empty).count() == 0)
  }

  test("saltedJoin with an empty big side returns empty, not replicated dim rows") {
    val big = Seq.empty[(String, Long)].toDF("k", "v")
    val small = Seq(("a", 1L)).toDF("k", "w")
    assert(graft.operators.Salting
      .saltedJoin(big, small, Seq("k"), col("v"), 8).count() == 0)
  }

  test("shingleOccurrencesN emits nothing for docs shorter than n tokens") {
    val docs = Seq((1L, "one two"), (2L, "a b c d e")).toDF("doc_id", "text")
    val rows = graft.operators.Corpus.shingleOccurrencesN(docs, 5).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L) &&
      rows.head.getString(1) == "a b c d e")
  }

  test("session_window on a single event yields one [ts, ts+gap) session") {
    // timestamp built from an Instant, assertions on epoch millis — a
    // Timestamp.valueOf literal + string render would couple the test to
    // the host JVM's default timezone vs the UTC session zone
    val t0 = java.time.Instant.parse("2024-01-01T10:00:00Z")
    val e = Seq((1L, java.sql.Timestamp.from(t0))).toDF("user_id", "ts")
    val r = e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("w.end"), col("n"))
      .collect().head
    assert(r.getTimestamp(0).toInstant == t0 &&
      r.getTimestamp(1).toInstant == t0.plusSeconds(30 * 60) && r.getLong(2) == 1L)
  }
}
