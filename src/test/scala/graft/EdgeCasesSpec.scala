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

  test("RAKE on degenerate docs: all-stopword text vanishes, no-stopword text is one phrase") {
    val docs = Seq(
      (1L, "the of and in"),              // stopwords only → zero phrases
      (2L, "alpha beta gamma"),           // no stopwords → ONE whole-doc phrase
      (3L, "alpha the alpha the alpha")   // 3 identical 1-word phrases → rank ties by pid
    ).toDF("doc_id", "text")
    val rows = graft.functions.TextStats.rakeOn(docs).collect()
    assert(!rows.exists(_.getLong(0) == 1L), "all-stopword doc produced phrases")
    val d2 = rows.filter(_.getLong(0) == 2L)
    // each distinct word: degree 3 (one phrase of length 3), freq 1 → 3e6 each
    assert(d2.length == 1 && d2.head.getString(2) == "alpha beta gamma" &&
      d2.head.getLong(3) == 9000000L && d2.head.getLong(4) == 3L)
    val d3 = rows.filter(_.getLong(0) == 3L)
    // alpha: degree 1+1+1=3, freq 3 → wscore 1e6; three identical phrases,
    // deterministic rank order by pid
    assert(d3.length == 3 && d3.forall(r => r.getString(2) == "alpha" &&
      r.getLong(3) == 1000000L))
    assert(d3.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
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
