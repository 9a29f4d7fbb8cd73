package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.TweetStream

/** The custom DSv2 MicroBatchStream source: rate-bounded micro-batches,
  * exactly-once row delivery, and composition with the shared tweet
  * extraction core.
  */
class ReplaySourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tweet(id: Long, ip: String) =
    s"""{"created_at":"2024-02-02","id":$id,"text":"c2 $ip","retweeted":false,"user":{"screen_name":"u$id"},"entities":{"hashtags":[],"urls":[]}}"""

  test("replay source: bounded batches, every record exactly once, through the IOC core") {
    val f = Files.createTempFile("tweets", ".jsonl")
    val n = 25
    Files.writeString(f, (1 to n).map(i => tweet(i, s"10.0.0.$i")).mkString("\n"))

    val raw = spark.readStream
      .format("graft.streaming.ReplayJsonlSource")
      .option("path", f.toString)
      .option("maxPerBatch", 7) // 25 rows → 4 micro-batches
      .load()
    assert(raw.isStreaming && raw.schema.fieldNames.toSeq == Seq("value"))

    val q = TweetStream.iocStream(raw)
      .writeStream.format("memory").queryName("replay_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val iocs = spark.table("replay_out").select("ioc")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(iocs == (1 to n).map(i => s"10.0.0.$i").sorted)   // all, exactly once
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4)  // rate-bounded batches
    assert(q.recentProgress.forall(_.numInputRows <= 7))
  }

  test("restart from checkpoint resumes at the committed offset - no reprocessing (S11)") {
    val f = Files.createTempFile("tweets_ckpt", ".jsonl")
    val ckpt = Files.createTempDirectory("replay_ckpt").toString
    val out = Files.createTempDirectory("replay_sink").toString
    Files.writeString(f, (1 to 10).map(i => tweet(i, s"10.1.0.$i")).mkString("\n"))

    def run(): Unit = {
      val raw = spark.readStream
        .format("graft.streaming.ReplayJsonlSource")
        .option("path", f.toString)
        .option("maxPerBatch", 4)
        .load()
      // durable file sink: appends across restarts would EXPOSE
      // reprocessing as duplicate rows (a memory sink is wiped per run)
      val q = TweetStream.iocStream(raw)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()                              // pass 1: consumes all 10 records
    // pass 2: more records arrive, then the query RESTARTS from the
    // same checkpoint — it must pick up only the 5 new ones
    Files.writeString(f,
      "\n" + (11 to 15).map(i => tweet(i, s"10.1.0.$i")).mkString("\n"),
      java.nio.file.StandardOpenOption.APPEND)
    run()

    val iocs = spark.read.parquet(out).select("ioc")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(iocs == (1 to 15).map(i => s"10.1.0.$i").sorted,
      s"restart reprocessed or lost records: $iocs")
  }

  test("Trigger.AvailableNow drains the whole file in rate-bounded batches, then terminates") {
    // Without SupportsTriggerAvailableNow, Spark's wrapper fixes the run's
    // end target at the FIRST latestOffset(start, limit) result — one
    // 7-row batch, silent 18-row loss, clean exit. StreamBench caught it
    // at 1M lines; this pins the contract at spec scale.
    val f = Files.createTempFile("tweets_an", ".jsonl")
    val n = 25
    Files.writeString(f, (1 to n).map(i => tweet(i, s"10.2.0.$i")).mkString("\n"))
    val raw = spark.readStream
      .format("graft.streaming.ReplayJsonlSource")
      .option("path", f.toString)
      .option("maxPerBatch", 7)
      .load()
    val q = TweetStream.iocStream(raw)
      .writeStream.format("memory").queryName("replay_an")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    val iocs = spark.table("replay_an").select("ioc")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(iocs == (1 to n).map(i => s"10.2.0.$i").sorted,
      "AvailableNow must drain ALL lines, exactly once")
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4, "still rate-bounded")
    assert(q.recentProgress.forall(_.numInputRows <= 7))
  }
}
