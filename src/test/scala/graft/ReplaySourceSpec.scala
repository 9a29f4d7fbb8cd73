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
}
