package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.EmailPipeline
import graft.sinks.ParquetSink
import graft.streaming.TweetStream

/** One extraction core, two execution modes: EmailPipeline is pure narrow
  * Column algebra, so the SAME function runs unchanged over a streaming file
  * source (the Structured-Streaming twin of the batch path; checkpoint +
  * file-source offsets replace the reference's meta.json last_run watermark).
  * Also covers observe() metrics and the partitioned parquet store.
  */
class StreamingEmailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emailRows = Seq(
    ("c1", "Alice", "Indicator update", "ip 127[.]0[.]0[.]1 done", Timestamp.valueOf("2024-03-01 09:30:00")),
    ("c2", "Bob", "Indicator digest", "url hxxps://x[.]y[.]com/z", Timestamp.valueOf("2024-03-02 10:00:00"))
  ).toDF("conversation_id", "sender", "subject", "body", "received_time")

  test("EmailPipeline runs unchanged as a streaming query over a file source") {
    val src = Files.createTempDirectory("emails").toString
    emailRows.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(emailRows.schema).parquet(src)
    val out = EmailPipeline(stream, "2026-08-12") // same function as batch
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("email_stream_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("email_stream_out")
      .select("id", "ioc", "type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("c1", "127.0.0.1", "ip"), ("c2", "https://x.y.com/z", "url")))
  }

  test("observe(): per-type counters surface in streaming progress (S11)") {
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    mem.addData(
      """{"created_at":"2024-02-02","id":1,"text":"c2 1.2.3.4 and d41d8cd98f00b204e9800998ecf8427e","retweeted":false,"user":{"screen_name":"u"},"entities":{"hashtags":[],"urls":[]}}""")
    val q = TweetStream.observed(TweetStream.iocStream(mem.toDF()))
      .writeStream.format("memory").queryName("observed_out")
      .outputMode("append").start()
    q.processAllAvailable()
    val metrics = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("ioc_counters")))
    q.stop()
    assert(metrics.nonEmpty)
    val m = metrics.last
    assert(m.getAs[Long]("ips") == 1L && m.getAs[Long]("hashes") == 1L
      && m.getAs[Long]("total") == 2L)
  }

  test("ParquetSink: hive partitioning by date_added/type enables pruning") {
    val dir = Files.createTempDirectory("iocstore").toString
    ParquetSink.write(EmailPipeline(emailRows, "2026-08-12"), dir)
    val back = spark.read.parquet(dir)
    // partition pruning: only the ip partition's files are scanned
    val pruned = back.filter(org.apache.spark.sql.functions.col("type") === "ip")
    assert(pruned.count() == 1)
    val dirs = Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
    assert(dirs.exists(_.contains("date_added=2026-08-12")))
  }
}
