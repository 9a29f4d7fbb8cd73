package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TweetPipeline
import graft.sinks.{FileTransport, RestBatchSink}
import graft.streaming.{DocsIngestStream, TweetStream}

/** In-JVM model of the Splunk KV store for exactly-once assertions: a
  * payload is a JSON array of records; a record WITH `_key` upserts (the
  * batch_save contract RestBatchSink's `keyed = true` relies on), one
  * WITHOUT gets a fresh server-assigned key (every delivery duplicates —
  * the reference's framing). Static maps so local-mode executor threads
  * and the driver share state; `storeId` isolates tests. */
final class KvStoreTransport(storeId: String) extends graft.sinks.Transport {
  def post(endpoint: String, payload: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(payload)
    val it = arr.elements()
    while (it.hasNext) {
      val rec = it.next()
      val key =
        if (rec.has("_key")) rec.get("_key").asText()
        else java.util.UUID.randomUUID().toString
      KvStoreTransport.store
        .computeIfAbsent(storeId, _ => new java.util.concurrent.ConcurrentHashMap())
        .put(key, rec.toString)
    }
    KvStoreTransport.posts.merge(storeId, 1L, (a, b) => a + b)
  }
}
object KvStoreTransport {
  val store = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, String]]()
  val posts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  def snapshot(storeId: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    Option(store.get(storeId)).map(_.asScala.toMap).getOrElse(Map.empty)
  }
  def postCount(storeId: String): Long = posts.getOrDefault(storeId, 0L)
}

/** Streaming + sink specs: MemoryStream of raw tweet JSON through the shared
  * extraction core, checkpointed foreachBatch → batched REST sink with the
  * file transport (FIXTURES.md §A2 cases).
  */
class TweetStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tweet(id: Long, text: String, retweeted: Boolean = false,
                    extended: Option[String] = None, user: String = "acct",
                    hashtags: Seq[String] = Seq("malware"),
                    urls: Seq[String] = Nil): String = {
    val ext = extended.map(t => s""","extended_tweet":{"full_text":"$t"}""").getOrElse("")
    val tags = hashtags.map(h => s"""{"text":"$h"}""").mkString(",")
    val us = urls.map(u => s"""{"expanded_url":"$u"}""").mkString(",")
    s"""{"created_at":"2024-02-02","id":$id,"text":"$text","retweeted":$retweeted$ext,"user":{"screen_name":"$user"},"entities":{"hashtags":[$tags],"urls":[$us]}}"""
  }

  test("flatten: retweet filter, extended-text coalesce, hashtag join (P2-P4)") {
    val raw = Seq(
      tweet(1, "c2 at 1.2.3.4"),
      tweet(2, "RT @x: 5.6.7.8"),                       // RT-prefix → dropped
      tweet(3, "9.9.9.9", retweeted = true),            // flag → dropped
      tweet(4, "short", extended = Some("long 4.4.4.4 text"),
        hashtags = Seq("emotet", "malspam"))
    ).toDF("value")
    val flat = TweetPipeline.flatten(raw).collect().map(r => r.getString(0) -> r).toMap
    assert(flat.keySet == Set("1", "4"))
    assert(flat("4").getString(1) == "long 4.4.4.4 text") // extended wins
    assert(flat("4").getString(3) == "emotet;malspam")
  }

  test("streaming end-to-end: MemoryStream → extraction → batched REST sink") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      tweet(10, "c2 172.16.0.9 sample d41d8cd98f00b204e9800998ecf8427e"),
      tweet(11, "RT @x: ignored 1.1.1.1"),
      tweet(12, "drop hxxp://cdn.evil.net/x"))
    val outDir = Files.createTempDirectory("resttest").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = TweetStream.start(mem.toDF(), "kv/batch_save", new FileTransport(outDir), ckpt)
    q.awaitTermination(60000)

    val lines = Files.list(java.nio.file.Paths.get(outDir)).toArray.toSeq
      .flatMap(p => scala.io.Source.fromFile(p.toString).getLines())
    // every payload is a JSON array; 3 IOCs total (ip, hash, url), RT dropped
    assert(lines.nonEmpty && lines.forall(l => l.startsWith("[") && l.endsWith("]")))
    val all = lines.mkString
    assert(all.contains("172.16.0.9") && all.contains("d41d8cd98f00b204e9800998ecf8427e")
      && all.contains("hxxp://cdn.evil.net/x"))
    assert(!all.contains("1.1.1.1"))
  }

  test("exactly-once per epoch: a replayed committed micro-batch leaves the KV end state unchanged") {
    // The failure this proves out: crash AFTER the sink posted an epoch but
    // BEFORE the checkpoint commit-marker landed. On restart Spark sees
    // offsets/0 without commits/0 and re-runs epoch 0 — foreachBatch is
    // at-least-once by contract. Deleting the commit marker between two
    // runs over the same checkpoint reproduces that crash window exactly.
    val srcDir = Files.createTempDirectory("replay_src")
    Files.writeString(srcDir.resolve("batch0.jsonl"), Seq(
      tweet(70, "c2 at 172.16.9.9 and hash d41d8cd98f00b204e9800998ecf8427e"),
      tweet(71, "drop hxxp://cdn.evil.net/x", user = "mallory"),
      tweet(72, "RT @x: ignored 1.1.1.1")).mkString("\n"))
    val ckpt = Files.createTempDirectory("ckpt_replay").toString
    val storeId = "replay-" + java.util.UUID.randomUUID()
    def run(): Unit = {
      val q = TweetStream.start(spark.readStream.text(srcDir.toString),
        "kv/batch_save", new KvStoreTransport(storeId), ckpt)
      q.awaitTermination(60000)
      q.stop() // AvailableNow self-terminates; stop() only forces cleanup
      // the checkpoint-in-use registry is released asynchronously after
      // termination — restarting before that looks like a concurrent query
      val deadline = System.currentTimeMillis + 30000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    }
    run()
    val state1 = KvStoreTransport.snapshot(storeId)
    val posts1 = KvStoreTransport.postCount(storeId)
    assert(state1.size == 3 && posts1 > 0,
      s"first delivery wrong: ${state1.size} records, $posts1 posts")
    // simulate the post-commit crash: offsets/0 stays, commits/0 vanishes
    // (with its Hadoop .crc sidecar — a stale checksum blocks the rewrite)
    Files.delete(java.nio.file.Paths.get(ckpt, "commits", "0"))
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    run()
    assert(KvStoreTransport.postCount(storeId) > posts1,
      "epoch 0 was not redelivered — the replay did not actually happen")
    assert(KvStoreTransport.snapshot(storeId) == state1,
      "replayed epoch changed the KV end state — keyed upsert is not idempotent")
  }

  test("unkeyed replay duplicates — the _key is what carries exactly-once (control case)") {
    import org.apache.spark.sql.functions.col
    val storeId = "unkeyed-" + java.util.UUID.randomUUID()
    val df = Seq(("c1", "1.2.3.4", "ip"), ("c1", "5.6.7.8", "ip"))
      .toDF("id", "ioc", "type").coalesce(1)
    val t = new KvStoreTransport(storeId)
    RestBatchSink.write(df, "ep", t)                // reference framing: no _key
    RestBatchSink.write(df, "ep", t)                // the same epoch, redelivered
    assert(KvStoreTransport.snapshot(storeId).size == 4,
      "server-assigned keys must duplicate on replay — otherwise the keyed test proves nothing")
  }

  test("keyed delivery collapses identical rows within an epoch; unkeyed preserves them (documented trade)") {
    // TweetStream.start's scaladoc: identical rows collapse to one KV
    // record under keying (_key = md5 of the row), while the unkeyed
    // reference framing preserves duplicates. Pin both halves.
    val dup = Seq(("c1", "1.2.3.4", "ip"), ("c1", "1.2.3.4", "ip"), ("c2", "5.6.7.8", "ip"))
      .toDF("id", "ioc", "type").coalesce(1)
    val keyedId = "collapse-" + java.util.UUID.randomUUID()
    RestBatchSink.write(dup, "ep", new KvStoreTransport(keyedId), keyed = true)
    assert(KvStoreTransport.snapshot(keyedId).size == 2,
      "keyed upsert must collapse the identical pair to one record")
    val unkeyedId = "preserve-" + java.util.UUID.randomUUID()
    RestBatchSink.write(dup, "ep", new KvStoreTransport(unkeyedId))
    assert(KvStoreTransport.snapshot(unkeyedId).size == 3,
      "unkeyed (reference framing) must preserve duplicates")
  }

  test("RestBatchSink chunks at batchSize and flushes the remainder (S8)") {
    val outDir = Files.createTempDirectory("chunks").toString
    val df = (1 to 7).toDF("n").coalesce(1)
    RestBatchSink.write(df, "ep", new FileTransport(outDir), batchSize = 3)
    val lines = Files.list(java.nio.file.Paths.get(outDir)).toArray.toSeq
      .flatMap(p => scala.io.Source.fromFile(p.toString).getLines())
    // 7 rows at batch 3 → 3 posts (3+3+1)
    assert(lines.size == 3)
    assert(lines.map(_.count(_ == '{')).sorted == Seq(1, 3, 3))
  }

  test("streaming dedup within watermark bounds duplicate IOCs") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      tweet(20, "hit 5.5.5.5"), tweet(21, "hit again 5.5.5.5"), tweet(22, "other 6.6.6.6"))
    val deduped = TweetStream.dedupedStream(TweetStream.iocStream(mem.toDF()))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val iocs = spark.table("dedup_out").select("ioc").collect().map(_.getString(0)).sorted
    assert(iocs.toSeq == Seq("5.5.5.5", "6.6.6.6"))
  }

  test("streaming near-dup: SimHash-colliding texts collapse within the watermark") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    implicit val sq = spark.sqlContext
    // 11 distinct tokens × 5 repeats: every SimHash bit's vote margin is
    // ≥ 5 (odd distinct count → no zero margins), so ONE extra token
    // (±1 per bit) cannot flip any bit — the near-dup collision is
    // guaranteed by construction, not found by luck
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lam")
    val base = Seq.fill(5)(words).flatten.mkString(" ")
    val nearDup = base + " extra"
    val other = "completely different spam about nothing interesting here today"
    val sh = Seq(base, nearDup, other).toDF("text")
      .select(graft.functions.TextStats.simhash(
        graft.functions.TextStats.tokens(col("text"))).as("s"))
      .collect().map(_.getString(0))
    assert(sh(0) == sh(1), "near-identical texts must share a SimHash")
    assert(sh(0) != sh(2), "distinct texts must differ")

    val mem = MemoryStream[String]
    mem.addData(tweet(50, base), tweet(51, nearDup), tweet(52, other))
    val flat = TweetPipeline.flatten(mem.toDF())
      .withColumn("created_at", to_timestamp(col("created_date")))
    val q = TweetStream.nearDedupedStream(flat).writeStream.format("memory")
      .queryName("neardup_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("neardup_out").select("id").collect()
      .map(_.getString(0)).toSet
    assert(ids.size == 2 && ids.contains("52"),
      s"expected one survivor of the near-dup pair plus the distinct tweet, got $ids")
  }


  test("DocsIngestStream: quality gate + near-dedup admit the same docs streaming and batch") {
    implicit val sq = spark.sqlContext
    // 11 DISTINCT tokens (odd): every SimHash bit-sum is a nonzero
    // multiple of the repeat count, so appending one extra token can
    // never flip a bit — the same guarantee the near-dup spec above uses
    val words = Seq("the", "a", "and", "of", "to", "in", "data", "spark",
      "join", "sort", "merge")
    // high-quality body (stopword-rich, long); a near-dup; junk that fails the gate
    val good = Seq.fill(10)(words).flatten.mkString(" ")
    val nearDup = good + " extra"
    val junk = "@@@@ ##### !!!!"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = Seq((1L, good, t0), (2L, nearDup, t0), (3L, junk, t0))

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    mem.addData(rows: _*)
    val stream = DocsIngestStream.admitted(
      mem.toDF().toDF("doc_id", "text", "ingest_ts"))
    val q = stream.writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ingest_out").select("doc_id").collect()
      .map(_.getLong(0)).toSet

    val batch = DocsIngestStream.admitted(
      rows.toDF("doc_id", "text", "ingest_ts"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(streamed == Set(1L), s"stream admitted $streamed")
    assert(batch == streamed, s"batch twin admitted $batch, stream admitted $streamed")
  }

  test("ingest warnings surface as observed metrics (firehose.py:33-34,52-53)") {
    implicit val sq = spark.sqlContext
    val long = "x" * 150
    val mem = MemoryStream[String]
    mem.addData(
      tweet(40, long),                                   // truncated, no extended
      tweet(41, long, extended = Some("full text 1.2.3.4")), // extended → NOT counted
      tweet(42, "two pastes", urls = Seq(
        "https://pastebin.com/a", "https://pastebin.com/b")), // multi-pastebin
      tweet(43, "plain 5.5.5.5", urls = Seq("https://example.com/z")))
    val flat = TweetStream.observedWarnings(
      TweetPipeline.flatten(mem.toDF(), withWarnings = true))
    val q = TweetPipeline.extract(flat).writeStream.format("memory")
      .queryName("warn_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val metrics = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("ingest_warnings")))
    assert(metrics.nonEmpty, "no ingest_warnings metrics in any progress event")
    assert(metrics.map(_.getLong(0)).sum == 1L) // truncated_no_extended
    assert(metrics.map(_.getLong(1)).sum == 1L) // multi_pastebin_links
  }

  test("track filter keeps only tracked hashtags (S4 semantics, in-engine)") {
    val raw = Seq(
      tweet(30, "a 1.2.3.4", hashtags = Seq("emotet")),
      tweet(31, "b 5.6.7.8", hashtags = Seq("kittens"))
    ).toDF("value")
    val kept = TweetStream.trackFilter(TweetPipeline.flatten(raw), Seq("emotet", "ransomware"))
      .collect().map(_.getString(0))
    assert(kept.toSeq == Seq("30"))
  }

  test("sighting rollup maintained by streaming aggregation ≡ batch rebuild") {
    // the streaming half of the iocSightings IVM story: Spark's stateful
    // streaming agg IS the incremental maintainer of the per-(type, ioc,
    // source, platform) index — count/min/max state folds each
    // micro-batch, so after any number of batches the maintained table
    // must equal a batch rebuild over everything ingested (the same
    // lossless-merge property OperatorsSpec proves for partial rollups)
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    implicit val sq = spark.sqlContext
    def rollup(df: org.apache.spark.sql.DataFrame) =
      TweetPipeline.extract(TweetPipeline.flatten(df))
        .groupBy(col("type"), col("ioc"), col("source"), col("platform"))
        .agg(count(lit(1)).as("n"), min(col("date_received")).as("mn"),
          max(col("date_received")).as("mx"))
    val r1 = Seq(
      tweet(60, "c2 9.9.9.9", user = "alice"),
      tweet(61, "seen 9.9.9.9 too", user = "bob"))
    val r2 = Seq(
      tweet(62, "third 9.9.9.9", user = "alice"),
      tweet(63, "hash d41d8cd98f00b204e9800998ecf8427e", user = "alice"))
    val mem = MemoryStream[String]
    val q = rollup(mem.toDF()).writeStream.format("memory")
      .queryName("sightings_stream").outputMode("complete").start()
    mem.addData(r1: _*); q.processAllAvailable()
    mem.addData(r2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sightings_stream")
    val batch = rollup((r1 ++ r2).toDF("value"))
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "streaming-maintained sighting index diverged from the batch rebuild")
  }
}
