package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Salting
import graft.streaming.{StatefulCounters, TweetStream}

/** Scale-technique specs: salted joins/aggs equal their unsalted twins on
  * skewed data; flatMapGroupsWithState running totals accumulate across
  * micro-batches.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = {
    // 10k rows, 95% on one hot key — the shape that breaks a plain shuffle
    (1 to 10000).map(i => (if (i % 20 == 0) s"key${i % 7}" else "hot", i.toLong, i * 1.0))
      .toDF("k", "uid", "v")
  }
  private lazy val dim = Seq(("hot", "H"), ("key1", "A"), ("key3", "B"))
    .toDF("k", "label")

  test("saltedJoin equals the plain join on skewed data") {
    val plain = skewed.join(dim, Seq("k")).select("k", "uid", "label")
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), col("uid"), factor = 8)
      .select("k", "uid", "label")
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
    assert(salted.count() == plain.count()) // duplicates preserved too
  }

  test("saltedSum equals the plain grouped sum") {
    val plain = skewed.groupBy(col("k")).agg(sum(col("v")).as("total"))
    val salted = Salting.saltedSum(skewed, "k", col("v"), col("uid"), factor = 8)
    val joined = plain.withColumnRenamed("total", "expected")
      .join(salted, Seq("k"))
    assert(joined.filter(col("expected") =!= col("total")).count() == 0)
    assert(salted.count() == plain.count())
  }

  test("bucketed tables: co-located equi-join plans with zero shuffle exchanges") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    // the in-memory catalog is per-session but the warehouse dir persists:
    // drop both layers so reruns don't hit LOCATION_ALREADY_EXISTS
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc))
        org.apache.commons.io.FileUtils.deleteDirectory(loc.toFile)
    }
    graft.sinks.ParquetSink.writeBucketed(a, "bkt_a", 8, "k")
    graft.sinks.ParquetSink.writeBucketed(b, "bkt_b", 8, "k")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      // both sides were hash-bucketed on k at write time → the join reuses
      // the on-disk layout: no ShuffleExchange anywhere in the plan
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flatMapGroupsWithState running totals accumulate across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    def tw(id: Long, ip: String) =
      s"""{"created_at":"2024-02-02","id":$id,"text":"c2 $ip","retweeted":false,"user":{"screen_name":"acct"},"entities":{"hashtags":[],"urls":[]}}"""
    val totals = StatefulCounters.runningTotals(spark, TweetStream.iocStream(mem.toDF()))
    val q = totals.writeStream.format("memory").queryName("totals_out")
      .outputMode("append").start()
    mem.addData(tw(1, "1.1.1.1"), tw(2, "2.2.2.2")) // batch 1: 2 ips
    q.processAllAvailable()
    mem.addData(tw(3, "3.3.3.3"))                   // batch 2: 1 more
    q.processAllAvailable()
    q.stop()
    val perBatch = spark.table("totals_out")
      .filter(col("iocType") === "ip" && col("source") === "acct")
      .select("total").collect().map(_.getLong(0)).sorted.toSeq
    assert(perBatch == Seq(2L, 3L)) // state carried 2 → 3 across batches
  }
}
