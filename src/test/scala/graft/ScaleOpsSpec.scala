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
