package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.TweetPipeline
import graft.sources.Tables

/** Scratch interleaved A/B for ioc_pastebin_enrich's fan-out × final-sort
  * shape (r15, VERDICT item 1). Dev tool only; same interleaving
  * discipline as [[ABWinnow]]. */
object ABPaste {
  private def tweets2(s: SparkSession, d: String, fan: Boolean): DataFrame = {
    val id = col("event_id")
    val other = concat(lit("https://other.example/x"), id.cast("string"))
    val ev = if (fan) Tables.fanout(Tables.events(s, d)) else Tables.events(s, d)
    ev.select(
      id.cast("string").as("id"),
      concat(lit("ping 10.1."), (id % 256).cast("string"), lit("."), (id % 7).cast("string")).as("text"),
      concat(lit("user-"), col("user_id").cast("string")).as("user"),
      concat(lit("malware;"), col("event_type")).as("hashtags"),
      date_format(col("ts"), "yyyy-MM-dd").as("created_date"),
      when(id % 3 === 0,
        concat(lit("https://pastebin.com/p"), (id % 50).cast("string"), lit(";"), other))
        .otherwise(other).as("urls"))
  }
  private def pages(s: SparkSession): DataFrame = s.range(50).select(
    concat(lit("https://pastebin.com/p"), col("id").cast("string")).as("url"),
    array(
      concat(lit("10.0.0."), col("id").cast("string")),
      concat(lit("host-"), col("id").cast("string"), lit(".evil.com")),
      md5(concat(lit("page"), col("id").cast("string"))),
      lit("xx")).as("lines"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tuning.initialShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def keys = Seq(col("id").cast("long"), col("type"), col("ioc"))
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "fan_rebalance" -> ((s: SparkSession, d: String) =>
        operators.Relational.sortedOnce(
          TweetPipeline.withPastebin(tweets2(s, d, fan = true), pages(s)), keys: _*)),
      "fan_plain_sort" -> ((s: SparkSession, d: String) =>
        TweetPipeline.withPastebin(tweets2(s, d, fan = true), pages(s))
          .orderBy(keys: _*)),
      "nofan_rebalance" -> ((s: SparkSession, d: String) =>
        operators.Relational.sortedOnce(
          TweetPipeline.withPastebin(tweets2(s, d, fan = false), pages(s)), keys: _*)),
      "nofan_plain_sort" -> ((s: SparkSession, d: String) =>
        TweetPipeline.withPastebin(tweets2(s, d, fan = false), pages(s))
          .orderBy(keys: _*)),
      "ctl_q1_agg" -> ((s: SparkSession, dd: String) =>
        SparkEntry.queries("q1_agg")(s, dd)))
    variants.foreach { case (_, f) =>
      f(spark, sfDir).write.format("noop").mode("overwrite").save() }
    val times = scala.collection.mutable.Map[String, List[Long]]().withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1000000
      }
    }
    variants.foreach { case (n, _) =>
      val ts = times(n)
      println(f"$n%-18s min=${ts.min}%5d  med=${ts.sorted.apply(ts.size / 2)}%5d  ${ts.mkString(" ")}")
    }
    spark.stop()
  }
}
