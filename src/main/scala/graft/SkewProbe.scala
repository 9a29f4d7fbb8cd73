package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-vs-manual-salt measurement on the 10× corpus (round-9 scale-stress
  * companion; results tabulated in DEPLOYMENT.md "skew"): a 95%-hot join
  * key over 6M lineitem rows against an 8-row dimension, executed four
  * ways —
  *
  *   plain        sort-merge join, AQE ON at DEFAULT skew thresholds
  *                (256 MB) — the thresholds never fire at MB-scale
  *                partitions, one reducer carries 95% of the fact side
  *   aqe_tuned    same join, skew thresholds lowered until the splitter
  *                actually fires (split confirmed in the adaptive plan)
  *   salted       [[graft.operators.Salting.saltedJoin]] 16-way
  *   broadcast    the tiny dim broadcast — no fact-side shuffle at all
  *
  * Run: SPARK_GRAFT_CPUS=4 sbt "runMain graft.SkewProbe target/sf1"
  * Prints one JSON line with 2 reps per variant (fresh plans each rep).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the suite's documented skew shape: 95% of rows on one key
    def big: DataFrame = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(when(col("l_orderkey") % 20 === 0,
          concat(lit("key"), col("l_orderkey") % 7)).otherwise(lit("hot")).as("k"),
        col("l_extendedprice").as("v"), col("l_orderkey"))
    def dim: DataFrame = spark.createDataFrame(
      ("hot" +: (0 until 7).map("key" + _)).map(k => (k, k.length))
    ).toDF("k", "w")

    def time(label: String)(mk: => DataFrame): (String, Seq[Double]) =
      label -> (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }

    def withConf[A](kv: (String, String)*)(body: => A): A = {
      val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val results = Seq(
      withConf(noBroadcast) {
        time("plain")(big.join(dim, Seq("k")).groupBy("k")
          .agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("wv")))
      },
      withConf(noBroadcast,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
        time("aqe_tuned")(big.join(dim, Seq("k")).groupBy("k")
          .agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("wv")))
      },
      withConf(noBroadcast) {
        time("salted")(graft.operators.Salting
          .saltedJoin(big, dim, Seq("k"), col("l_orderkey"), 16)
          .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("wv")))
      },
      time("broadcast")(big.join(broadcast(dim), Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("wv"))))

    val json = results.map { case (l, ts) =>
      "\"" + l + "\":[" + ts.map(t => f"$t%.2f").mkString(",") + "]"
    }.mkString("{", ",", s""","dir":"$dir"}""")
    spark.stop()
    println(json)
  }
}
