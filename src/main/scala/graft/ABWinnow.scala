package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch interleaved A/B for the text_winnowing window-minima shape
  * (r15, VERDICT item 4). Dev tool only — not referenced by any query
  * path; variants are built inline so one JVM times all of them
  * round-robin (steal-robust, per the BASELINE.md adjudication rule).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.ABWinnow"
  */
object ABWinnow {
  private def base(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), graft.functions.TextStats.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 6)
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(t) - 2), i -> " +
          "md5(concat_ws(' ', element_at(t, i), element_at(t, i + 1)," +
          " element_at(t, i + 2))))").as("hs"))

  private def v0(s: SparkSession, d: String): DataFrame = // r14 shape
    base(s, d).select(col("doc_id"), explode(expr(
      "array_distinct(transform(sequence(1, size(hs) - 3), j -> " +
        "array_min(slice(hs, j, 4))))")).as("fp"))
      .orderBy(col("doc_id"), col("fp"))

  private def v1(s: SparkSession, d: String): DataFrame = // least() in lambda
    base(s, d).select(col("doc_id"), explode(expr(
      "array_distinct(transform(sequence(1, size(hs) - 3), j -> " +
        "least(element_at(hs, j), element_at(hs, j + 1)," +
        " element_at(hs, j + 2), element_at(hs, j + 3))))")).as("fp"))
      .orderBy(col("doc_id"), col("fp"))

  private def v2(s: SparkSession, d: String): DataFrame = { // codegen explode
    base(s, d)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("hs")) - 3)).as("j"), col("hs"))
      .select(col("doc_id"), least(
        element_at(col("hs"), col("j")),
        element_at(col("hs"), col("j") + 1),
        element_at(col("hs"), col("j") + 2),
        element_at(col("hs"), col("j") + 3)).as("fp"))
      .distinct()
      .orderBy(col("doc_id"), col("fp"))
  }

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
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("v0_r14" -> v0 _, "v1_least_lambda" -> v1 _, "v2_codegen_explode" -> v2 _,
        "ctl_q1_agg" -> ((s: SparkSession, dd: String) =>
          SparkEntry.queries("q1_agg")(s, dd)))
    // warm all variants once (codegen compile), then interleave timed reps
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
      println(f"$n%-22s min=${ts.min}%5d  med=${ts.sorted.apply(ts.size / 2)}%5d  ${ts.mkString(" ")}")
    }
    spark.stop()
  }
}
