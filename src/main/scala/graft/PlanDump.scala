package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (plans/rNN/<query>_before.txt /
  * _after.txt). Usage:
  *
  *   sbt "runMain graft.PlanDump plans/r14 before q1_agg basket_pairs"
  *   sbt "runMain graft.PlanDump plans/r14 after"          // all queries
  *
  * Writes <outDir>/<query>_<tag>.txt with the formatted physical plan as
  * produced on SPARK_GRAFT_SF_DIR (default sf0.001 — plan SHAPE, not
  * timing, is the artifact; counts are pre-AQE like PLANS.md).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"),
        s"-- $name ($tag) on $sfDir\n" + plan)
      println(s"wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
