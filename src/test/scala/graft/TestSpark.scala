package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark_guide.md: one session per
  * suite; sharing across suites is fine since config is identical). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // default 100-char metadata truncation hides most of a scan's
    // PushedFilters list — PlanShapeSpec asserts on its full contents
    .config("spark.sql.maxMetadataStringLength", "2000")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
