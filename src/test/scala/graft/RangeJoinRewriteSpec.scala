package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RangeJoinRewrite

/** The injected band-join rewrite: a naive `abs(a.t - b.t) <= w` inner
  * join (no equi key → BroadcastNestedLoopJoin in vanilla Spark) must
  * become a bucketed equi-join under the rule, produce the identical row
  * set, and leave joins that already carry an equi key untouched.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def points(n: Int, name: String): DataFrame =
    spark.range(n).select(
      col("id").as(s"${name}_id"),
      ((col("id") * 37) % 5000 - 2500).as(s"${name}_t")) // negatives included

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("band join with no equi key: bucketed plan, identical rows") {
    val a = points(300, "a")
    val b = points(300, "b")
    def q = a.join(b, abs(col("a_t") - col("b_t")) <= 40 && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    val naive = rows(q) // vanilla: nested-loop, correct but quadratic
    val (optimized, plan) = withRule {
      (rows(q), q.queryExecution.executedPlan.toString)
    }
    assert(optimized == naive, "rewrite changed the result set")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join still plans as a nested loop:\n$plan")
    assert(plan.contains("__graft_lb"), s"bucket key missing from plan:\n$plan")
  }

  test("band width boundary: pairs at exactly w survive the rewrite") {
    import spark.implicits._
    val a = Seq((1L, -40L), (2L, 0L), (3L, 39L)).toDF("a_id", "a_t")
    val b = Seq((10L, 0L), (11L, 79L)).toDF("b_id", "b_t")
    def q = a.join(b, abs(col("a_t") - col("b_t")) <= 40)
      .select(col("a_id"), col("b_id"))
    val expected = rows(q)
    val got = withRule(rows(q))
    assert(got == expected)
    assert(got((1L, 10L)) && got((3L, 11L))) // |−40−0| = 40, |39−79| = 40
  }

  test("join with an equi key is left alone") {
    val a = points(100, "a").withColumn("a_u", col("a_id") % 5)
    val b = points(100, "b").withColumn("b_u", col("b_id") % 5)
    def q = a.join(b, col("a_u") === col("b_u") &&
      abs(col("a_t") - col("b_t")) <= 40 && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    val expected = rows(q)
    val (got, plan) = withRule {
      (rows(q), q.queryExecution.executedPlan.toString)
    }
    assert(got == expected)
    assert(!plan.contains("__graft_lb"), s"rule fired despite an equi key:\n$plan")
  }

  test("randomized equivalence: widths and sign-crossing values") {
    // deterministic pseudo-random point sets (md5-derived, no rand()):
    // values cross zero, widths exercise tiny and wide buckets
    val a = spark.range(200).select(
      col("id").as("a_id"),
      (conv(substring(md5(concat(lit("a"), col("id"))), 1, 6), 16, 10).cast("long") % 2000 - 1000).as("a_t"))
    val b = spark.range(200).select(
      col("id").as("b_id"),
      (conv(substring(md5(concat(lit("b"), col("id"))), 1, 6), 16, 10).cast("long") % 2000 - 1000).as("b_t"))
    for (w <- Seq(1, 7, 40, 500)) {
      def q = a.join(b, abs(col("a_t") - col("b_t")) <= w)
        .select(col("a_id"), col("b_id"))
      val naive = rows(q)
      val got = withRule(rows(q))
      assert(got == naive, s"width $w: rewrite lost/invented pairs " +
        s"(missing ${naive -- got}, extra ${got -- naive})")
    }
  }

  test("session-extension route injects the same rule") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses prev's SparkContext; extensions apply to the new session
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne prev, "getOrCreate returned the extension-less session")
      val a = s2.range(50).select(col("id").as("a_id"), (col("id") * 7).as("a_t"))
      val b = s2.range(50).select(col("id").as("b_id"), (col("id") * 11).as("b_t"))
      val p = a.join(b, abs(col("a_t") - col("b_t")) <= 10)
        .queryExecution.executedPlan.toString
      assert(p.contains("__graft_lb") && !p.contains("BroadcastNestedLoopJoin"),
        s"extension session did not rewrite the band join:\n$p")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
