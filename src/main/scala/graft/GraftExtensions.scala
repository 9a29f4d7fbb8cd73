package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.ArrayDot

/** SQL surface for the engine: the extraction/analysis primitives exposed as
  * SQL functions, so `spark.sql("SELECT graft_refang(ioc) …")` works next to
  * the DataFrame API.
  *
  * Routes:
  *  - scalar Column-algebra functions register as Spark 4 SQL UDFs
  *    (`CREATE TEMPORARY FUNCTION … RETURN <expr>`): pure macro text, the
  *    analyzer inlines the body — identical plans to the DataFrame API,
  *    fully codegen'd, no closures;
  *  - [[graft.functions.ArrayDot]] (a real Catalyst Expression) registers
  *    through the FunctionRegistry, and via `spark.sql.extensions=
  *    graft.GraftExtensions` at session build (SURVEY.md §7.3's mechanism).
  */
object GraftFunctions {

  /** SQL UDF bodies — kept byte-equivalent to the Column versions in
    * [[graft.extract.Iocs]] / [[graft.functions.TextStats]]. */
  val sqlUdfs: Seq[String] = Seq(
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_refang(x STRING) RETURNS STRING
      |RETURN regexp_replace(regexp_replace(x, 'h[xX]{2}p(?=[s:])', 'http'), '\\[([.@])\\]', '$1')""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_clean_text(x STRING) RETURNS STRING
      |RETURN regexp_replace(x, '(?s)(?:^|\n)[^\n]*From: H-ISAC Amber.*$', '')""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_extract_all(x STRING, p STRING) RETURNS ARRAY<STRING>
      |RETURN regexp_extract_all(x, p, 1)""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_classify(x STRING) RETURNS STRING
      |RETURN CASE
      |  WHEN contains(x, '.') AND forall(
      |    split(regexp_replace(regexp_replace(x, '^[a-zA-Z]+://', ''), '/.*$', ''), '\\.'),
      |    s -> s rlike '^[0-9]+$') THEN 'ip'
      |  WHEN contains(x, '.') THEN 'url'
      |  WHEN x rlike '^[a-zA-Z0-9]{32,64}' THEN 'hash'
      |  ELSE 'unmatched' END""".stripMargin,
    // the ONE quality formula (TextStats.qualityScore) as SQL — the
    // samplers, the filter, the dashboard, and now any SQL consumer share
    // byte-identical scoring (asserted against the Column version in
    // SqlSurfaceSpec)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_quality(x STRING) RETURNS DOUBLE
      |RETURN 0.4D * least(cast(size(filter(split(lower(x), ' '),
      |    t -> t IN ('the','a','and','of','to','in'))) AS DOUBLE)
      |  / size(split(lower(x), ' ')) * 5.0D, 1.0D)
      |+ 0.3D * greatest(0.0D, 1.0D - cast(size(regexp_extract_all(x, '[^A-Za-z0-9\\s]', 0)) AS DOUBLE)
      |  / length(x) * 5.0D)
      |+ 0.3D * least(cast(size(split(lower(x), ' ')) AS DOUBLE) / 100.0D, 1.0D)""".stripMargin,
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_simhash(x STRING) RETURNS STRING
      |RETURN concat_ws('', transform(
      |  aggregate(
      |    transform(split(lower(x), ' '),
      |      t -> lpad(bin(cast(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)), 60, '0')),
      |    array_repeat(cast(0 AS BIGINT), 60),
      |    (acc, b) -> zip_with(acc, sequence(1, 60),
      |      (a, p) -> a + (CASE WHEN substr(b, p, 1) = '1' THEN 1 ELSE -1 END))),
      |  v -> CASE WHEN v > 0 THEN '1' ELSE '0' END))""".stripMargin
  )

  private val arrayDotBuilder: Seq[Expression] => Expression =
    exprs => ArrayDot(exprs(0), exprs(1))
  private val arrayL2Builder: Seq[Expression] => Expression =
    exprs => graft.functions.ArrayL2(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    sqlUdfs.foreach(spark.sql(_))
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("array_dot", arrayDotBuilder, "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("array_l2", arrayL2Builder, "scala_udf")
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` entry point: injects
  * the Expression-backed functions at session build. (The SQL UDFs are
  * session objects — create them with [[GraftFunctions.register]].) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("array_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "array_dot"),
      exprs => ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("array_l2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "array_l2"),
      exprs => graft.functions.ArrayL2(exprs(0), exprs(1))))
    // band joins written naively (abs(a.t - b.t) <= w, no equi key) become
    // bucketed equi-joins instead of BroadcastNestedLoopJoin
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // the whole-operator extension: plans graft.plans.TopKPerKey logical
    // nodes as the sort-free bounded-heap TopKPerKeyExec
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
