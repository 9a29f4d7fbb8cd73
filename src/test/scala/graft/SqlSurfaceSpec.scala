package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.EmailPipeline

/** SQL function surface + typed Dataset boundary. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  test("registered SQL functions: refang, classify, clean_text, extract, array_dot") {
    val r = spark.sql(
      """SELECT graft_refang('hxxps://www[.]google[.]com') AS refanged,
        |  graft_classify('1.2.3.4') AS cls,
        |  graft_clean_text('keep\nFrom: H-ISAC Amber\ndrop') AS cleaned,
        |  graft_extract_all('a 1.2.3.4 b 5.6.7.8', '((?:^|\\b)(?:\\d{1,3}\\.){3}\\d{1,3}(?:\\b|$))') AS ips,
        |  array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot""".stripMargin).head()
    assert(r.getString(0) == "https://www.google.com")
    assert(r.getString(1) == "ip")
    assert(r.getString(2) == "keep")
    assert(r.getSeq[String](3) == Seq("1.2.3.4", "5.6.7.8"))
    assert(r.getDouble(4) == 11.0)
  }

  test("graft_simhash over SQL matches the DataFrame API") {
    val viaSql = spark.sql("SELECT graft_simhash('spark joins data') AS s").head().getString(0)
    val viaDf = Seq("spark joins data").toDF("t")
      .select(graft.functions.TextStats.simhash(
        graft.functions.TextStats.tokens(org.apache.spark.sql.functions.col("t"))))
      .head().getString(0)
    assert(viaSql == viaDf && viaSql.length == 60)
  }

  test("graft_quality over SQL is bit-identical to TextStats.qualityScore") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("sql_quality_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_quality(text) AS q FROM sql_quality_docs")
    val viaCol = docs.select(col("doc_id"),
      graft.functions.TextStats.qualityScore(col("text")).as("c"))
    val joined = viaSql.join(viaCol, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("q") =!= col("c")).count() == 0,
      "SQL macro and Column formula diverged")
  }

  test("GraftExtensions injects array_dot at session build") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // shared JVM: don't stop the context other suites use
    assert(s2.sql("SELECT array_dot(array(1.0D, 2.0D), array(2.0D, 3.0D))")
      .head().getDouble(0) == 8.0)
  }

  test("full SQL text over registered views equals the DataFrame API (TPC-H q3)") {
    val d = "/root/testdata/sf0.001"
    for (t <- Seq("customer", "orders", "lineitem"))
      graft.sources.Tables.table(spark, d, t).createOrReplaceTempView(t)
    val viaSql = spark.sql(
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '2000-06-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin).collect().toSeq
    val viaApi = SparkEntry.queries("q3_topk")(spark, d).collect().toSeq
    assert(viaSql == viaApi, "SQL text and DataFrame API diverged on q3")
  }

  test("typed Dataset[IocRecord] boundary") {
    val emails = Seq(("c1", "A", "indicator", "ip 1[.]2[.]3[.]4",
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("conversation_id", "sender", "subject", "body", "received_time")
    val ds: org.apache.spark.sql.Dataset[graft.model.IocRecord] =
      EmailPipeline.typed(emails, "2026-08-12")
    val rec = ds.collect().head
    assert(rec.ioc == "1.2.3.4" && rec.`type` == "ip" && rec.platform == "H-ISAC")
  }
}
