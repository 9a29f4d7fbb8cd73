package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Iocs
import graft.pipeline.{EmailPipeline, TweetPipeline}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed done in SURVEY.md §2 has an entry in [[queries]]
  * (Spark) and, when ANSI-SQL-expressible, a matching entry in [[oracleSql]]
  * (DuckDB dialect). Column names, types, and row order are made identical
  * on both sides: every query ends in a total deterministic ORDER BY;
  * aggregates on doubles go through exact DECIMAL accumulation and a final
  * cast to DOUBLE; counts are BIGINT on both sides.
  */
object SparkEntry {

  /** Injected clock for date_added (reference: datetime.now(), h-isac.py:100)
    * — pinned so Spark, DuckDB, and golden tests agree (SURVEY.md §7.4). */
  val DateAdded = "2026-08-12"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ioc_email_etl")(spark, "/root/testdata/sf0.001")

  private def dsum(c: Column): Column = operators.Relational.dsum(c)

  /** Parity queries over the reference's own surface (SURVEY.md §2.1-§2.4). */
  private val parity: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ioc_email_etl" -> ((s, d) =>
      EmailPipeline(Tables.emails(s, d), DateAdded)
        .orderBy(col("id"), col("type"), col("ioc"))),

    "ioc_tweet_etl" -> ((s, d) =>
      TweetPipeline.extract(Tables.tweets(s, d))
        .orderBy(col("id").cast("long"), col("type"), col("ioc"))),

    // A1: per-type counts (h-isac.py:171-174) — one hash agg, not 4 scans.
    "ioc_type_counts" -> ((s, d) =>
      EmailPipeline(Tables.emails(s, d), DateAdded)
        .groupBy(col("type")).count()
        .orderBy(col("type"))),

    // R7/R8 standalone: refang over defanged tokens (incl. meow scheme,
    // case-variant hXXp, bracketed @) synthesized from part.
    "ioc_refang" -> ((s, d) => {
      val pk = col("p_partkey")
      val raw = when(pk % 4 === 0, concat(lit("hxxps://evil-"), pk.cast("string"), lit("[.]example[.]com/a")))
        .when(pk % 4 === 1, concat(lit("hXXp://evil-"), pk.cast("string"), lit("[.]example[.]org")))
        .when(pk % 4 === 2, concat(lit("meows://drop-"), pk.cast("string"), lit("[.]cdn[.]net")))
        .otherwise(concat(lit("mailto:user"), pk.cast("string"), lit("@bad[.]host[.]io")))
      Tables.part(s, d)
        .select(pk, raw.as("defanged"),
          Iocs.stripMailto(Iocs.refang(raw)).as("refanged"))
        .orderBy(pk)
    }),

    // R9: sort_iocs classification over synthesized raw tokens from events.
    "ioc_classify" -> ((s, d) => {
      val id = col("event_id")
      val toks = array(
        concat(lit("172.16."), (id % 256).cast("string"), lit("."), ((id * 3) % 256).cast("string")),
        md5(col("props")),
        concat(lit("host-"), id.cast("string"), lit(".example.com/path")),
        concat(lit("tok"), id.cast("string")))
      Tables.events(s, d)
        .select(id, explode(toks).as("token"))
        .select(id.as("event_id"), col("token"), Iocs.classify(col("token")).as("type"))
        .orderBy(col("event_id"), col("token"))
    })
  )

  private val parityOracle: Map[String, String] = Map(
    "ioc_email_etl" -> OracleViews.emailEtlSql(DateAdded),
    "ioc_tweet_etl" -> OracleViews.tweetEtlSql,
    "ioc_type_counts" ->
      (s"WITH base AS (\n${OracleViews.emailEtlSql(DateAdded)}\n)\n" +
        "SELECT type, count(*) AS count FROM base GROUP BY type ORDER BY type"),
    "ioc_refang" ->
      s"""WITH t AS (
         |  SELECT p_partkey,
         |    CASE WHEN p_partkey % 4 = 0 THEN 'hxxps://evil-' || CAST(p_partkey AS VARCHAR) || '[.]example[.]com/a'
         |         WHEN p_partkey % 4 = 1 THEN 'hXXp://evil-' || CAST(p_partkey AS VARCHAR) || '[.]example[.]org'
         |         WHEN p_partkey % 4 = 2 THEN 'meows://drop-' || CAST(p_partkey AS VARCHAR) || '[.]cdn[.]net'
         |         ELSE 'mailto:user' || CAST(p_partkey AS VARCHAR) || '@bad[.]host[.]io' END AS defanged
         |  FROM part)
         |SELECT p_partkey, defanged,
         |  replace(${OracleViews.refang("defanged")}, 'mailto:', '') AS refanged
         |FROM t
         |ORDER BY p_partkey""".stripMargin,
    "ioc_classify" ->
      """WITH toks AS (
        |  SELECT event_id, unnest([
        |    '172.16.' || CAST(event_id % 256 AS VARCHAR) || '.' || CAST((event_id * 3) % 256 AS VARCHAR),
        |    md5(props),
        |    'host-' || CAST(event_id AS VARCHAR) || '.example.com/path',
        |    'tok' || CAST(event_id AS VARCHAR)]) AS token
        |  FROM events)
        |SELECT event_id, token,
        |  CASE WHEN contains(token, '.') AND len(list_filter(
        |         string_split(regexp_replace(regexp_replace(token, '^[a-zA-Z]+://', ''), '/.*$', ''), '.'),
        |         x -> NOT regexp_matches(x, '^[0-9]+$'))) = 0 THEN 'ip'
        |       WHEN contains(token, '.') THEN 'url'
        |       WHEN regexp_matches(token, '^[a-zA-Z0-9]{32,64}') THEN 'hash'
        |       ELSE 'unmatched' END AS type
        |FROM toks
        |ORDER BY event_id, token""".stripMargin
  )

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parity ++
      operators.Relational.queries ++
      operators.Events.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      functions.TextStats.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    parityOracle ++
      operators.Relational.oracle ++
      operators.Events.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      operators.Multimodal.oracle ++
      functions.TextStats.oracle
}
