package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic sampling for training-data pipelines — the operators a
  * 100 TB corpus job runs constantly (downsample a stratum, carve a
  * held-out split) done WITHOUT `rand()`: every decision is a pure
  * function of the row's id via md5, so task retries, AQE re-planning,
  * and re-runs produce byte-identical samples, and the DuckDB oracle
  * reproduces them exactly. All per-row Column algebra — shuffle-free
  * until the (optional) final aggregation; at scale the sample predicate
  * rides the scan like any other filter.
  */
object Sampling {

  /** Uniform hash bucket in [0, mod): md5 of the id's decimal string. */
  def hashBucket(id: Column, mod: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % mod

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // stratified downsampling: per-language keep-rates (en 50%, es 20%,
    // de 10%) applied via hash buckets — the class-rebalancing step of a
    // corpus build. Emits the surviving rows; the sample is a pure filter,
    // so at 100 TB it fuses into the scan.
    "sample_stratified" -> ((s, d) => {
      val b = hashBucket(col("doc_id"), 10)
      val keep = when(col("lang") === "en", b < 5)
        .when(col("lang") === "es", b < 2)
        .otherwise(b < 1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), b.as("bucket"))
        .filter(keep)
        .orderBy(col("doc_id"))
    }),

    // 90/10 train/test split: per-(lang, split) counts — the split
    // assignment is the same hash-bucket function, so a document's split
    // never changes across runs (the property that keeps held-out data
    // held out).
    "sample_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          when(hashBucket(col("doc_id"), 10) < 9, "train").otherwise("test").as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("split")))
  )

  private val bucketSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10"

  val oracle: Map[String, String] = Map(
    "sample_stratified" ->
      s"""SELECT doc_id, lang, $bucketSql AS bucket
         |FROM documents
         |WHERE CASE WHEN lang = 'en' THEN $bucketSql < 5
         |           WHEN lang = 'es' THEN $bucketSql < 2
         |           ELSE $bucketSql < 1 END
         |ORDER BY doc_id""".stripMargin,
    "sample_split" ->
      s"""SELECT lang,
         |  CASE WHEN $bucketSql < 9 THEN 'train' ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs
         |FROM documents
         |GROUP BY 1, 2
         |ORDER BY lang, split""".stripMargin
  )
}
