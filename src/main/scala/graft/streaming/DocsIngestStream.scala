package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextStats

/** Continuous corpus ingest — the STREAMING twin of the batch
  * `corpus_manifest`: documents arriving on a stream pass the SAME quality
  * cut (`TextStats.qualityKeep`) and a SimHash near-dedup before they are
  * admitted, and carry the SAME quality score the batch dashboards read.
  *
  * Dedup semantics: `dropDuplicatesWithinWatermark` on the 60-bit SimHash —
  * exact-collision near-dup within the watermark horizon (the streaming
  * stand-in for the batch banded index; a doc re-arriving after the horizon
  * is re-admitted and the PERIODIC batch dedup pass reconciles — the
  * standard lambda split for dedup state that cannot grow forever).
  *
  * Scale: the filter and scoring are per-row column algebra (no state);
  * dedup state is bounded by (arrival rate × watermark horizon) distinct
  * fingerprints — the DEPLOYMENT.md streaming-state row's sizing rule.
  */
object DocsIngestStream {

  /** Banded-MinHash admission gate — the STREAMING twin of the batch
    * `dedup_incremental` index join: each incoming document computes its
    * K-minima signature and band hashes PER ROW (the HOF formulation —
    * streaming-safe, no window; equality with the batch window
    * formulation is asserted in OperatorsSpec), then stream-static
    * left-joins the persisted corpus banded index `(band, band_hash,
    * old_id)` and rolls up to the per-document verdict. At 100 TB the
    * index is the table the last full dedup pass wrote; per-batch cost is
    * ∝ batch size and old×old pairs are never revisited. Docs shorter
    * than 3 tokens have no shingles, hence no signature — excluded
    * exactly like the batch path (whose occurrence rows are empty). */
  def minhashAdmitted(docs: DataFrame, oldIndex: DataFrame): DataFrame = {
    import graft.operators.Dedup
    val toks = split(lower(col("text")), " ")
    val banded = docs
      .filter(size(toks) >= 3)
      .withColumn("sig", Dedup.minhashSig(Dedup.shingles(toks), Dedup.K))
      .select(col("doc_id"), posexplode(array((0 until Dedup.Bands).map { b =>
        md5(concat_ws("|", (0 until Dedup.Rows).map(r =>
          element_at(col("sig"), b * Dedup.Rows + r + 1).cast("string")): _*))
      }: _*)).as(Seq("band", "band_hash")))
    banded.join(oldIndex, Seq("band", "band_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(min(col("old_id")).as("dup_of"))
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("admitted"))
  }

  /** quality-gate → near-dedup → scored admission record. Works on any
    * frame with (doc_id, text, `timeCol`); streaming or batch (the spec
    * asserts stream/batch agreement on the same input). */
  def admitted(docs: DataFrame, watermarkDelay: String = "1 hour",
               timeCol: String = "ingest_ts"): DataFrame = {
    val gated = docs
      .filter(TextStats.qualityKeep(col("text")))
      .withColumn("simhash60", TextStats.simhash(TextStats.tokens(col("text"))))
      .withColumn("quality", TextStats.qualityScore(col("text")))
    if (docs.isStreaming)
      gated.withWatermark(timeCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("simhash60")
    else
      // batch twin: same gate, same fingerprint, keep first arrival
      gated.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("simhash60"))
            .orderBy(col(timeCol), col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
  }
}
