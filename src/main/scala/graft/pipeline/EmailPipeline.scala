package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.extract.Iocs

/** Batch email ETL — the Spark re-expression of /root/reference/h-isac.py's
  * main flow (SURVEY.md §3.1): subject filter (P1) → reply-chain truncation
  * (R1) → regex extraction (R2-R5) → refang + mailto strip (R7/R8) →
  * per-type stack + explode (X1/X2, plain explode = drop-empty semantics of
  * h-isac.py:103) → metadata projection (P5) → canonical 8-column IOC frame.
  *
  * The whole pipeline is narrow (no shuffle) and stays in one
  * WholeStageCodegen span — at 100 TB it is a pure scan-transform job whose
  * cost is one pass over the bodies; the manual `Items.Restrict` incremental
  * predicate of the reference (h-isac.py:152-153) becomes an ordinary
  * pushed-down filter on `received_time`.
  */
object EmailPipeline {

  /** `dateAdded` is the injected clock (reference: datetime.now(),
    * h-isac.py:100) — injectable so tests and the DuckDB oracle are
    * deterministic (SURVEY.md §7.4 "nondeterminism at the edges").
    */
  def apply(emails: DataFrame, dateAdded: String,
            sinceWatermark: Option[String] = None): DataFrame = {
    val since = sinceWatermark.map(w => col("received_time") >= lit(w))
      .getOrElse(lit(true)) // S2: last_run high-watermark predicate
    val cleaned = Iocs.cleanText(col("body"))
    def ext(pat: String): Column = Iocs.extractAll(cleaned, pat)

    // Each Generate keeps ONLY the surviving columns (body and the by_type
    // array are dropped at the first explode — carrying them would copy the
    // body and every extracted array across the 4 fan-out rows).
    emails
      .filter(since && lower(col("subject")).contains("indicator")) // P1
      .select(col("conversation_id"), col("sender"), col("received_time"),
        explode(array( // X2 stack
          struct(lit("ip").as("type"),
            Iocs.refangAll(ext(Iocs.IpDefanged)).as("iocs")),
          struct(lit("hash").as("type"),
            ext(Iocs.Hash).as("iocs")), // hashes are never refanged (h-isac.py:82-84)
          struct(lit("url").as("type"),
            Iocs.refangAll(ext(Iocs.UrlFast)).as("iocs")),
          struct(lit("email").as("type"),
            transform(Iocs.refangAll(ext(Iocs.Email)), Iocs.stripMailto _).as("iocs"))))
          .as("t"))
      .select( // X1: plain explode drops empty types (h-isac.py:103)
        col("conversation_id").as("id"),
        lit(dateAdded).as("date_added"),
        date_format(col("received_time"), "yyyy-MM-dd").as("date_received"),
        explode(col("t.iocs")).as("ioc"),
        lit("H-ISAC").as("platform"),
        col("sender").as("source"),
        lit("N/A").as("tag"),
        col("t.type").as("type"))
  }

  /** Typed boundary (SURVEY.md §1.4): the canonical frame as
    * Dataset[IocRecord] for callers who want compile-time field checks; the
    * operator pipeline itself stays untyped Column algebra for Catalyst. */
  def typed(emails: DataFrame, dateAdded: String): Dataset[graft.model.IocRecord] = {
    val df = apply(emails, dateAdded)
    import df.sparkSession.implicits._
    df.as[graft.model.IocRecord]
  }
}
