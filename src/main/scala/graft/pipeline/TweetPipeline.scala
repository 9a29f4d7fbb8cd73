package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.extract.Iocs
import graft.model.Schemas

/** Tweet ETL — the Spark re-expression of /root/reference/firehose.py's
  * listener (SURVEY.md §3.2). One transform core serves both the batch
  * oracle query (over a pre-flattened tweet table) and Structured Streaming
  * (raw JSON → [[flatten]] → [[extract]] inside foreachBatch / readStream).
  *
  * Asymmetries with the email path, preserved deliberately (SURVEY.md §2.3):
  * plain-dot IP regex (no defang tolerance, firehose.py:56), NO refang pass
  * (firehose.py never refangs), date_added taken from the tweet's created_at
  * (firehose.py:41,112), platform/date_received filled per SURVEY.md §1.1.
  */
object TweetPipeline {

  /** Raw tweet JSON → flat columns (projections P2-P4, firehose.py:22-37):
    * retweet filter, extended-text coalesce with \r-strip/\n→space,
    * nested user/entities access, ";"-joined hashtags and urls.
    *
    * `withWarnings = true` additionally carries the reference's two console
    * warnings as boolean columns, for `observe()` counters downstream
    * (see [[graft.streaming.TweetStream.observedWarnings]]):
    *  - `warn_truncated`: no extended_tweet AND cleaned text > 140 chars —
    *    "Tweet is truncated, but extended_tweet isn't available..."
    *    (firehose.py:33-34);
    *  - `warn_multi_pastebin`: more than one pastebin link in a tweet —
    *    "Unhandled situation: More than one pastebin link" (firehose.py:52-53).
    * The flags are extra columns only; every downstream select ignores them,
    * so the parity path is unchanged.
    */
  def flatten(raw: DataFrame, withWarnings: Boolean = false): DataFrame = {
    val t = from_json(col("value"), Schemas.tweet)
    val cleanedText = regexp_replace(regexp_replace(
      coalesce(col("t.extended_tweet.full_text"), col("t.text")),
      "\r", ""), "\n", " ")
    // P2. Pushdown rewrites both probes onto the raw value column, so a
    // row is tokenized up to three times (two single-field filter parses
    // + the full parse for survivors) — an r13 A/B that pinned the filter
    // above the parse with an optimizer fence measured NO gain (medians
    // 75.1k vs 75.4k rec/s, extract leg), so the pushed shape stands and
    // the single-field probes are confirmed cheap (DEPLOYMENT.md,
    // "Fused-scanner A/B" note).
    val base = raw.select(t.as("t"))
      .filter(!col("t.retweeted") && !col("t.text").startsWith("RT @"))
    val cols = Seq(
      col("t.id").cast("string").as("id"),
      cleanedText.as("text"), // P3: \r→"" then \n→" ", exactly
      col("t.user.screen_name").as("user"),
      concat_ws(";", transform(col("t.entities.hashtags"), h => h("text")))
        .as("hashtags"), // P4
      concat_ws(";", transform(col("t.entities.urls"), u => u("expanded_url")))
        .as("urls"),
      col("t.created_at").as("created_date"))
    val warnCols =
      if (!withWarnings) Nil
      else Seq(
        (col("t.extended_tweet.full_text").isNull && length(cleanedText) > 140)
          .as("warn_truncated"),
        (size(filter(transform(col("t.entities.urls"), u => u("expanded_url")),
          u => u.contains("pastebin"))) > 1).as("warn_multi_pastebin"))
    base.select(cols ++ warnCols: _*)
  }

  /** Escape hatch for A/B adjudication of the fused scanner: set
    * SPARK_GRAFT_FUSED_EXTRACT=0 to run the original three-regex plan.
    * Default is the fused path — output equality is fuzz-asserted
    * (IocScanSpec) and oracle-gated every round (the DuckDB oracle runs
    * the ORIGINAL patterns). */
  private val FusedExtract: Boolean =
    sys.env.get("SPARK_GRAFT_FUSED_EXTRACT").forall(_ != "0")

  /** Flat tweet columns → canonical 8-column IOC frame (extraction R3/R4/R6
    * + per-type unpivot X2, firehose.py:56-62,105-122).
    *
    * Two equivalent formulations (same rows, same per-type match order):
    * the FUSED path scans the text once with [[graft.functions.IocScan]]
    * and pays ONE Generate; the regex path runs three
    * `regexp_extract_all` passes and two Generates. The fused scanner is
    * the r12 knee-sweep answer (extraction was the measured ~74k rec/s
    * per-node streaming ceiling); the regex path remains as the
    * adjudication baseline and the semantics reference.
    */
  def extract(tweets: DataFrame): DataFrame = {
    // P2 — already applied by flatten() on the streaming path; the batch
    // path over a pre-flattened table carries the raw retweeted flag.
    val live =
      if (tweets.columns.contains("retweeted"))
        tweets.filter(!col("retweeted") && !col("text").startsWith("RT @"))
      else tweets
    if (FusedExtract) {
      // One scan, one Generate: the explode drops text immediately and
      // fans out the (type, ioc) pairs the scanner already classified.
      live
        .select(col("id"), col("created_date"), col("user"), col("hashtags"),
          explode(graft.functions.ExtractIocs.extract_iocs(col("text"))).as("t"))
        .select(
          col("id"),
          col("created_date").as("date_added"), // firehose.py:41,112
          col("created_date").as("date_received"),
          col("t.ioc").as("ioc"),
          lit("Twitter").as("platform"),
          col("user").as("source"),
          col("hashtags").as("tag"),
          col("t.type").as("type"))
    } else extractRegex(live)
  }

  /** The original three-regex formulation — the fused path's semantics
    * oracle (kept runnable for A/B and fuzz-equality, never dead code).
    * Each Generate carries ONLY the surviving columns: the first explode
    * drops the raw text and the by_type array immediately (keeping them
    * would duplicate the text and ALL extracted arrays across the 3
    * fan-out rows), the second drops the struct. Both stay in one
    * WholeStageCodegen span with the regex extraction. */
  private[graft] def extractRegex(live: DataFrame): DataFrame = {
    def ext(pat: String): Column = Iocs.extractAll(col("text"), pat)
    live
      .select(col("id"), col("created_date"), col("user"), col("hashtags"),
        explode(array(
          struct(lit("ip").as("type"), ext(Iocs.IpPlain).as("iocs")),
          struct(lit("hash").as("type"), ext(Iocs.Hash).as("iocs")),
          struct(lit("url").as("type"), ext(Iocs.UrlFast).as("iocs")))).as("t"))
      .select(
        col("id"),
        col("created_date").as("date_added"), // firehose.py:41,112
        col("created_date").as("date_received"),
        explode(col("t.iocs")).as("ioc"),
        lit("Twitter").as("platform"),
        col("user").as("source"),
        col("hashtags").as("tag"),
        col("t.type").as("type"))
  }

  /** Pastebin enrichment (S6/X5, firehose.py:50-71): pick each tweet's first
    * pastebin link (P6), left-join the pages lookup (url → array<line>), run
    * sort_iocs classification (R9) over the fetched lines, and return the
    * classified lines in the canonical frame, unioned with the tweet-text
    * extractions. In production the lookup table is produced by a
    * per-partition HTTP fetch (nondeterministic, kept out of Catalyst); in
    * tests it is a fixture table (FIXTURES.md §A3).
    */
  def withPastebin(tweets: DataFrame, pages: DataFrame): DataFrame = {
    val linked = tweets
      .withColumn("pastebin_link", // P6; try_: ANSI mode throws on empty arrays
        try_element_at(filter(split(col("urls"), ";"), u => u.contains("pastebin")), lit(1)))
      .join(pages.withColumnRenamed("url", "pastebin_link"),
        Seq("pastebin_link"), "left")
    val fetched = linked
      .filter(col("lines").isNotNull)
      .select(col("id"), col("created_date"), col("user"), col("hashtags"),
        explode(col("lines")).as("line"))
      .select(
        col("id"),
        col("created_date").as("date_added"),
        col("created_date").as("date_received"),
        col("line").as("ioc"),
        lit("Twitter").as("platform"),
        col("user").as("source"),
        col("hashtags").as("tag"),
        Iocs.classify(col("line")).as("type"))
      .filter(col("type") =!= "unmatched") // unmatched kept out of the sink, as in dict_to_kv
    extract(tweets).unionByName(fetched)
  }
}
