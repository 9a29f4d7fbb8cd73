package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Live mode of the pastebin enrichment source (SURVEY.md §2.1 S6): fetch
  * each distinct linked page ON THE EXECUTORS and return the
  * `(url, lines)` lookup table that [[graft.pipeline.TweetPipeline.withPastebin]]
  * joins against. The reference fetched inline per tweet on a single thread
  * (/root/reference/firehose.py:74-80); here:
  *
  *  - URLs are deduplicated BEFORE fetching (the reference re-fetched a page
  *    for every tweet linking it) and repartitioned so fetch parallelism
  *    scales with executors, bounded by `maxParallelism` to be polite;
  *  - the fetch runs in mapPartitions, outside Catalyst, and the resulting
  *    table is joined declaratively — retries re-fetch only their partition;
  *    treat results as at-least-once and keep fetchers idempotent (the
  *    network is inherently nondeterministic, SURVEY.md §7.4);
  *  - [[PageFetcher]] is the seam: tests/offline use a deterministic stub,
  *    production supplies an HTTP client that parses
  *    `#code_frame2 ol > li > div` like the reference.
  */
trait PageFetcher extends Serializable {
  /** Fetch one page and return its extracted text lines. */
  def fetch(url: String): Seq[String]
}

object LivePastebin {

  private val pageSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("lines", ArrayType(StringType))))

  /** tweets must carry the flattened `urls` (";"-joined) column. Returns the
    * `(url, lines)` lookup table for `withPastebin`. */
  def fetchPages(tweets: DataFrame, fetcher: PageFetcher,
                 maxParallelism: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    val links = tweets
      .select(explode(split(col("urls"), ";")).as("url"))
      .filter(col("url").contains("pastebin"))
      .distinct()                       // fetch each page once, not per tweet
      .repartition(maxParallelism)      // bound concurrent fetch fan-out
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pageSchema)
    links.mapPartitions { rows =>
      rows.map { r =>
        val u = r.getString(0)
        Row(u, fetcher.fetch(u))
      }
    }(enc)
  }
}
