package graft.model

import org.apache.spark.sql.types._

/** Canonical IOC record — the reference's single output contract
  * (/root/reference/README.md:13-29). Both ingest paths (email batch,
  * tweet stream) converge on this 8-column shape; the reference's
  * streaming path emits only 6 of the 8 (/root/reference/firehose.py:125-128)
  * — we unify on all 8 (SURVEY.md §1.1).
  */
final case class IocRecord(
    id: String,
    date_added: String,    // yyyy-MM-dd at the contract edge (h-isac.py:100)
    date_received: String, // yyyy-MM-dd (h-isac.py:99)
    ioc: String,
    platform: String,      // "H-ISAC" | "Twitter"
    source: String,
    tag: String,           // ";"-joined hashtags, "N/A" for email
    `type`: String         // ip | hash | url | email
)

object Schemas {

  /** Email source table — stands in for the Outlook folder scan
    * (/root/reference/h-isac.py:117-123). See FIXTURES.md §A1.
    */
  val email: StructType = StructType(Seq(
    StructField("conversation_id", StringType),
    StructField("sender", StringType),
    StructField("subject", StringType),
    StructField("body", StringType),
    StructField("received_time", TimestampType)
  ))

  /** Tweet JSON schema — the nested shape accessed by
    * /root/reference/firehose.py:19-37. Parsed with from_json.
    */
  val tweet: StructType = StructType(Seq(
    StructField("created_at", StringType),
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("retweeted", BooleanType),
    StructField("extended_tweet", StructType(Seq(
      StructField("full_text", StringType)))),
    StructField("user", StructType(Seq(
      StructField("screen_name", StringType)))),
    StructField("entities", StructType(Seq(
      StructField("hashtags", ArrayType(StructType(Seq(
        StructField("text", StringType))))),
      StructField("urls", ArrayType(StructType(Seq(
        StructField("expanded_url", StringType))))))))
  ))

  /** Canonical IOC output schema (all-string contract edge, README.md:13-29). */
  val ioc: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("date_added", StringType),
    StructField("date_received", StringType),
    StructField("ioc", StringType),
    StructField("platform", StringType),
    StructField("source", StringType),
    StructField("tag", StringType),
    StructField("type", StringType)
  ))

  /** Pastebin enrichment lookup table — test stand-in for the HTTP fetch
    * (/root/reference/firehose.py:74-80). See FIXTURES.md §A3.
    */
  val pastebinPages: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("lines", ArrayType(StringType))
  ))
}
