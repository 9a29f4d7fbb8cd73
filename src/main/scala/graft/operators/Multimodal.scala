package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake behind [[BinaryDecoder]] — but the Spark-side plumbing
  * (schema, batch shape, partition-local decoding via mapPartitions, typed
  * output) is real and tested. In production you swap [[FakeDecoder]] for a
  * JNI/codec-backed implementation; nothing else changes.
  *
  * Scale notes: decode runs per partition (one decoder instance per task,
  * amortized init), the binary column is never shuffled — metadata is
  * projected out first and only the narrow typed columns move. That is the
  * 100 TB rule for multimodal data: bytes stay where they were read.
  */
object Multimodal {

  /** Decoded media metadata — what a real image decoder would yield. */
  final case class MediaMeta(width: Int, height: Int, format: String, nBytes: Long)

  /** The seam for real codecs. Implementations MUST be deterministic per
    * byte-array input (task retries re-decode). */
  trait BinaryDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic stand-in: derives metadata purely from the bytes.
    * Arithmetic is done in Long: `n * 31` overflows Int for payloads
    * ≥ ~69 MB, which would yield a negative height and diverge from the
    * BIGINT-computed oracle. */
  object FakeDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val w = 64 + (n % 577)
      val h = 64 + ((n.toLong * 31) % 433).toInt
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      MediaMeta(w, h, fmt, n.toLong)
    }
  }

  private val metaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Partition-local decode: (id, payload binary) → typed metadata rows.
    * mapPartitions (not a per-row UDF) so a real decoder's init cost is paid
    * once per task and batches stay contiguous. */
  def decodeMeta(df: DataFrame, decoder: BinaryDecoder = FakeDecoder): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(metaSchema)
    df.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val m = decoder.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), m.width, m.height, m.format, m.nBytes)
        }
      }(enc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary-column metadata over documents-as-payloads: the SQL-expressible
    // half of the multimodal surface (encode → binary, length, sha2 digest).
    "binary_meta" -> ((s, d) =>
      Relational.sortedOnce(graft.sources.Tables.documents(s, d)
        .select(
          col("doc_id"),
          octet_length(to_binary(col("text"), lit("utf-8"))).cast("long").as("n_bytes"),
          sha2(col("text").cast("binary"), 256).as("sha256"),
          substring(hex(col("text").cast("binary")), 1, 8).as("magic")),
        col("doc_id"))),

    // the mapPartitions decode path as a first-class oracle query: payloads
    // synthesized from text bytes, decoded partition-locally by the
    // deterministic [[FakeDecoder]]; the oracle reproduces the decoder's
    // byte-length arithmetic in SQL. Proves the executor-side plumbing
    // (schema, encoder, batching) — swap the decoder for a codec and the
    // query is a real image-metadata extractor.
    "binary_decode" -> ((s, d) =>
      Relational.sortedOnce(
        decodeMeta(graft.sources.Tables.documents(s, d)
          .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))),
        col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    "binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256,
        |  upper(substr(hex(encode(text)), 1, 8)) AS magic
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "binary_decode" ->
      """SELECT doc_id,
        |  CAST(64 + n % 577 AS INTEGER) AS width,
        |  CAST(64 + (n * 31) % 433 AS INTEGER) AS height,
        |  CASE WHEN n % 3 = 0 THEN 'png' WHEN n % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format,
        |  CAST(n AS BIGINT) AS n_bytes
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
