package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over `documents` — exact, n-gram Jaccard, and
  * MinHash+LSH near-dup (BASELINE.json north star; the core of any
  * large-scale training-data pipeline).
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash aggregation on the content key — the shuffle
  *    is by key hash, perfectly balanced unless one document dominates;
  *  - the MinHash path is the scale path: O(docs × K) signature computation
  *    (per-row HOFs, no shuffle), then a shuffle on (band, bandHash) whose
  *    fan-in is only near-duplicate clusters — candidate verification runs
  *    per bucket, never all-pairs;
  *  - the plain n-gram Jaccard join (shingle inverted index) is kept as the
  *    exact baseline; its shuffle grows with shared-shingle frequency, which
  *    is why MinHash banding exists.
  *
  * All hashes are md5-derived so the DuckDB oracle reproduces them exactly.
  */
object Dedup {

  /** Word 3-gram shingles, distinct, from a token array column. Inclusive
    * slice: tokens i..i+2 for i in 1..n-2 (Spark slice is 1-based like
    * DuckDB's). */
  def shingles(toks: Column): Column =
    // guard: Spark sequence(1, n) DESCENDS when n < 1 (unlike DuckDB range,
    // which is empty) — short docs must yield an empty shingle set.
    when(size(toks) >= 3,
      array_distinct(
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word-3-gram rows (doc_id, shingle) — the codegen formulation:
    * posexplode tokens → two window leads → concat → distinct. Equivalent to
    * `explode(shingles(tokens(text)))` (asserted in OperatorsSpec) but stays
    * in WholeStageCodegen; the array-HOF version is interpreted and was the
    * dominant cost of both dedup joins (each self-join branch re-evaluates
    * its subtree, multiplying the per-row cost). One shuffle on doc_id for
    * the window, one for the distinct — both on high-cardinality keys.
    */
  def shingleRows(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .distinct()
  }

  /** MinHash signature: K lexicographic minima of md5(j:shingle). */
  def minhashSig(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, x => md5(concat(j.cast("string"), lit(":"), x)))))

  val K = 12        // signature length
  val Rows = 3      // rows per band
  val Bands = K / Rows

  val JaccardThreshold = 0.4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup on a normalized content key: groups with >1 member.
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(substring(col("text"), 1, 40)).as("content_key"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .filter(col("n_dups") > 1)
        .orderBy(col("content_key"))),

    // exact n-gram Jaccard via shingle inverted index: explode distinct
    // shingles, self-join on shingle, count intersections, Jaccard filter.
    "dedup_ngram_jaccard" -> ((s, d) => {
      val sh = shingleRows(Tables.documents(s, d))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val withSz = sh.join(sizes, Seq("doc_id"))
      val a = withSz.select(col("doc_id").as("id1"), col("sz").as("sz1"), col("shingle"))
      val b = withSz.select(col("doc_id").as("id2"), col("sz").as("sz2"), col("shingle"))
      a.join(b, Seq("shingle")).filter(col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2"), col("sz1"), col("sz2"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("id1"), col("id2"), col("jaccard"))
        .orderBy(col("id1"), col("id2"))
    }),

    // edit-distance near-dup: blocked candidate generation (equal 20-char
    // prefix key) then Levenshtein verification on a 60-char window — the
    // classic block-then-verify shape; never all-pairs.
    "dedup_levenshtein" -> ((s, d) => {
      val doc = Tables.documents(s, d)
        .select(col("doc_id"), md5(substring(col("text"), 1, 20)).as("blk"),
          substring(col("text"), 1, 60).as("head"))
      val a = doc.select(col("blk"), col("doc_id").as("id1"), col("head").as("h1"))
      val b = doc.select(col("blk"), col("doc_id").as("id2"), col("head").as("h2"))
      a.join(b, Seq("blk")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          levenshtein(col("h1"), col("h2")).cast("long").as("edit_dist"))
        .orderBy(col("id1"), col("id2"))
    }),

    // embedding-cosine near-dup: vector pairs above a cosine threshold
    // (brute-force over the fixed-size embedding table; the SRP-LSH bucket
    // path in Similarity is the 100 TB candidate generator).
    "dedup_embedding_cosine" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          Similarity.normSq(col("embedding")).as("nsq"))
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nsq").as("n1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nsq").as("n2"))
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .withColumn("cosine",
          Similarity.dot(col("e1"), col("e2")) / sqrt(col("n1") * col("n2")))
        .filter(col("cosine") >= 0.3)
        .select(col("id1"), col("id2"), col("cosine"))
        .orderBy(col("id1"), col("id2"))
    }),

    // MinHash+LSH: md5 minima signature → band hashes → bucket join →
    // candidate pairs (deduped across bands).
    //
    // Formulated as explode → groupBy(doc).agg(K min's) rather than nested
    // array HOFs: the lambda formulation re-evaluated the shingle array per
    // signature index AND ran interpreted (measured 48 s → ~2 s at sf0.1).
    // Exploded md5s are codegen'd; the shuffle key is doc_id — high
    // cardinality, so the agg balances across 1000 executors at scale.
    "dedup_minhash_lsh" -> ((s, d) => {
      val sh = shingleRows(Tables.documents(s, d))
      val sig = sh.groupBy(col("doc_id")).agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("m0"),
        (1 until K).map(j =>
          min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"m$j")): _*)
      val banded = sig.select(col("doc_id"),
        posexplode(array((0 until Bands).map(b =>
          md5(concat_ws("|", (0 until Rows).map(r => col(s"m${b * Rows + r}")): _*))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
      val a = banded.select(col("band"), col("band_hash"), col("doc_id").as("id1"))
      val b = banded.select(col("band"), col("band_hash"), col("doc_id").as("id2"))
      a.join(b, Seq("band", "band_hash")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()
        .orderBy(col("id1"), col("id2"))
    })
  )

  private val sqlToks = "string_split(lower(text), ' ')"
  private val sqlShingles =
    s"list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-2, 0)+1)])"

  private val nsqSql =
    "list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in range(1, len(embedding)+1)])"

  val oracle: Map[String, String] = Map(
    "dedup_levenshtein" ->
      """WITH doc AS (
        |  SELECT doc_id, md5(substr(text, 1, 20)) AS blk, substr(text, 1, 60) AS head
        |  FROM documents)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
        |FROM doc a JOIN doc b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |ORDER BY id1, id2""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nsqSql AS nsq
         |  FROM embeddings)
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding)+1)]) / sqrt(a.nsq * b.nsq) AS cosine
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in range(1, len(a.embedding)+1)]) / sqrt(a.nsq * b.nsq) >= 0.3
         |ORDER BY id1, id2""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(substr(text, 1, 40)) AS content_key,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents
        |GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY content_key""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, len(s) AS sz, unnest(s) AS shingle
         |  FROM (SELECT doc_id, $sqlShingles AS s
         |        FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |pairs AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sz AS sz1, b.sz AS sz2,
         |    COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id1, id2,
         |  CAST(inter AS DOUBLE) / (sz1 + sz2 - inter) AS jaccard
         |FROM pairs
         |WHERE CAST(inter AS DOUBLE) / (sz1 + sz2 - inter) >= $JaccardThreshold
         |ORDER BY id1, id2""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH sig AS (
         |  SELECT doc_id,
         |    [list_aggregate([md5(CAST(j AS VARCHAR) || ':' || x) for x in s], 'min') for j in range(0, $K)] AS sig
         |  FROM (SELECT doc_id, $sqlShingles AS s
         |        FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |banded AS (
         |  SELECT doc_id, b AS band,
         |    md5(array_to_string(sig[b*$Rows+1:b*$Rows+$Rows], '|')) AS band_hash
         |  FROM sig, range(0, $Bands) r(b))
         |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |FROM banded a
         |JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
         |  AND a.doc_id < b.doc_id
         |ORDER BY id1, id2""".stripMargin
  )
}

/** Local alias to avoid a package cycle: tokens() lives with the text ops. */
private object TextStats2 {
  def tokens(text: Column): Column = graft.functions.TextStats.tokens(text)
}
