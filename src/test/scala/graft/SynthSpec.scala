package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the scale-stress synthesizer ([[graft.Synth]]) — the 10×
  * corpus BENCH_sf1.json measures against is only evidence if the replica
  * preserves the base corpus's structure. Pinned at factor 2 over
  * sf0.001 (same code path as the 10× build; `Synth.main` is exercised
  * end-to-end, parquet out and back).
  */
class SynthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("synth2").toString
    Synth.run(spark, "/root/testdata/sf0.001", d, 2)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$outDir/$name.parquet")
  private def base(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  test("replicated tables split into factor files (scan parallelism grows with data)") {
    // a single-row-group output serializes every scan onto one task at
    // any scale — the 30x stress caught exactly that shape
    val files = new java.io.File(s"$outDir/lineitem.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2, s"expected factor (2) output files, got $files")
  }

  test("row counts scale by the factor; fixed dims stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() == 2 * base(n).count(), s"$n not 2x")
    for (n <- Seq("region", "nation"))
      assert(t(n).count() == base(n).count(), s"$n must stay fixed")
  }

  test("keys stay unique and referential integrity survives the offset") {
    assert(t("customer").select("c_custkey").distinct().count() == t("customer").count())
    assert(t("orders").select("o_orderkey").distinct().count() == t("orders").count())
    // doc_id uniqueness is an INVARIANT reformulations depend on (r14
    // ADVICE): text_winnowing's per-doc array_distinct ≡ global
    // DISTINCT(doc_id, fp) and dedup_substring's collect_set posting
    // fold both assume one row per doc_id — pin it on base AND synth
    assert(base("documents").select("doc_id").distinct().count() ==
      base("documents").count())
    assert(t("documents").select("doc_id").distinct().count() == t("documents").count())
    // no orphans in either direction of the fact chain
    assert(t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    assert(t("lineitem").join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
    assert(t("lineitem").join(t("supplier"),
      col("l_suppkey") === col("s_suppkey"), "left_anti").count() == 0)
  }

  test("entity names stay bijective with their keys (and replica 0 keeps base names)") {
    // Real TPC-H data guarantees s_name/c_name are the zero-padded key;
    // keeping the BASE name across replicas duplicated it 10× and broke
    // the sf1 oracle twice: q21 (GROUP BY s_name merged 10 suppliers →
    // 10× numwait) and q20 (ORDER BY s_name alone stopped being total).
    for ((tbl, key, name, prefix) <- Seq(
        ("supplier", "s_suppkey", "s_name", "Supplier#"),
        ("customer", "c_custkey", "c_name", "Customer#"))) {
      val df = t(tbl)
      assert(df.select(name).distinct().count() == df.count(), s"$name not unique")
      val bad = df.filter(col(name) =!=
        concat(lit(prefix), lpad(col(key).cast("string"), 9, "0"))).count()
      assert(bad == 0, s"$bad rows where $name is not the zero-padded $key")
    }
  }

  test("per-key history sizes are preserved (replication grows keys, not rows per key)") {
    val baseHist = base("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val synthHist = t("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(synthHist == baseHist.map { case (k, v) => k -> v * 2 },
      s"lineitems-per-order histogram must double per bucket: $baseHist vs $synthHist")
  }

  test("replica 0 is the base corpus verbatim; replica 1 content diverges") {
    val nDocs = base("documents").count()
    val r0 = t("documents").filter(col("doc_id") < nDocs).select("doc_id", "text")
    assert(r0.except(base("documents").select("doc_id", "text")).count() == 0)
    // rotated replica: same lengths (n_chars stays truthful), different bytes
    val joined = t("documents").filter(col("doc_id") >= nDocs)
      .select((col("doc_id") - nDocs).as("doc_id"), col("text").as("t1"))
      .join(base("documents").select(col("doc_id"), col("text").as("t0")), Seq("doc_id"))
    assert(joined.filter(length(col("t1")) =!= length(col("t0"))).count() == 0)
    assert(joined.filter(col("t1") === col("t0")).count() == 0,
      "replica 1 text must differ from base everywhere")
    assert(t("documents").filter(length(col("text")) =!= col("n_chars")).count() == 0)
    // embeddings too: the perturbation must be gated OFF for replica 0
    // (pmod(0,10)+1 = 1 would give amplitude 0.02, and float round-trip
    // through *(1+ε·cos) is not identity) — replica-0 vectors byte-match
    val nVec = base("embeddings").count()
    val e0 = t("embeddings").filter(col("vec_id") < nVec)
      .select("vec_id", "embedding")
    assert(e0.except(base("embeddings").select("vec_id", "embedding")).count() == 0,
      "replica 0 embeddings must be byte-identical to the base")
  }

  test("replica alphabets are distinct bijections for every factor up to MaxFactor") {
    // the 30x stress caught the mod-26 shift wrap: replica 26+k verbatim-
    // duplicated replica k, driving shingle DF to the cap (fake cross-
    // replica exact dups). Affine maps must be pairwise distinct and each
    // a bijection, for the whole supported factor range.
    val maps = (0 until Synth.MaxFactor).map(Synth.alphabetFor)
    maps.foreach(m => assert(m.toSet.size == 26, s"not a bijection: $m"))
    assert(maps.distinct.size == Synth.MaxFactor, "two replicas share an alphabet")
    assert(maps.head == "abcdefghijklmnopqrstuvwxyz", "replica 0 must be identity")
    assertThrows[IllegalArgumentException](Synth.alphabetFor(Synth.MaxFactor))
  }

  test("mod-10 split conventions survive (offsets are multiples of 10)") {
    // dedup_incremental / sim_incremental split on id % 10 — each replica
    // must contribute the same per-class share as the base
    val b = base("embeddings").filter(col("vec_id") % 10 === 0).count()
    assert(t("embeddings").filter(col("vec_id") % 10 === 0).count() == 2 * b)
    val bd = base("documents").filter(col("doc_id") % 10 === 0).count()
    assert(t("documents").filter(col("doc_id") % 10 === 0).count() == 2 * bd)
  }

  test("embeddings perturb per replica but stay near the base direction") {
    val nVec = base("embeddings").count()
    val joined = t("embeddings").filter(col("vec_id") >= nVec)
      .select((col("vec_id") - nVec).as("vec_id"), col("embedding").as("e1"))
      .join(base("embeddings").select(col("vec_id"), col("embedding").as("e0")), Seq("vec_id"))
      .select(
        aggregate(zip_with(col("e0"), col("e1"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("dot"),
        sqrt(aggregate(col("e0"), lit(0.0), (a, x) => a + x * x)).as("n0"),
        sqrt(aggregate(col("e1"), lit(0.0), (a, x) => a + x * x)).as("n1"))
      .select((col("dot") / (col("n0") * col("n1"))).as("cos"))
    // distinct vectors (cos < 1) that still index into the same region (cos ≫ 0)
    assert(joined.filter(col("cos") >= 0.999999).count() == 0,
      "replica vectors must not be exact copies")
    assert(joined.filter(col("cos") < 0.95).count() == 0,
      "perturbation must stay small enough to preserve index geometry")
  }

  test("embedding perturbation stays direction-preserving at the HIGHEST replica index") {
    // the old 0.02·r amplitude flipped multiplier signs from r≈50 — this
    // applies the production formula at r = MaxFactor-1 (311) directly
    // (running a 312× corpus build in a spec is not needed to pin the
    // per-replica math) and asserts the same cosine band as factor 2
    val r = Synth.MaxFactor - 1
    val joined = base("embeddings")
      .select(col("embedding").as("e0"),
        Synth.perturbEmbedding(col("embedding"), lit(r)).as("e1"))
      .select(
        aggregate(zip_with(col("e0"), col("e1"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("dot"),
        sqrt(aggregate(col("e0"), lit(0.0), (a, x) => a + x * x)).as("n0"),
        sqrt(aggregate(col("e1"), lit(0.0), (a, x) => a + x * x)).as("n1"))
      .select((col("dot") / (col("n0") * col("n1"))).as("cos"))
    assert(joined.filter(col("cos") >= 0.999999).count() == 0,
      "replica 311 vectors must not be exact copies")
    assert(joined.filter(col("cos") < 0.95).count() == 0,
      "replica 311 must preserve direction (amplitude must not grow with r)")
  }
}
