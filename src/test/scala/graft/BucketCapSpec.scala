package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Cap-neutrality of the LSH bucket-size ceilings (Dedup.MaxBucketSize):
  * at the tested scale factors every bucket is far below the cap, so the
  * capped candidate-pair output must EQUAL the effectively-uncapped one
  * (cap = Int.MaxValue). This is the invariant the MaxBucketSize scaladoc
  * claims; a tiny cap must still yield a subset (recall-only trade, never
  * false positives).
  */
class BucketCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Set[(String, String)] =
    df.select("id1", "id2").collect()
      .map(r => (r.get(0).toString, r.get(1).toString)).toSet

  test("MinHash LSH: capped pair output equals uncapped at test SF") {
    val capped = pairs(Dedup.computeMinhashPairs(spark, d, Dedup.MaxBucketSize))
    val uncapped = pairs(Dedup.computeMinhashPairs(spark, d, Int.MaxValue))
    assert(capped == uncapped,
      s"cap=${Dedup.MaxBucketSize} changed the pair set: " +
        s"missing=${(uncapped -- capped).take(5)} extra=${(capped -- uncapped).take(5)}")
    assert(capped.nonEmpty, "test SF produced no candidate pairs — vacuous")
  }

  test("SimHash banding: capped pair output equals uncapped at test SF") {
    val capped = pairs(Dedup.simhashPairs(spark, d, Dedup.MaxBucketSize))
    val uncapped = pairs(Dedup.simhashPairs(spark, d, Int.MaxValue))
    assert(capped == uncapped)
    assert(capped.nonEmpty, "test SF produced no candidate pairs — vacuous")
  }

  test("overflow report agrees with cap neutrality at test SF") {
    val rep = Dedup.queries("dedup_bucket_overflow")(spark, d).collect()
    assert(rep.nonEmpty)
    // BucketCapSpec proves capped == uncapped here; the report must agree:
    // zero buckets over the cap, zero members dropped
    rep.foreach { r =>
      assert(r.getLong(3) == 0, s"band ${r.getLong(0)}: n_over_cap != 0")
      assert(r.getLong(4) == 0, s"band ${r.getLong(0)}: members_dropped != 0")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("a pathologically small cap yields a subset, never new pairs") {
    val tiny = pairs(Dedup.computeMinhashPairs(spark, d, 2))
    val full = pairs(Dedup.computeMinhashPairs(spark, d, Int.MaxValue))
    assert(tiny.subsetOf(full),
      s"cap overflow invented pairs: ${(tiny -- full).take(5)}")
  }
}
