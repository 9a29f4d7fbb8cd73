package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Key-salting for skewed joins and aggregations — the manual fallback when
  * AQE's skew-join split isn't enough (e.g. one IOC value or one band hash
  * dominating a bucket at 100 TB).
  *
  * Deterministic salting: the salt is derived by hashing the big side's
  * OTHER columns (not rand()) so task retries and the DuckDB oracle see the
  * same assignment. The small side is replicated `factor` times; the big
  * side's hot key rows spread over `factor` sub-keys, turning one straggler
  * partition into `factor` even ones at the cost of a `factor`× blow-up of
  * the (small) replicated side.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `keys`, salted `factor` ways. Result equals
    * `big.join(small, keys)` row-for-row. `saltSource` drives the salt
    * assignment (pass a unique/high-entropy column of `big`). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Skew-proof aggregation: two-phase groupBy — partial agg on
    * (key, salt), final agg on key. Equivalent to `groupBy(key).agg(sum)`
    * for decomposable aggregates; the first shuffle spreads a hot key over
    * `factor` reducers. (Spark's partial aggregation already does this
    * map-side; this helper is for the case where a single reducer key still
    * overflows — the "hot key" pattern.) */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
                saltSource: Column, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"))

  /** Oracle-checked skew-proof aggregation: event values summed per
    * event_type (LOW-cardinality key — exactly the shape where one reducer
    * key melts at 100 TB) through the two-phase salted agg. The salt is
    * engine-internal (Murmur3) and washes out in the final phase, so the
    * oracle is the plain GROUP BY; decimal accumulation makes the result
    * independent of how rows landed in salt groups. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_salted" -> ((s, d) =>
      saltedSum(Tables.events(s, d), "event_type",
          col("value").cast("decimal(12,2)"), col("event_id"), 8)
        .select(col("event_type"), col("total").cast("double").as("total_value"))
        .orderBy(col("event_type"))),

    // Z-order key computation over (user, hour) — the multi-dimensional
    // layout key [[graft.sinks.ParquetSink.writeZOrdered]] clusters 100 TB
    // event logs by. Pure integer shift/mask algebra → bit-identical in
    // both engines; the row-group pruning win the key exists for is
    // asserted against real parquet footers in ScaleOpsSpec.
    "zorder_key" -> ((s, d) => {
      // integer µs→hour arithmetic (a double division would round, and
      // DuckDB's epoch() is DOUBLE — epoch_us // is the exact twin)
      val hb = expr("((unix_micros(ts) div 1000000) div 3600) % 65536")
      Relational.sortedOnce(Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          hb.as("hour_bucket"),
          graft.sinks.ParquetSink.zvalue(col("user_id").cast("long"), hb).as("zval")),
        col("zval"), col("event_id"))
    }),

    // Skew-proof JOIN through [[saltedJoin]]: events ⋈ a per-type dimension
    // on event_type — a handful of distinct keys carrying the whole fact
    // table, the exact shape where one reducer key melts at 100 TB. The
    // salt spreads each hot key over 16 sub-keys; the dimension replicates
    // 16× (16 × |types| rows — trivially small). The salt is engine-internal
    // and row-preserving, so the oracle is the PLAIN join; the post-join
    // aggregate keeps the checked result type-count-sized, and decimal
    // accumulation makes it independent of salt-group row order.
    "join_skew_salted" -> ((s, d) => {
      val e = Tables.events(s, d)
      val dim = e.select(col("event_type")).distinct()
        .withColumn("type_weight",
          conv(substring(md5(col("event_type")), 1, 8), 16, 10)
            .cast("long") % 1000)
      saltedJoin(e.select(col("event_type"), col("event_id"), col("value")),
          dim, Seq("event_type"), col("event_id"), 16)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)") * col("type_weight"))
            .cast("double").as("weighted_value"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_salted" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "zorder_key" ->
      """WITH base AS (
        |  SELECT event_id, user_id,
        |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 3600) % 65536 AS hour_bucket
        |  FROM events)
        |SELECT event_id, user_id, hour_bucket,
        |  CAST(list_sum([
        |    ((CAST(user_id AS BIGINT) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i)) +
        |    ((hour_bucket >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))
        |    for i in range(0, 16)]) AS BIGINT) AS zval
        |FROM base
        |ORDER BY zval, event_id""".stripMargin,
    "join_skew_salted" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT) % 1000
        |      AS type_weight
        |  FROM events)
        |SELECT e.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2)) * type_weight) AS DOUBLE)
        |    AS weighted_value
        |FROM events e JOIN dim USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY event_type""".stripMargin
  )
}
