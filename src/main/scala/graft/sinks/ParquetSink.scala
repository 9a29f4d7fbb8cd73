package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Columnar IOC store — what replaces the reference's CSV/KV stores as the
  * system of record at scale. Hive-partitioned by `date_added` and `type`
  * (SURVEY.md §7.2.7 "partition-by-date writes"), so the two dominant access
  * patterns — "yesterday's IOCs" and "all IPs" — become partition-pruned
  * scans that never touch the rest of 100 TB. Low cardinality on both keys
  * (dates × 4 types) keeps file counts sane; within a partition, files split
  * by task, so write parallelism scales with executors.
  */
object ParquetSink {
  def write(iocs: DataFrame, path: String): Unit =
    iocs.write
      .partitionBy("date_added", "type")
      .mode("append")
      .parquet(path)

  /** Bucketed system-of-record table: rows are hash-bucketed (and sorted)
    * on the join key at WRITE time, so every later equi-join or aggregation
    * on that key between same-bucketed tables runs with ZERO exchanges —
    * the single highest-leverage layout decision for a 100 TB fact table
    * that is joined every day (pay the shuffle once at ingest, never
    * again). Asserted shuffle-free in ScaleOpsSpec. */
  def writeBucketed(df: DataFrame, table: String,
                    numBuckets: Int, key: String): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Morton (Z-order) interleave of the low 16 bits of two Long columns —
    * pure integer Column algebra (32 shift/mask terms, fully codegen'd,
    * no UDF). Sorting a write by this key clusters BOTH dimensions at
    * once, so parquet row-group min/max stats prune two-dimensional box
    * predicates — the layout lever for a 100 TB event log queried by
    * (user, time): a time-sorted file prunes only time, a Z-sorted file
    * prunes the product. Pruning win asserted against real parquet
    * footers in ScaleOpsSpec. */
  def zvalue(a: Column, b: Column): Column =
    (0 until 16).map(i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
      .reduce(_ + _)

  /** Z-sorted parquet write: range-partition on [[zvalue]] then sort within
    * partitions — the distributed global sort (no single-task bottleneck);
    * each output file covers a contiguous Z range. `writerOptions` passes
    * parquet knobs (block/page size) straight to the writer. */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    writerOptions: Map[String, String] = Map.empty): Unit =
    df.withColumn("__z", zvalue(col(a), col(b)))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.options(writerOptions).mode("overwrite").parquet(path)
}
