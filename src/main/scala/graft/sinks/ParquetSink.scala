package graft.sinks

import org.apache.spark.sql.DataFrame

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
}
