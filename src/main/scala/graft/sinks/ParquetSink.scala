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
}
