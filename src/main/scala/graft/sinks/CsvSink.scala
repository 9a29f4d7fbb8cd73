package graft.sinks

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.DataFrame

/** Dated CSV sink — the reference's batch output
  * (`amber_list_iocs_%Y%m%d.csv`, /root/reference/h-isac.py:166-168; note
  * README.md:51 names it differently — code wins, SURVEY.md §2.1 S7).
  *
  * Default is a partitioned header CSV directory (the scale path: one file
  * per task, no driver bottleneck). `singleFile = true` coalesces to one
  * part for byte-parity with the reference's single-file contract — export
  * convenience only, never the 100 TB path.
  */
object CsvSink {

  private val stamp = DateTimeFormatter.ofPattern("yyyyMMdd")

  def path(dir: String, date: LocalDate): String =
    s"$dir/amber_list_iocs_${date.format(stamp)}.csv"

  def write(df: DataFrame, dir: String, date: LocalDate,
            singleFile: Boolean = false): String = {
    val target = path(dir, date)
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", "true").mode("overwrite").csv(target)
    target
  }
}
