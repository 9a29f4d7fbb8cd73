package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Splunk REST response normalization — the Spark re-expression of
  * `_parse_results` (/root/reference/splunk2.py:22-47, SURVEY.md §2.1 S10):
  * key-dispatch a JSON response body into either a tabular DataFrame
  * (`entry` / `results` / bare list) or a scalar (`sid` / `_key`), else
  * nothing.
  *
  * Dispatch happens driver-side on the (small) response envelope with the
  * Jackson shipped in Spark; tabular payloads are handed to
  * `spark.read.json`, which infers the schema exactly like
  * `pd.DataFrame(...)` did in the reference.
  */
sealed trait SplunkResult
final case class TabularResult(df: DataFrame) extends SplunkResult
final case class ScalarResult(value: String) extends SplunkResult
case object EmptyResult extends SplunkResult

object SplunkResponse {

  private val mapper = new ObjectMapper()

  def parse(spark: SparkSession, body: String): SplunkResult = {
    val root: JsonNode =
      try mapper.readTree(body)
      catch { case _: Exception => return EmptyResult } // splunk2.py:43-46

    def toDf(nodes: Iterator[JsonNode]): TabularResult = {
      import spark.implicits._
      TabularResult(spark.read.json(nodes.map(_.toString).toSeq.toDS()))
    }

    if (root.isArray) toDf(root.elements().asScala)          // splunk2.py:36-42
    else if (root.has("entry")) toDf(root.get("entry").elements().asScala)
    else if (root.has("results")) toDf(root.get("results").elements().asScala)
    else if (root.has("sid")) ScalarResult(root.get("sid").asText)  // :32-35
    else if (root.has("_key")) ScalarResult(root.get("_key").asText)
    else EmptyResult                                          // :43-46
  }
}
