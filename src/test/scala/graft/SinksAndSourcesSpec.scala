package graft

import java.nio.file.Files
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.CsvSink
import graft.sources.{EmptyResult, ScalarResult, SplunkResponse, TabularResult}

/** Specs for the CSV sink (S7) and Splunk response normalization (S10). */
class SinksAndSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CsvSink: dated filename + header CSV content (h-isac.py:166-168)") {
    val dir = Files.createTempDirectory("csv").toString
    val df = Seq(("c1", "1.2.3.4", "ip")).toDF("id", "ioc", "type")
    val target = CsvSink.write(df, dir, LocalDate.of(2026, 8, 12), singleFile = true)
    assert(target.endsWith("/amber_list_iocs_20260812.csv"))
    val lines = Files.list(java.nio.file.Paths.get(target)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines())
    assert(lines == Seq("id,ioc,type", "c1,1.2.3.4,ip"))
  }

  test("LivePastebin: executor-side fetch, deduped per page, joins into the pipeline") {
    // deterministic stub fetcher (production supplies an HTTP client)
    val fetcher = new graft.sources.PageFetcher {
      def fetch(url: String): Seq[String] =
        Seq(s"10.0.0.${url.last}", "host.evil.com", "xx")
    }
    val tweets = Seq(
      ("1", "a", "u1", "t", "2024-01-01", "https://pastebin.com/p1;https://x.example/z"),
      ("2", "b", "u2", "t", "2024-01-01", "https://pastebin.com/p1"), // same page twice
      ("3", "c", "u3", "t", "2024-01-01", "https://y.example/q"))
      .toDF("id", "text", "user", "hashtags", "created_date", "urls")
    val pages = graft.sources.LivePastebin.fetchPages(tweets, fetcher)
    assert(pages.count() == 1) // p1 deduped; non-pastebin links never fetched
    val out = graft.pipeline.TweetPipeline.withPastebin(tweets, pages)
      .filter($"platform" === "Twitter" && $"ioc".startsWith("10.0.0."))
      .collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("1", "2")) // both tweets enriched
  }

  test("SplunkResponse: entry/results → DataFrame (splunk2.py:28-31)") {
    val body = """{"entry": [{"name": "a", "n": 1}, {"name": "b", "n": 2}]}"""
    SplunkResponse.parse(spark, body) match {
      case TabularResult(df) =>
        assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("n", "name"))
      case other => fail(s"expected table, got $other")
    }
    SplunkResponse.parse(spark, """{"results": [{"x": 1}]}""") match {
      case TabularResult(df) => assert(df.count() == 1)
      case other => fail(s"expected table, got $other")
    }
  }

  test("SplunkResponse: sid/_key → scalar (splunk2.py:32-35)") {
    assert(SplunkResponse.parse(spark, """{"sid": "job42"}""") == ScalarResult("job42"))
    assert(SplunkResponse.parse(spark, """{"_key": "k9"}""") == ScalarResult("k9"))
  }

  test("SplunkResponse: bare list → DataFrame; garbage → empty (splunk2.py:36-46)") {
    SplunkResponse.parse(spark, """[{"a": 1}, {"a": 2}]""") match {
      case TabularResult(df) => assert(df.count() == 2)
      case other => fail(s"expected table, got $other")
    }
    assert(SplunkResponse.parse(spark, "not json at all") == EmptyResult)
    assert(SplunkResponse.parse(spark, """{"unknown": true}""") == EmptyResult)
  }
}
