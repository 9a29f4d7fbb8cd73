package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Iocs

/** Unit specs for the extraction core — the corpora encode the reference's
  * documented behavior (README.md:33-41 refang examples, regex quirks from
  * SURVEY.md §2.3) and our recorded divergences.
  */
class IocsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(c.as("r")).head().getString(0)

  private def extract(pattern: String, input: String): Seq[String] =
    Seq(input).toDF("x")
      .select(Iocs.extractAll(col("x"), pattern).as("r"))
      .head().getSeq[String](0)

  test("refang: README examples") {
    assert(one(Iocs.refang(col("x")), "hxxps://www[.]google[.]com") == "https://www.google.com")
    assert(one(Iocs.refang(col("x")), "hXXp://evil[.]example[.]org") == "http://evil.example.org")
    assert(one(Iocs.refang(col("x")), "127[.]0[.]0[.]1") == "127.0.0.1")
    assert(one(Iocs.refang(col("x")), "my[.]email[@]somedomain[.]com") == "my.email@somedomain.com")
    // meow scheme: brackets refang, scheme preserved (only hxxp rewrites)
    assert(one(Iocs.refang(col("x")), "meows://drop[.]cdn[.]net") == "meows://drop.cdn.net")
  }

  test("mailto strip after refang (h-isac.py:84)") {
    assert(one(Iocs.stripMailto(Iocs.refang(col("x"))),
      "mailto:user@bad[.]host[.]io") == "user@bad.host.io")
  }

  test("clean_text: truncates at FIRST marker line (h-isac.py:51-67)") {
    val body = "line1\nline2\nFrom: H-ISAC Amber List reply\nold1\nFrom: H-ISAC Amber again\nold2"
    assert(one(Iocs.cleanText(col("x")), body) == "line1\nline2")
    // marker on the first line → everything removed
    assert(one(Iocs.cleanText(col("x")), "From: H-ISAC Amber\nrest") == "")
    // no marker → unchanged
    assert(one(Iocs.cleanText(col("x")), "a\nb") == "a\nb")
  }

  test("IP regex (email path) tolerates defanged octets; tweet path does not") {
    assert(extract(Iocs.IpDefanged, "c2 at 10[.]0[.]0[.]1 and 1.2.3.4") ==
      Seq("10[.]0[.]0[.]1", "1.2.3.4"))
    assert(extract(Iocs.IpPlain, "c2 at 10[.]0[.]0[.]1 and 1.2.3.4") == Seq("1.2.3.4"))
  }

  test("hash regex greedy: one 64-hex token yields one match, not substrings") {
    val h64 = "a" * 32 + "0123456789abcdef0123456789abcdef"
    assert(extract(Iocs.Hash, s"sample $h64 end") == Seq(h64))
    val md5v = "d41d8cd98f00b204e9800998ecf8427e"
    assert(extract(Iocs.Hash, s"md5 $md5v.") == Seq(md5v))
  }

  test("URL regex accepts hxxp/meow defang schemes and bracketed dots") {
    assert(extract(Iocs.Url, "go hxxps://evil[.]example[.]com/p now") ==
      Seq("hxxps://evil[.]example[.]com/p"))
    assert(extract(Iocs.Url, "go meow://x[.]y now") == Seq("meow://x[.]y"))
    // scheme-less // matches at string start via (?:^), but NOT after a
    // space: space→slash is no \b — verified identical in Python re.
    assert(extract(Iocs.Url, "//cdn.example.net/lib.js rest") ==
      Seq("//cdn.example.net/lib.js"))
    assert(extract(Iocs.Url, "bare //cdn.example.net/lib.js ok") == Seq.empty)
  }

  test("UrlFast is extraction-identical to the reference Url pattern (fuzz)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab1_[]#&,;=./-xX hp:s\n\t"
    val fuzz = Seq.fill(400)((1 to (1 + rnd.nextInt(60)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val tricky = Seq("//a-", "x//a-", "//a[.]b- ", "hxxps://a[.]b/c- x",
      "meow://x[.]y", "//", " // ", "//-", "//a..b", "a//b[.]", "hxxp://",
      "//a[.]b[.]c/d#e&f,g;h=i", "//]][[")
    val inputs = fuzz ++ tricky
    val both = inputs.toDF("x").select(
      Iocs.extractAll(col("x"), Iocs.Url).as("ref"),
      Iocs.extractAll(col("x"), Iocs.UrlFast).as("fast")).collect()
    both.zip(inputs).foreach { case (r, in) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"diverged on: ${in.replace("\n","\\n")}")
    }
  }

  test("email regex matches ONLY defanged addresses (README.md:33-41)") {
    assert(extract(Iocs.Email, "contact a@b[.]com and plain a@b.com") == Seq("a@b[.]com"))
    assert(extract(Iocs.Email, "plain only a@b.com") == Seq.empty)
  }

  test("classify: intended sort_iocs semantics (firehose.py:82-103)") {
    val rows = Seq("1.2.3.4", "http://1.2.3.4/x", "host.example.com",
      "d41d8cd98f00b204e9800998ecf8427e", "ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ", "junk")
      .toDF("x").select(col("x"), Iocs.classify(col("x")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("1.2.3.4") == "ip")
    assert(rows("http://1.2.3.4/x") == "ip") // intended: classify the host, not urlparse('')
    assert(rows("host.example.com") == "url")
    assert(rows("d41d8cd98f00b204e9800998ecf8427e") == "hash")
    assert(rows("ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ") == "hash") // alnum-not-hex, per firehose.py:97
    assert(rows("junk") == "unmatched")
  }
}
