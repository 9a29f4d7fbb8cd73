package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest}
import java.net.http.HttpResponse.BodyHandlers
import java.time.Duration

/** The reference's pastebin scrape, `get_iocs`
  * (/root/reference/firehose.py:74-80): GET the page, select
  * `#code_frame2 ol > li > div`, take each item's text. No HTML library
  * ships on the cluster classpath, so the selection is a scoped regex
  * parse (see [[PastebinHtml.lines]]) rather than a DOM walk — equivalent
  * on the pastebin markup the selector targets.
  */
object PastebinHtml {

  private val Item = """(?s)<li[^>]*>\s*<div[^>]*>(.*?)</div>""".r
  private val Tag = "<[^>]+>".r

  /** `#code_frame2 ol > li > div` as a scoped scan: cut the document down
    * to the span between the element carrying id="code_frame2" and its
    * list's closing `</ol>`, then take each `<li><div>…</div>` item's text
    * with inner tags stripped and basic entities unescaped (BeautifulSoup's
    * `.text` behavior on this markup). */
  def lines(html: String): Seq[String] = {
    val at = html.indexOf("code_frame2")
    if (at < 0) Seq.empty
    else {
      val tail = html.substring(at)
      val end = tail.indexOf("</ol>")
      val scoped = if (end >= 0) tail.substring(0, end) else tail
      Item.findAllMatchIn(scoped)
        .map(m => unescape(Tag.replaceAllIn(m.group(1), "")).trim)
        .toList
    }
  }

  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    .replace("&#39;", "'").replace("&amp;", "&")
}

/** Production [[PageFetcher]]: executor-side HTTP GET + [[PastebinHtml]]
  * parse. Serializable config shell — the HttpClient is @transient lazy,
  * built once per executor on first use (amortized across the partition's
  * URLs, the same pattern as the sink transport). Fetch failures return no
  * lines rather than failing the task: a dead pastebin link loses that
  * page's IOCs, exactly like the reference's unchecked `requests.get`
  * losing them on a 404 body with no `#code_frame2`. */
final class HttpPageFetcher extends PageFetcher {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(20)).build()

  override def fetch(url: String): Seq[String] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(60)).GET().build()
      PastebinHtml.lines(client.send(req, BodyHandlers.ofString()).body())
    } catch { case _: java.io.IOException => Seq.empty }
}
