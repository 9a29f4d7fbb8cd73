package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** Production REST client backed by `java.net.http` — the Spark-side
  * equivalent of the reference's Splunk API wrapper
  * (/root/reference/splunk2.py:13-71):
  *
  *  - base URL is fixed at construction (host + management port,
  *    splunk2.py:16-17);
  *  - credentials must be supplied via [[authenticate]] before any request;
  *    a request without them fails fast (splunk2.py:50-51's ValueError →
  *    IllegalStateException here);
  *  - the endpoint is left-stripped of '/' and joined to the base with
  *    exactly one slash (splunk2.py:53-55);
  *  - all verbs dispatch through one generic [[request]] with HTTP Basic
  *    auth and caller-supplied headers/body (splunk2.py:57-71);
  *  - response bodies are returned raw; normalization is
  *    [[graft.sources.SplunkResponse.parse]] (the `_parse_results` twin).
  *
  * Differences kept deliberately: TLS verification stays ON (the reference
  * passed `verify=False`; silently accepting any certificate is not a
  * behavior worth porting), and proxy bypass is the JVM default.
  *
  * Instances are Serializable config shells for executor-side use (the
  * sink's foreachPartition): the HttpClient itself is @transient lazy, so
  * each executor builds its own client on first use and nothing
  * non-serializable rides the task closure.
  */
final class HttpRestClient(base: String) extends Transport {

  private var auth: Option[(String, String)] = None

  /** Store credentials for Basic auth (splunk2.py:19-20). */
  def authenticate(username: String, password: String): this.type = {
    auth = Some((username, password)); this
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  private def url(endpoint: String): String =
    base.stripSuffix("/") + "/" + endpoint.dropWhile(_ == '/')

  /** Generic verb dispatch; returns the raw response body. */
  def request(method: String, endpoint: String,
              headers: Map[String, String] = Map.empty,
              body: Option[String] = None): String = {
    val (u, p) = auth.getOrElse(throw new IllegalStateException(
      "Please provide authentication credentials before trying to interact with the API."))
    val basic = Base64.getEncoder.encodeToString(
      s"$u:$p".getBytes(StandardCharsets.UTF_8))
    val b = HttpRequest.newBuilder(URI.create(url(endpoint)))
      .timeout(Duration.ofSeconds(60))
      .header("Authorization", s"Basic $basic")
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = (method.toUpperCase match {
      case "GET" => b.GET()
      case m => b.method(m,
        body.map(BodyPublishers.ofString).getOrElse(BodyPublishers.noBody()))
    }).build()
    val resp: HttpResponse[String] = client.send(req, BodyHandlers.ofString())
    // Fail loudly on error statuses: the sink's at-least-once guarantee
    // rests on a failed POST failing its TASK (so Spark retries it) — a
    // 5xx body returned as a "result" would silently drop the batch.
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from ${url(endpoint)}: ${resp.body().take(200)}")
    resp.body()
  }

  def get(endpoint: String, headers: Map[String, String] = Map.empty): String =
    request("GET", endpoint, headers)

  def delete(endpoint: String, headers: Map[String, String] = Map.empty): String =
    request("DELETE", endpoint, headers)

  /** [[Transport]] seam for [[RestBatchSink]]: JSON-array payloads POST to
    * the batch_save endpoint (h-isac.py:31-43). */
  override def post(endpoint: String, payload: String): Unit = {
    request("POST", endpoint,
      Map("Content-Type" -> "application/json"), Some(payload))
    ()
  }
}
