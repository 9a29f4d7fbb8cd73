package graft.sinks

import java.nio.file.{Files, NoSuchFileException, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Config-file loading + validation — the entry-point checks of the
  * reference's `push_to_splunk` (/root/reference/h-isac.py:11-28):
  *
  *  - a missing file fails with the "does not exist" message
  *    (h-isac.py:16-17);
  *  - required keys are checked by set difference `want - have`
  *    (h-isac.py:20-23) so the error is raised before any credential is
  *    used;
  *  - the validated config yields the authenticated client and the KV
  *    batch_save endpoint (h-isac.py:25-28).
  *
  * Driver-side by design: this runs once before any Spark job is planned,
  * so it is plain JVM code, not an operator (SURVEY.md §2.1 note).
  */
final case class SplunkConfig(username: String, password: String,
                              app: String, kvStore: String) {

  /** KV store batch_save endpoint (h-isac.py:28). */
  def endpoint: String =
    s"servicesNS/nobody/$app/storage/collections/data/$kvStore/batch_save"

  /** Authenticated REST client for `base` (h-isac.py:25-26). */
  def client(base: String): HttpRestClient =
    new HttpRestClient(base).authenticate(username, password)
}

object SplunkConfig {

  val RequiredKeys: Set[String] = Set("username", "password", "app", "kv_store")

  def load(path: String): SplunkConfig = {
    val text =
      try Files.readString(Paths.get(path))
      catch {
        case _: NoSuchFileException | _: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(
            s"$path does not exist. Please try again with the correct file path.")
      }
    val node = new ObjectMapper().readTree(text)
    val have = node.fieldNames().asScala.toSet
    if ((RequiredKeys -- have).nonEmpty)
      throw new NoSuchElementException(
        "Required keys missing. Make sure your config file has username, password, app, and kv_store.")
    SplunkConfig(node.get("username").asText, node.get("password").asText,
      node.get("app").asText, node.get("kv_store").asText)
  }
}
