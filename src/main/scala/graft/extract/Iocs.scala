package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The extraction core: every transform is a pure Column→Column function
  * (DataFrame algebra), so one implementation serves batch, Structured
  * Streaming, and the SQL-oracle harness. All patterns are ported from the
  * reference with file:line citations; Python `re` → Java regex dialect
  * differences are noted inline (SURVEY.md §7.4).
  *
  * Everything here stays inside WholeStageCodegen (built-in string/regex/
  * higher-order functions only — no UDFs), so the pipeline is a single
  * narrow, shuffle-free codegen span per input partition: exactly what you
  * want when the input is 100 TB of raw text — throughput scales linearly
  * with executors and no stage boundary materializes the heavy bodies.
  */
object Iocs {

  // ---- regex patterns -----------------------------------------------------
  // Email-feed variants tolerate analyst defanging ("[.]"); the tweet-feed IP
  // variant deliberately does not (firehose.py:56 vs h-isac.py:70) — both are
  // kept, per SURVEY.md §2.3 R2/R6.
  //
  // LOAD-BEARING GUARD (r13 verdict condition for keeping the fused
  // scanner): graft.functions.IocScan hand-reproduces the java.util.regex
  // semantics of IpPlain / Hash / UrlFast on the tweet hot path. Any edit
  // to a pattern below MUST extend IocScanSpec's fuzz corpus in the SAME
  // commit — the fuzz suite (vs the live regex plan) plus the DuckDB
  // oracle (which runs these ORIGINAL patterns) are the only things
  // keeping the two implementations equivalent.

  /** IP with optional defanged octets — /root/reference/h-isac.py:70 */
  val IpDefanged = """((?:^|\b)(?:\d{1,3}\[?\.\]?){3}\d{1,3}(?:\b|$))"""

  /** Plain IP, no defang tolerance — /root/reference/firehose.py:56 */
  val IpPlain = """((?:^|\b)(?:\d{1,3}\.){3}\d{1,3}(?:\b|$))"""

  /** md5/sha1/sha256; greedy, so a 64-hex token yields one match, not
    * substrings — /root/reference/h-isac.py:71, firehose.py:57 */
  val Hash = """((?:^|\b)[a-fA-F0-9]{32,64}(?:\b|$))"""

  /** URL accepting hxxp(s)/meow(s) defang schemes and bracketed dots —
    * /root/reference/h-isac.py:72, firehose.py:58 */
  val Url = """((?:^|\b)(?:h[xX]{2}ps?:|meows?:)?//(?:[A-Za-z0-9_\[\]#&,;=./-]+(?:\[?\.\]?)?)+(?:\b|$))"""

  /** Language-identical linear rewrite of [[Url]], used on the hot path:
    * the reference's `(?:X+(?:\[?\.\]?)?)+` nests quantifiers whose inner
    * chars are all members of X's class, so the language is exactly `X+` —
    * but Java's backtracking engine pays an exponential split-exploration
    * tax on the nested form (RE2/DuckDB does not, it's linear by
    * construction). Extraction equality is fuzz-asserted in IocsSpec and by
    * the oracle gate, which runs the ORIGINAL pattern in DuckDB. */
  val UrlFast = """((?:^|\b)(?:h[xX]{2}ps?:|meows?:)?//[A-Za-z0-9_\[\]#&,;=./-]+(?:\b|$))"""

  /** Email address — only matches *defanged* addresses (requires `[.]` in the
    * domain), by design per README.md:33-41 — /root/reference/h-isac.py:73 */
  val Email = """((?:^|\b)(?:[^\s]+?\@(?:.+?)\[\.\][a-zA-Z]+)(?:$|\b))"""

  /** Reply-chain truncation marker — /root/reference/h-isac.py:62 */
  val ReplyMarker = "From: H-ISAC Amber"

  // ---- scalar transforms --------------------------------------------------

  /** Refang one IOC string: `h[xX]{2}p(?=[s:])`→`http`, `[([.@])]`→`$1`
    * (/root/reference/h-isac.py:46-49). Java regex supports the lookahead
    * directly. Applied per-element on the email path only — the tweet path
    * never refangs (no refang calls anywhere in firehose.py); preserve the
    * asymmetry (SURVEY.md §2.3 R7).
    */
  def refang(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "h[xX]{2}p(?=[s:])", "http"),
      """\[([.@])\]""", "$1")

  /** mailto: strip (replace-all, matching Python str.replace), applied after
    * refang, emails only (/root/reference/h-isac.py:84). */
  def stripMailto(c: Column): Column = regexp_replace(c, "mailto:", "")

  /** Reply-chain truncation (`clean_text`, /root/reference/h-isac.py:51-67):
    * if the marker appears anywhere, keep only the lines strictly before the
    * FIRST line containing it. Single regexp_replace: (?s) lets .* span
    * newlines; the leading `(?:^|\n)` anchors to a line start and the
    * non-greedy prefix guarantees we cut at the first marker line.
    */
  def cleanText(body: Column): Column =
    regexp_replace(body, "(?s)(?:^|\n)[^\n]*" + ReplyMarker + ".*$", "")

  /** Extract all matches of `pattern` group 1 from `c` as array<string>. */
  def extractAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(1))

  /** Refang every element of an array column. */
  def refangAll(arr: Column): Column = transform(arr, refang _)

  // ---- classification (sort_iocs, /root/reference/firehose.py:82-103) -----

  /** Classify a raw token into ip | url | hash | unmatched.
    *
    * We implement the *intended* semantics — classify the raw token — rather
    * than the reference's `urlparse(x).netloc` quirk, which turns every
    * scheme-less token into netloc='' and misclassifies bare IPs
    * (firehose.py:88-93; divergence recorded in SURVEY.md §2.3 R9 and
    * asserted in IocsSpec). Rules, in reference order:
    *   contains "." and every dot-split element int-castable → ip
    *   contains "."                                          → url
    *   matches ^[a-zA-Z0-9]{32,64} (alnum, NOT hex — firehose.py:97,
    *     unanchored tail preserved via a prefix match)        → hash
    *   otherwise                                              → unmatched
    */
  def classify(tok: Column): Column = {
    val host = regexp_replace(tok, "^[a-zA-Z]+://", "") // scheme strip
    val bare = regexp_replace(host, "/.*$", "")         // path strip
    // digit-run test, not a cast: Spark 4 runs ANSI mode where a failed
    // string→int cast throws; a pure regex check is also engine-portable.
    // ONE anchored rlike instead of forall(split(...)): Spark's split
    // keeps trailing empty strings (limit −1), so "every dot-separated
    // element matches ^[0-9]+$" holds exactly when the whole string is
    // nonempty digit runs joined by single dots — no leading/trailing/
    // doubled dot. The HOF formulation was CodegenFallback (interpreted
    // lambda + array allocation per token); rlike compiles once and
    // stays in WholeStageCodegen (r14, guide §4/codegen).
    val octetsAllInt = bare.rlike("^[0-9]+(\\.[0-9]+)*$")
    when(tok.contains(".") && octetsAllInt, lit("ip"))
      .when(tok.contains("."), lit("url"))
      .when(tok.rlike("^[a-zA-Z0-9]{32,64}"), lit("hash"))
      .otherwise(lit("unmatched"))
  }
}
