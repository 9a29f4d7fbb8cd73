package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Single-pass linear IOC scanner — the fused alternative to the tweet
  * path's THREE `regexp_extract_all` calls (IpPlain / Hash / UrlFast,
  * extract/Iocs.scala:29-47).
  *
  * Why it exists: the r12 streaming knee sweep attributed the ~74k rec/s
  * per-node ceiling to regex extraction (BENCH_sf1.json `knee_sweep_r12`);
  * SURVEY.md §4 reserved a fused extraction `Expression` for that moment.
  * Each `regexp_extract_all` call re-converts the UTF8String to a Java
  * String and walks it with java.util.regex's backtracking engine; this
  * scanner converts ONCE and emits all three IOC families from hand-rolled
  * linear matchers with NO backtracking.
  *
  * LOAD-BEARING GUARD (r13 verdict condition for keeping this scanner):
  * any edit to the source patterns (extract/Iocs.scala:26-47) or to the
  * matchers below MUST extend IocScanSpec's fuzz corpus in the SAME
  * commit. The fuzz suite asserts equality against the live
  * `regexp_extract_all` plan, and the round oracle runs the ORIGINAL
  * patterns in DuckDB — together they are the only proof the fused path
  * and the reference patterns stay equivalent.
  *
  * Semantics contract: output is identical — per input row, the same
  * multiset of (type, ioc) pairs, in the same per-type left-to-right
  * match order — to `regexp_extract_all(text, P, 1)` for the three
  * patterns. The java.util.regex subtleties are reproduced explicitly:
  *
  *  - `\b` is the ASCII word boundary (`\w` = [A-Za-z0-9_]; Spark compiles
  *    these patterns without UNICODE_CHARACTER_CLASS);
  *  - `$` (no MULTILINE) matches at end of input AND just before a FINAL
  *    line terminator (\n, \r, \r\n, NEL u0085, LS u2028, PS u2029) — see
  *    [[IocScan.dollarAt]];
  *  - the hash run analysis: `(?:^|\b)[hex]{32,64}(?:\b|$)` admits exactly
  *    the MAXIMAL hex runs of length 32..64 with non-word/edge context on
  *    both sides (a >64 run yields nothing: no interior position carries
  *    the leading \b, and greedy backtracking always lands the cut before
  *    another hex char);
  *  - the IP octets: each of the first three `\d{1,3}\.` groups only
  *    matches a COMPLETE digit run of 1-3 digits (a longer run leaves the
  *    next char a digit at every backtracking depth, never the dot);
  *  - the URL tail `[CLS]+(?:\b|$)` greedy-then-backtrack trim: keep the
  *    longest prefix of the CLS run whose cut position is a word boundary
  *    (the class mixes word and non-word chars, so the boundary can fall
  *    INSIDE the run), or the whole run at end-of-input;
  *  - the URL head `(?:^|\b)(?:h[xX]{2}ps?:|meows?:)?//`: when the
  *    optional scheme fails, the `//` itself must sit at the boundary —
  *    which, `/` being a non-word char, means the PRECEDING char must be a
  *    word char (so "x//foo" matches "//foo" but " //foo" matches nothing,
  *    exactly like the regex).
  *
  * Equality with the regex path is asserted two ways: IocScanSpec fuzzes
  * adversarial strings against the live `regexp_extract_all` plan, and the
  * oracle gate runs the ORIGINAL patterns in DuckDB against the fused
  * pipeline's output (same discipline as UrlFast vs Url).
  */
object IocScan {

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** The UrlFast character class [A-Za-z0-9_\[\]#&,;=./-]. */
  private def isCls(c: Char): Boolean =
    isWord(c) || c == '[' || c == ']' || c == '#' || c == '&' || c == ',' ||
      c == ';' || c == '=' || c == '.' || c == '/' || c == '-'

  private def isTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** java.util.regex `$` without MULTILINE: end of input, or before a
    * final line terminator — where a final "\r\n" counts as ONE
    * terminator, so `$` matches before the '\r' but never between the
    * '\r' and the '\n' (JVM-verified; today unreachable through
    * [[scanUrls]] since '\r' is not a CLS char, but the helper's
    * contract is exact `$` semantics for any future caller). */
  private def dollarAt(s: String, pos: Int): Boolean = {
    val n = s.length
    pos == n ||
      (pos == n - 1 && isTerm(s.charAt(n - 1)) &&
        !(s.charAt(n - 1) == '\n' && n >= 2 && s.charAt(n - 2) == '\r')) ||
      (pos == n - 2 && s.charAt(n - 2) == '\r' && s.charAt(n - 1) == '\n')
  }

  /** `\b` at position pos (between pos-1 and pos; virtual edges non-word). */
  private def bAt(s: String, pos: Int): Boolean = {
    val n = s.length
    val before = pos > 0 && isWord(s.charAt(pos - 1))
    val after = pos < n && isWord(s.charAt(pos))
    before != after
  }

  /** `(?:\b|$)` at a match end. */
  private def endOk(s: String, pos: Int): Boolean =
    bAt(s, pos) || dollarAt(s, pos)

  /** Hash matches: maximal hex runs, length 32..64, non-word context. */
  private def scanHashes(s: String, out: ArrayBuffer[(String, String)]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      if (isHex(s.charAt(i))) {
        var j = i
        while (j < n && isHex(s.charAt(j))) j += 1
        val len = j - i
        val leadOk = i == 0 || !isWord(s.charAt(i - 1))
        if (leadOk && len >= 32 && len <= 64 && (j == n || !isWord(s.charAt(j))))
          out += (("hash", s.substring(i, j)))
        i = j // no interior position of a hex run carries \b
      } else i += 1
    }
  }

  /** IP matches: 4 complete digit runs of 1-3 digits joined by dots. */
  private def scanIps(s: String, out: ArrayBuffer[(String, String)]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var p = i
        var ok = true
        var k = 0
        while (ok && k < 3) { // three "digits." groups
          var q = p
          while (q < n && isDigit(s.charAt(q))) q += 1
          if (q - p >= 1 && q - p <= 3 && q < n && s.charAt(q) == '.') p = q + 1
          else ok = false
          k += 1
        }
        if (ok) { // final octet + (?:\b|$): next char must be non-word/edge
          var q = p
          while (q < n && isDigit(s.charAt(q))) q += 1
          if (q - p >= 1 && q - p <= 3 && (q == n || !isWord(s.charAt(q)))) {
            out += (("ip", s.substring(i, q)))
            i = q
          } else {
            // skip the digit run at i: interior positions carry no \b
            var r = i; while (r < n && isDigit(s.charAt(r))) r += 1; i = r
          }
        } else {
          var r = i; while (r < n && isDigit(s.charAt(r))) r += 1; i = r
        }
      } else i += 1
    }
  }

  /** Optional scheme at j: returns position after "h[xX]{2}ps?:" /
    * "meows?:", or -1. Deterministic (the only lookahead is s-vs-colon). */
  private def schemeEnd(s: String, j: Int): Int = {
    val n = s.length
    def colonAt(k: Int): Int =
      if (k < n && s.charAt(k) == ':') k + 1
      else if (k + 1 < n && s.charAt(k) == 's' && s.charAt(k + 1) == ':') k + 2
      else -1
    if (j + 3 < n && s.charAt(j) == 'h' &&
      (s.charAt(j + 1) == 'x' || s.charAt(j + 1) == 'X') &&
      (s.charAt(j + 2) == 'x' || s.charAt(j + 2) == 'X') &&
      s.charAt(j + 3) == 'p') colonAt(j + 4)
    else if (j + 3 < n && s.charAt(j) == 'm' && s.charAt(j + 1) == 'e' &&
      s.charAt(j + 2) == 'o' && s.charAt(j + 3) == 'w') colonAt(j + 4)
    else -1
  }

  /** URL matches: [scheme]//CLS+ with boundary head and trimmed tail. */
  private def scanUrls(s: String, out: ArrayBuffer[(String, String)]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      var matched = false
      if (i == 0 || bAt(s, i)) {
        var j = schemeEnd(s, i)
        if (j < 0) j = i // optional scheme not taken
        if (j + 1 < n && s.charAt(j) == '/' && s.charAt(j + 1) == '/') {
          val runStart = j + 2
          var k = runStart
          while (k < n && isCls(s.charAt(k))) k += 1
          if (k > runStart) {
            // greedy-then-backtrack: longest cut in (runStart, k] that is
            // a word boundary or end-of-input-$
            var cut = k
            var found = false
            while (!found && cut > runStart) {
              if (endOk(s, cut)) found = true else cut -= 1
            }
            if (found) {
              out += (("url", s.substring(i, cut)))
              i = cut
              matched = true
            }
          }
        }
      }
      if (!matched) i += 1
    }
  }

  /** All three families as (type, ioc) pairs, per-type blocks in ip,
    * hash, url order (the same block order as the unfused
    * explode-of-three). Test seam for the fuzz-equality spec. */
  private[graft] def scanPairs(s: String): ArrayBuffer[(String, String)] = {
    val out = new ArrayBuffer[(String, String)]()
    scanIps(s, out)
    scanHashes(s, out)
    scanUrls(s, out)
    out
  }

  // shared immutable type tags — one allocation for the whole JVM, not
  // one per extracted IOC (UTF8String is immutable, safe to share)
  private val IpTag = UTF8String.fromString("ip")
  private val HashTag = UTF8String.fromString("hash")
  private val UrlTag = UTF8String.fromString("url")

  private def tagOf(t: String): UTF8String = t match {
    case "ip" => IpTag
    case "hash" => HashTag
    case _ => UrlTag
  }

  /** Entry point for both the interpreted eval and the generated code. */
  def scanRows(text: UTF8String): GenericArrayData = {
    val out = scanPairs(text.toString)
    val rows = new Array[Any](out.length)
    var i = 0
    while (i < out.length) {
      val (t, v) = out(i)
      rows(i) = InternalRow(tagOf(t), UTF8String.fromString(v))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** `extract_iocs(text)` → array<struct<type:string, ioc:string>> — one
  * scan, one Generate: `explode(extract_iocs(text))` replaces the
  * explode-of-three-structs + explode-of-matches pair AND the three regex
  * passes. Codegen'd (a static call into [[IocScan]], same shape as
  * Spark's own RegExpExtractAll which calls into java.util.regex), so the
  * extraction stays inside the WholeStageCodegen span. */
case class ExtractIocs(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_iocs"

  override def dataType: DataType = ExtractIocs.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_iocs requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    IocScan.scanRows(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IocScan.scanRows($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractIocs {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("ioc", StringType, nullable = false))), containsNull = false)

  def extract_iocs(text: Column): Column =
    ColumnBridge.column(ExtractIocs(ColumnBridge.expression(text)))
}
