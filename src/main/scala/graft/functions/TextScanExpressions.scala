package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan kernels for the per-byte text-analysis hot paths
  * (PII scrubbing, encoding-artifact detection, line-wise corrections).
  *
  * These replace `java.util.regex`-backed column chains whose backtracking
  * engine is the dominant cost at corpus scale (at sf1 the PII pass alone
  * was 56× DuckDB's RE2). Each kernel reproduces the EXACT semantics of the
  * regex chain it replaces — Java leftmost-first `find()` with greedy
  * backtracking, sequential `regexp_replace` passes — and each has a
  * bit-parity spec against the original expression chain over adversarial
  * fuzz input (`TextScanKernelSpec`). The DuckDB oracles keep their regex
  * form, so the correctness gate independently re-checks equivalence on
  * every run.
  *
  * All patterns are pure-ASCII, so the scanners run on raw UTF-8 bytes:
  * continuation bytes (>= 0x80) are outside every character CLASS. The one
  * Unicode-aware construct is `\b` — Java's Pattern.Bound tests
  * `Character.isLetterOrDigit` on the neighboring codepoint regardless of
  * flags — so boundary checks decode the adjacent codepoint (see
  * `TextScan.isWordCpAt/isWordCpBefore`). */
object TextScan {
  @inline private[functions] def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private[functions] def isUpper(b: Byte): Boolean = b >= 'A' && b <= 'Z'
  @inline private[functions] def isLetter(b: Byte): Boolean =
    isUpper(b) || (b >= 'a' && b <= 'z')
  @inline private[functions] def isWord(b: Byte): Boolean =
    isLetter(b) || isDigit(b) || b == '_'
  /** Non-continuation byte = one codepoint (what Spark/DuckDB `length` counts). */
  @inline private[functions] def isCharStart(b: Byte): Boolean = (b & 0xC0) != 0x80

  private[functions] def numChars(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { if (isCharStart(b(i))) c += 1; i += 1 }
    c
  }

  // ---- Java `\b` emulation ------------------------------------------------
  // Pattern.Bound's word test is '_' OR Character.isLetterOrDigit(cp) —
  // UNICODE-AWARE even without UNICODE_CHARACTER_CLASS (unlike `\w`). A CJK
  // ideograph or accented letter adjacent to a digit run therefore BLOCKS
  // the boundary in Spark's Java regex, and the kernels must agree (the
  // fuzz parity spec caught exactly this). ASCII fast path; multi-byte
  // neighbors decode one codepoint.

  private def decodeCp(b: Array[Byte], n: Int, i: Int): Int = {
    val c = b(i) & 0xFF
    if (c < 0x80) c
    else if (c < 0xE0) { // 2-byte
      if (i + 1 >= n) return 0xFFFD
      ((c & 0x1F) << 6) | (b(i + 1) & 0x3F)
    } else if (c < 0xF0) { // 3-byte
      if (i + 2 >= n) return 0xFFFD
      ((c & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
    } else { // 4-byte
      if (i + 3 >= n) return 0xFFFD
      ((c & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
        ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
    }
  }

  /** Word-char test (Java `\b` rules) for the codepoint STARTING at byte i. */
  private[functions] def isWordCpAt(b: Array[Byte], n: Int, i: Int): Boolean = {
    if (i >= n) return false
    val c = b(i)
    if (c >= 0) isWord(c)
    else Character.isLetterOrDigit(decodeCp(b, n, i))
  }

  /** Word-char test for the codepoint ENDING just before byte i. */
  private[functions] def isWordCpBefore(b: Array[Byte], i: Int): Boolean = {
    if (i <= 0) return false
    val c = b(i - 1)
    if (c >= 0) return isWord(c)
    var s = i - 1
    while (s > 0 && !isCharStart(b(s))) s -= 1
    Character.isLetterOrDigit(decodeCp(b, b.length, s))
  }
}

/** PII matcher/replacer — the kernel behind `pii_scan`. Each `findX` emulates
  * the corresponding Java regex (see `Pii.EmailRe` etc.) exactly: leftmost
  * start wins, greedy quantifiers backtrack, alternation branches try in
  * listed order. Returns `(start << 32) | end` or -1. */
object PiiScan {
  import TextScan._

  @inline private def isLocal(b: Byte): Boolean =
    isLetter(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isLetter(b) || isDigit(b) || b == '.' || b == '-'
  @inline private def isSep(b: Byte): Boolean = b == ' ' || b == '-'
  @inline private def pack(s: Int, e: Int): Long = (s.toLong << 32) | (e.toLong & 0xFFFFFFFFL)

  /** `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`. The local run is
    * maximal (local chars never include '@'); the domain backtracks the
    * greedy `[A-Za-z0-9.-]+` from longest down until a '.' with >= 2
    * letters follows — i.e. the RIGHTMOST eligible dot wins. */
  def findEmail(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isLocal(b(i))) {
        var re = i
        while (re < n && isLocal(b(re))) re += 1
        if (re < n && b(re) == '@') {
          val a = re + 1
          var de = a
          while (de < n && isDomain(b(de))) de += 1
          var L = de - a - 1
          var end = -1
          while (L >= 1 && end < 0) {
            if (b(a + L) == '.') {
              var le = a + L + 1
              while (le < n && isLetter(b(le))) le += 1
              if (le - (a + L + 1) >= 2) end = le
            }
            L -= 1
          }
          if (end > 0) return pack(i, end)
          i = re + 1 // every start inside this run shares the failed domain
        } else i = re // run not followed by '@': no start inside it matches
      } else i += 1
    }
    -1L
  }

  /** `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`. Digit runs never contain
    * '.', so each `\d{1,3}` must consume its ENTIRE run (length 1-3) — no
    * backtracking can save an over-long octet. */
  def findIp(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isDigit(b(i)) && !isWordCpBefore(b, i)) {
        val e = tryIp(b, n, i)
        if (e > 0) return pack(i, e)
      }
      i += 1
    }
    -1L
  }
  private def tryIp(b: Array[Byte], n: Int, p: Int): Int = {
    var q = p
    var seg = 0
    while (seg < 3) {
      var r = q
      while (r < n && isDigit(b(r))) r += 1
      val len = r - q
      if (len < 1 || len > 3 || r >= n || b(r) != '.') return -1
      q = r + 1
      seg += 1
    }
    var r = q
    while (r < n && isDigit(b(r))) r += 1
    val len = r - q
    if (len < 1 || len > 3) return -1
    if (isWordCpAt(b, n, r)) return -1
    r
  }

  /** The five phone branches, tried in the regex's alternation order at
    * each start (first char partitions them: '+' -> B1,B2,B3; '(' -> B4;
    * digit+\b -> B5). */
  def findPhone(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      val c = b(i)
      var end = -1
      if (c == '+') {
        end = tryPlusParen(b, n, i)
        if (end < 0) end = tryPlusSeq(b, n, i, middle3 = true)
        if (end < 0) end = tryPlusSeq(b, n, i, middle3 = false)
      } else if (c == '(') {
        end = tryParen(b, n, i)
      } else if (isDigit(c) && !isWordCpBefore(b, i)) {
        end = tryBare(b, n, i)
      }
      if (end > 0) return pack(i, end)
      i += 1
    }
    -1L
  }
  /** `\+\d{1,3}[ -]` prefix: country-code run must end at the separator. */
  private def tryCc(b: Array[Byte], n: Int, p: Int): Int = {
    var r = p + 1
    while (r < n && isDigit(b(r))) r += 1
    val len = r - p - 1
    if (len < 1 || len > 3 || r >= n || !isSep(b(r))) -1 else r + 1
  }
  @inline private def digitsAt(b: Array[Byte], n: Int, q: Int, k: Int): Boolean = {
    if (q + k > n) return false
    var i = 0
    while (i < k) { if (!isDigit(b(q + i))) return false; i += 1 }
    true
  }
  /** `\(\d{3}\)[ -]?\d{3}-\d{4}` from `q` (the '(' position). */
  private def parenRest(b: Array[Byte], n: Int, q: Int): Int = {
    if (q >= n || b(q) != '(') return -1
    if (!digitsAt(b, n, q + 1, 3)) return -1
    if (q + 4 >= n || b(q + 4) != ')') return -1
    var r = q + 5
    // greedy `[ -]?`: try with the separator consumed, backtrack without
    if (r < n && isSep(b(r))) {
      val e = dashTail(b, n, r + 1)
      if (e > 0) return e
    }
    dashTail(b, n, r)
  }
  /** `\d{3}-\d{4}` from `x`. */
  private def dashTail(b: Array[Byte], n: Int, x: Int): Int = {
    if (!digitsAt(b, n, x, 3)) return -1
    if (x + 3 >= n || b(x + 3) != '-') return -1
    if (!digitsAt(b, n, x + 4, 4)) return -1
    x + 8
  }
  private def tryPlusParen(b: Array[Byte], n: Int, p: Int): Int = {
    val q = tryCc(b, n, p)
    if (q < 0) -1 else parenRest(b, n, q)
  }
  /** B2 (`middle3`): `+cc[ -]\d{3}[ -]\d{3}[ -]\d{4}`; B3: `+cc[ -]\d{3}[ -]\d{4}`. */
  private def tryPlusSeq(b: Array[Byte], n: Int, p: Int, middle3: Boolean): Int = {
    var q = tryCc(b, n, p)
    if (q < 0) return -1
    if (!digitsAt(b, n, q, 3)) return -1
    if (q + 3 >= n || !isSep(b(q + 3))) return -1
    q += 4
    if (middle3) {
      if (!digitsAt(b, n, q, 3)) return -1
      if (q + 3 >= n || !isSep(b(q + 3))) return -1
      q += 4
    }
    if (!digitsAt(b, n, q, 4)) return -1
    q + 4
  }
  private def tryParen(b: Array[Byte], n: Int, p: Int): Int = parenRest(b, n, p)
  /** B5 `\b\d{3}[ -]\d{3}[ -]\d{4}\b`. */
  private def tryBare(b: Array[Byte], n: Int, p: Int): Int = {
    if (!digitsAt(b, n, p, 3)) return -1
    if (p + 3 >= n || !isSep(b(p + 3))) return -1
    if (!digitsAt(b, n, p + 4, 3)) return -1
    if (p + 7 >= n || !isSep(b(p + 7))) return -1
    if (!digitsAt(b, n, p + 8, 4)) return -1
    val e = p + 12
    if (isWordCpAt(b, n, e)) -1 else e
  }

  /** `\b\d{1,5} [A-Z][A-Za-z]+ (Street|...|Dr)\b`; suffix alternatives in
    * the regex's listed order (longest-first at shared prefixes), each
    * requiring the trailing boundary — Java backtracks into the next
    * alternative when `\b` fails. */
  private val Suffixes: Array[Array[Byte]] =
    Array("Street", "Avenue", "Boulevard", "Road", "Lane", "Drive",
      "St", "Ave", "Blvd", "Rd", "Ln", "Dr")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  def findAddress(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isDigit(b(i)) && !isWordCpBefore(b, i)) {
        val e = tryAddr(b, n, i)
        if (e > 0) return pack(i, e)
      }
      i += 1
    }
    -1L
  }
  private def tryAddr(b: Array[Byte], n: Int, p: Int): Int = {
    var r = p
    while (r < n && isDigit(b(r))) r += 1
    val len = r - p
    if (len < 1 || len > 5 || r >= n || b(r) != ' ') return -1
    val w = r + 1
    if (w >= n || !isUpper(b(w))) return -1
    var we = w + 1
    while (we < n && isLetter(b(we))) we += 1
    if (we - w < 2) return -1
    if (we >= n || b(we) != ' ') return -1
    val s = we + 1
    var k = 0
    while (k < Suffixes.length) {
      val suf = Suffixes(k)
      if (startsWith(b, n, s, suf)) {
        val e = s + suf.length
        if (!isWordCpAt(b, n, e)) return e
      }
      k += 1
    }
    -1
  }
  @inline private def startsWith(b: Array[Byte], n: Int, p: Int, what: Array[Byte]): Boolean = {
    if (p + what.length > n) return false
    var i = 0
    while (i < what.length) { if (b(p + i) != what(i)) return false; i += 1 }
    true
  }

  // ---- replace-all / count-all drivers -----------------------------------

  type Finder = (Array[Byte], Int, Int) => Long

  private def countAll(b: Array[Byte], f: Finder): Long = {
    var c = 0L
    var from = 0
    var m = f(b, b.length, from)
    while (m >= 0) {
      c += 1
      from = (m & 0xFFFFFFFFL).toInt
      m = f(b, b.length, from)
    }
    c
  }

  /** Replace-all with the Java `regexp_replace` contract: scan resumes at
    * each match end. Returns the rewritten bytes and the match count. */
  private def replaceAll(b: Array[Byte], f: Finder, tag: Array[Byte]): (Array[Byte], Long) = {
    var m = f(b, b.length, 0)
    if (m < 0) return (b, 0L)
    val out = new java.io.ByteArrayOutputStream(b.length + 16)
    var c = 0L
    var last = 0
    while (m >= 0) {
      val s = (m >>> 32).toInt
      val e = (m & 0xFFFFFFFFL).toInt
      out.write(b, last, s - last)
      out.write(tag, 0, tag.length)
      last = e
      c += 1
      m = f(b, b.length, e)
    }
    out.write(b, last, b.length - last)
    (out.toByteArray, c)
  }

  private val EmailTag = "<EMAIL>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val IpTag = "<IP>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val PhoneTag = "<PHONE>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val AddressTag = "<ADDRESS>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** The `pii_scan` contract: counts are over the ORIGINAL text (matching
    * `regexp_extract_all` on the input), redaction is the SEQUENTIAL
    * email -> IP -> phone -> address rewrite (each pass over the previous
    * pass's output) — exactly the `Pii.redact` chain. */
  def run(u: UTF8String): InternalRow = {
    val b0 = u.getBytes
    val (r1, nE) = replaceAll(b0, findEmail, EmailTag)
    val nI = countAll(b0, findIp)
    val (r2, _) = replaceAll(r1, findIp, IpTag)
    val nP = countAll(b0, findPhone)
    val (r3, _) = replaceAll(r2, findPhone, PhoneTag)
    val nA = countAll(b0, findAddress)
    val (r4, _) = replaceAll(r3, findAddress, AddressTag)
    // counts are Int like `size(regexp_extract_all(...))` was — callers cast
    new GenericInternalRow(Array[Any](nE.toInt, nI.toInt, nP.toInt, nA.toInt,
      UTF8String.fromBytes(r4)))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_addresses", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
}

case class PiiScanExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pii_scan expects string, got $other")
  }
  override def dataType: DataType = PiiScan.schema
  override def prettyName: String = "pii_scan"
  override def nullSafeEval(input: Any): Any =
    PiiScan.run(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.run($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)
}

/** Encoding-artifact counters — the kernel behind `encoding_stats`
  * (`TextOps.encodingArtifacts` semantics, one byte pass instead of a
  * replace + regex + 15 literal-count chain). */
object EncodingStats {
  import TextScan._

  /** The mojibake tell-tales (canonical list — `TextOps.MojibakeSeqs`
    * aliases this): UTF-8 bytes of é/è/ä/ö/ü/ñ/ó/ç and the smart-punctuation
    * triples decoded as Latin-1/Windows-1252. Defined HERE (not injected)
    * so executor-side object init is self-contained on a real cluster. */
  val MojibakeSeqs: Seq[String] = Seq(
    "\u00C3\u00A9", "\u00C3\u00A8", "\u00C3\u00A4", "\u00C3\u00B6", // e-acute/grave, a/o-umlaut
    "\u00C3\u00BC", "\u00C3\u00B1", "\u00C3\u00B3", "\u00C3\u00A7", // u-umlaut, n-tilde, o-acute, c-cedilla
    "\u00E2\u0080\u0099", "\u00E2\u0080\u009C", "\u00E2\u0080\u009D", // smart quotes
    "\u00E2\u0080\u0093", "\u00E2\u0080\u0094", "\u00E2\u0080\u00A6", // dashes, ellipsis
    "\u00C2\u00A0") // non-breaking space

  /** Their UTF-8 encodings — all start 0xC3 (U+00C3/U+00E2/U+00C2 lead),
    * none is a prefix of another, none self-overlaps, so counting match
    * positions equals summing the per-sequence non-overlapping replace
    * counts. */
  private val mojibake: Array[Array[Byte]] =
    MojibakeSeqs.map(s => UTF8String.fromString(s).getBytes).toArray

  @inline private def isControl(b: Byte): Boolean =
    (b >= 0x00 && b <= 0x08) || b == 0x0B || b == 0x0C ||
      (b >= 0x0E && b <= 0x1F) || b == 0x7F

  def run(u: UTF8String): InternalRow = {
    val b = u.getBytes
    val n = b.length
    var nChars = 0L
    var nRep = 0L
    var nCtl = 0L
    var nMoji = 0L
    val seqs = mojibake
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isCharStart(c)) nChars += 1
      if (c >= 0) { // ASCII
        if (isControl(c)) nCtl += 1
      } else if (c == 0xEF.toByte) {
        if (i + 2 < n && b(i + 1) == 0xBF.toByte && b(i + 2) == 0xBD.toByte) nRep += 1
      } else if (c == 0xC3.toByte) {
        var k = 0
        var hit = false
        while (k < seqs.length && !hit) {
          val s = seqs(k)
          if (i + s.length <= n) {
            var j = 1
            var ok = true
            while (ok && j < s.length) { ok = b(i + j) == s(j); j += 1 }
            if (ok) { nMoji += 1; hit = true }
          }
          k += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nRep, nCtl, nMoji,
      nRep == 0L && nMoji == 0L && nCtl * 200L <= nChars))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_replacement", LongType, nullable = false),
    StructField("n_control", LongType, nullable = false),
    StructField("n_mojibake", LongType, nullable = false),
    StructField("looks_clean", BooleanType, nullable = false)))
}

case class EncodingStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"encoding_stats expects string, got $other")
  }
  override def dataType: DataType = EncodingStats.schema
  override def prettyName: String = "encoding_stats"
  override def nullSafeEval(input: Any): Any =
    EncodingStats.run(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EncodingStats.run($c)")
  override protected def withNewChildInternal(newChild: Expression): EncodingStatsExpr =
    copy(child = newChild)
}

/** RefinedWeb line-wise corrections — the kernel behind `line_filter_stats`
  * (`TextOps.lineFilterRebuild` semantics in one pass: per-line token
  * count, letter/upper counts, rebuild + doc-keep flag). Token counting
  * mirrors `split(trim(line), "\\s+")`: trim strips SPACES only; the split
  * keeps a leading empty field when the trimmed line starts with other
  * whitespace, and the count is (whitespace runs) + 1. */
object LineFilterStats {
  import TextScan._

  @inline private def isWs(b: Byte): Boolean = // Java regex \s (ASCII)
    b == ' ' || b == '\t' || b == 0x0B || b == '\f' || b == '\r' || b == '\n'

  def run(u: UTF8String, minTokens: Int): InternalRow = {
    val b = u.getBytes
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(n)
    var nKept = 0L
    var keptChars = 0L
    var totalChars = 0L
    var s = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == '\n') {
        // line [s, i)
        var letters = 0L
        var uppers = 0L
        var j = s
        while (j < i) {
          val c = b(j)
          if (isCharStart(c)) totalChars += 1
          if (isLetter(c)) { letters += 1; if (isUpper(c)) uppers += 1 }
          j += 1
        }
        if (i < n) totalChars += 1 // the '\n' itself counts in len(text)
        // space-trim bounds
        var ts = s
        while (ts < i && b(ts) == ' ') ts += 1
        var te = i
        while (te > ts && b(te - 1) == ' ') te -= 1
        // tokens = ws runs + 1 over the trimmed slice
        var runs = 0L
        var inWs = false
        j = ts
        while (j < te) {
          if (isWs(b(j))) { if (!inWs) { runs += 1; inWs = true } }
          else inWs = false
          j += 1
        }
        val tokens = runs + 1 // "" splits to [""] -> 1, same formula
        val keep = tokens >= minTokens &&
          !(letters > 0 && uppers * 10 > letters * 6)
        if (keep) {
          if (nKept > 0) { out.write('\n'); keptChars += 1 }
          out.write(b, s, i - s)
          keptChars += numChars(b, s, i)
          nKept += 1
        }
        s = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), nKept,
      keptChars * 2 >= totalChars))
  }

  val schema: StructType = StructType(Seq(
    StructField("text_kept", StringType, nullable = false),
    StructField("n_kept_lines", LongType, nullable = false),
    StructField("kept", BooleanType, nullable = false)))
}

case class LineFilterStatsExpr(child: Expression, minTokens: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"line_filter_stats expects string, got $other")
  }
  override def dataType: DataType = LineFilterStats.schema
  override def prettyName: String = "line_filter_stats"
  override def nullSafeEval(input: Any): Any =
    LineFilterStats.run(input.asInstanceOf[UTF8String], minTokens)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LineFilterStats.run($c, $minTokens)")
  override protected def withNewChildInternal(newChild: Expression): LineFilterStatsExpr =
    copy(child = newChild)
}
