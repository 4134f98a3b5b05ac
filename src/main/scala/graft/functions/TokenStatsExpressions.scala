package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token/character statistics kernels. The Gopher repetition and
  * C4 quality signals each re-tokenized the document and ran interpreted
  * HOF folds (`array_distinct`, `filter`, `aggregate`) or a sort-based
  * multiplicity per statistic; `token_stats`/`gopher_stats` produce every
  * signal from ONE tokenization with open-addressing count tables —
  * exactness is against the staged chains (`TokenStatsKernelSpec` fuzz
  * parity) and the unchanged DuckDB gate oracles.
  *
  * Tokenization contract (shared with `TextOps.tokens` and the oracle
  * `string_split_regex(trim(text),'\s+')`): trim strips SPACES only; the
  * split keeps empty lead/trail fields produced by non-space whitespace at
  * the ends; an all-space document tokenizes to one empty token. */
private[functions] object Tokenize {
  import TextScan.{isCharStart, isLetter, isDigit}

  @inline def isWs(b: Byte): Boolean = // Java regex \s (ASCII)
    b == ' ' || b == '\t' || b == 0x0B || b == '\f' || b == '\r' || b == '\n'
  @inline def isAsciiWord(b: Byte): Boolean =
    isLetter(b) || isDigit(b) || b == '_'

  /** Token spans of `b` under the split contract. Returns the count; fills
    * `starts`/`ends` (caller passes arrays sized >= maxTokens(b)). */
  def spans(b: Array[Byte], starts: Array[Int], ends: Array[Int]): Int = {
    val n = b.length
    var ts = 0
    while (ts < n && b(ts) == ' ') ts += 1
    var te = n
    while (te > ts && b(te - 1) == ' ') te -= 1
    var cnt = 0
    var fs = ts
    var i = ts
    while (i < te) {
      if (isWs(b(i))) {
        starts(cnt) = fs; ends(cnt) = i; cnt += 1
        while (i < te && isWs(b(i))) i += 1
        fs = i
      } else i += 1
    }
    starts(cnt) = fs; ends(cnt) = te; cnt += 1
    cnt
  }

  /** Upper bound on token count: ws runs + 1 <= n/1 + 1. */
  def maxTokens(b: Array[Byte]): Int = b.length / 2 + 2

  def fnv(b: Array[Byte], from: Int, until: Int): Int = {
    var h = 0x811C9DC5
    var i = from
    while (i < until) { h = (h ^ (b(i) & 0xFF)) * 0x01000193; i += 1 }
    h
  }
  def bytesEq(b: Array[Byte], s1: Int, e1: Int, s2: Int, e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var i = 0
    val len = e1 - s1
    while (i < len) { if (b(s1 + i) != b(s2 + i)) return false; i += 1 }
    true
  }
  def nextPow2(x: Int): Int = Integer.highestOneBit(math.max(4, x) * 2 - 1) << 1

  def charLen(b: Array[Byte], from: Int, until: Int): Long = {
    var c = 0L; var i = from
    while (i < until) { if (isCharStart(b(i))) c += 1; i += 1 }
    c
  }

  /** token equals an ASCII-lowercase word after `lower()`? ASCII fast path;
    * tokens with multi-byte chars fall back to the same default-locale
    * `String.toLowerCase` that UTF8String.toLowerCase delegates to. */
  def lowerEquals(b: Array[Byte], s: Int, e: Int, word: Array[Byte]): Boolean = {
    var ascii = true
    var i = s
    while (ascii && i < e) { ascii = b(i) >= 0; i += 1 }
    if (ascii) {
      if (e - s != word.length) return false
      i = 0
      while (i < word.length) {
        var c = b(s + i)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
        if (c != word(i)) return false
        i += 1
      }
      true
    } else {
      val t = new String(b, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
      t.toLowerCase == new String(word, java.nio.charset.StandardCharsets.US_ASCII)
    }
  }
}

/** `token_stats(text)` — the C4/Gopher per-document statistics in one pass:
  * token count, distinct tokens, max token multiplicity, max word-bigram
  * multiplicity, summed token length (codepoints), stopword hits, BPE-ish
  * unit count (`\w+|[^\w\s]`), sentence-punctuation chars, total chars. */
object TokenStats {
  import TextScan.isCharStart
  import Tokenize._

  /** p02's stopword list — canonical here (executor-safe), aliased by
    * `TextOps.Stopwords`. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val stopBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  def run(u: UTF8String): InternalRow = {
    val b = u.getBytes
    val n = b.length

    // ---- character pass: units, punctuation, chars ----
    var nUnits = 0L
    var nPunct = 0L
    var nChars = 0L
    var inWordRun = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isCharStart(c)) nChars += 1
      if (c >= 0) {
        if (isAsciiWord(c)) {
          if (!inWordRun) { nUnits += 1; inWordRun = true }
        } else {
          inWordRun = false
          if (!isWs(c)) nUnits += 1 // ASCII symbol: one [^\w\s] unit
          if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?')
            nPunct += 1
        }
      } else {
        inWordRun = false
        if (isCharStart(c)) nUnits += 1 // non-ASCII codepoint: not \w, not \s
      }
      i += 1
    }

    // ---- token pass ----
    val starts = new Array[Int](maxTokens(b))
    val ends = new Array[Int](maxTokens(b))
    val nTok = spans(b, starts, ends)
    var sumLen = 0L
    var nStop = 0L
    val cap = nextPow2(nTok)
    val mask = cap - 1
    val slotTok = new Array[Int](cap)
    java.util.Arrays.fill(slotTok, -1)
    val slotCnt = new Array[Int](cap)
    val ids = new Array[Int](nTok)
    var nDistinct = 0L
    var maxMult = 0L
    var t = 0
    while (t < nTok) {
      val s = starts(t); val e = ends(t)
      sumLen += charLen(b, s, e)
      var k = 0
      var stop = false
      while (!stop && k < stopBytes.length) {
        val w = stopBytes(k)
        if (e - s == w.length) {
          var j = 0
          var eq = true
          while (eq && j < w.length) { eq = b(s + j) == w(j); j += 1 }
          stop = eq
        }
        k += 1
      }
      if (stop) nStop += 1
      var slot = fnv(b, s, e) & mask
      var done = false
      while (!done) {
        val rep = slotTok(slot)
        if (rep < 0) {
          slotTok(slot) = t; slotCnt(slot) = 1; nDistinct += 1
          if (maxMult < 1) maxMult = 1
          done = true
        } else if (bytesEq(b, starts(rep), ends(rep), s, e)) {
          slotCnt(slot) += 1
          if (slotCnt(slot) > maxMult) maxMult = slotCnt(slot)
          done = true
        } else slot = (slot + 1) & mask
      }
      ids(t) = slot
      t += 1
    }

    // ---- bigram pass: joined-with-space bigram equality == component
    // equality (tokens never contain whitespace), so (id, id) pairs count
    // exactly what `word_bigrams` + max_multiplicity counted ----
    var maxBigram = 0L
    if (nTok >= 2) {
      val capB = nextPow2(nTok - 1)
      val maskB = capB - 1
      val keys = new Array[Long](capB)
      java.util.Arrays.fill(keys, -1L)
      val cnts = new Array[Int](capB)
      t = 0
      while (t < nTok - 1) {
        val key = (ids(t).toLong << 32) | ids(t + 1).toLong
        var h = (key ^ (key >>> 29)) * 0xBF58476D1CE4E5B9L
        h ^= h >>> 32
        var slot = h.toInt & maskB
        var done = false
        while (!done) {
          if (keys(slot) < 0) {
            keys(slot) = key; cnts(slot) = 1
            if (maxBigram < 1) maxBigram = 1
            done = true
          } else if (keys(slot) == key) {
            cnts(slot) += 1
            if (cnts(slot) > maxBigram) maxBigram = cnts(slot)
            done = true
          } else slot = (slot + 1) & maskB
        }
        t += 1
      }
    }

    new GenericInternalRow(Array[Any](nTok.toLong, nDistinct, maxMult,
      maxBigram, sumLen, nStop, nUnits, nPunct, nChars))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_mult", LongType, nullable = false),
    StructField("max_bigram_mult", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false),
    StructField("n_units", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))
}

case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects string, got $other")
  }
  override def dataType: DataType = TokenStats.schema
  override def prettyName: String = "token_stats"
  override def nullSafeEval(input: Any): Any =
    TokenStats.run(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.run($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

/** `gopher_stats(text)` — the Gopher document-rule counters in one pass
  * (Rae et al. 2021 §A1.1): word/word-char/line counts, bullet and
  * ellipsis-terminated lines, symbol count ('#' chars + non-overlapping
  * '...' runs), words containing a letter, DISTINCT stopwords present
  * (lowercased match). */
object GopherStats {
  import TextScan.{isCharStart, isLetter}
  import Tokenize._

  /** Canonical here (executor-safe), aliased by `TextOps.GopherStopwords`. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  private val stopBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  private val Bullet = Array(0xE2.toByte, 0x80.toByte, 0xA2.toByte) // U+2022
  private val Ellipsis = Array(0xE2.toByte, 0x80.toByte, 0xA6.toByte) // U+2026

  def run(u: UTF8String): InternalRow = {
    val b = u.getBytes
    val n = b.length

    // ---- line + symbol pass ----
    var nLines = 0L
    var nBullet = 0L
    var nEllipsis = 0L
    var nSymbols = 0L
    var s = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == '\n') {
        nLines += 1
        var ts = s
        while (ts < i && b(ts) == ' ') ts += 1
        var te = i
        while (te > ts && b(te - 1) == ' ') te -= 1
        if (ts < te) {
          val c = b(ts)
          if (c == '-' || c == '*' ||
            (te - ts >= 3 && c == Bullet(0) && b(ts + 1) == Bullet(1) &&
              b(ts + 2) == Bullet(2))) nBullet += 1
          if ((te - ts >= 3 && b(te - 3) == '.' && b(te - 2) == '.' &&
              b(te - 1) == '.') ||
            (te - ts >= 3 && b(te - 3) == Ellipsis(0) &&
              b(te - 2) == Ellipsis(1) && b(te - 1) == Ellipsis(2)))
            nEllipsis += 1
        }
        s = i + 1
      }
      i += 1
    }
    i = 0
    while (i < n) { // '#' chars + non-overlapping "..." runs (literalCount)
      if (b(i) == '#') { nSymbols += 1; i += 1 }
      else if (b(i) == '.' && i + 2 < n && b(i + 1) == '.' && b(i + 2) == '.') {
        nSymbols += 1; i += 3
      } else i += 1
    }

    // ---- token pass ----
    val starts = new Array[Int](maxTokens(b))
    val ends = new Array[Int](maxTokens(b))
    val nTok = spans(b, starts, ends)
    var sumLen = 0L
    var nAlpha = 0L
    var stopMask = 0
    var t = 0
    while (t < nTok) {
      val ts = starts(t); val te = ends(t)
      sumLen += charLen(b, ts, te)
      var j = ts
      var alpha = false
      while (!alpha && j < te) { alpha = isLetter(b(j)); j += 1 }
      if (alpha) nAlpha += 1
      var k = 0
      while (k < stopBytes.length) {
        if ((stopMask & (1 << k)) == 0 && lowerEquals(b, ts, te, stopBytes(k)))
          stopMask |= 1 << k
        k += 1
      }
      t += 1
    }

    new GenericInternalRow(Array[Any](nTok.toLong, sumLen, nLines, nBullet,
      nEllipsis, nSymbols, nAlpha, Integer.bitCount(stopMask).toLong))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_word_chars", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ellipsis_end", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))
}

case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got $other")
  }
  override def dataType: DataType = GopherStats.schema
  override def prettyName: String = "gopher_stats"
  override def nullSafeEval(input: Any): Any =
    GopherStats.run(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStats.run($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

/** Remove half-open token-position spans from a token array and rebuild the
  * document — the array-side form of substring-dedup's "cut the duplicated
  * stretches" step. The previous relational form re-exploded every token
  * (one shuffle of the whole corpus), anti-joined the span table, and
  * re-sorted each document's surviving tokens; this runs map-side on the
  * already-tokenized row. Spans sort+merge defensively (the islands pass
  * already emits them disjoint). Returns (text_kept, n_kept). */
object CutSpans {
  def run(toks: org.apache.spark.sql.catalyst.util.ArrayData,
          spans: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = toks.numElements()
    val m = if (spans == null) 0 else spans.numElements()
    if (m == 0) {
      var total = 0
      var i = 0
      while (i < n) { total += toks.getUTF8String(i).numBytes() + 1; i += 1 }
      val out = new java.io.ByteArrayOutputStream(math.max(16, total))
      i = 0
      while (i < n) {
        if (i > 0) out.write(' ')
        val t = toks.getUTF8String(i)
        out.write(t.getBytes, 0, t.numBytes())
        i += 1
      }
      return new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(out.toByteArray), n.toLong))
    }
    val ss = new Array[Int](m)
    val es = new Array[Int](m)
    val order = (0 until m).sortBy(j => spans.getStruct(j, 2).getInt(0))
    var j = 0
    while (j < m) {
      val row = spans.getStruct(order(j), 2)
      ss(j) = row.getInt(0); es(j) = row.getInt(1)
      j += 1
    }
    val out = new java.io.ByteArrayOutputStream(64)
    var kept = 0L
    var si = 0
    var i = 0
    while (i < n) {
      while (si < m && es(si) <= i) si += 1
      val cut = si < m && i >= ss(si) && i < es(si)
      if (!cut) {
        if (kept > 0) out.write(' ')
        val t = toks.getUTF8String(i)
        out.write(t.getBytes, 0, t.numBytes())
        kept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), kept))
  }

  val schema: StructType = StructType(Seq(
    StructField("text_kept", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
}

case class CutSpansExpr(toks: Expression, spans: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = toks
  override def right: Expression = spans
  override def nullable: Boolean = toks.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, spans.dataType) match {
      case (ArrayType(StringType, _), ArrayType(st: StructType, _))
        if st.length == 2 && st(0).dataType == IntegerType &&
          st(1).dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cut_spans expects (array<string>, array<struct<int,int>>), got $other")
    }
  override def dataType: DataType = CutSpans.schema
  override def prettyName: String = "cut_spans"

  // spans is NULLABLE-tolerant (left-join misses = no cuts), so eval is
  // hand-rolled rather than nullSafeEval
  override def eval(input: InternalRow): Any = {
    val t = toks.eval(input)
    if (t == null) return null
    val s = spans.eval(input)
    CutSpans.run(t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      if (s == null) null
      else s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tEv = toks.genCode(ctx)
    val sEv = spans.genCode(ctx)
    val code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${tEv.code}
           |boolean ${ev.isNull} = ${tEv.isNull};
           |org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
           |if (!${ev.isNull}) {
           |  ${sEv.code}
           |  ${ev.value} = graft.functions.CutSpans.run(${tEv.value},
           |    ${sEv.isNull} ? null : ${sEv.value});
           |}
           |""".stripMargin)).code()
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpansExpr =
    copy(toks = newLeft, spans = newRight)
}

/** Per-document term frequencies in one pass — `array<struct<token, cnt>>`
  * in first-occurrence order. The map-side TF half of TF-IDF/BM25: the
  * relational form exploded EVERY token occurrence into a corpus-wide
  * (doc, token) groupBy shuffle; this collapses each document to its
  * distinct tokens locally, so only distinct-per-doc rows ever move.
  * Same tokenization contract as `token_stats`. */
object TokenCounts {
  import Tokenize._

  def run(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = u.getBytes
    val starts = new Array[Int](maxTokens(b))
    val ends = new Array[Int](maxTokens(b))
    val nTok = spans(b, starts, ends)
    val cap = nextPow2(nTok)
    val mask = cap - 1
    val slotTok = new Array[Int](cap)
    java.util.Arrays.fill(slotTok, -1)
    val slotCnt = new Array[Int](cap)
    val firstOrder = new Array[Int](nTok) // slots in first-occurrence order
    var nDistinct = 0
    var t = 0
    while (t < nTok) {
      val s = starts(t); val e = ends(t)
      var slot = fnv(b, s, e) & mask
      var done = false
      while (!done) {
        val rep = slotTok(slot)
        if (rep < 0) {
          slotTok(slot) = t; slotCnt(slot) = 1
          firstOrder(nDistinct) = slot; nDistinct += 1
          done = true
        } else if (bytesEq(b, starts(rep), ends(rep), s, e)) {
          slotCnt(slot) += 1; done = true
        } else slot = (slot + 1) & mask
      }
      t += 1
    }
    val out = new Array[Any](nDistinct)
    var i = 0
    while (i < nDistinct) {
      val slot = firstOrder(i)
      val rep = slotTok(slot)
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(b, starts(rep), ends(rep) - starts(rep)),
        slotCnt(slot).toLong))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  val elementSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
}

case class TokenCountsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_counts expects string, got $other")
  }
  override def dataType: DataType =
    ArrayType(TokenCounts.elementSchema, containsNull = false)
  override def prettyName: String = "token_counts"
  override def nullSafeEval(input: Any): Any =
    TokenCounts.run(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.run($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountsExpr =
    copy(child = newChild)
}

/** Sparse integer dot product for the trained-classifier iterations:
  * Σ w[f]·x over a per-document `array<struct<f, x>>` feature list against
  * a dense weight array. Exact BIGINT arithmetic, order-free by
  * construction (integer adds commute), so the fused map-only scoring pass
  * is bit-identical to the relational join+groupBy it replaces. NULL
  * feature lists (left-join misses — docs with no bigrams) score 0. */
object SparseLogit {
  def run(fx: org.apache.spark.sql.catalyst.util.ArrayData,
          w: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    if (fx == null) return 0L
    var acc = 0L
    var i = 0
    val n = fx.numElements()
    while (i < n) {
      val row = fx.getStruct(i, 2)
      acc += w.getLong(row.getLong(0).toInt) * row.getLong(1)
      i += 1
    }
    acc
  }
}

case class SparseLogitExpr(fx: Expression, w: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = fx
  override def right: Expression = w
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (fx.dataType, w.dataType) match {
      case (ArrayType(st: StructType, _), ArrayType(LongType, _))
        if st.length == 2 && st(0).dataType == LongType &&
          st(1).dataType == LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sparse_logit expects (array<struct<long,long>>, array<long>), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sparse_logit"

  // fx is NULLABLE-tolerant (left-join misses = no features, z = 0), so
  // eval is hand-rolled rather than nullSafeEval
  override def eval(input: InternalRow): Any = {
    val f = fx.eval(input)
    SparseLogit.run(
      if (f == null) null
      else f.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      w.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fEv = fx.genCode(ctx)
    val wEv = w.genCode(ctx)
    val code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${fEv.code}
           |${wEv.code}
           |boolean ${ev.isNull} = false;
           |long ${ev.value} = graft.functions.SparseLogit.run(
           |  ${fEv.isNull} ? null : ${fEv.value}, ${wEv.value});
           |""".stripMargin)).code()
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseLogitExpr =
    copy(fx = newLeft, w = newRight)
}

/** Per-row classifier logit straight from the token array: Σ over adjacent
  * word bigrams of w[md5_prefix60("w1 w2") mod buckets] — the exact z the
  * batch classifier computes from its (f, x) feature table (each bigram
  * OCCURRENCE contributes its bucket weight once; grouping into counts
  * first is the same integer sum). One compiled pass, no intermediate
  * bigram/feature arrays — this is what lets the STATELESS streaming twin
  * score each arriving document as a single scalar expression under
  * pinned trained weights. */
object BigramLogit {
  private val Space = ' '.toByte
  def run(toks: org.apache.spark.sql.catalyst.util.ArrayData,
          w: org.apache.spark.sql.catalyst.util.ArrayData,
          buckets: Int): Long = {
    val n = toks.numElements()
    if (n < 2) return 0L
    var acc = 0L
    var prev = toks.getUTF8String(0).getBytes
    var i = 1
    while (i < n) {
      val cur = toks.getUTF8String(i).getBytes
      val buf = new Array[Byte](prev.length + 1 + cur.length)
      System.arraycopy(prev, 0, buf, 0, prev.length)
      buf(prev.length) = Space
      System.arraycopy(cur, 0, buf, prev.length + 1, cur.length)
      val f = java.lang.Math.floorMod(Md5Prefix60.hash60(buf), buckets.toLong)
      acc += w.getLong(f.toInt)
      prev = cur
      i += 1
    }
    acc
  }
}

case class BigramLogitExpr(toks: Expression, w: Expression, buckets: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = toks
  override def right: Expression = w
  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, w.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bigram_logit expects (array<string>, array<long>), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bigram_logit"

  override def nullSafeEval(t: Any, wv: Any): Any =
    BigramLogit.run(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      wv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, wv) =>
      s"graft.functions.BigramLogit.run($t, $wv, $buckets)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramLogitExpr =
    copy(toks = newLeft, w = newRight)
}
