package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N-gram profile scorer: Σ over literal grams of
  * `charLen(gram) × nonOverlappingCount(gram in text)` — the exact value of
  * the `length(t) - length(replace(t, g, ''))` chain the language-ID oracle
  * counts with (`replace` removes non-overlapping left-to-right matches, so
  * the length delta is count × gram char-length), but in ONE kernel call
  * per profile instead of one full-text `replace` + string allocation PER
  * GRAM (80 scans/doc for 4×20-gram profiles — the honest bench showed
  * that chain at 4.7 s/100k docs).
  *
  * Counting uses `String.indexOf` stepping by the matched gram's UTF-16
  * length — the same non-overlapping scan `replace` performs; occurrence
  * counts are unit-agnostic, and the per-occurrence weight uses the gram's
  * CODE-POINT length to match Spark's `length()` on supplementary-plane
  * text. */
object GramScore {
  def score(s: String, grams: Array[String], charLens: Array[Int]): Long = {
    var total = 0L
    var gi = 0
    while (gi < grams.length) {
      val g = grams(gi)
      if (g.nonEmpty) {
        var c = 0
        var idx = s.indexOf(g)
        while (idx >= 0) { c += 1; idx = s.indexOf(g, idx + g.length) }
        total += c.toLong * charLens(gi)
      }
      gi += 1
    }
    total
  }
}

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03) in one kernel pass:
  * code points → rolling polynomial k-gram hashes (base 31, the shared
  * modulus) → per-window minima → sorted distinct. Bit-identical to the
  * staged `charCodes |> kgramHashes |> winnowFromKgrams` expression chain
  * (same integer math, same empty-input fallbacks) — which evaluates as
  * INTERPRETED higher-order functions and showed up at 50 s/500k docs on
  * the honest bench. */
object WinnowFps {
  def fps(s: String, k: Int, w: Int, mod: Long): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.emptyLongArray
    val kh = new Array[Long](n - k + 1)
    var i = 0
    while (i < kh.length) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(i + j)) % mod; j += 1 }
      kh(i) = acc
      i += 1
    }
    val mins =
      if (kh.length >= w) {
        val out = new Array[Long](kh.length - w + 1)
        var p = 0
        while (p < out.length) {
          var mn = kh(p)
          var q = 1
          while (q < w) { if (kh(p + q) < mn) mn = kh(p + q); q += 1 }
          out(p) = mn
          p += 1
        }
        out
      } else kh
    java.util.Arrays.sort(mins)
    // sorted -> dedupe adjacent = sorted distinct
    var m = 0
    var r = 0
    while (r < mins.length) {
      if (m == 0 || mins(r) != mins(m - 1)) { mins(m) = mins(r); m += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(mins, m)
  }
}

case class WinnowFpsExpr(child: Expression, k: Int, w: Int, mod: Long)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string input, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WinnowFps.fps(input.asInstanceOf[UTF8String].toString, k, w, mod))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WinnowFps.fps($c.toString(), $k, $w, ${mod}L))")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

/** PQ encoding in one kernel: per subspace, the argmin-distance codebook
  * entry (ascending-index scan, strict `<` — ties take the LOWEST cid,
  * matching the staged `array_min(struct(d, cid))` ordering), distances
  * folded j-ascending so doubles are bit-identical to the staged
  * expression tree (which at m=8,k=16 is ~1000 nodes and falls out of
  * codegen — 21 s/500k rows on the honest bench). */
object PqEncodeKernel {
  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData,
             m: Int, k: Int, sub: Int, flat: Array[Double]): Array[Int] = {
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var ki = 0
      while (ki < k) {
        var d = 0.0
        var j = 0
        val base = (mi * k + ki) * sub
        while (j < sub) {
          val dd = v.getDouble(mi * sub + j) - flat(base + j)
          d += dd * dd
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = ki }
        ki += 1
      }
      out(mi) = bestC
      mi += 1
    }
    out
  }
}

case class PqEncodeExpr(child: Expression, m: Int, k: Int, sub: Int,
                        flat: Array[Double]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqEncodeKernel.encode(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        m, k, sub, flat))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqEncodeKernel.encode($c, $m, $k, $sub, $fRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Maximum element multiplicity of a string array — the sorted-run count
  * behind the Gopher repetition statistics, as one kernel call instead of
  * `array_sort` + an interpreted `aggregate` fold per row. Sort order is
  * UTF8String's binary order (what `array_sort` uses); only EQUALITY of
  * neighbors matters for the result, so the value is order-convention-free.
  * Empty array → 0. */
object MaxMultiplicity {
  def run(a: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    // null elements are legal (containsNull=true is accepted and the SQL
    // function is user-callable): skip them while copying — the previous
    // array_sort+aggregate chain was null-tolerant, natural-order sort is not
    val arr = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { arr(m) = a.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0) return 0L
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]], 0, m)
    var best = 1L
    var run = 1L
    i = 1
    while (i < m) {
      if (arr(i).equals(arr(i - 1))) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }
}

case class MaxMultiplicityExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_multiplicity expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "max_multiplicity"

  override def nullSafeEval(input: Any): Any =
    MaxMultiplicity.run(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MaxMultiplicity.run($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicityExpr =
    copy(child = newChild)
}

/** Adjacent word 2-grams WITH multiplicity, space-joined — one kernel pass
  * instead of the interpreted `transform(sequence, concat_ws(element_at))`
  * chain. n tokens → n−1 bigrams; <2 tokens → empty. */
object WordBigrams {
  private val Space = UTF8String.fromString(" ")
  def run(a: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = a.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = a.getUTF8String(i)
      out(i - 1) = UTF8String.concat(prev, Space, cur)
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Positional word k-gram fingerprints as 60-bit md5 prefixes — element i
  * = md5_prefix60 of the k tokens starting at token i, space-joined.
  * One compiled pass; the staged `transform(sequence(...),
  * i -> md5(concat_ws(...)))` chain it replaces evaluated its lambda
  * interpreted per position AND shuffled 32-hex strings where this ships
  * longs (the p51 hashed-posting idiom: the DuckDB oracle mirrors
  * `('0x'||substring(md5(g),1,15))::BIGINT`, so any collision merges the
  * same two grams on both sides and the gate stays hash-exact).
  * n tokens → n−k+1 grams; fewer than k tokens → empty. */
object GramFps60 {
  def run(a: org.apache.spark.sql.catalyst.util.ArrayData,
          k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = a.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      var len = k - 1
      var j = 0
      while (j < k) { len += tb(i + j).length; j += 1 }
      val buf = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < k) {
        val t = tb(i + j)
        System.arraycopy(t, 0, buf, off, t.length)
        off += t.length
        if (j < k - 1) { buf(off) = ' '.toByte; off += 1 }
        j += 1
      }
      out(i) = Md5Prefix60.hash60(buf)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class GramFps60Expr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_fps60 expects array<string>, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_fps60"

  override def nullSafeEval(input: Any): Any =
    GramFps60.run(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramFps60.run($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramFps60Expr =
    copy(child = newChild)
}

case class WordBigramsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_bigrams expects array<string>, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"

  override def nullSafeEval(input: Any): Any =
    WordBigrams.run(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBigrams.run($c)")

  override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
    copy(child = newChild)
}

/** BPE merge kernels — the left-to-right non-overlapping merge scan of
  * Sennrich et al. (the semantics `Bpe.mergeStep`'s (emitted, pending)
  * aggregate fold implements, spec-proven equal to the reference pairwise
  * scan), compiled: `bpe_merge_step` applies ONE (a,b)→ab merge to a
  * symbol array (the training rounds' fold), `bpe_pieces` runs a whole
  * RANK-ORDERED merge list over a word (the encoding path — previously
  * nMerges nested interpreted aggregates per distinct word). */
object BpeKernel {
  def mergeStep(a: org.apache.spark.sql.catalyst.util.ArrayData,
                l: UTF8String, r: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    val out = new java.util.ArrayList[Any](n)
    val merged = UTF8String.concat(l, r)
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.getUTF8String(i).equals(l) &&
          a.getUTF8String(i + 1).equals(r)) {
        out.add(merged); i += 2
      } else { out.add(a.getUTF8String(i)); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def pieces(w: UTF8String, flat: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = w.toString
    var syms: Array[String] = {
      val buf = new java.util.ArrayList[String](s.length)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val cc = Character.charCount(cp)
        buf.add(s.substring(i, i + cc))
        i += cc
      }
      buf.toArray(new Array[String](0))
    }
    var mi = 0
    while (mi + 1 < flat.length) {
      val a = flat(mi); val b = flat(mi + 1); val m = a + b
      val out = new java.util.ArrayList[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out.add(m); i += 2
        } else { out.add(syms(i)); i += 1 }
      }
      syms = out.toArray(new Array[String](0))
      mi += 2
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      syms.map(UTF8String.fromString): Array[Any])
  }
}

case class BpeMergeStepExpr(first: Expression, second: Expression,
                            third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(StringType, _),
        StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_step expects (array<string>, string, string), got $other")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  override def nullSafeEval(a: Any, l: Any, r: Any): Any =
    BpeKernel.mergeStep(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, r) =>
      s"${ev.value} = graft.functions.BpeKernel.mergeStep($a, $l, $r);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeMergeStepExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class BpePiecesExpr(child: Expression, flat: Array[String])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_pieces expects a string word, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pieces"

  override def nullSafeEval(input: Any): Any =
    BpeKernel.pieces(input.asInstanceOf[UTF8String], flat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernel.pieces($c, $fRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpePiecesExpr =
    copy(child = newChild)
}

case class GramScoreExpr(child: Expression, grams: Seq[String])
  extends UnaryExpression {

  private lazy val gramsArr: Array[String] = grams.toArray
  private lazy val charLens: Array[Int] =
    grams.map(g => g.codePointCount(0, g.length)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_score expects a string input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "gram_score"

  override def nullSafeEval(input: Any): Any =
    GramScore.score(input.asInstanceOf[UTF8String].toString, gramsArr, charLens)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gRef = ctx.addReferenceObj("grams", gramsArr, "java.lang.String[]")
    val lRef = ctx.addReferenceObj("gramLens", charLens, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramScore.score($c.toString(), $gRef, $lRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramScoreExpr =
    copy(child = newChild)
}

/** Precompiled BPE merge plan for COUNTING pieces: every merge symbol
  * (component and result) interned to an int once at plan build; the
  * per-word fold then runs over int arrays — no string allocation or
  * comparison per round (the `bpe_pieces` fold re-materialized a String
  * array per merge). Symbols absent from every merge map to -1: they can
  * never participate in a merge, so one shared id preserves counts.
  * A presence filter skips rounds whose components don't occur in the
  * word (stale-true only costs a scan, never correctness). */
final class BpeCountPlan(val flat: Array[String]) extends Serializable {
  val nMerges: Int = flat.length / 2
  private val table = new java.util.HashMap[String, Integer]()
  private def intern(s: String): Int = {
    val got = table.get(s)
    if (got != null) got.intValue()
    else { val id = table.size(); table.put(s, id); id }
  }
  val aIds = new Array[Int](nMerges)
  val bIds = new Array[Int](nMerges)
  val mIds = new Array[Int](nMerges)
  locally {
    var r = 0
    while (r < nMerges) {
      aIds(r) = intern(flat(2 * r))
      bIds(r) = intern(flat(2 * r + 1))
      mIds(r) = intern(flat(2 * r) + flat(2 * r + 1))
      r += 1
    }
  }
  val vocab: Int = table.size()

  def count(w: UTF8String): Long = {
    val s = w.toString
    val ids = new Array[Int](s.length)
    val present = new Array[Boolean](vocab)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      val got = table.get(s.substring(i, i + cc))
      val id = if (got == null) -1 else got.intValue()
      ids(n) = id
      if (id >= 0) present(id) = true
      n += 1
      i += cc
    }
    var r = 0
    while (r < nMerges) {
      val a = aIds(r); val b = bIds(r)
      if (present(a) && present(b)) {
        val m = mIds(r)
        var wr = 0
        var rd = 0
        while (rd < n) {
          if (rd + 1 < n && ids(rd) == a && ids(rd + 1) == b) {
            ids(wr) = m; present(m) = true; rd += 2
          } else { ids(wr) = ids(rd); rd += 1 }
          wr += 1
        }
        n = wr
      }
      r += 1
    }
    n.toLong
  }
}

case class BpePieceCountExpr(child: Expression, plan: BpeCountPlan)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_piece_count expects a string word, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_piece_count"

  override def nullSafeEval(input: Any): Any =
    plan.count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("bpeCountPlan", plan,
      classOf[BpeCountPlan].getName)
    defineCodeGen(ctx, ev, c => s"$pRef.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpePieceCountExpr =
    copy(child = newChild)
}
