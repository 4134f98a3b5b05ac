package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** `bin_be(bin, off, n)` / `bin_le(bin, off, n)` — unsigned integer of `n`
  * bytes read big/little-endian at 1-BASED byte offset `off` of a binary
  * column; NULL when the field is (even partially) out of range.
  *
  * This is the binary-slicing kernel under [[graft.operators.MediaHeaders]]:
  * header fields are read straight from the bytes instead of staging a
  * `hex(content)` string (2x the binary's memory) and substring-ing it. A
  * codegen scalar (stays inside whole-stage codegen), so the per-row cost is
  * an array-bounds check and an `n`-byte loop.
  *
  * `n` is capped at 8; an 8-byte read returns the SIGNED two's-complement
  * value (callers reading 64-bit durations accept the wrap beyond 2^63).
  * The null-on-out-of-range contract is what makes bounded scans safe: a
  * truncated header reads as NULL, never as garbage bytes.
  */
case class BinRead(bin: Expression, off: Expression, nBytes: Int, littleEndian: Boolean)
  extends BinaryExpression {

  override def left: Expression = bin
  override def right: Expression = off
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = if (littleEndian) "bin_le" else "bin_be"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bin.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a binary column, got ${bin.dataType}")
    else if (off.dataType != LongType && off.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects an int/bigint offset, got ${off.dataType}")
    else if (nBytes < 1 || nBytes > 8)
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be 1..8 bytes, got $nBytes")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(b: Any, o: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    val off1 = o match { case i: Int => i.toLong; case l: Long => l }
    if (off1 < 1 || off1 + nBytes - 1 > bytes.length) null
    else {
      val base = (off1 - 1).toInt
      var v = 0L
      var i = 0
      if (littleEndian)
        while (i < nBytes) { v |= (bytes(base + i) & 0xffL) << (8 * i); i += 1 }
      else
        while (i < nBytes) { v = (v << 8) | (bytes(base + i) & 0xffL); i += 1 }
      v
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) => {
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val body =
        if (littleEndian)
          s"$v |= (($b[$base + $i]) & 0xffL) << (8 * $i);"
        else
          s"$v = ($v << 8) | (($b[$base + $i]) & 0xffL);"
      s"""
         |if ($o < 1L || $o + ${nBytes - 1}L > $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $base = (int) ($o - 1L);
         |  long $v = 0L;
         |  for (int $i = 0; $i < $nBytes; $i++) {
         |    $body
         |  }
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BinRead =
    copy(bin = newLeft, off = newRight)
}

/** `bin_rfind(bin, pattern, patLen, maxScan)` — 1-based offset of the LAST
  * occurrence of the big-endian `patLen`-byte `pattern` within the final
  * `maxScan` bytes of a binary column; NULL when absent.
  *
  * The bounded BACKWARD scan that unlocks container formats keeping their
  * clock at the END of the stream (OGG's duration lives in the last page's
  * granule position; an OGG page is ≤ 65307 bytes, so a 66 KB window always
  * holds the final page header). O(maxScan) worst case per row, bounded by
  * construction, map-only, inside whole-stage codegen — the forward
  * step-chain scans of [[graft.operators.MediaHeaders]] stay the right tool
  * for head-anchored structures; this kernel exists because no bounded
  * UNROLLED chain can walk variable-size pages backwards. */
case class BinRfind(bin: Expression, pattern: Long, patLen: Int, maxScan: Int)
  extends UnaryExpression {

  override def child: Expression = bin
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "bin_rfind"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bin.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bin_rfind expects a binary column, got ${bin.dataType}")
    else if (patLen < 1 || patLen > 8)
      TypeCheckResult.TypeCheckFailure(s"bin_rfind pattern width must be 1..8 bytes, got $patLen")
    else if (maxScan < patLen)
      TypeCheckResult.TypeCheckFailure(s"bin_rfind maxScan must be >= pattern width")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(b: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    val from = math.max(0, bytes.length - maxScan)
    var i = bytes.length - patLen
    while (i >= from) {
      var v = 0L
      var j = 0
      while (j < patLen) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      if (v == pattern) return (i + 1).toLong
      i -= 1
    }
    null
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val from = ctx.freshName("from")
      val found = ctx.freshName("found")
      s"""
         |int $from = $b.length - $maxScan; if ($from < 0) $from = 0;
         |boolean $found = false;
         |for (int $i = $b.length - $patLen; $i >= $from && !$found; $i--) {
         |  long $v = 0L;
         |  for (int $j = 0; $j < $patLen; $j++) {
         |    $v = ($v << 8) | (($b[$i + $j]) & 0xffL);
         |  }
         |  if ($v == ${pattern}L) { ${ev.value} = (long) ($i + 1); $found = true; }
         |}
         |if (!$found) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinRfind =
    copy(bin = newChild)
}
