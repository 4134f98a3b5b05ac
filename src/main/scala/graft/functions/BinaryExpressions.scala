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
