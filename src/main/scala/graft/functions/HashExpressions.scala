package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit md5 prefix — `('0x' || substring(md5(x),1,15))
  * ::BIGINT` in the DuckDB oracles — as ONE native expression instead of the
  * `conv(substring(md5(x), 1, 15), 16, 10)` chain: that chain materializes a
  * 32-char hex string, substrings it, and BigInteger-parses the result PER
  * ROW, and it is the hash backbone of the whole pipeline tier (MinHash
  * fingerprints, DSIR/classifier feature hashing, split/sample seeding,
  * paragraph keys). Here: one thread-local digest, 8 byte reads, zero
  * intermediate strings — bit-identical values by construction (the first
  * 15 hex digits ARE the first 7.5 bytes).
  */
object Md5Prefix60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned value of the first 15 hex digits of md5(bytes): 7 full bytes
    * then the high nibble of byte 7 — 60 bits, always non-negative. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }
}

case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects a string input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix60.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60Expr =
    copy(child = newChild)
}
