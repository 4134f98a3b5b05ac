package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared Bloom bit derivation — ONE implementation used by the aggregate's
  * interpreted update, the membership expression's interpreted eval, AND its
  * generated code (static forwarder call), so the three can never disagree
  * on bit positions. Kirsch-Mitzenmacher double hashing over a splitmix64
  * mix: position i = (h1 + i*h2) mod numBits with h2 forced odd. */
object BloomBits {
  def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def pos(h1: Long, h2: Long, i: Int, numBits: Int): Int =
    (((h1 + i.toLong * h2) & Long.MaxValue) % numBits).toInt

  def set(words: Array[Long], fp: Long, numHashes: Int): Unit = {
    val h1 = mix(fp); val h2 = mix(h1) | 1L
    val numBits = words.length * 64
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i, numBits)
      words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def contains(words: ArrayData, fp: Long, numHashes: Int): Boolean = {
    // the probe side accepts ANY array<bigint>; an empty one holds nothing
    // (and would otherwise divide by zero in pos)
    if (words.numElements() == 0) return false
    val h1 = mix(fp); val h2 = mix(h1) | 1L
    val numBits = words.numElements() * 64
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i, numBits)
      if ((words.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_sketch(fp, numBits, numHashes)` — a mergeable Bloom filter as a
  * native `TypedImperativeAggregate` (the RedPajama-v2-style membership
  * sketch): per group it maintains a numBits bit array; `merge` is the
  * bitwise OR, so it is fully map-side combinable and the filter for a
  * 100 TB benchmark set costs numBits/8 bytes of state regardless of
  * cardinality. The sketch's reason to exist vs the exact broadcast-set
  * decontamination path: when the reference set is too large to broadcast
  * as distinct values, the fixed-size filter still broadcasts — no false
  * negatives, FP rate ~(1-e^(-kn/m))^k.
  *
  * Input contract: LONG pre-computed fingerprints only (the same
  * `mdHash31` fingerprints the exact tier compares), keeping membership
  * decisions aligned with the exact operator on identical inputs. */
case class BloomSketchAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be > 0, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch expects a LONG pre-computed fingerprint, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numBits / 64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = newChildren.head)
}

/** `bloom_contains(bloom, fp, numHashes)` — membership test against a
  * [[BloomSketchAgg]] bit array (numBits is implied by the array length).
  * Codegen'd: the generated code calls the same [[BloomBits]] static logic
  * as the interpreted paths, and the probe loop stays inside whole-stage
  * codegen — at 100 TB this runs once per corpus posting against a
  * broadcast one-row filter. */
case class BloomContains(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects (array<bigint>, bigint), got ($l, $r)")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(bloom: Any, fp: Any): Any =
    BloomBits.contains(bloom.asInstanceOf[ArrayData], fp.asInstanceOf[Long], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, fp) => {
      s"${ev.value} = graft.functions.BloomBits.contains($bloom, $fp, $numHashes);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
