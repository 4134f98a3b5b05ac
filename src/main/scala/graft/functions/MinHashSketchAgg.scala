package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sketch(value, k)` — a mergeable MinHash sketch as a native
  * `TypedImperativeAggregate` (SURVEY.md §4.3's one candidate for custom
  * aggregate machinery).
  *
  * Per group it maintains k running minima of universal hashes of the input
  * values; `merge` is the elementwise min, which makes the sketch fully
  * map-side combinable and embarrassingly parallel — the signature of a
  * 100 TB group costs k longs of state regardless of group size. Two
  * sketches' estimated Jaccard is the fraction of equal components
  * (compare with `zip_with` + `aggregate` or graft's vec kernels).
  *
  * Input contract: a LONG child is treated as a PRE-COMPUTED base
  * fingerprint, folded into [0,2^31) by masking — this is how
  * `Dedup.minhashSigTable` feeds it the md5-derived `mdHash31` fingerprint
  * that the DuckDB oracle can mirror. Any other type is xxhash64-hashed
  * internally (convenient SQL surface over raw values); the two agree when
  * the caller pre-hashes with `pmod(xxhash64(x), 2^31)`.
  */
case class MinHashSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L
  private def a(i: Int): Long = (0x9E3779B9L * (2L * i + 1)) % (P - 2) + 1
  private def b(i: Int): Long = (0xC2B2AE3DL * (i + 1L)) % P

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = child.dataType match {
        // long input = pre-computed fingerprint (md5- or xxhash-derived),
        // folded to 31 bits (mask == pmod by a power of two for any sign)
        case LongType => v.asInstanceOf[Long] & 0x7FFFFFFFL
        // otherwise hash the raw value: pmod(xxhash64(x), 2^31) equivalent
        case dt => org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(v, dt, 42L) & 0x7FFFFFFFL
      }
      var i = 0
      while (i < k) {
        val h = (a(i) * base + b(i)) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}
