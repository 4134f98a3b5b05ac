package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `simhash_sketch(f)` — 60-bit SimHash signature as a mergeable
  * `TypedImperativeAggregate` over pre-hashed 60-bit fingerprints.
  *
  * The input column carries each feature's numeric fingerprint (the md5-derived
  * 60-bit hash `graft.operators.Dedup.mdHash60`, chosen because DuckDB can
  * mirror it exactly — `('0x' || substring(md5(x),1,15))::BIGINT`). Per group
  * the buffer is 60 running vote counters (+1 when bit j of the fingerprint is
  * set, −1 otherwise); `merge` is elementwise addition, so the aggregate is
  * fully map-side combinable — 240 bytes of state per group regardless of
  * group size, the property that makes it usable over a 100 TB corpus.
  * `eval` packs the sign bits: bit j of the result is 1 iff votes(j) > 0.
  *
  * This replaces 60-plus separate `sum()` aggregate columns (round-1 shape),
  * whose generated aggregation class was so wide that Janino compilation
  * dominated query latency.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val Bits = 60

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sketch"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val f = v.asInstanceOf[Long]
      var j = 0
      while (j < Bits) {
        buf(j) += (if (((f >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < Bits) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < Bits) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Bits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}
