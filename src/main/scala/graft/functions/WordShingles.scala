package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel — ONE implementation behind both the interpreted eval and
  * the generated code (static forwarder call), mirroring how the HOF chain
  * it replaces behaves: shingle i..i+n-1 is the space-join of the tokens
  * (`concat_ws` semantics — null-skipping, though split() never yields
  * nulls), deduplicated keeping FIRST-occurrence order (`array_distinct`
  * semantics), empty result below n tokens. */
object WordShinglesKernel {
  private val Space = UTF8String.fromString(" ")

  /** Fresh per call: ArrayData is not immutable by contract downstream. */
  def empty(): ArrayData = new GenericArrayData(Array.empty[Any])

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return empty()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** `word_shingles(toks, n)` — distinct word n-gram shingles as a native
  * codegen expression. The HOF chain it replaces
  * (`array_distinct(transform(sequence(...), i -> concat_ws(...)))`)
  * evaluates interpreted, outside whole-stage codegen, re-boxing every
  * token per shingle position; this runs one compiled loop per row and
  * keeps the projection inside codegen. Output is BIT-IDENTICAL to the
  * HOF version (parity spec), so every shingle-derived oracle hash is
  * unchanged. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  /** NULL-tolerant like the HOF chain it replaced: its
    * `when(size(t) >= n, ...).otherwise(array())` fell through to the
    * empty array on a NULL token array (null condition), so callers'
    * `size(shingles) === 0` short-doc predicates kept selecting those
    * rows — a null-intolerant expression would silently change that. */
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShinglesKernel.empty()
    else WordShinglesKernel.shingles(v.asInstanceOf[ArrayData], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
         |  graft.functions.WordShinglesKernel.empty() :
         |  graft.functions.WordShinglesKernel.shingles(${c.value}, $n);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
