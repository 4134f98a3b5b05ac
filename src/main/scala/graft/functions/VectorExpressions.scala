package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.InternalRow

/** Native Catalyst expressions for the embedding-vector kernels (SURVEY.md
  * §4.3: custom `Expression`s for the beyond-reference similarity tier).
  *
  * Spark's array higher-order functions (`zip_with` + `aggregate`) evaluate
  * interpreted — outside whole-stage codegen — which makes a 64-dim dot
  * product ~100 boxed expression evaluations per pair. These expressions
  * generate a tight primitive loop instead (and stay inside whole-stage
  * codegen), a 10-50× kernel speedup on similarity joins.
  *
  * Numeric contract: strict left-to-right summation in index order, so
  * results are BIT-IDENTICAL to the interpreted fold and to any engine that
  * folds sequentially (the DuckDB oracle's `list_reduce`). Vector elements
  * must be non-null; lengths are clamped to the shorter input.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<double> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm with the same left-to-right summation contract as [[VecDot]]. */
case class VecNorm(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"vec_norm expects array<double>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** `vec_lsh_keys(v, tables, planesPerTable)` — all random-hyperplane LSH
  * bucket keys of a vector in ONE expression: returns `array<long>` of length
  * `tables`, where bit j of key t is the sign of `v · plane(t, j)`.
  *
  * The hyperplanes are never materialized: component d of plane (t, j) is the
  * integer-arithmetic pseudo-random value
  * `((1103515245*(t*8191 + j*131 + d) + 12345) mod 2^31) / 2^31 - 0.5`
  * computed inline in the loop. Pure integer ops + one exact dyadic division
  * make the planes bit-identical in ANY engine — the DuckDB oracle re-derives
  * them from the same formula, so LSH candidate sets match exactly.
  *
  * Replaces the round-1 shape (tables × planes separate `vec_dot` calls
  * against `typedLit` plane arrays), which bloated the plan with thousands of
  * literal doubles and made codegen compilation the dominant cost.
  */
case class VecLshKeys(child: Expression, tables: Int, planesPerTable: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"vec_lsh_keys expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "vec_lsh_keys"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < planesPerTable) {
        var s = 0.0
        var d = 0
        while (d < n) {
          val p = ((1103515245L * (t * 8191L + j * 131L + d) + 12345L) % 2147483648L) / 2147483648.0 - 0.5
          s += v.getDouble(d) * p
          d += 1
        }
        if (s > 0) key |= (1L << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |long[] $keys = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $planesPerTable; $j++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      double $p = ((1103515245L * ($t * 8191L + $j * 131L + $d) + 12345L) % 2147483648L) / 2147483648.0 - 0.5;
         |      $s += $a.getDouble($d) * $p;
         |    }
         |    if ($s > 0) $key |= (1L << $j);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecLshKeys =
    copy(child = newChild)
}

/** `mat_vec(m, v)` — matrix-vector product: out[i] = Σ_j m[i][j] · v[j].
  * The OPQ-rotation kernel ([[graft.operators.Quantize.opqRotation]]): the
  * rotation matrix rides as a literal `array<array<double>>`, so rotating a
  * corpus stays inside whole-stage codegen instead of an interpreted
  * `transform`/`aggregate` HOF pair (D² boxed evaluations per row). Rows are
  * clamped to the shorter of (row length, vector length); same strict
  * left-to-right summation contract as [[VecDot]]. */
case class MatVec(mat: Expression, vec: Expression)
  extends BinaryExpression {

  override def left: Expression = mat
  override def right: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = (mat.dataType, vec.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"mat_vec expects (array<array<double>>, array<double>), got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override def nullSafeEval(m: Any, v: Any): Any = {
    val rows = m.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Double](rows.numElements())
    var i = 0
    while (i < out.length) {
      val row = rows.getArray(i)
      val n = math.min(row.numElements(), x.numElements())
      var s = 0.0
      var j = 0
      while (j < n) { s += row.getDouble(j) * x.getDouble(j); j += 1 }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, v) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      s"""
         |double[] $out = new double[$m.numElements()];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $m.getArray($i);
         |  int $n = java.lang.Math.min($row.numElements(), $v.numElements());
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $s += $row.getDouble($j) * $v.getDouble($j);
         |  }
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MatVec =
    copy(mat = newLeft, vec = newRight)
}

/** All within-block cosine near-duplicate pairs from ONE packed block —
  * the GEMM-shaped replacement for the blocked self-join's per-pair
  * `vec_dot` (the join materialized every pair row with BOTH d-dim arrays
  * attached; at sf1 that was 2.5x DuckDB). The block's vectors unpack once
  * into a flat primitive matrix; the i<j loop emits (min_id, max_id, sim)
  * for sim >= minSim. Zero-norm rows never pair (cosine is undefined; the
  * ANSI-mode division in the join form would throw on them — the kernel
  * makes the operator total instead).
  *
  * Dot products run in index order, and IEEE multiply is commutative, so
  * the sim doubles are bit-identical to the join form in either pair
  * orientation. Equal ids never pair (the join's `a.id < b.id`). */
object BlockCosinePairs {
  def run(arr: org.apache.spark.sql.catalyst.util.ArrayData,
          minSim: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // unpack once: ids, norms, flat row-major matrix
    val first = arr.getStruct(0, 3)
    val d = first.getArray(1).numElements()
    val ids = new Array[Long](n)
    val nrms = new Array[Double](n)
    val m = new Array[Double](n * d)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      nrms(i) = row.getDouble(2)
      val v = row.getArray(1)
      // uniform dimensionality is a hard precondition: silently truncating
      // longer vectors / zero-padding shorter ones would make the sims
      // diverge from the staged per-pair vec_dot form on ragged input while
      // still LOOKING like valid cosines — fail loudly instead
      if (v.numElements() != d)
        throw new IllegalArgumentException(
          s"block_cosine_pairs: ragged block — vector ${ids(i)} has dim " +
            s"${v.numElements()}, block dim is $d (all vectors in a block " +
            "must share one dimensionality)")
      var j = 0
      while (j < d) { m(i * d + j) = v.getDouble(j); j += 1 }
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < n) {
      val baseI = i * d
      var k = i + 1
      while (k < n) {
        // zero-norm rows never pair: cosine is undefined there, and the
        // ANSI-mode division the join form ran would THROW on them — the
        // kernel makes the operator total instead (documented divergence)
        if (ids(i) != ids(k) && nrms(i) != 0.0 && nrms(k) != 0.0) {
          val baseK = k * d
          var s = 0.0
          var j = 0
          while (j < d) { s += m(baseI + j) * m(baseK + j); j += 1 }
          val sim = s / (nrms(i) * nrms(k))
          if (sim >= minSim) {
            val (a, b2) = if (ids(i) < ids(k)) (ids(i), ids(k)) else (ids(k), ids(i))
            out += InternalRow(a, b2, sim)
          }
        }
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  val elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
}

case class BlockCosinePairsExpr(child: Expression, minSim: Double)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.length == 3 &&
      st(0).dataType == LongType &&
      st(1).dataType.isInstanceOf[ArrayType] &&
      st(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
      st(2).dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"block_cosine_pairs expects array<struct<long, array<double>, double>>, got $other")
  }
  override def dataType: DataType =
    ArrayType(BlockCosinePairs.elementSchema, containsNull = false)
  override def prettyName: String = "block_cosine_pairs"
  override def nullSafeEval(input: Any): Any =
    BlockCosinePairs.run(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], minSim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BlockCosinePairs.run($c, $minSim)")
  override protected def withNewChildInternal(newChild: Expression): BlockCosinePairsExpr =
    copy(child = newChild)
}

/** Argmax over array<double> with ties resolved to the HIGHEST index — the
  * exact semantics of `array_max(array(struct(sim, cid), ...)).getField("cid")`
  * (struct max compares sim first, then cid, so equal sims pick the higher
  * cid). Double comparison mirrors Spark SQL ordering: -0.0 == 0.0, NaN
  * greater than everything. One kernel call replaces the nCentroids-struct
  * expression tree every IVF/SemDeDup cell assignment used to build — the
  * tree was codegen-able but its size (16 structs × vec_dot) dominated the
  * per-row cost and the per-stage Janino compile. Empty input → -1 (never
  * occurs: centroid sets are non-empty literals). */
object ArgMaxLast {
  def run(a: ArrayData): Int = {
    val n = a.numElements()
    var best = java.lang.Double.NEGATIVE_INFINITY
    var bi = -1
    var i = 0
    while (i < n) {
      val v = a.getDouble(i)
      // v >= best with Spark semantics: > or == (covers -0.0 == 0.0); NaN
      // wins over non-NaN and ties with NaN keep the later index
      if (v > best || v == best || (java.lang.Double.isNaN(v) &&
            (java.lang.Double.isNaN(best) || !(best > v)))) {
        best = v; bi = i
      }
      i += 1
    }
    bi
  }
}

case class ArgMaxLastExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arg_max_last expects array<double>, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "arg_max_last"
  override def nullSafeEval(a: Any): Any =
    ArgMaxLast.run(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArgMaxLast.run($c)")
  override protected def withNewChildInternal(newChild: Expression): ArgMaxLastExpr =
    copy(child = newChild)
}

/** Top-n indices of array<double> ordered by (value DESC, index DESC) — the
  * exact semantics of `slice(reverse(array_sort(array(struct(sim, cid)...))),
  * 1, n)` projected to cid: array_sort ascends by (sim, cid), reverse gives
  * sim DESC then cid DESC. Same Spark double ordering as [[ArgMaxLast]]
  * (NaN greatest, -0.0 == 0.0). Selection loop — n (nProbe) is small and
  * the input length is nCentroids. */
object TopCells {
  private def before(v: Double, i: Int, bv: Double, bi: Int): Boolean = {
    // (v, i) orders before (bv, bi) under value DESC, index DESC
    if (java.lang.Double.isNaN(v)) !java.lang.Double.isNaN(bv) || i > bi
    else if (java.lang.Double.isNaN(bv)) false
    else if (v > bv) true
    else if (v == bv) i > bi
    else false
  }
  def run(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val k = math.min(n, len)
    if (k <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Int])
    val idx = new Array[Int](k)
    val vals = new Array[Double](k)
    var size = 0
    var i = 0
    while (i < len) {
      val v = a.getDouble(i)
      if (size < k || before(v, i, vals(size - 1), idx(size - 1))) {
        var p = if (size < k) size else k - 1
        while (p > 0 && before(v, i, vals(p - 1), idx(p - 1))) {
          vals(p) = vals(p - 1); idx(p) = idx(p - 1); p -= 1
        }
        vals(p) = v; idx(p) = i
        if (size < k) size += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx)
  }
}

case class TopCellsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_cells expects array<double>, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"
  override def nullSafeEval(a: Any): Any =
    TopCells.run(a.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopCells.run($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TopCellsExpr =
    copy(child = newChild)
}
