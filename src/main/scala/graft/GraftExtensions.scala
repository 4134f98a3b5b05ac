package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArgMaxLastExpr, BigramLogitExpr, BinRead, BinRfind, BlockCosinePairsExpr, BloomContains, BloomSketchAgg, BpeMergeStepExpr, BpePieceCountExpr, BpePiecesExpr, CutSpansExpr, EncodingStatsExpr, GopherStatsExpr, GramFps60Expr, GramScoreExpr, LineFilterStatsExpr, MatVec, MaxMultiplicityExpr, Md5Prefix60Expr, MinHashSketchAgg, PiiScanExpr, PqEncodeExpr, SimHashAgg, SparseLogitExpr, TokenCountsExpr, TopCellsExpr, TokenStatsExpr, TopKRowsAgg, VecDot, VecLshKeys, VecNorm, WinnowFpsExpr, WordBigramsExpr, WordShingles}

/** Session extensions registering graft's native expressions as SQL
  * functions. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions`).
  * Usable from SQL (`SELECT vec_dot(a, b)`) and the DataFrame API
  * (`call_function("vec_dot", a, b)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def intLit(fn: String)(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int = e match {
    // ADVICE r11: a null literal must fail at analysis with a clear message,
    // not NPE in the builder
    case org.apache.spark.sql.catalyst.expressions.Literal(null, _) =>
      throw new IllegalArgumentException(
        s"$fn expects a non-null literal integer parameter")
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects literal integer parameters, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bpe_merge_step"),
      new ExpressionInfo(classOf[BpeMergeStepExpr].getName, "bpe_merge_step"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeMergeStepExpr(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("bpe_pieces"),
      new ExpressionInfo(classOf[BpePiecesExpr].getName, "bpe_pieces"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val flat = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            arr: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString).toArray
          case other => throw new IllegalArgumentException(
            s"bpe_pieces expects a literal merge list, got $other")
        }
        BpePiecesExpr(children.head, flat)
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_piece_count"),
      new ExpressionInfo(classOf[BpePieceCountExpr].getName, "bpe_piece_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val flat = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            arr: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString).toArray
          case other => throw new IllegalArgumentException(
            s"bpe_piece_count expects a literal merge list, got $other")
        }
        BpePieceCountExpr(children.head, new graft.functions.BpeCountPlan(flat))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_bigrams"),
      new ExpressionInfo(classOf[WordBigramsExpr].getName, "word_bigrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordBigramsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("bigram_logit"),
      new ExpressionInfo(classOf[BigramLogitExpr].getName, "bigram_logit"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BigramLogitExpr(children.head, children(1),
          intLit("bigram_logit")(children(2)))))
    ext.injectFunction((
      FunctionIdentifier("sparse_logit"),
      new ExpressionInfo(classOf[SparseLogitExpr].getName, "sparse_logit"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SparseLogitExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("gram_fps60"),
      new ExpressionInfo(classOf[GramFps60Expr].getName, "gram_fps60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"gram_fps60 expects a literal k, got $other")
        }
        GramFps60Expr(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("max_multiplicity"),
      new ExpressionInfo(classOf[MaxMultiplicityExpr].getName, "max_multiplicity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MaxMultiplicityExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStatsExpr].getName, "token_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenStatsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cut_spans"),
      new ExpressionInfo(classOf[CutSpansExpr].getName, "cut_spans"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CutSpansExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCountsExpr].getName, "token_counts"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenCountsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStatsExpr].getName, "gopher_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GopherStatsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("block_cosine_pairs"),
      new ExpressionInfo(classOf[BlockCosinePairsExpr].getName, "block_cosine_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val minSim = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toDouble
          case other => throw new IllegalArgumentException(
            s"block_cosine_pairs expects a literal minSim, got $other")
        }
        BlockCosinePairsExpr(children.head, minSim)
      }))
    ext.injectFunction((
      FunctionIdentifier("pii_scan"),
      new ExpressionInfo(classOf[PiiScanExpr].getName, "pii_scan"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PiiScanExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("encoding_stats"),
      new ExpressionInfo(classOf[EncodingStatsExpr].getName, "encoding_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        EncodingStatsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("line_filter_stats"),
      new ExpressionInfo(classOf[LineFilterStatsExpr].getName, "line_filter_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LineFilterStatsExpr(children.head,
          intLit("line_filter_stats")(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "winnow_fps"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def longLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
          e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toLong
            case other => throw new IllegalArgumentException(
              s"winnow_fps expects literal parameters, got $other")
          }
        WinnowFpsExpr(children.head, longLit(children(1)).toInt,
          longLit(children(2)).toInt, longLit(children(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val lit = intLit("pq_encode") _
        val flat = children(4) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            arr: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
            arr.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"pq_encode expects a literal flattened codebook, got $other")
        }
        PqEncodeExpr(children.head, lit(children(1)), lit(children(2)),
          lit(children(3)), flat)
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_score"),
      new ExpressionInfo(classOf[GramScoreExpr].getName, "gram_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val grams = children.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"gram_score expects literal gram strings, got $other")
        }
        GramScoreExpr(children.head, grams)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60Expr].getName, "md5_prefix60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecNorm(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashSketchAgg].getName, "minhash_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = children match {
          case Seq(_, org.apache.spark.sql.catalyst.expressions.Literal(v, _)) =>
            v.toString.toInt
          case _ => 64
        }
        MinHashSketchAgg(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_sketch"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("topk_rows"),
      new ExpressionInfo(classOf[TopKRowsAgg].getName, "topk_rows"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // ADVICE r11: validate arity here (analysis time) instead of failing
        // lazily on executors; the struct field-count check lives in
        // TopKRowsAgg.checkInputDataTypes
        if (children.length != 3) throw new IllegalArgumentException(
          s"topk_rows expects 3 arguments (struct, k, first_desc), got ${children.length}")
        val k = intLit("topk_rows")(children(1))
        val firstDesc = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(null, _) =>
            throw new IllegalArgumentException(
              "topk_rows expects a non-null literal boolean direction")
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toBoolean
          case other => throw new IllegalArgumentException(
            s"topk_rows expects a literal boolean direction, got $other")
        }
        TopKRowsAgg(children.head, k, firstDesc).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(children.head, intLit("word_shingles")(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("bloom_sketch"),
      new ExpressionInfo(classOf[BloomSketchAgg].getName, "bloom_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val lit = intLit("bloom_sketch") _
        BloomSketchAgg(children.head, lit(children(1)), lit(children(2)))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = children match {
          case Seq(_, _, org.apache.spark.sql.catalyst.expressions.Literal(v, _)) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"bloom_contains expects (bloom, fp, literal numHashes), got $other")
        }
        BloomContains(children(0), children(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("arg_max_last"),
      new ExpressionInfo(classOf[ArgMaxLastExpr].getName, "arg_max_last"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgMaxLastExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("top_cells"),
      new ExpressionInfo(classOf[TopCellsExpr].getName, "top_cells"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopCellsExpr(children(0), intLit("top_cells")(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("mat_vec"),
      new ExpressionInfo(classOf[MatVec].getName, "mat_vec"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MatVec(children(0), children(1))))
    Seq(("bin_be", false), ("bin_le", true)).foreach { case (name, le) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[BinRead].getName, name),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          BinRead(children(0), children(1), intLit(name)(children(2)), le)))
    }
    ext.injectFunction((
      FunctionIdentifier("bin_rfind"),
      new ExpressionInfo(classOf[BinRfind].getName, "bin_rfind"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val lit = intLit("bin_rfind") _
        val pat = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toLong
          case other => throw new IllegalArgumentException(
            s"bin_rfind expects a literal pattern, got $other")
        }
        BinRfind(children(0), pat, lit(children(2)), lit(children(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_lsh_keys"),
      new ExpressionInfo(classOf[VecLshKeys].getName, "vec_lsh_keys"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val lit = intLit("vec_lsh_keys") _
        VecLshKeys(children.head, lit(children(1)), lit(children(2)))
      }))
  }
}
