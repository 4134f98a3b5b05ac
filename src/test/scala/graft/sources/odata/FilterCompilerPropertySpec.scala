package graft.sources.odata

import graft.testkit.ODataStub
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test: for ANY generated filter tree, the compiled `$filter`
  * string evaluated server-side (the stub's independent OData-expression
  * evaluator) selects exactly the rows the Spark `sources.Filter` semantics
  * select. This is the correctness core of pushdown — a divergence here
  * silently returns wrong data. */
class FilterCompilerPropertySpec extends AnyFunSuite {

  private val stub = new ODataStub(v2 = false) // evaluator only; not started

  // row model mirrors the stub's Customers
  private val rows: Seq[Map[String, Any]] = stub.rows

  private val strFields = Seq("CustomerID", "CompanyName", "Country")
  private val strValues = Gen.oneOf(
    Gen.oneOf("Germany", "France", "Mexico", "C05", "Company 3", "Ab'cd"),
    Gen.alphaNumStr.map(_.take(8)))

  private def leafGen: Gen[Filter] = Gen.oneOf(
    for { f <- Gen.oneOf(strFields); v <- strValues } yield EqualTo(f, v),
    for { f <- Gen.oneOf(strFields); v <- strValues } yield Not(EqualTo(f, v)),
    for { v <- Gen.chooseNum(0L, 25000L) } yield GreaterThan("Revenue", v),
    for { v <- Gen.chooseNum(0L, 25000L) } yield LessThanOrEqual("Revenue", v),
    for { v <- Gen.chooseNum(0L, 25000L) } yield GreaterThanOrEqual("Revenue", v),
    for { v <- Gen.chooseNum(0L, 25000L) } yield LessThan("Revenue", v),
    for { f <- Gen.oneOf(strFields) } yield IsNotNull(f),
    for { f <- Gen.oneOf(strFields); v <- strValues } yield StringStartsWith(f, v))

  private def treeGen(depth: Int): Gen[Filter] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) } yield And(l, r)),
      2 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) } yield Or(l, r)),
      1 -> treeGen(depth - 1).map(Not(_)))

  /** Reference semantics of a Spark sources.Filter over the row model. */
  private def sparkEval(f: Filter, row: Map[String, Any]): Boolean = f match {
    case EqualTo(a, v)            => row(a) == v
    case GreaterThan(a, v)        => cmp(row(a), v) > 0
    case GreaterThanOrEqual(a, v) => cmp(row(a), v) >= 0
    case LessThan(a, v)           => cmp(row(a), v) < 0
    case LessThanOrEqual(a, v)    => cmp(row(a), v) <= 0
    case IsNull(a)                => row(a) == null
    case IsNotNull(a)             => row(a) != null
    case And(l, r)                => sparkEval(l, row) && sparkEval(r, row)
    case Or(l, r)                 => sparkEval(l, row) || sparkEval(r, row)
    case Not(i)                   => !sparkEval(i, row)
    case StringStartsWith(a, v)   => row(a).toString.startsWith(v)
    case other => throw new IllegalArgumentException(other.toString)
  }
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => x.compareTo(y)
    case (x: String, y: String) => x.compareTo(y)
    case (x, y)                 => x.toString.compareTo(y.toString)
  }

  test("compiled $filter selects exactly the rows Spark semantics select (500 random trees)") {
    val prop = Prop.forAll(treeGen(3)) { f =>
      ODataFilterCompiler.translate(f, v2 = false) match {
        case None => true // residual: Spark re-evaluates, nothing to check
        case Some(expr) =>
          val viaServer = rows.filter(r => stub.evalFilter(expr, r)).map(_("CustomerID"))
          val viaSpark = rows.filter(r => sparkEval(f, r)).map(_("CustomerID"))
          if (viaServer != viaSpark)
            println(s"MISMATCH filter=$f compiled=$expr server=$viaServer spark=$viaSpark")
          viaServer == viaSpark
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
  }
}
