package graft.sources.odata

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.sources._

/** OData URL construction: canonicalize existing query params, merge query
  * options without duplicates, single-encode (reference
  * `src/odata_predicate_pushdown_helper.cpp:126-236,355-410` and
  * `src/odata_url_helpers.cpp`).
  *
  * Merge rules mirror the reference: `$filter`/`$expand` keep an existing
  * value (AND-merge for filter); `$select`/`$top`/`$skip` overwrite; `%24x`
  * is canonicalized to `$x`; v2 requests force `$format=json` (v2 servers
  * default to ATOM XML otherwise).
  */
final case class ODataUrl(base: String, params: Seq[(String, String)]) {

  def withParam(k: String, v: String): ODataUrl = {
    val cleaned = params.filterNot(_._1 == k)
    ODataUrl(base, cleaned :+ (k -> v))
  }

  /** $filter merges with AND (parenthesized); others overwrite. */
  def mergeFilter(expr: String): ODataUrl =
    params.find(_._1 == "$filter") match {
      case Some((_, existing)) => withParam("$filter", s"($existing) and ($expr)")
      case None                => withParam("$filter", expr)
    }

  def render: String = {
    if (params.isEmpty) base
    else base + "?" + params.map { case (k, v) =>
      s"${encode(k)}=${encode(v)}"
    }.mkString("&")
  }

  private def encode(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)
      .replace("+", "%20")
      // keep OData tokens readable/expected by servers
      .replace("%24", "$").replace("%2C", ",").replace("%28", "(")
      .replace("%29", ")").replace("%2F", "/").replace("%3D", "=")
}

object ODataUrl {
  /** Parse an URL that may already carry (possibly %24-encoded) options. */
  def parse(url: String): ODataUrl = {
    val qIdx = url.indexOf('?')
    if (qIdx < 0) ODataUrl(url, Seq.empty)
    else {
      val base = url.substring(0, qIdx)
      val params = url.substring(qIdx + 1).split('&').toSeq.filter(_.nonEmpty).map { kv =>
        val eq = kv.indexOf('=')
        val (k, v) = if (eq < 0) (kv, "") else (kv.substring(0, eq), kv.substring(eq + 1))
        val dk = URLDecoder.decode(k, StandardCharsets.UTF_8)
        (dk, URLDecoder.decode(v, StandardCharsets.UTF_8))
      }
      ODataUrl(base, params)
    }
  }
}

/** Spark `sources.Filter` → OData `$filter` compiler — the reference's own
  * relational algebra (SURVEY.md §2.4; `odata_predicate_pushdown_helper.cpp:
  * 697-876`). Filters that cannot be translated are returned as residual and
  * re-evaluated by Spark (partial pushdown, exactly like the reference's
  * skipped-filter path `:747-757`).
  */
object ODataFilterCompiler {

  final case class Compiled(expr: Option[String], residual: Array[Filter], pushed: Array[Filter])

  def compile(filters: Array[Filter], v2: Boolean): Compiled = {
    val results = filters.map(f => f -> translate(f, v2))
    val pushed = results.collect { case (f, Some(_)) => f }
    val residual = results.collect { case (f, None) => f }
    val exprs = results.collect { case (_, Some(e)) => e }
    Compiled(
      if (exprs.isEmpty) None else Some(exprs.map(e => s"($e)").mkString(" and ")),
      residual, pushed)
  }

  /** None = untranslatable → residual. */
  def translate(f: Filter, v2: Boolean): Option[String] = f match {
    case EqualTo(a, v)            => lit(v, v2).map(l => s"$a eq $l")
    case GreaterThan(a, v)        => lit(v, v2).map(l => s"$a gt $l")
    case GreaterThanOrEqual(a, v) => lit(v, v2).map(l => s"$a ge $l")
    case LessThan(a, v)           => lit(v, v2).map(l => s"$a lt $l")
    case LessThanOrEqual(a, v)    => lit(v, v2).map(l => s"$a le $l")
    case Not(EqualTo(a, v))       => lit(v, v2).map(l => s"$a ne $l")
    case IsNull(a)                => Some(s"$a eq null")
    case IsNotNull(a)             => Some(s"$a ne null")
    case And(l, r) =>
      for (le <- translate(l, v2); re <- translate(r, v2)) yield s"($le and $re)"
    case Or(l, r) =>
      for (le <- translate(l, v2); re <- translate(r, v2)) yield s"($le or $re)"
    case Not(inner) => translate(inner, v2).map(e => s"not ($e)")
    case In(a, vs) if vs.nonEmpty && vs.length <= 50 =>
      val lits = vs.toSeq.map(v => lit(v, v2))
      if (lits.forall(_.isDefined))
        Some(lits.flatten.map(l => s"$a eq $l").mkString("(", " or ", ")"))
      else None
    case StringStartsWith(a, v) => Some(s"startswith($a, ${quote(v, v2)})")
    case StringEndsWith(a, v)   => Some(s"endswith($a, ${quote(v, v2)})")
    case StringContains(a, v) =>
      // v2 spells it substringof(needle, haystack); v4 contains(haystack, needle)
      if (v2) Some(s"substringof(${quote(v, v2)}, $a)")
      else Some(s"contains($a, ${quote(v, v2)})")
    case _ => None
  }

  /** Typed literal rendering (reference `:795-822`): strings quoted with ''
    * escaping, numerics bare, booleans lowercase. Empty strings and giant
    * literals are refused → residual (reference `:747-757`). */
  def lit(v: Any, v2: Boolean): Option[String] = v match {
    case null => Some("null")
    case s: String =>
      if (s.isEmpty || s.length > 1000) None else Some(quote(s, v2))
    case s: UTF8StringLike => lit(s.toString, v2)
    case b: Boolean => Some(if (b) "true" else "false")
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) => Some(n.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal => Some(d.underlying.toPlainString)
    case t: java.sql.Timestamp =>
      val iso = t.toInstant.toString
      Some(if (v2) s"datetime'${iso.stripSuffix("Z")}'" else iso)
    case d: java.sql.Date => Some(d.toString)
    case _ => None
  }

  private def quote(s: String, v2: Boolean): String =
    "'" + s.replace("'", "''") + "'"

  // marker trait so we don't link against UTF8String here
  type UTF8StringLike = CharSequence
}
