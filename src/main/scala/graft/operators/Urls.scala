package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed deduplication — the first dedup tier of
  * the published web-corpus recipes (C4 dedups by URL before any content
  * tier; crawl frontiers key on the canonical form). Beyond-reference
  * training-pipeline tier; no counterpart in the reference.
  *
  * Everything is a codegen'd expression over the engine-shared regex subset
  * (no lookarounds — DuckDB's RE2 lacks them; no backreferences in
  * patterns), so the p35 gate query hash-compares against DuckDB running
  * the identical transform chain.
  *
  * Canonical form (documented contract, applied in order):
  *  1. fragment (`#...`) and userinfo (`user:pass@`) dropped;
  *  2. scheme and host:port lowercased (path/query case preserved — paths
  *     are case-sensitive);
  *  3. scheme-default ports dropped (`http…:80`, `https…:443`); any other
  *     port kept;
  *  4. tracking query params removed — `utm_*`, `fbclid`, `gclid`,
  *     `msclkid`, `igshid`, `mc_cid`, `mc_eid` — recognized only at real
  *     separators (query start or `&`), never inside parameter values;
  *  5. trailing PATH slashes dropped (`/a/?x`→`/a?x`, `/a/`→`/a`) and
  *     query separator debris healed (`&&`→`&`, leading/trailing `&`, a
  *     now-empty query loses its `?`) — each on its own side of the first
  *     `?`, so `/`, `?`, `&` inside parameter values are untouched;
  *  6. a string with no `scheme://` prefix passes through unchanged (not a
  *     URL — the caller's data problem, not silently rewritten), and such
  *     rows (incl. NULL/empty) are NEVER dedup keys: [[dedupByUrl]] and the
  *     streaming twin keep them unconditionally, [[urlGroups]] excludes
  *     them — otherwise every URL-less document in the corpus would share
  *     one group and collapse to a single arbitrary survivor.
  *
  * Idempotent: normalize(normalize(u)) == normalize(u) (spec-checked).
  *
  * Scale shape: canonicalization is map-only; [[urlGroups]] is ONE
  * hash-shuffle on the canonical URL with partial aggregation (the same
  * shape as exact text dedup — at 100 TB the shuffle ships one short
  * string + two longs per distinct URL per map task).
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]*)"
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
  /** Tracking params are recognized only at a REAL separator (start of the
    * query or `&`) — a literal `?utm_…` embedded in a parameter VALUE (e.g.
    * `?next=/x?utm_source=f`) is data, not a parameter, and stays. */
  private val TrackingRe =
    "(^|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid)=[^&]*"

  /** Lowercased scheme; "" when the value is not a `scheme://` URL. */
  def urlScheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))

  /** Lowercased host:port with userinfo dropped; "" for non-URLs. */
  def urlHostPort(u: Column): Column = lower(regexp_extract(u, HostRe, 1))

  /** Lowercased host alone (port dropped). */
  def urlHost(u: Column): Column =
    regexp_replace(urlHostPort(u), ":[0-9]+$", "")

  /** Path + query with the fragment dropped, verbatim case. */
  def urlRest(u: Column): Column = regexp_extract(u, RestRe, 1)

  /** The canonical form (contract in the object doc). The path and the
    * query are split at the FIRST `?` and healed separately — the earlier
    * single-string chain rewrote `/`/`?`/`&` sequences INSIDE parameter
    * values (`?q=a/?b`, `?next=/home/`), collapsing genuinely distinct
    * URLs. Within the query, only `^` and `&` are separators. Plain scalar
    * expressions throughout (no HOFs): the whole projection stays inside
    * whole-stage codegen, and repeated subtrees (scheme, host:port) are
    * eliminated by codegen subexpression elimination. */
  def urlNormalize(u: Column): Column = {
    val sch = urlScheme(u)
    val hp = urlHostPort(u)
    val hpNoDefault = when(sch === "http", regexp_replace(hp, ":80$", ""))
      .when(sch === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val rest = urlRest(u)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_replace(regexp_replace(regexp_replace(
      regexp_extract(rest, "^[^?]*\\?(.*)$", 1),
      TrackingRe, "$1"),         // drop tracking params at real separators
      "&&+", "&"),               // collapse runs left by removals
      "^&+|&+$", "")             // leading/trailing separator debris
    when(sch === "", u)          // not a URL: pass through unchanged
      .otherwise(concat(sch, lit("://"), hpNoDefault, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** True when the value parses as a `scheme://` URL (false for NULL). */
  def isUrl(u: Column): Column = coalesce(urlScheme(u) =!= "", lit(false))

  /** URL dedup groups among parseable URLs: one row per canonical URL —
    * (url_norm, host, keep_id = min id, n_copies). One shuffle. Rows
    * without a parseable URL form no group (object doc, rule 6). */
  def urlGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.filter(isUrl(col(urlCol)))
      .groupBy(urlNormalize(col(urlCol)).as("url_norm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .withColumn("host", urlHost(col("url_norm")))
      .select("url_norm", "host", "keep_id", "n_copies")

  /** Survivors of URL dedup: the first (min-id) row per canonical URL,
    * arbitrary payload columns intact (min-id semi-join, like
    * [[Dedup.dedupExact]]); rows without a parseable URL are kept
    * unconditionally — an absent URL is no evidence of duplication. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    // keep-set from urlGroups so the group definition lives in ONE place
    // (mirrors Dedup.dedupExact over exactGroups; unused columns are pruned).
    // One left join instead of a union of two filtered scans: df is read
    // twice total (keep-set agg + this pass), same as the pre-contract
    // shape — a row survives when it has no parseable URL OR won its group.
    val keep = urlGroups(df, idCol, urlCol)
      .select(col("keep_id").as(idCol)).withColumn("__graft_keep", lit(1))
    df.join(keep, Seq(idCol), "left")
      .filter(!isUrl(col(urlCol)) || col("__graft_keep").isNotNull)
      .drop("__graft_keep")
  }
}
