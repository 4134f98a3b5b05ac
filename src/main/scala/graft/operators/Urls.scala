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
  *  4. tracking query params removed: `utm_*`, `fbclid`, `gclid`,
  *     `msclkid`, `igshid`, `mc_cid`, `mc_eid`;
  *  5. separator debris collapsed (`?&`→`?`, `&&`→`&`, dangling `?`/`&`
  *     stripped), trailing path slashes dropped (`/a/?x`→`/a?x`,
  *     `/a/`→`/a`);
  *  6. a string with no `scheme://` prefix passes through unchanged (not a
  *     URL — the caller's data problem, not silently rewritten).
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
  private val TrackingRe =
    "([?&])(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid)=[^&#]*"

  /** Lowercased scheme; "" when the value is not a `scheme://` URL. */
  def urlScheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))

  /** Lowercased host:port with userinfo dropped; "" for non-URLs. */
  def urlHostPort(u: Column): Column = lower(regexp_extract(u, HostRe, 1))

  /** Lowercased host alone (port dropped). */
  def urlHost(u: Column): Column =
    regexp_replace(urlHostPort(u), ":[0-9]+$", "")

  /** Path + query with the fragment dropped, verbatim case. */
  def urlRest(u: Column): Column = regexp_extract(u, RestRe, 1)

  /** The canonical form (contract in the object doc). */
  def urlNormalize(u: Column): Column = bindOnce(u) { url =>
    bindOnce(urlScheme(url)) { sch =>
      val hp = urlHostPort(url)
      val hpNoDefault = when(sch === "http", regexp_replace(hp, ":80$", ""))
        .when(sch === "https", regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
      val rest = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(regexp_replace(
          urlRest(url),
          TrackingRe, "$1"),     // drop tracking params, keep the separator
          "&&+", "&"),           // collapse runs left by removals
          "\\?&", "?"),          // first removed param owned the '?'
          "/+\\?", "?"),         // trailing path slash before the query
          "[?&]+$", ""),         // dangling separators
          "/+$", "")             // trailing path slashes
      when(sch === "", url)      // not a URL: pass through unchanged
        .otherwise(concat(sch, lit("://"), hpNoDefault, rest))
    }
  }

  /** URL dedup groups: one row per canonical URL —
    * (url_norm, host, keep_id = min id, n_copies). One shuffle. */
  def urlGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.groupBy(urlNormalize(col(urlCol)).as("url_norm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .withColumn("host", regexp_replace(
        regexp_extract(col("url_norm"), HostRe, 1), ":[0-9]+$", ""))
      .select("url_norm", "host", "keep_id", "n_copies")

  /** Survivors of URL dedup: the first (min-id) row per canonical URL,
    * arbitrary payload columns intact (min-id semi-join, like
    * [[Dedup.dedupExact]]). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = df
      .groupBy(urlNormalize(col(urlCol)).as("url_norm"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }
}
