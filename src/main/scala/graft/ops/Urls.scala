package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization and domain filtering — the provenance leg of a
  * web-corpus pipeline: canonicalize each document's source URL so
  * syntactic variants collapse to one key (the first-stage dedup of
  * every crawl pipeline), extract host/registrable-domain for
  * per-site statistics, and drop documents from blocklisted domains.
  *
  * All pure regex/array column expressions (RE2-and-Java common
  * subset, so the same patterns mirror in the DuckDB oracle, q131) —
  * narrow per-row projections that ride the scan; the blocklist
  * filter is a broadcast semi/anti join on the domain key. Nothing
  * here shuffles the corpus.
  *
  * Canonicalization contract (documented, deterministic):
  *   - scheme and host lowercased
  *   - default ports dropped (:80 for http, :443 for https); other
  *     ports kept
  *   - empty path becomes "/"
  *   - tracking parameters removed (utm_*, gclid, fbclid), remaining
  *     query parameters kept IN ORIGINAL ORDER (no reordering — key
  *     order can be semantic); an emptied query drops its "?"
  *   - fragment dropped
  * Registrable domain is the naive last-two-labels form (no public
  * suffix list in this sandbox — swap point documented on
  * [[registrableDomain]]).
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"
  private val PortRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
  private val QueryRe = "\\?([^#]*)"
  private val TrackerRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid)="

  def urlScheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  def urlHost(url: Column): Column = lower(regexp_extract(url, HostRe, 1))

  /** Explicit port digits, or "" when none is present. */
  def urlPort(url: Column): Column = regexp_extract(url, PortRe, 1)

  def urlPath(url: Column): Column = regexp_extract(url, PathRe, 1)

  /** Raw query string (no "?"), or "" when absent. */
  def urlQuery(url: Column): Column = regexp_extract(url, QueryRe, 1)

  /** Query string with tracking parameters removed, original order
    * kept; "" when nothing survives. */
  def cleanQuery(url: Column): Column =
    array_join(
      filter(split(urlQuery(url), "&"),
        p => p =!= "" && !p.rlike(TrackerRe)),
      "&")

  /** The canonical form per the contract in the object doc. Rows that
    * do not parse as scheme://host... canonicalize to NULL (scheme or
    * host extract comes back empty) so malformed URLs are visible, not
    * silently passed through. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val host = urlHost(url)
    val port = urlPort(url)
    val keepPort = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path = when(urlPath(url) === "", "/").otherwise(urlPath(url))
    val q = cleanQuery(url)
    val query = when(q === "", "").otherwise(concat(lit("?"), q))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, keepPort, path, query))
  }

  /** Naive registrable domain: the last two dot-labels of the host
    * (example.com from www.example.com). A production deployment
    * swaps in a public-suffix-list match here — same column-in,
    * column-out contract, so callers are unaffected. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)

  /** First-stage crawl dedup: one representative (min id) per
    * CANONICAL URL, with the collapse size kept for audit. Rows whose
    * URL does not canonicalize (NULL key — no provenance to compare
    * on) all survive with n_dups = 1 rather than collapsing into one
    * NULL group. One hash aggregation on the canonical key — the
    * cheapest dedup a web corpus gets, run before any content pass.
    * Output: idCol, canon_url, n_dups. */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String,
      urlCol: String): DataFrame = {
    val c = df.select(col(idCol),
      canonicalizeUrl(col(urlCol)).as("canon_url"))
    val reps = c.where(col("canon_url").isNotNull)
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
    val unparseable = c.where(col("canon_url").isNull)
      .withColumn("n_dups", lit(1L))
    reps.select(col(idCol), col("canon_url"), col("n_dups"))
      .unionByName(
        unparseable.select(col(idCol), col("canon_url"), col("n_dups")))
  }

  /** Drop rows whose URL's registrable domain is on the blocklist.
    * The blocklist (bounded: a curated list, not data) broadcasts;
    * the corpus anti-joins without shuffling. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bl = blocked.map(_.toLowerCase).toDF("__blocked_domain")
    df.join(broadcast(bl),
        registrableDomain(urlHost(col(urlCol))) === col("__blocked_domain"),
        "left_anti")
  }
}
