package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web-corpus curation: the primitive behind
 * domain-level dedup, per-domain caps, and crawl-frontier joins. A raw crawl
 * carries the same page under many spellings (case-varied scheme/host,
 * `www.` prefixes, default ports, fragments, tracking parameters, shuffled
 * query order); canonicalizing first makes exact-match dedup catch them.
 *
 * All pure column expressions (parse_url is a codegen'd built-in; the query
 * rewrite is array filter/sort over a handful of params) — one scan, no
 * shuffle, no UDF.
 */
object Urls {

  /** Query parameters that never identify content (click/campaign tracking). */
  val trackingParams: Seq[String] = Seq("utm_", "ref=", "fbclid=", "gclid=", "mc_eid=")

  /**
   * Canonical form: lowercase scheme and host, strip one leading `www.`,
   * drop default ports (80/443 — parse_url's HOST already excludes the port,
   * so a NON-default port is re-attached from a separate extraction), drop
   * the fragment, drop tracking params, sort surviving query params
   * byte-wise. Adds `url_canon` and `domain` (registered domain = last two
   * host labels; a public-suffix list refines this at deployment).
   */
  def canonicalize(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(parse_url(u, lit("PROTOCOL")))
    val host0 = lower(parse_url(u, lit("HOST")))
    val host = regexp_replace(host0, "^www\\.", "")
    // parse_url HOST drops any port; keep explicitly-spelled non-default ones
    val port = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)(?:[/?#]|$)", 1)
    val keepPort = port =!= "" && port =!= "80" && port =!= "443"
    val path = coalesce(parse_url(u, lit("PATH")), lit(""))
    val query = parse_url(u, lit("QUERY"))
    val params = filter(split(query, "&"), p =>
      trackingParams.map(t => p.startsWith(t)).reduce(_ || _).unary_! && (p =!= ""))
    val q = array_join(array_sort(params), "&")
    val canon = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query.isNotNull && q =!= "", concat(lit("?"), q)).otherwise(lit("")))
    df.withColumn("url_canon", canon)
      .withColumn("domain", regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }

  /** Deterministic messy-URL synthesis from the documents table (mirrors
    * Multimodal.syntheticMedia): every component the canonicalizer must
    * normalize is present — case-varied scheme/host, `www.`, the default
    * :443 port, tracking params AND a real param out of sorted order, and a
    * fragment — all derived from (source, doc_id) so the oracle can
    * construct the expected canonical form independently. */
  def syntheticUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(
        lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/p/"),
        col("doc_id"), lit("?utm_source=feed&z="), pmod(col("doc_id"), lit(7)),
        lit("&id="), col("doc_id"), lit("&ref=track#sec"), pmod(col("doc_id"), lit(3))
      ).as("url"))
}
