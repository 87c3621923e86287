package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first operator of a web-crawl curation
  * pipeline (the dedup key for billions of raw frontier URLs). Pure
  * column expressions (codegen'd string ops + one bounded array sort;
  * no UDF, no shuffle): canonical form is
  * lowercase(scheme) "://" lowercase(host) [":" port if non-default]
  * path-sans-ONE-trailing-slash ["?" sorted non-tracking params].
  * Fragments and tracking params (utm_*, fbclid) are dropped; default
  * ports (80 for http, 443 for https) are stripped. Mirrors the DuckDB
  * twin in OraclesData token-for-token (split_part / regexp both
  * dialect-shared).
  */
object UrlFns {

  def canonicalizeUrl(u: Column): Column = {
    val nofrag = split_part(u, lit("#"), lit(1))
    val scheme = lower(split_part(nofrag, lit("://"), lit(1)))
    val rest = nofrag.substr(length(scheme) + lit(4), length(nofrag))
    val hostport = split_part(rest, lit("/"), lit(1))
    val pathq = rest.substr(length(hostport) + lit(1), length(rest))
    val host = lower(split_part(hostport, lit(":"), lit(1)))
    val port = split_part(hostport, lit(":"), lit(2))
    val portCanon = when(port === "" ||
      (scheme === "https" && port === "443") ||
      (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = split_part(pathq, lit("?"), lit(1))
    val qs = when(length(pathq) > length(path0),
      pathq.substr(length(path0) + lit(2), length(pathq)))
      .otherwise(lit(""))
    val pathCanon = when(regexp_replace(path0, "/$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/$", ""))
    // join FIRST so the (interpreted) filter lambda has one consumer
    val qJoined = array_join(array_sort(filter(split(qs, "&"),
      p => !p.startsWith("utm_") && !p.startsWith("fbclid") &&
        p =!= "")), "&")
    val qCanon = when(qJoined === "", lit(""))
      .otherwise(concat(lit("?"), qJoined))
    concat(scheme, lit("://"), host, portCanon, pathCanon, qCanon)
  }

  /** Last two dot-labels of the canonical URL's host — the
    * registered-domain grouping key (a public-suffix list refines this
    * in production; two labels is the synthetic-host contract here).
    */
  def registeredDomain(canonUrl: Column): Column = {
    val host = split_part(split_part(canonUrl, lit("://"), lit(2)),
      lit("/"), lit(1))
    regexp_extract(split_part(host, lit(":"), lit(1)),
      "([^.]+\\.[^.]+)$", 1)
  }
}
