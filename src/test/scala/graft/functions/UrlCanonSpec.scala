package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Pins the one-pass codegen [[UrlCanon]]/[[UrlDomain]] expressions to
  * the composable [[UrlFns]] column chain (the form the DuckDB twin
  * restates stage-for-stage) — the fused expression is only allowed to
  * be FASTER, never different. The battery covers every staged quirk:
  * missing "://", '?' before any '/', multiple '?', trailing '.',
  * empty labels, double slashes, >16 params (the slow-path boundary),
  * url-embedded second scheme, and the synthetic-frontier shapes q326
  * actually feeds it.
  */
class UrlCanonSpec extends AnyFunSuite {
  import spark.implicits._

  private val urls = Seq(
    // frontier shapes (the q326 derivation's cross product, sampled)
    "HTTPS://WWW.Shop7.COM:443/item/3?utm_source=news&id=42&ref=3",
    "https://www.SHOP12.com/item/24/?ref=6&id=99&utm_campaign=spring",
    "Https://WWW.Shop0.com:8080/item/0?id=0&ref=0",
    "https://www.SHOP39.COM/item/7?id=81&ref=2#section-2",
    "http://www.shop1.com:80/item/1?id=1&ref=1",
    // staged-definition quirks
    "no-scheme-at-all",
    "",
    "http://host?x=1",                       // '?' before any '/'
    "https://a.b/p?u=http://x.y&a=1",        // embedded second scheme
    "https://a.b/p?x=1?y=2&z=3",             // second '?' inside a param
    "https://trail.dot./p",                  // trailing dot host
    "https://.com/p",                        // empty leading label
    "https://a..com/p",                      // empty middle label
    "https://single/p",                      // no dot in host
    "https://a.b.c.d:9090//double//slash//", // deep path, double slashes
    "https://a.b/",                          // bare slash path
    "https://a.b",                           // no path at all
    "https://a.b/p?",                        // empty query
    "https://a.b/p?&&",                      // only empty params
    "https://a.b/p?utm_x=1&fbclid=2&utm_=3", // all tracking
    "https://a.b/p?" + (1 to 20).map(i => s"p$i=$i").mkString("&"),
    "HTTP://UPPER.HOST.ORG:8081/Mixed/Case/Path?B=2&A=1&b=0#frag")

  test("fused expression matches the composable column chain on the edge battery") {
    val df = urls.toDF("url")
      .select(col("url"),
        UrlCanon.urlCanonical(col("url")).as("fast"),
        UrlFns.canonicalizeUrl(col("url")).as("slow"))
      .withColumn("fastDom", UrlCanon.urlDomain(col("url")))
      .withColumn("slowDom", UrlFns.registeredDomain(col("slow")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"canon mismatch for '${r.getString(0)}': " +
          s"fast='${r.getString(1)}' slow='${r.getString(2)}'")
      assert(r.getString(3) == r.getString(4),
        s"domain mismatch for '${r.getString(0)}': " +
          s"fast='${r.getString(3)}' slow='${r.getString(4)}'")
    }
  }

  test("null propagates; exact canonical forms pinned") {
    val one = Seq[(String, String)](("a", null)).toDF("k", "url")
      .select(UrlCanon.urlCanonical(col("url")).as("c"),
        UrlCanon.urlDomain(col("url")).as("d"))
      .collect().head
    assert(one.isNullAt(0) && one.isNullAt(1))
    val got = Seq("HTTPS://WWW.Shop7.COM:443/item/3/?utm_source=x&id=42&ref=3#f")
      .toDF("url")
      .select(UrlCanon.urlCanonical(col("url")).as("c"),
        UrlCanon.urlDomain(col("url")).as("d"))
      .as[(String, String)].collect().head
    assert(got._1 == "https://www.shop7.com/item/3?id=42&ref=3")
    assert(got._2 == "shop7.com")
  }
}
