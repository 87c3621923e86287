package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function layer: every reference scalar transform (SURVEY.md §2.8)
  * re-expressed with built-in codegen'd Catalyst expressions — no UDFs in
  * the hot path. Citations are reference file:line.
  */
object Fns {

  /** F1: multi-format datetime parse (reference `transformers.py:8-29`).
    * Tries ISO-8601 with zone, date, year-month, year; null when nothing
    * matches (use [[multiFormatTsStrict]] to raise instead, matching the
    * reference's ValueError).
    */
  def multiFormatTs(c: Column): Column =
    // regex dispatch FIRST (as the reference does): a blind coalesce of
    // try_to_timestamp attempts costs an internal exception per failing
    // format per row — shape-matching picks the right parser directly
    when(c.rlike("^\\d{4}$"), try_to_timestamp(c, lit("yyyy")))
      .when(c.rlike("^\\d{4}-\\d{2}$"), try_to_timestamp(c, lit("yyyy-MM")))
      .when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
        try_to_timestamp(c, lit("yyyy-MM-dd")))
      .otherwise(coalesce(
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXX")), // +0000 / Z
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXX")),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss"))))

  /** F1 error branch: `transformers.py:27-29` raises on unparseable input. */
  def multiFormatTsStrict(c: Column): Column =
    when(c.isNotNull && multiFormatTs(c).isNull,
      raise_error(concat(lit("unparseable datetime: "), c)))
      .otherwise(multiFormatTs(c))

  /** F4: partial-date precision — 366 = year only, 31 = year-month,
    * 1 = full date (reference `transformer_loaders/pure_api_pub.py:48-62`).
    * Input is the raw string; pairs with [[multiFormatTs]] for the value.
    */
  def datePrecision(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}"), lit(1))
      .when(c.rlike("^\\d{4}-\\d{2}$"), lit(31))
      .when(c.rlike("^\\d{4}$"), lit(366))
      .otherwise(lit(null).cast("int"))

  /** F8: locale-filtered text extraction from `text[]{locale,value}` arrays
    * (reference `pure_api_pub.py:263-270`): first en_US match, else first.
    */
  def localeValue(arr: Column, locale: String = "en_US"): Column = coalesce(
    try_element_at(filter(arr, t => t.getField("locale") === locale), lit(1))
      .getField("value"),
    try_element_at(arr, lit(1)).getField("value"))

  /** F8 strict variant matching the transformer loaders'
    * `next((t.value for t in texts if t.locale=='en_US'), None)`:
    * first en_US match, NULL when absent (no first-element fallback).
    */
  def localeValueStrict(arr: Column, locale: String = "en_US"): Column =
    try_element_at(filter(arr, t => t.getField("locale") === locale),
      lit(1)).getField("value")

  /** F5: middle-initial append with whitespace guard
    * (reference `oit_to_edw/person.py:486-491`).
    */
  def firstNameWithMi(firstName: Column, mi: Column): Column =
    when(mi.isNotNull && trim(mi) =!= "", concat_ws(" ", firstName, trim(mi)))
      .otherwise(firstName)

  /** F6: synthetic association id
    * `autoid:{person}-{org}-{desc}-{type}-{yyyy-MM-dd}`
    * (reference `oit_to_edw/person.py:278-284`).
    */
  def autoId(parts: Column*): Column =
    concat(lit("autoid:"), concat_ws("-", parts: _*))

  /** F7: URI tail parsing — last `n` segments of a '/'-separated URI,
    * in reverse order (reference `pure_api_pub.py:185-189`,
    * `pure_api_internal_person.py:30-45`).
    */
  def uriTail(c: Column, n: Int): Column =
    slice(reverse(split(c, "/")), 1, n)

  /** Last segment of a URI. */
  def uriLast(c: Column): Column = element_at(split(c, "/"), -1)

  /** F9: staff-type normalization: strip non-alpha, lowercase
    * (reference `pure_api_internal_person.py:256-263`).
    */
  def normalizeToken(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z]+", ""))

  /** F11: single-digit record-number check
    * (reference `oit_to_edw/person.py:370,432`).
    */
  def isSingleDigit(c: Column): Column = c.rlike("^[0-9]$")

  /** P8 freshness guard: an incoming document is fresh iff no DB row
    * exists or the DB row is strictly older (reference
    * `pure_api_changes.py:49-64`).
    */
  def isFresh(dbModified: Column, modified: Column): Column =
    dbModified.isNull || dbModified < modified

  /** Exact complement of [[isFresh]] under three-valued logic. A doc
    * with a null `modified` against an existing DB row makes both
    * `dbModified < modified` and `dbModified >= modified` NULL, so a
    * naive `>=` skips filter silently drops it — precisely the rows the
    * skip side-channel exists to surface.
    */
  def isNotFresh(dbModified: Column, modified: Column): Column =
    !(isFresh(dbModified, modified) <=> true)

  /** Skip-reason label for the [[isNotFresh]] side-channel. "stale" is
    * a genuinely older document; a null `modified` against an existing
    * DB row is NOT stale — it's a missing/unparseable timestamp, a data
    * quality problem the label must not hide behind a routine skip.
    */
  def staleReason(dbModified: Column, modified: Column): Column =
    when(modified.isNull && dbModified.isNotNull, lit("null_modified"))
      .otherwise(lit("stale"))

  /** F12: stable content-addressed id over identifying fields — the
    * reference sha1s a sorted-key json dump (`exceptions.py:38-43`).
    * Field order is fixed by the caller passing fields alphabetically.
    */
  def stableId(fields: Column*): Column =
    sha1(to_json(struct(fields: _*)))

  /** F15: email synthesis (reference `oit_to_edw/person.py:116`). */
  def umnEmail(internetId: Column): Column =
    when(internetId.isNotNull, concat(internetId, lit("@umn.edu")))

  /** F19: boolean → 'Y'/'N' rendering
    * (reference `pure_api_internal_person.py:267`).
    */
  def ynFlag(b: Column): Column =
    when(b.isNull, lit(null).cast("string"))
      .otherwise(when(b, lit("Y")).otherwise(lit("N")))

  /** Exact-sum helper for oracle parity: double → decimal(18,2) → sum →
    * double. Decimal addition is associative, so the result is identical
    * regardless of partitioning/aggregation order on BOTH Spark and the
    * DuckDB oracle — unlike raw double sums, which drift in the last ulp
    * with operand order. Scale note: at 100 TB this also means partial
    * (map-side) aggregation is safe and deterministic.
    */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Deterministic average via exact decimal sum / count. */
  def exactAvg(c: Column): Column =
    (sum(c.cast("decimal(18,2)")).cast("double") / count(c))

  /** Cosine similarity between two float-array columns, computed with
    * codegen'd higher-order functions (no UDF): dot(a,b)/(|a||b|).
    * Folds run left-to-right on both Spark and DuckDB's list functions,
    * but for oracle parity callers should round the result.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }
}
