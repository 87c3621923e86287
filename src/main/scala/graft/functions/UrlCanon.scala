package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen URL canonicalization — the fused form of
  * [[UrlFns.canonicalizeUrl]] / [[UrlFns.registeredDomain]].
  *
  * The composable column version chains split_part / substr / two
  * regexp_replace passes plus an INTERPRETED higher-order filter and
  * an array_sort per row; under CollapseProject those re-evaluate per
  * consumer, and in the full-bench interleave the N-pass regexp
  * execution made q326 the suite's noise magnifier (its per-row string
  * work is legitimate — its magnification of box contention was not:
  * clean ~4.5 s readings swung to 25-53 s under load). This expression
  * walks the URL's chars once per call: fragment cut, scheme/host
  * ASCII-lowercase, default-port strip (80/http, 443/https),
  * ONE-trailing-slash collapse, tracking-param drop (utm_*, fbclid),
  * insertion-sorted param join — allocation per row is the output
  * string plus a small param-bounds array.
  *
  * Semantics are pinned to the staged split_part/substr definitions
  * shared with the DuckDB twin (OraclesData q326) TOKEN-FOR-TOKEN on
  * their quirks: a missing "://" yields scheme=whole/rest="", hostport
  * is everything to the FIRST '/' even when a '?' precedes it, an
  * empty stripped path renders "/", and param order is byte-ascending
  * (= DuckDB list_sort on ASCII). Case folding is ASCII-only ('A'-'Z',
  * the [[ShingleHashes]] contract); non-ASCII hosts should lower()
  * upstream. UrlCanonSpec pins expression≡column-composition on an
  * edge battery.
  *
  * [[UrlDomain]] extracts the registered-domain key (last two dot
  * labels of the canonical host) straight from the RAW url — the
  * canonical host is just the ASCII-lowercased raw host, so this skips
  * re-canonicalizing (and the old regexp_extract) entirely; feeding
  * canon into a second expression would re-run the whole
  * canonicalization per consumer under CollapseProject.
  */
case class UrlCanon(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "url_canonicalize"
}

/** Registered domain (last two dot labels, the `([^.]+\.[^.]+)$` rule)
  * of the canonical host, computed one-pass from the raw url. See
  * [[UrlCanon]].
  */
case class UrlDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.domain(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.domain($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "url_registered_domain"
}

object UrlCanon {

  private def lowerAscii(sb: java.lang.StringBuilder, s: String,
      from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
  }

  /** (schemeEnd, restStart, hostportEnd, hostEnd) over s truncated at
    * `end` (the fragment cut): scheme = [0, schemeEnd) before "://",
    * rest = [restStart, end), hostport = [restStart, hostportEnd)
    * before the first '/', host = [restStart, hostEnd) before the
    * first ':' of hostport. Mirrors the split_part staging including
    * its no-"://" quirk (scheme = whole string, rest empty).
    */
  private def bounds(s: String, end: Int): (Int, Int, Int, Int) = {
    val sep = s.indexOf("://")
    val (schemeEnd, restStart) =
      if (sep >= 0 && sep < end) (sep, sep + 3) else (end, end)
    var i = restStart
    while (i < end && s.charAt(i) != '/') i += 1
    val hostportEnd = i
    var h = restStart
    while (h < hostportEnd && s.charAt(h) != ':') h += 1
    (schemeEnd, restStart, hostportEnd, h)
  }

  def compute(url: UTF8String): UTF8String = {
    val s = url.toString
    val hash = s.indexOf('#')
    val end = if (hash >= 0) hash else s.length
    val (schemeEnd, restStart, hostportEnd, hostEnd) = bounds(s, end)
    val out = new java.lang.StringBuilder(end + 1)
    lowerAscii(out, s, 0, schemeEnd)
    out.append("://")
    lowerAscii(out, s, restStart, hostEnd)
    // default-port strip needs the LOWERCASED scheme for comparison
    val schemeLc = out.substring(0, schemeEnd)
    if (hostEnd < hostportEnd) { // a ':' is present
      val port = s.substring(hostEnd + 1, hostportEnd)
      val isDefault = port.isEmpty ||
        (schemeLc == "https" && port == "443") ||
        (schemeLc == "http" && port == "80")
      if (!isDefault) { out.append(':'); out.append(port) }
    }
    // path = [hostportEnd, pathEnd) before '?', minus ONE trailing '/'
    var q = hostportEnd
    while (q < end && s.charAt(q) != '?') q += 1
    var pathEnd = q
    if (pathEnd > hostportEnd && s.charAt(pathEnd - 1) == '/') pathEnd -= 1
    if (pathEnd == hostportEnd) out.append('/')
    else out.append(s, hostportEnd, pathEnd)
    // query params: [q+1, end) split on '&', drop empty/utm_*/fbclid,
    // byte-ascending sort via insertion over (start, end) bounds —
    // param counts are small (the frontier contract), so O(k²)
    // compares beat any allocation-heavy sort
    if (q < end) {
      val starts = new Array[Int](16); val ends = new Array[Int](16)
      var k = 0
      var ps = q + 1
      var i = ps
      while (i <= end) {
        if (i == end || s.charAt(i) == '&') {
          if (i > ps && !regionStarts(s, ps, i, "utm_") &&
              !regionStarts(s, ps, i, "fbclid")) {
            if (k == starts.length) return computeSlow(s, end) // >16 params
            // insertion: find slot by byte order (ASCII = char order)
            var j = k
            while (j > 0 && compareRegion(s, starts(j - 1), ends(j - 1), ps, i) > 0) {
              starts(j) = starts(j - 1); ends(j) = ends(j - 1); j -= 1
            }
            starts(j) = ps; ends(j) = i; k += 1
          }
          ps = i + 1
        }
        i += 1
      }
      if (k > 0) {
        out.append('?')
        var j = 0
        while (j < k) {
          if (j > 0) out.append('&')
          out.append(s, starts(j), ends(j))
          j += 1
        }
      }
    }
    UTF8String.fromString(out.toString)
  }

  private def regionStarts(s: String, from: Int, until: Int,
      prefix: String): Boolean =
    until - from >= prefix.length &&
      s.regionMatches(from, prefix, 0, prefix.length)

  /** Byte-order compare of two ASCII-delimited regions of s; chars
    * compare as unsigned UTF-16 units, which equals UTF-8 byte order
    * for the ASCII params this operator contracts for.
    */
  private def compareRegion(s: String, as: Int, ae: Int,
      bs: Int, be: Int): Int = {
    var i = as; var j = bs
    while (i < ae && j < be) {
      val d = s.charAt(i) - s.charAt(j)
      if (d != 0) return d
      i += 1; j += 1
    }
    (ae - as) - (be - bs)
  }

  /** Fallback for >16 query params (never hit by the synthetic
    * frontier; kept so the expression stays total): same semantics via
    * collections.
    */
  private def computeSlow(s: String, end: Int): UTF8String = {
    val (schemeEnd, restStart, hostportEnd, hostEnd) = bounds(s, end)
    val out = new java.lang.StringBuilder(end + 1)
    lowerAscii(out, s, 0, schemeEnd)
    out.append("://")
    lowerAscii(out, s, restStart, hostEnd)
    val schemeLc = out.substring(0, schemeEnd)
    if (hostEnd < hostportEnd) {
      val port = s.substring(hostEnd + 1, hostportEnd)
      val isDefault = port.isEmpty ||
        (schemeLc == "https" && port == "443") ||
        (schemeLc == "http" && port == "80")
      if (!isDefault) { out.append(':'); out.append(port) }
    }
    var q = hostportEnd
    while (q < end && s.charAt(q) != '?') q += 1
    var pathEnd = q
    if (pathEnd > hostportEnd && s.charAt(pathEnd - 1) == '/') pathEnd -= 1
    if (pathEnd == hostportEnd) out.append('/')
    else out.append(s, hostportEnd, pathEnd)
    if (q < end) {
      val params = s.substring(q + 1, end).split("&", -1).toSeq
        .filter(p => p.nonEmpty && !p.startsWith("utm_") &&
          !p.startsWith("fbclid"))
        .sortWith { (a, b) =>
          UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
        }
      if (params.nonEmpty) {
        out.append('?')
        out.append(params.mkString("&"))
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** Last two dot labels of the lowercased raw host — identical to
    * regexp_extract(host(canon), "([^.]+\.[^.]+)$", 1) because the
    * canonical host is exactly the ASCII-lowercased raw host. Empty
    * string when the host has no two non-empty trailing labels (the
    * regexp_extract no-match contract).
    */
  def domain(url: UTF8String): UTF8String = {
    val s = url.toString
    val hash = s.indexOf('#')
    val end = if (hash >= 0) hash else s.length
    val (_, restStart, _, hostEnd) = bounds(s, end)
    var lastDot = -1
    var i = restStart
    while (i < hostEnd) { if (s.charAt(i) == '.') lastDot = i; i += 1 }
    if (lastDot < 0 || lastDot == hostEnd - 1) return UTF8String.EMPTY_UTF8
    var prevDot = -1
    i = restStart
    while (i < lastDot) { if (s.charAt(i) == '.') prevDot = i; i += 1 }
    // label between prevDot and lastDot must be non-empty; when no
    // prevDot the label runs from restStart (non-empty iff restStart
    // < lastDot, which holds since lastDot indexes a '.' >= restStart
    // and an empty leading label means lastDot == restStart)
    if (prevDot == lastDot - 1 || lastDot == restStart)
      return UTF8String.EMPTY_UTF8
    val from = if (prevDot >= 0) prevDot + 1 else restStart
    val out = new java.lang.StringBuilder(hostEnd - from)
    lowerAscii(out, s, from, hostEnd)
    UTF8String.fromString(out.toString)
  }

  /** Column-API entry points. */
  def urlCanonical(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(UrlCanon(ColumnBridge.expression(c)))
  }
  def urlDomain(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(UrlDomain(ColumnBridge.expression(c)))
  }
}
