package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Round-16 wave 5 (q326–q332): the arithmetic of each query pinned
  * INDEPENDENTLY of the DuckDB gate — plain-Scala/BigInt re-folds over
  * the collected sf0.001 facts, coded from the metric definitions (not
  * from the query plans), so a formula error both engines share still
  * fails here. Same contract as [[Round16EvalSpec]].
  */
class Round16DataSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---------------------------------------------------------------
  // q326: an independent JVM URL canonicalizer (java.net-free string
  // code, NOT the Column expression) applied to the same derivation.
  // ---------------------------------------------------------------

  private def deriveUrl(ok: Long, ck: Long): String = {
    val scheme = (ok % 3) match {
      case 0 => "HTTPS"; case 1 => "https"; case _ => "Https" }
    val host = (if (ck % 2 == 0) "WWW.Shop" else "www.SHOP") +
      (ck % 40) + (if (ok % 2 == 0) ".COM" else ".com")
    val port =
      if (ok % 16 == 0) ":8080" else if (ok % 4 == 1) ":443" else ""
    val path = "/item/" + (ck % 25) + (if (ok % 5 == 0) "/" else "")
    val qs = (ok % 3) match {
      case 0 => s"?utm_source=news&id=${ck % 100}&ref=${ck % 7}"
      case 1 => s"?ref=${ck % 7}&id=${ck % 100}&utm_campaign=spring"
      case _ => s"?id=${ck % 100}&ref=${ck % 7}"
    }
    val frag = if (ok % 6 == 0) "#section-2" else ""
    s"$scheme://$host$port$path$qs$frag"
  }

  private def canonScala(u: String): String = {
    val nofrag = u.takeWhile(_ != '#')
    val schemeEnd = nofrag.indexOf("://")
    val scheme = nofrag.substring(0, schemeEnd).toLowerCase
    val rest = nofrag.substring(schemeEnd + 3)
    val slash = rest.indexOf('/')
    val hostport = if (slash < 0) rest else rest.substring(0, slash)
    val pathq = if (slash < 0) "" else rest.substring(slash)
    val (host, port) = hostport.split(":", 2) match {
      case Array(h, p) => (h.toLowerCase, p)
      case Array(h) => (h.toLowerCase, "")
    }
    val portC =
      if (port.isEmpty || (scheme == "https" && port == "443") ||
        (scheme == "http" && port == "80")) "" else ":" + port
    val qm = pathq.indexOf('?')
    val path0 = if (qm < 0) pathq else pathq.substring(0, qm)
    val qs = if (qm < 0) "" else pathq.substring(qm + 1)
    val pathC = {
      val stripped = path0.replaceAll("/$", "")
      if (stripped.isEmpty) "/" else stripped
    }
    val params = qs.split("&").filter(p =>
      p.nonEmpty && !p.startsWith("utm_") && !p.startsWith("fbclid"))
      .sorted
    val qC = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$host$portC$pathC$qC"
  }

  test("q326 matches an independent Scala canonicalizer") {
    val keys = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = keys.map { case (ok, ck) =>
      val raw = deriveUrl(ok, ck)
      val canon = canonScala(raw)
      val host = canon.drop(canon.indexOf("://") + 3).takeWhile(_ != '/')
        .takeWhile(_ != ':')
      val domain = host.split('.').takeRight(2).mkString(".")
      (domain, raw, canon)
    }
    val want = rows.groupBy(_._1).map { case (d, xs) =>
      val nRaw = xs.map(_._2).distinct.length.toLong
      val nCan = xs.map(_._3).distinct.length.toLong
      d -> ((xs.length.toLong, nRaw, nCan,
        (BigInt(nRaw - nCan) * 1000000 / nRaw).toLong, xs.map(_._3).min))
    }
    val got = QueriesData.q326UrlCanonicalize(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got.keySet == want.keySet)
    for ((d, w) <- want) assert(got(d) == w, s"domain $d: ${got(d)} != $w")
    // the canonicalizer must actually collapse something
    assert(want.values.exists(v => v._2 > v._3))
  }

  test("q326 canonicalizer properties: idempotent, case/port/param-order invariant") {
    val variants = Seq(
      "HTTPS://WWW.Example.COM:443/a/b?z=1&utm_source=x&a=2#frag",
      "https://www.example.com/a/b?a=2&z=1",
      "https://www.EXAMPLE.com:443/a/b?utm_campaign=c&z=1&a=2")
    val canons = variants.map(canonScala)
    assert(canons.distinct.size == 1)
    assert(canons.head == "https://www.example.com/a/b?a=2&z=1")
    assert(canonScala(canons.head) == canons.head) // idempotent
    assert(canonScala("http://Host.com:8080/x/") == "http://host.com:8080/x")
    assert(canonScala("http://h.com:80/?utm_source=1") == "http://h.com/")
  }

  // ---------------------------------------------------------------
  // q327 / q330 document base
  // ---------------------------------------------------------------

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "source", "n_chars", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

  test("q327 matches a BigInt CDF-distance re-fold") {
    val mn = docs.map(_._3).min; val mx = docs.map(_._3).max
    val nTot = docs.length.toLong
    def bin(c: Long): Long = math.min(19L, (c - mn) * 20 / (mx - mn + 1))
    val corp = (0L to 19L).map(i =>
      i -> docs.count(d => bin(d._3) <= i).toLong).toMap
    val want = docs.groupBy(_._2).map { case (src, xs) =>
      val nS = xs.length.toLong
      val ds = (0L to 19L).map { i =>
        val cumS = xs.count(d => bin(d._3) <= i).toLong
        (BigInt(cumS) * nTot - BigInt(corp(i)) * nS).abs
      }
      src -> ((nS, (ds.sum * 1000000 / (BigInt(nS) * nTot * 20)).toLong,
        (ds.max * 1000000 / (BigInt(nS) * nTot)).toLong))
    }
    val got = QueriesData.q327WassersteinDrift(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((s, w) <- want) assert(got(s) == w, s"source $s: ${got(s)} != $w")
  }

  // ---------------------------------------------------------------
  // q328 / q329 / q332 lineitem facts
  // ---------------------------------------------------------------

  private lazy val liQ = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_suppkey", "l_quantity", "l_returnflag",
      "l_extendedprice").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toLong,
      r.getString(3), r.getDouble(4)))

  private lazy val orderPrio = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderpriority").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("q328 matches a direct midrank re-fold (true midranks, not the grid)") {
    val vals = liQ.map(v => (orderPrio(v._1), v._3))
    val n = vals.length.toLong
    // true midranks computed the classical way: sort, average tied ranks
    val byQ = vals.map(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val sortedQ = byQ.keys.toSeq.sorted
    val below = sortedQ.scanLeft(0L)((acc, q) => acc + byQ(q))
      .zip(sortedQ).map { case (b, q) => q -> b }.toMap
    // 2×midrank of value q = 2·below + ties + 1 (integer)
    val perGroup = vals.groupBy(_._1).map { case (prio, xs) =>
      val nj = xs.length.toLong
      val sj = xs.map { case (_, q) =>
        BigInt(2 * below(q) + byQ(q) + 1) }.sum
      (prio, nj, sj)
    }
    val u = perGroup.map { case (_, nj, sj) =>
      val mr = sj * 1000 / nj
      mr * mr * nj
    }.sum
    val hPpm = (3 * u / (BigInt(n) * (n + 1)) -
      3 * (BigInt(n) + 1) * 1000000).toLong
    val tt = byQ.values.map(t => BigInt(t) * t * t - t).sum
    val hTie = (BigInt(hPpm) * (BigInt(n) * n * n - n) /
      (BigInt(n) * n * n - n - tt)).toLong
    val got = QueriesData.q328KruskalWallis(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((prio, nj, sj) <- perGroup) {
      val w = (nj, (sj * 1000 / (2 * nj)).toLong, hPpm, hTie)
      assert(got(prio) == w, s"$prio: ${got(prio)} != $w")
    }
    // sanity: the midrank identity Σ S_j = 2·N(N+1)/2·... = 2·Σranks
    assert(perGroup.map(_._3).sum == BigInt(n) * (n + 1))
  }

  private lazy val suppNation = {
    val sn = Tables.supplier(spark, sf)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nn = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    sn.view.mapValues(nn).toMap
  }

  test("q329 matches a brute-force pairwise dominance re-fold") {
    val rows = liQ.map(v => (suppNation(v._2), v._3, v._4 == "R"))
    val want = rows.groupBy(_._1).map { case (nat, xs) =>
      val r = xs.filter(_._3).map(_._2)
      val o = xs.filterNot(_._3).map(_._2)
      var gt = BigInt(0); var lt = BigInt(0)
      for (a <- r; b <- o) {
        if (a > b) gt += 1 else if (a < b) lt += 1
      }
      val den = BigInt(r.length) * o.length
      val mag =
        if ((gt - lt).abs * 1000 < den * 147) "negligible"
        else if ((gt - lt).abs * 100 < den * 33) "small"
        else if ((gt - lt).abs * 1000 < den * 474) "medium"
        else "large"
      nat -> ((r.length.toLong, o.length.toLong,
        ((gt - lt) * 1000000 / den).toLong, mag))
    }
    val got = QueriesData.q329CliffsDelta(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((nat, w) <- want) assert(got(nat) == w, s"$nat: ${got(nat)} != $w")
  }

  test("q332 matches a BigInt sufficient-statistic re-fold") {
    val xs = liQ.map(v => (orderPrio(v._1), math.floor(v._5).toLong))
    val pg = xs.groupBy(_._1).map { case (prio, vs) =>
      (prio, vs.length.toLong, vs.map(v => BigInt(v._2)).sum,
        vs.map(v => BigInt(v._2) * v._2).sum)
    }
    val k = pg.size.toLong; val n = pg.map(_._2).sum
    val st = pg.map(_._3).sum; val sst = pg.map(_._4).sum
    val u = pg.map { case (_, nj, sj, _) => sj * sj / nj }.sum
    val ssb = u - st * st / n
    val ssw = sst - u
    val f = (ssb * (n - k) * 1000 / (ssw * (k - 1))).toLong
    val eta = (ssb * 1000000 / (ssb + ssw)).toLong
    val got = QueriesData.q332AnovaF(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    for ((prio, nj, sj, _) <- pg) {
      val w = (nj, (sj * 1000 / nj).toLong, k - 1, n - k, f, eta)
      assert(got(prio) == w, s"$prio: ${got(prio)} != $w")
    }
    assert(ssb > 0 && ssw > 0) // decomposition is non-degenerate
  }

  // ---------------------------------------------------------------
  // q330: independent CDC implementation (imperative per-doc loop)
  // ---------------------------------------------------------------

  test("q330 matches an imperative per-document CDC re-fold") {
    val perDoc = docs.map { case (_, src, _, text) =>
      val toks = text.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").filter(_.nonEmpty)
      // boundary AFTER token i (1-based) when md5 of the 4-token
      // window ending at i has hash % 16 == 0
      val bounds = (4 to toks.length).filter { i =>
        val g = toks.slice(i - 4, i).mkString(" ")
        java.lang.Long.parseLong(md5Hex(g).take(8), 16) % 16 == 0
      }.toSet
      // chunk id of token i = boundaries strictly before i
      val chunks = toks.zipWithIndex.groupBy { case (_, i0) =>
        (1 to i0).count(bounds.contains) // positions 1..i-1 (1-based i = i0+1)
      }.toSeq.map { case (_, ts) =>
        val s = ts.sortBy(_._2).map(_._1).mkString(" ")
        (md5Hex(s), ts.length.toLong)
      }
      (src, chunks)
    }
    val want = perDoc.groupBy(_._1).map { case (src, ds) =>
      val all = ds.flatMap(_._2)
      val nC = all.length.toLong
      val nD = all.map(_._1).distinct.length.toLong
      val nT = all.map(_._2).sum
      src -> ((nC, nD, (BigInt(nC - nD) * 1000000 / nC).toLong,
        (BigInt(nT) * 1000 / nC).toLong))
    }
    val got = QueriesData.q330CdcChunks(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((s, w) <- want) assert(got(s) == w, s"source $s: ${got(s)} != $w")
  }

  // ---------------------------------------------------------------
  // q333: independent Misra-Gries stream simulation (the exact
  // 3-slice replay, per-shard MG(56) with sorted batched folds),
  // then the q112 coverage contract: result == exact top-20 and the
  // simulated candidate union covers it, with pruning forced.
  // ---------------------------------------------------------------

  test("q333 equals the exact top-20 and an MG stream simulation covers it") {
    // sf0.01: at sf0.001 a shard sees fewer distinct items than
    // counters and the MG state never decrements — this test wants
    // the pruning regime (all 65 items per shard, k = 56)
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def item(u: Long, t: String) = s"$t:${u % 13}"
    val k = 56
    var state = Map.empty[Int, Map[String, Long]]
    var seen = Map.empty[Int, Set[String]].withDefaultValue(Set.empty)
    for (r <- 0 to 2) {
      val slice = ev.filter(e => math.floorMod(e._1, 3L) == r)
      for ((shard, rows) <- slice.groupBy(e => (e._2 % 8).toInt)) {
        var mg = state.getOrElse(shard, Map.empty[String, Long])
        val batch = rows.map(e => item(e._2, e._3)).groupBy(identity)
          .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        seen += shard -> (seen(shard) ++ batch.map(_._1))
        for ((it, c) <- batch) {
          mg = mg.updated(it, mg.getOrElse(it, 0L) + c)
          if (mg.size > k) {
            val dec = mg.valuesIterator.min
            mg = mg.collect { case (i, v) if v > dec => i -> (v - dec) }
          }
        }
        state += shard -> mg
      }
    }
    val cands = state.values.flatMap(_.keys).toSet
    val exact = ev.groupBy(e => item(e._2, e._3)).view
      .mapValues(_.length.toLong).toSeq
    val top20 = exact.sortBy { case (i, n) => (-n, i) }.take(20)
    assert(top20.forall { case (i, _) => cands.contains(i) },
      "MG candidate union must cover the exact top-20")
    assert(state.exists { case (sh, mg) => seen(sh).size > k },
      "pruning must be forced (a shard saw more items than counters)")
    val got = QueriesStats
      .q333StreamHeavyHitters(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == top20, s"got $got\nwant $top20")
  }

  // ---------------------------------------------------------------
  // q334: BigInt permutation p-values + an independent BH step-up
  // ---------------------------------------------------------------

  test("q334 matches a BigInt permutation + BH re-fold") {
    val custNation = {
      val cn = Tables.customer(spark, sf)
        .select("c_custkey", "c_nationkey").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val nn = Tables.nation(spark, sf)
        .select("n_nationkey", "n_name").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      cn.view.mapValues(nn).toMap
    }
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
      .collect()
      .map(r => (custNation(r.getLong(1)), r.getLong(0),
        r.getString(2) < "3",
        BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
    def split(b: Int, ok: Long): Boolean =
      java.lang.Long.parseLong(md5Hex(s"bh:$b:$ok").take(8), 16) % 5 < 2
    val pv = orders.groupBy(_._1).map { case (nation, xs) =>
      def stat(assign: ((String, Long, Boolean, Long)) => Boolean)
          : (BigInt, Long, Long) = {
        val (t, c) = xs.partition(assign)
        (BigInt(t.map(_._4).sum) * 1000000 / t.length -
          BigInt(c.map(_._4).sum) * 1000000 / c.length,
          t.length.toLong, c.length.toLong)
      }
      val (obs, nt, nc) = stat(_._3)
      val extreme = (1 to 32).count { b =>
        stat(o => split(b, o._2))._1.abs >= obs.abs
      }
      nation -> ((nt, nc, obs.toLong,
        (BigInt(1 + extreme) * 1000000 / 33).toLong))
    }
    val ranks = pv.toSeq.sortBy { case (n, (_, _, _, p)) => (p, n) }
      .zipWithIndex.map { case ((n, v), i) => n -> (v, i + 1L) }.toMap
    val m = ranks.size
    val cut = ranks.values
      .collect { case ((_, _, _, p), r) if BigInt(p) * m <= r * 100000L => r }
      .foldLeft(0L)(math.max)
    val got = QueriesData.q334BhFdr(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))).toMap
    assert(got.keySet == ranks.keySet)
    for ((n, ((nt, nc, obs, p), rk)) <- ranks) {
      val w = (nt, nc, obs, p, rk, rk * 100000 / m, rk <= cut)
      assert(got(n) == w, s"$n: ${got(n)} != $w")
    }
    // ranks are a permutation of 1..m (the triangle join got ties right)
    assert(got.values.map(_._5).toSeq.sorted == (1L to m.toLong))
  }

  // ---------------------------------------------------------------
  // q335: integer zone/predicate re-fold + the advisor's point
  // ---------------------------------------------------------------

  test("q335 matches an integer zone-map re-fold; matched layouts prune") {
    val li = Tables.lineitem(spark, sf)
      .select("l_shipdate", "l_orderkey", "l_partkey").collect()
      .map { r =>
        val d = r.getAs[java.time.LocalDateTime](0).toLocalDate
        (java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1992, 1, 1), d),
          r.getLong(1), r.getLong(2))
      }
    def mnmx(v: Seq[Long]) = (v.min, v.max)
    val (sdMn, sdMx) = mnmx(li.map(_._1)); val (okMn, okMx) = mnmx(li.map(_._2))
    val (pkMn, pkMx) = mnmx(li.map(_._3))
    def zone(v: Long, mn: Long, mx: Long) =
      math.min(63L, (v - mn) * 64 / (mx - mn + 1))
    val layouts = Seq[(String, ((Long, Long, Long)) => Long)](
      ("by_shipday", t => zone(t._1, sdMn, sdMx)),
      ("by_orderkey", t => zone(t._2, okMn, okMx)),
      ("by_partkey", t => zone(t._3, pkMn, pkMx)))
    val zones = layouts.flatMap { case (name, zf) =>
      li.groupBy(zf).map { case (z, xs) =>
        (name, z, xs.map(_._1).min, xs.map(_._1).max,
          xs.map(_._3).min, xs.map(_._3).max)
      }
    }
    val preds =
      (0 until 16).map(i => ("ship_windows",
        sdMn + (sdMx - sdMn + 1) * i / 32,
        sdMn + (sdMx - sdMn + 1) * (i + 2) / 32 - 1)) ++
      (0 until 16).map(i => ("partkey_ranges",
        pkMn + (pkMx - pkMn + 1) * i / 32,
        pkMn + (pkMx - pkMn + 1) * (i + 2) / 32 - 1))
    val want = (for {
      (layout, fam) <- layouts.map(_._1)
        .flatMap(l => Seq((l, "ship_windows"), (l, "partkey_ranges")))
    } yield {
      val zs = zones.filter(_._1 == layout)
      val scanned = preds.filter(_._1 == fam).map { case (_, lo, hi) =>
        zs.count { case (_, _, sdLo, sdHi, pkLo, pkHi) =>
          if (fam == "ship_windows") sdLo <= hi && sdHi >= lo
          else pkLo <= hi && pkHi >= lo
        }.toLong
      }.sum
      (layout, fam) -> ((zs.length.toLong, scanned,
        (BigInt(scanned) * 1000000 / (zs.length * 16)).toLong))
    }).toMap
    val got = QueriesData.q335ZonemapAdvisor(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // the advisor's point: the matched layout prunes hard, the
    // mismatched layouts scan everything
    assert(got(("by_shipday", "ship_windows"))._3 < 200000)
    assert(got(("by_partkey", "partkey_ranges"))._3 < 200000)
    assert(got(("by_partkey", "ship_windows"))._3 == 1000000)
    assert(got(("by_shipday", "partkey_ranges"))._3 == 1000000)
  }

  // ---------------------------------------------------------------
  // q336: double-precision cosine re-fold with Spark's rounding
  // ---------------------------------------------------------------

  test("q336 matches a re-fold and recall is monotone in prefix dim") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val queries = vecs.filter(_._1 % 50 == 0)
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def rnd(x: Double): BigDecimal = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def top10(d: Int): Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, rnd(cos(qv, cv, d))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(10).map(_._1).toSeq
    }.toMap
    val full = top10(64)
    val want = Seq(8, 16, 32).map { d =>
      val t = top10(d)
      val overlap = queries.map { case (qid, _) =>
        t(qid).count(full(qid).toSet).toLong }.sum
      val top1 = queries.count { case (qid, _) =>
        t(qid).head == full(qid).head }.toLong
      d.toLong -> ((queries.length.toLong, overlap,
        (BigInt(overlap) * 1000000 / (queries.length * 10)).toLong, top1))
    }.toMap
    val got = QueriesData.q336MatryoshkaEval(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // truncation can only lose information: recall monotone in d
    assert(got(8L)._3 <= got(16L)._3 && got(16L)._3 <= got(32L)._3)
  }

  // ---------------------------------------------------------------
  // q337: BigInt pinball re-fold + the loss identity at tau = 50
  // ---------------------------------------------------------------

  test("q337 matches a BigInt pinball re-fold; tau=50 is half the MAE") {
    val weekly = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val d = r.getAs[java.time.LocalDateTime](1).toLocalDate
        (r.getLong(0), d.minusDays((d.getDayOfWeek.getValue - 1).toLong),
          BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
      }
    val custNation = {
      val cn = Tables.customer(spark, sf)
        .select("c_custkey", "c_nationkey").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val nn = Tables.nation(spark, sf)
        .select("n_nationkey", "n_name").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      cn.view.mapValues(nn).toMap
    }
    val byWeek = weekly.groupBy(w => (custNation(w._1), w._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val scored = byWeek.toSeq.flatMap { case ((n, wk), rev) =>
      byWeek.get((n, wk.minusDays(364))).map(r52 => (n, rev, r52))
    }
    val want = (for {
      (n, xs) <- scored.groupBy(_._1); tau <- Seq(10L, 50L, 90L)
    } yield {
      val pb = xs.map { case (_, y, f) =>
        BigInt(math.max(tau * (y - f), (tau - 100) * (y - f))) }.sum
      (n, tau) -> ((xs.length.toLong, pb.toLong,
        (pb / (xs.length * 100)).toLong))
    }).toMap
    val got = QueriesData.q337PinballEval(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // pinball at tau=50 is exactly half the absolute error in x100 units
    for ((n, xs) <- scored.groupBy(_._1)) {
      val mae = xs.map { case (_, y, f) => BigInt((y - f).abs) }.sum
      assert(BigInt(got((n, 50L))._2) == mae * 50, n)
    }
  }

  // ---------------------------------------------------------------
  // q338: brute-force co-occurrence + list-pair diversity re-fold
  // ---------------------------------------------------------------

  test("q338 matches a brute-force diversity re-fold") {
    val bi = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nP = bi.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = bi.groupBy(_._1).values.toSeq.flatMap { xs =>
      val ps = xs.map(_._2).sorted.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val score: Map[(Long, Long), Long] = co.flatMap { case ((a, b), c) =>
      val s = (BigInt(c) * c * BigInt("1000000000000") /
        (BigInt(nP(a)) * nP(b))).toLong
      Seq((a, b) -> s, (b, a) -> s)
    }.toMap
    val brand = Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val recs = score.groupBy(_._1._1).map { case (pa, xs) =>
      pa -> xs.toSeq.map { case ((_, pb), sc) => (pb, sc) }
        .sortBy { case (pb, sc) => (-sc, pb) }.take(3).map(_._1)
    }
    val want = recs.groupBy(r => brand(r._1)).map { case (b, rs) =>
      val pairs: Seq[BigInt] = rs.toSeq.flatMap {
        case (_, nbs: Seq[Long] @unchecked) =>
          for (i <- nbs.indices; j <- nbs.indices if i < j)
            yield BigInt(1000000000000L) -
              BigInt(score.getOrElse((nbs(i), nbs(j)), 0L))
      }
      val distinctNb = rs.values.flatten.toSet.size.toLong
      b -> ((rs.size.toLong, pairs.length.toLong,
        (pairs.sum / pairs.length).toLong, distinctNb,
        (BigInt(distinctNb) * 1000000 / brand.size).toLong))
    }
    val got = QueriesData.q338RecDiversity(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == want.keySet)
    for ((b, w) <- want) assert(got(b) == w, s"$b: ${got(b)} != $w")
  }

  // ---------------------------------------------------------------
  // q339: BigInt ESS re-fold + the Cauchy-Schwarz bound
  // ---------------------------------------------------------------

  test("q339 matches a BigInt ESS re-fold and respects ESS <= n") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nL = docs.groupBy(_._1).view.mapValues(_.length).toMap
    val w = nL.view.mapValues(n => 1000000000000L / n).toMap
    val want = docs.groupBy(_._2).map { case (src, xs) =>
      val grid = xs.groupBy(_._1).view.mapValues(_.length.toLong).toSeq
      val sw = grid.map { case (l, k) => BigInt(k) * w(l) }.sum
      val sww = grid.map { case (l, k) => BigInt(k) * w(l) * w(l) }.sum
      val n = xs.length.toLong
      src -> ((n, grid.length.toLong,
        (sw * sw * 1000 / sww).toLong,
        (sw * sw * 1000000 / (sww * n)).toLong,
        (BigInt(grid.map(_._2).max) * 1000000 / n).toLong))
    }
    val got = QueriesData.q339EssDiagnostics(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    // Cauchy-Schwarz: ESS <= n always; and the skewed language mix
    // must make at least one source genuinely sub-n
    assert(got.values.forall(v => v._4 <= 1000000L))
    assert(got.values.exists(v => v._4 < 950000L))
  }

  // ---------------------------------------------------------------
  // q340: imperative truss peel on the brute-force proximity graph
  // ---------------------------------------------------------------

  test("q341 ORC round-trip is lossless and the read pushes its predicate") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files
      .createTempDirectory("q341-spec").toString
    try {
      val src = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
      src.repartition(4).write.mode("overwrite").orc(s"$root/li")
      val back = spark.read.orc(s"$root/li")
      // byte-for-byte row multiset identity through the ORC writer
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      // the quantity predicate must reach the ORC reader as a pushed
      // filter, not a post-scan residual-only filter
      val plan = back.filter(col("l_quantity") >= 25)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(l_quantity,25"), plan)
    } finally TmpTrees.delete(root)
  }

  test("q340 matches an imperative k-truss peel; every edge in >=2 triangles") {
    // sf0.01: the sf0.001 grid has zero triangles (empty truss)
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5Hex(s).take(8), 16)
    val pts = Tables.customer(spark, "/root/testdata/sf0.01")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(id => (id, h32(s"x:$id") % 100000, h32(s"y:$id") % 100000))
    var edges = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      if (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 4000000
    } yield (a, b)).toSet
    var done = false
    while (!done) {
      val es = edges
      val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val next = es.filter { case (a, b) =>
        (adj(a) - b).count(c => es.contains(
          (math.min(b, c), math.max(b, c)))) >= 2
      }
      done = next == es
      edges = next
    }
    val support = edges.toSeq.map { case (a, b) =>
      val adj = edges.toSeq.flatMap { case (x, y) => Seq(x -> y, y -> x) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (a, b, (adj(a) - b).count(c => edges.contains(
        (math.min(b, c), math.max(b, c)))).toLong)
    }
    val want = support.map { case (a, b, s) => (a, b) -> s }.toMap
    val got = QueriesData.q340KTruss(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.forall(_ >= 2))
  }

  // ---------------------------------------------------------------
  // q331: BigInt normal equations + a residual-optimality property
  // ---------------------------------------------------------------

  test("q331 matches a BigInt Cramer re-fold and beats coefficient perturbations") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong,
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact,
        BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
    val custSeg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orderCust = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val facts = rows.map(v =>
      (custSeg(orderCust(v._1)), BigInt(v._2), BigInt(v._3), BigInt(v._4)))
    val want = facts.groupBy(_._1).map { case (seg, xs) =>
      val n = BigInt(xs.length)
      def fl(v: BigInt) = v * 1000000 / n
      val m1 = fl(xs.map(_._2).sum); val m2 = fl(xs.map(_._3).sum)
      val my = fl(xs.map(_._4).sum)
      val m11 = fl(xs.map(x => x._2 * x._2).sum) + 1000000
      val m22 = fl(xs.map(x => x._3 * x._3).sum) + 1000000
      val m12 = fl(xs.map(x => x._2 * x._3).sum)
      val m1y = fl(xs.map(x => x._2 * x._4).sum)
      val m2y = fl(xs.map(x => x._3 * x._4).sum)
      val det = BigInt(1000000) * (m11 * m22 - m12 * m12) -
        m1 * (m1 * m22 - m12 * m2) + m2 * (m1 * m12 - m11 * m2)
      val d0 = my * (m11 * m22 - m12 * m12) -
        m1 * (m1y * m22 - m12 * m2y) + m2 * (m1y * m12 - m11 * m2y)
      val d1 = BigInt(1000000) * (m1y * m22 - m12 * m2y) -
        my * (m1 * m22 - m12 * m2) + m2 * (m1 * m2y - m1y * m2)
      val d2 = BigInt(1000000) * (m11 * m2y - m1y * m12) -
        m1 * (m1 * m2y - m1y * m2) + my * (m1 * m12 - m11 * m2)
      seg -> ((xs.length.toLong, (d0 * 1000000 / det).toLong,
        (d1 * 1000000 / det).toLong, (d2 * 1000000 / det).toLong))
    }
    val got = QueriesData.q331RidgeRegression(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((seg, w) <- want) assert(got(seg) == w, s"$seg: ${got(seg)} != $w")
    // optimality: the fitted coefficients beat ±10% slope perturbations
    // on the TRUE ridge objective (double arithmetic is fine here —
    // we're comparing losses, not pinning hashes)
    for ((seg, (_, b0m, b1m, b2m)) <- got) {
      val xs = facts.filter(_._1 == seg)
      def loss(b0: Double, b1: Double, b2: Double): Double =
        xs.map { case (_, x1, x2, y) =>
          val e = y.toDouble - b0 - b1 * x1.toDouble - b2 * x2.toDouble
          e * e
        }.sum / xs.length + 1.0 * (b1 * b1 + b2 * b2)
      val (b0, b1, b2) = (b0m / 1e6, b1m / 1e6, b2m / 1e6)
      val base = loss(b0, b1, b2)
      for (f <- Seq(0.9, 1.1)) {
        assert(base <= loss(b0, b1 * f, b2), s"$seg b1 perturb $f")
        assert(base <= loss(b0, b1, b2 * f), s"$seg b2 perturb $f")
      }
    }
  }
}
