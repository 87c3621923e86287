package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Round-16 eval wave (q309–q317): each query's arithmetic is pinned
  * here INDEPENDENTLY of the DuckDB gate — a driver-side Scala/BigInt
  * re-implementation over the collected sf0.001 facts (small enough to
  * fold exactly), or closed identities where the metric's definition
  * provides them. The DuckDB gate pins cross-engine hashes at sf0.01;
  * these specs pin the intended MATH, so an error that both engines
  * replicate (shared formula typo) still fails.
  */
class Round16EvalSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val li = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
      "l_discount")
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getDouble(3).toLong,
      BigDecimal(r.getDouble(4)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))

  private lazy val orderPrio = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderpriority").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("q309 Fleiss kappa matches an exact BigInt re-fold of the fact") {
    val byOrder = li.groupBy(_._1)
    val items = byOrder.collect {
      case (ok, rows) if rows.length >= 3 =>
        val first3 = rows.filter(_._2 <= 3)
        val cnt = first3.groupBy(_._3).map { case (c, v) => c -> v.length }
        (orderPrio(ok), cnt.getOrElse("R", 0).toLong,
          cnt.getOrElse("N", 0).toLong, cnt.getOrElse("A", 0).toLong)
    }.toSeq
    val want = items.groupBy(_._1).map { case (prio, xs) =>
      val n = BigInt(xs.size)
      val sp = xs.map { case (_, r, nn, a) =>
        BigInt(r * (r - 1) + nn * (nn - 1) + a * (a - 1)) }.sum
      val (sr, sn, sa) = (BigInt(xs.map(_._2).sum),
        BigInt(xs.map(_._3).sum), BigInt(xs.map(_._4).sum))
      val ss = sr * sr + sn * sn + sa * sa
      prio -> ((n.toLong, (sp * 1000000 / (6 * n)).toLong,
        (ss * 1000000 / (9 * n * n)).toLong,
        ((3 * n * sp - 2 * ss) * 1000000 / (18 * n * n - 2 * ss)).toLong))
    }
    val got = QueriesEval.q309FleissKappa(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((prio, (n, po, pe, k)) <- want) {
      assert(got(prio) == ((n, po, pe, k)), s"$prio: ${got(prio)}")
    }
  }

  test("q310 MAP matches an exact re-fold of per-customer rankings") {
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact,
        r.getString(3) == "F"))
    val seg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perCust = orders.groupBy(_._1).map { case (ck, xs) =>
      val ranked = xs.sortBy(o => (-o._3, o._2))
      var cum = 0L
      val terms = ranked.zipWithIndex.collect {
        case ((_, _, _, rel), i) if rel =>
          cum += 1; BigInt(cum) * 1000000 / (i + 1)
      }
      val p = ranked.count(_._4)
      ck -> (if (p > 0) Some((terms.sum / p).toLong) else None)
    }
    val want = perCust.groupBy(x => seg(x._1)).map { case (sg, xs) =>
      val aps = xs.values.flatten
      sg -> ((aps.size.toLong, xs.values.count(_.isEmpty).toLong,
        if (aps.nonEmpty) (aps.map(BigInt(_)).sum / aps.size).toLong
        else -1L))
    }
    val got = QueriesEval.q310Map(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((sg, w) <- want) assert(got(sg) == w, s"$sg: ${got(sg)} vs $w")
  }

  test("q311 sweep satisfies exact confusion identities per threshold") {
    val p = li.count(_._3 == "R").toLong
    val n = li.size - p
    val rows = QueriesEval.q311ConfusionSweep(spark, sf).collect()
    assert(rows.length == 9)
    var prevTp = Long.MaxValue
    for (r <- rows) {
      val (t, tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(tp + fn == p, s"t=$t P split")
      assert(fp + tn == n, s"t=$t N split")
      assert(tp == li.count(x => x._3 == "R" && x._4 > t).toLong, s"t=$t tp")
      assert(fp == li.count(x => x._3 != "R" && x._4 > t).toLong, s"t=$t fp")
      assert(tp <= prevTp, "tp monotone in threshold"); prevTp = tp
      assert(r.getLong(5) <= 1000000 && r.getLong(6) <= 1000000)
      assert(r.getLong(7) <= 1000000 && r.getLong(8) <= 1000000)
    }
  }

  test("q312 Murphy components recompose to Brier within the floor band") {
    val rows = QueriesEval.q312BrierDecomposition(spark, sf).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      val (brier, rel, res, unc) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      // each component floors its own ppm independently; with 11 bins
      // the recomposition drift is a few ppm, never more
      assert(math.abs(brier - (rel - res + unc)) <= 10,
        s"identity: $brier vs ${rel - res + unc}")
      assert(brier >= 0 && brier <= 1000000)
    }
    // n-weighted per-status sum equals the global exact numerator
    val byLs = Tables.lineitem(spark, sf)
      .select("l_linestatus", "l_returnflag", "l_discount").collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
    val want = byLs.groupBy(_._1).map { case (ls, xs) =>
      val bsum = xs.map { x =>
        val f = BigInt(x._3) * 100000 // discount pct → forecast ppm
        val o = if (x._2 == "R") BigInt(1000000) else BigInt(0)
        (f - o) * (f - o)
      }.sum
      ls -> (bsum / (BigInt(xs.size) * 1000000)).toLong
    }
    val got = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q313 Spearman matches an exact midrank re-fold") {
    val want = li.groupBy(_._3).map { case (rf, xs) =>
      def r2(vals: Seq[Long]): Map[Long, Long] = {
        val grouped = vals.groupBy(identity).toSeq.sortBy(_._1)
        var before = 0L
        grouped.map { case (v, g) =>
          val r = 2 * before + g.size + 1
          before += g.size
          v -> r
        }.toMap
      }
      val rq = r2(xs.map(_._4).toSeq)
      val rd = r2(xs.map(_._5).toSeq)
      val n = BigInt(xs.size)
      val s4 = xs.map { x =>
        val d = BigInt(rq(x._4) - rd(x._5)); d * d
      }.sum
      rf -> (BigInt(1000000) -
        (BigInt(6) * (s4 / n) * 1000000) / (BigInt(4) * (n * n - 1))).toLong
    }
    val got = QueriesEval.q313SpearmanRho(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q314 Krippendorff alpha matches an exact BigInt re-fold") {
    val L = BigInt(232792560L)
    val byOrder = li.groupBy(_._1)
    val items = byOrder.collect {
      case (ok, rows) if rows.length >= 2 =>
        val cnt = rows.groupBy(_._3).map { case (c, v) => c -> v.length }
        (orderPrio(ok), rows.length.toLong,
          cnt.getOrElse("R", 0).toLong, cnt.getOrElse("N", 0).toLong,
          cnt.getOrElse("A", 0).toLong)
    }.toSeq
    val want = items.groupBy(_._1).map { case (prio, xs0) =>
      val xs = xs0.filter(_._2 <= 21)
      val n = BigInt(xs.map(_._2).sum)
      val sd = xs.map { case (_, m, r, nn, a) =>
        (L / (m - 1)) * BigInt(r * (m - r) + nn * (m - nn) + a * (m - a))
      }.sum
      val (sr, sn, sa) = (BigInt(xs.map(_._3).sum),
        BigInt(xs.map(_._4).sum), BigInt(xs.map(_._5).sum))
      val se = sr * (n - sr) + sn * (n - sn) + sa * (n - sa)
      prio -> (BigInt(1000000) -
        ((sd / L) * (n - 1) * 1000000) / se).toLong
    }
    val got = QueriesEval.q314KrippendorffAlpha(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(6))).toList
    assert(got.forall(_._2 == 0L), "no wide items expected on TPC-H facts")
    val gotAlpha = got.map(x => x._1 -> x._3).toMap
    assert(gotAlpha == want, s"$gotAlpha vs $want")
  }

  test("q315 JSD values sit in [0, 1e6] micros with sane term counts") {
    // sf0.001's documents table equals sf0.01's (500 docs) — range and
    // structural invariants here; cross-engine hashes pin the values
    val rows = QueriesEval.q315JsDivergence(spark, sf).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val (nt, terms, jsd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(terms <= nt, "distinct terms cannot exceed tokens")
      assert(jsd >= 0 && jsd <= 1000000, s"jsd out of range: $jsd")
    }
  }

  test("q316 ROUGE matches a direct Scala recount for every en doc") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: Seq[String], n: Int): Map[String, Int] =
      t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (k, v) => k -> v.size }
    val en = docs.filter(_._2 == "en")
    val refDoc = en.minBy(_._1)
    val got = QueriesEval.q316RougeExemplar(spark, sf).collect()
      .filter(_.getString(1) == "en")
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(!got.contains(refDoc._1), "exemplar must be excluded")
    for ((id, _, text) <- en if id != refDoc._1) {
      for (n <- Seq(1, 2)) {
        val c = grams(toks(text), n); val rf = grams(toks(refDoc._3), n)
        val ov = c.map { case (g, cc) => math.min(cc, rf.getOrElse(g, 0)) }
          .sum.toLong
        val (ncand, nref) = (c.values.sum.toLong, rf.values.sum.toLong)
        val (wp, wr, wf) = (BigInt(ov) * 1000000 / ncand,
          BigInt(ov) * 1000000 / nref,
          BigInt(2) * ov * 1000000 / (ncand + nref))
        if (n == 1)
          assert(got(id) == ((wp.toLong, wr.toLong, wf.toLong)),
            s"doc $id r1: ${got(id)} vs ($wp,$wr,$wf)")
      }
    }
  }

  test("q318 distinct-n matches a direct Scala gram recount") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val want = docs.groupBy(_._1).map { case (lang, xs) =>
      def stats(n: Int): (Long, Long) = {
        val grams = xs.flatMap(d => toks(d._2).sliding(n)
          .filter(_.size == n).map(_.mkString(" ")))
        (grams.size.toLong, grams.distinct.size.toLong)
      }
      val Seq((t1, u1), (t2, u2), (t3, u3)) = (1 to 3).map(stats)
      lang -> ((t1, u1, BigInt(u1) * 1000000 / t1,
        BigInt(u2) * 1000000 / t2, BigInt(u3) * 1000000 / t3))
    }
    val got = QueriesEval.q318DistinctN(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        BigInt(r.getLong(3)), BigInt(r.getLong(4)),
        BigInt(r.getLong(5))))).toMap
    assert(got.keySet == want.keySet)
    for ((l, w) <- want) assert(got(l) == w, s"$l: ${got(l)} vs $w")
  }

  test("q319/q320 power-law fits land in their structural ranges") {
    // log arithmetic is pinned cross-engine by the DuckDB hash gate;
    // here: shape invariants a broken ladder/grid would violate
    for (r <- QueriesEval.q319ZipfSlope(spark, sf).collect()) {
      // zh tokenizes to a handful of whitespace "words" — its ladder
      // is shorter than the 100-rank cap
      assert(r.getLong(1) >= 2 && r.getLong(1) <= 100, "ladder size")
      val slope = r.getDouble(2)
      assert(slope < 0 && slope > -5, s"zipf slope $slope")
    }
    for (r <- QueriesEval.q320HeapsLaw(spark, sf).collect()) {
      assert(r.getLong(1) >= 2 && r.getLong(1) <= 16)
      // the synthetic corpus draws from a small fixed vocabulary, so
      // V(N) saturates within the first checkpoint and beta sits at
      // ~0 — real corpora run ~0.5
      val beta = r.getDouble(2)
      assert(beta >= 0 && beta <= 1.2, s"heaps beta $beta")
    }
  }

  test("q321 integral p_n match a Scala recount; BLEU recomposes") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: Seq[String], n: Int): Map[String, Int] =
      t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (k, v) => k -> v.size }
    val got = QueriesEval.q321BleuCorpus(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((lang, xs) <- docs.groupBy(_._2)) {
      val ref = xs.minBy(_._1)
      val cands = xs.filter(_._1 != ref._1)
      val r = got(lang)
      for (n <- 1 to 4) {
        val rf = grams(toks(ref._3), n)
        val (ov, nc) = cands.map { c =>
          val g = grams(toks(c._3), n)
          (g.map { case (k, v) => math.min(v, rf.getOrElse(k, 0)) }.sum,
            g.values.sum)
        }.foldLeft((0L, 0L)) { case ((a, b), (x, y)) => (a + x, b + y) }
        assert(r.getLong(n) == (BigInt(ov) * 1000000 / nc).toLong,
          s"$lang p$n")
      }
      val (p1, p2, p3, p4) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      val (bp, bleu) = (r.getDouble(5), r.getDouble(6))
      if (p1 > 0 && p2 > 0 && p3 > 0 && p4 > 0) {
        val re = bp * math.pow(p1 / 1e6 * (p2 / 1e6) * (p3 / 1e6)
          * (p4 / 1e6), 0.25)
        assert(math.abs(bleu - re) < 2e-6, s"$lang bleu $bleu vs $re")
      } else assert(bleu == 0.0)
    }
  }

  test("q322 matches an exact md5-refold of all 33 assignments") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h2(sVal: String): Long = {
      val d = md.digest(sVal.getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val seg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fact = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (seg(r.getLong(0)), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
    val want = fact.groupBy(_._1).map { case (sg, xs) =>
      def stat(b: Int): Long = {
        val (s1, n1, s0, n0) = xs.foldLeft((BigInt(0), 0L, BigInt(0), 0L)) {
          case ((a1, c1, a0, c0), (_, ok, cents)) =>
            if (h2(s"perm:$b:$ok") == 1) (a1 + cents, c1 + 1, a0, c0)
            else (a1, c1, a0 + cents, c0 + 1)
        }
        (s1 * 1000000 / n1 - s0 * 1000000 / n0).toLong
      }
      val obs = stat(0)
      val extreme = (1 to 32).count(b => math.abs(stat(b)) >= math.abs(obs))
      sg -> ((obs, extreme.toLong,
        (BigInt(1 + extreme) * 1000000 / 33).toLong))
    }
    val got = QueriesEval.q322SignFlipTest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want, s"$got vs $want")
  }

  test("q323 isotonic fit matches a BigInt minimax re-fold, monotone") {
    val byLs = Tables.lineitem(spark, sf)
      .select("l_linestatus", "l_returnflag", "l_discount").collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact * 100000L))
    val want = byLs.groupBy(_._1).flatMap { case (ls, xs) =>
      val grid = xs.groupBy(_._3).toSeq.sortBy(_._1).map { case (f, g) =>
        (f, g.size.toLong, g.count(_._2 == "R").toLong)
      }
      grid.map { case (fi, _, _) =>
        val fits = for {
          j <- grid.indices if grid(j)._1 <= fi
        } yield (for {
          k <- grid.indices if grid(k)._1 >= fi && k >= j
        } yield {
          val so = BigInt(grid.slice(j, k + 1).map(_._3).sum)
          val sn = BigInt(grid.slice(j, k + 1).map(_._2).sum)
          (so * 1000000 / sn).toLong
        }).min
        (ls, fi) -> fits.max
      }
    }
    val got = QueriesEval.q323IsotonicCalibration(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got == want.toMap, "minimax refold")
    // monotone non-decreasing within each status
    for ((ls, rows) <- got.groupBy(_._1._1)) {
      val fits = rows.toSeq.sortBy(_._1._2).map(_._2)
      assert(fits == fits.sorted, s"$ls not monotone: $fits")
    }
  }

  test("q324 registers and estimates match a Scala HLL re-iteration") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(sVal: String): Long = {
      val d = md.digest(sVal.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val ids = Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    val side = math.ceil(math.sqrt(ids.length.toDouble)).toLong * 1000L
    val pts = ids.map(id => id -> ((h32(s"x:$id") % side,
      h32(s"y:$id") % side))).toMap
    val edges = (for {
      a <- ids; b <- ids if a < b
      (xa, ya) = pts(a); (xb, yb) = pts(b)
      if (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 1000000L
    } yield Seq((a, b), (b, a))).flatten.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
    def rho(h: Long): Long = {
      val rest = h / 64
      if (rest == 0) 27L else 27L - (63 - java.lang.Long.numberOfLeadingZeros(rest) + 1)
    }
    var regs: Map[Long, Map[Int, Long]] = ids.map { id =>
      val h = h32(s"anf:$id")
      id -> Map((h % 64).toInt -> rho(h))
    }.toMap
    val hist = scala.collection.mutable.ArrayBuffer(regs)
    for (_ <- 1 to 3) {
      regs = ids.map { id =>
        val mine = regs(id)
        val nbrs = edges.getOrElse(id, Seq.empty[Long]).map(regs)
        id -> (mine +: nbrs).flatten
          .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).max }
      }.toMap
      hist += regs
    }
    val got = QueriesEval.q324Hyperanf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (h <- 0 to 3; id <- ids) {
      val m = hist(h)(id)
      val sumPow = m.values.map(rg => 1L << (27 - rg).toInt).sum +
        (64L - m.size) * 134217728L
      val nZero = 64L - m.size
      val raw = ((0.709 * 4096.0) * 134217728.0) / sumPow.toDouble
      val est =
        if (raw <= 160.0 && nZero > 0)
          math.floor(64.0 * math.log(64.0 / nZero.toDouble) * 1000000.0)
        else math.floor(raw * 1000000.0)
      assert(got((id, h.toLong)) == ((sumPow, nZero, est.toLong)),
        s"id=$id h=$h: ${got((id, h.toLong))} vs ($sumPow,$nZero,$est)")
    }
  }

  test("q325 matches an exact BigInt power-iteration re-fold") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val i = r.getTimestamp(1).toInstant // microsecond-exact key
        (r.getLong(0), i.getEpochSecond * 1000000L + i.getNano / 1000,
          r.getLong(2), r.getString(3))
      }
    val journeys = ev.groupBy(_._1).map { case (_, xs) =>
      val path = xs.sortBy(x => (x._2, x._3)).map(_._4)
      val i = path.indexOf("purchase")
      if (i >= 0) path.take(i + 1) else path
    }
    val trans = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    for (p <- journeys) {
      val states = "START" +: p.toSeq
      for (Seq(a, b) <- states.sliding(2)) trans((a, b)) += 1
      trans((p.last, if (p.last == "purchase") "CONV" else "NULL")) += 1
    }
    def converge(removed: String): Long = {
      val vt = trans.toSeq.collect {
        case ((s0, d0), c) if s0 != removed =>
          (s0, if (d0 == removed) "NULL" else d0, c)
      }.groupBy(x => (x._1, x._2))
        .map { case (k, v) => k -> v.map(_._3).sum }
      val states = (vt.keys.map(_._1) ++ vt.keys.map(_._2)).toSet
      var p = states.map(st =>
        st -> (if (st == "CONV") BigInt(1000000) else BigInt(0))).toMap
      for (_ <- 1 to 6) {
        p = states.map { st =>
          st -> (if (st == "CONV") BigInt(1000000)
          else if (st == "NULL") BigInt(0)
          else {
            val out = vt.filter(_._1._1 == st)
            if (out.isEmpty) BigInt(0)
            else out.map { case ((_, d0), c) => BigInt(c) * p(d0) }.sum /
              out.values.map(BigInt(_)).sum
          })
        }.toMap
      }
      p("START").toLong
    }
    val full = converge("__none__")
    val want = Seq("click", "error", "signup", "view").map { ch =>
      ch -> math.max(full - converge(ch), 0L)
    }.toMap
    val tot = want.values.sum
    val got = QueriesEval.q325MarkovAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    for ((ch, eff) <- want) {
      assert(got(ch) == ((full, eff,
        (BigInt(eff) * 1000000 / tot).toLong)), s"$ch: ${got(ch)}")
    }
  }

  test("q317 Theil-Sen matches an exact pairwise-median re-fold") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .join(Tables.part(spark, sf),
        org.apache.spark.sql.functions.expr("p_partkey = l_partkey"))
      .select("p_brand", "o_orderdate", "l_extendedprice").collect()
      .map { r =>
        val d = r.get(1).toString.substring(0, 7).split("-")
        (r.getString(0), d(0).toLong * 12 + d(1).toLong - 1,
          BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
      }
    val want = rows.groupBy(_._1).map { case (brand, xs) =>
      val series = xs.groupBy(_._2).map { case (m, v) =>
        m -> v.map(_._3).sum }.toSeq.sortBy(_._1)
      val slopes = for {
        (m1, y1) <- series; (m2, y2) <- series if m1 < m2
      } yield ((BigInt(y2 - y1) * 1000000 / (m2 - m1)).toLong, m1, m2)
      val sorted = slopes.sortBy(x => (x._1, x._2, x._3))
      brand -> sorted((sorted.size + 1) / 2 - 1)._1
    }
    val got = QueriesEval.q317TheilSen(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == want, s"diff: ${got.toSet.diff(want.toSet)}")
  }
}
