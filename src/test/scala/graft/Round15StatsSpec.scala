package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Property pins for the [[QueriesStats]] wave (q276–q282), beyond
  * their DuckDB hash gates: each test re-derives the query's defining
  * mathematics independently (driver-side brute force on the sf0.001
  * graph / series), so a future edit that stays hash-stable against a
  * co-broken oracle still fails here.
  */
class Round15StatsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** The sf0.001 proximity graph (q274/q275/q276/q277's geometry),
    * collected once: ~150 nodes, ~a few hundred edges. */
  private lazy val (nodes, adj) = {
    val ids = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long").as("id"))
      .collect().map(_.getLong(0)).toSeq
    val pairs = QueriesCore.gridRadiusPairs(
      QueriesCore.adaptiveGridPoints(
        Tables.customer(spark, sf).select(col("c_custkey").as("id"))),
      r = 1000L)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val m = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      m(a) = m(a) + b; m(b) = m(b) + a
    }
    (ids, m.toMap.withDefaultValue(Set.empty))
  }

  test("q276 LPA ≡ driver-side synchronous 4-round brute force") {
    val got = QueriesStats.q276LabelPropagation(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var lbl = nodes.map(id => id -> id).toMap
    for (_ <- 1 to 4) {
      lbl = nodes.map { id =>
        val votes = adj(id).toSeq.map(lbl)
        if (votes.isEmpty) id -> lbl(id)
        else {
          val byLbl = votes.groupBy(identity).map {
            case (l, vs) => (l, vs.size)
          }
          val best = byLbl.toSeq.minBy { case (l, c) => (-c, l) }._1
          id -> best
        }
      }.toMap
    }
    assert(got == lbl,
      s"LPA drift on ${got.count { case (k, v) => lbl(k) != v }} nodes")
    // non-vacuity: propagation actually merged something
    assert(got.values.toSet.size < nodes.size,
      "every node kept its own label — the graph has no edges?")
  }

  test("q277 local clustering ≡ brute-force triangles through each node") {
    val got = QueriesStats.q277LocalClustering(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { id =>
      val nb = adj(id)
      val deg = nb.size.toLong
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }.toLong
      val ppm = if (deg >= 2) 2000000L * tri / (deg * (deg - 1)) else 0L
      assert(got(id) == ((deg, tri, ppm)),
        s"node $id: got ${got(id)}, brute ($deg, $tri, $ppm)")
    }
    // non-vacuity: at least one genuine triangle on the sf0.001 graph
    assert(got.values.exists(_._2 > 0), "no triangles — vacuous pin")
  }

  test("q278 Mann–Whitney: rank-biserial bounded and brute-forced") {
    val rows = QueriesStats.q278MannWhitney(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getLong(3)) <= 1000000L,
        s"${r.getString(0)}: rank-biserial outside ±1e6 ppm")
    }
    // brute force the first nation from raw quantities via midranks
    val nation = rows.head.getString(0)
    val qtys = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf),
        col("n_nationkey") === col("c_nationkey"))
      .filter(col("n_name") === nation &&
        col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = qtys.map(_._2).sorted
    // midrank×2 of value v in the combined sample
    def rank2(v: Long): Long = {
      val below = all.count(_ < v).toLong
      val ties = all.count(_ == v).toLong
      2 * below + ties + 1
    }
    val rSum2 = qtys.filter(_._1 == "R").map(q => rank2(q._2)).sum
    val n1 = qtys.count(_._1 == "R").toLong
    val n2 = qtys.count(_._1 == "N").toLong
    val u1x2 = rSum2 - n1 * (n1 + 1)
    val rbPpm = (BigInt(u1x2) * 1000000 / (BigInt(n1) * n2)
      - 1000000).toLong
    assert(rows.head.getLong(3) == rbPpm,
      s"$nation: got ${rows.head.getLong(3)}, brute $rbPpm")
  }

  test("q279 item-cosine ranking agrees with true double cosine") {
    val bi = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nP = bi.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val byOrder = bi.groupBy(_._1).values.map(_.map(_._2).sorted)
    val co = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    byOrder.foreach { parts =>
      for (a <- parts; b <- parts if a < b) co((a, b)) += 1
    }
    def cosine(a: Long, b: Long): Double = {
      val c = co(if (a < b) (a, b) else (b, a))
      c / math.sqrt(nP(a).toDouble * nP(b).toDouble)
    }
    val got = QueriesStats.q279ItemCosine(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (part, rs) =>
      val ordered = rs.sortBy(_.getLong(4))
      // the e12 integer ranking must be non-increasing in true cosine
      // (strictly, up to exact integer-score ties)
      val cosines = ordered.map(r => cosine(part, r.getLong(1)))
      val scores = ordered.map(_.getLong(3))
      for (i <- 1 until cosines.length)
        assert(cosines(i - 1) >= cosines(i) - 1e-12 ||
            scores(i - 1) == scores(i),
          s"part $part: integer ranking inverted true cosine order")
      // and the top-1 must be a true argmax of cosine among neighbors
      val nbrs = nP.keys.filter(q => q != part &&
        co(if (part < q) (part, q) else (q, part)) > 0)
      val maxCos = nbrs.map(q => cosine(part, q)).max
      assert(math.abs(cosines.head - maxCos) < 1e-12,
        s"part $part: top-1 is not the true cosine argmax")
    }
  }

  test("q280 changepoint ≡ brute-force argmax |n·S_t − t·S_n| per nation") {
    val daily = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val got = QueriesStats.q280Changepoint(spark, sf)
      .select(col("nation"),
        date_format(col("cp_date"), "yyyy-MM-dd"),
        col("t"), col("n_days"), col("stat_cents"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    daily.foreach { case (nation, xs) =>
      val series = xs.sortBy(_._2).map(x => (x._2, x._3))
      val n = series.length.toLong
      val sN = series.map(_._2).sum
      var sT = 0L
      val stats = series.zipWithIndex.init.map { case ((d, rev), i) =>
        sT += rev
        (d, i + 1L,
          ((BigInt(n) * sT - BigInt(i + 1L) * sN).abs / n).toLong)
      }
      // argmax by stat, ties to the EARLIEST date (ISO strings sort
      // lexicographically = chronologically)
      val best = stats.minBy(x => (-x._3, x._1))
      val g = got(nation)
      assert((g._1, g._2, g._4) == ((best._1, best._2, best._3)),
        s"$nation: got $g, brute $best")
      assert(g._3 == n)
    }
  }

  test("q281 stream CMS: one-sided error everywhere AND collisions real") {
    val rows = QueriesStats.q281StreamCms(spark, sf)
      .select("est_count", "exact_count", "sound").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2) && r.getLong(0) >= r.getLong(1)),
      "streaming CMS under-counted — state merge or cell hashing broken")
    assert(rows.exists(r => r.getLong(0) > r.getLong(1)),
      "no collisions at w=64 — the one-sided guarantee is vacuous")
  }

  test("q283 winsorize ≡ brute-force type-1 quantile clamp, all nations") {
    val cents = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val got = QueriesStats.q283Winsorize(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    cents.foreach { case (nation, xs) =>
      val v = xs.map(_._2).sorted
      val n = v.length
      // type-1 quantile: value at 1-based index ceil(q·n)
      val p05 = v(((n + 19) / 20) - 1)
      val p95 = v(((19 * n + 19) / 20) - 1)
      val win = v.map(c => math.max(math.min(c, p95), p05)).sum
      assert(got(nation) == ((n.toLong, p05, p95, v.sum, win)),
        s"$nation: got ${got(nation)}, " +
          s"brute (${n.toLong}, $p05, $p95, ${v.sum}, $win)")
    }
  }

  test("q284 Kendall τ ≡ brute-force pair counts, all nations") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("l_quantity").cast("long"),
        expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = QueriesStats.q284KendallTau(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    rows.foreach { case (nation, xs) =>
      val v = xs.map(x => (x._2, x._3))
      var nc = 0L; var nd = 0L
      for (i <- v.indices; k <- (i + 1) until v.length) {
        val dx = java.lang.Long.compare(v(k)._1, v(i)._1)
        val dy = java.lang.Long.compare(v(k)._2, v(i)._2)
        if (dx * dy > 0) nc += 1 else if (dx * dy < 0) nd += 1
      }
      val n = v.length.toLong
      val den = BigInt(n) * (n - 1)
      def ppm(x: Long) = (BigInt(x) * 2000000 / den).toLong
      // BigInt division truncates toward zero like DIV / //
      assert(got(nation) == ((n, ppm(nc), ppm(nd), ppm(nc - nd))),
        s"$nation: got ${got(nation)}, " +
          s"brute ($n, ${ppm(nc)}, ${ppm(nd)}, ${ppm(nc - nd)})")
    }
  }

  test("q285 trigrams ≡ brute-force 30-min sessionization") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._2, r._3))
      // split at >30-min gaps, then slide a width-3 window per session
      var sess = List[List[String]]()
      var cur = List[String]()
      var prev = Long.MinValue
      seq.foreach { r =>
        if (prev != Long.MinValue && r._2 - prev > 1800L * 1000000L) {
          sess ::= cur.reverse; cur = Nil
        }
        cur ::= r._4; prev = r._2
      }
      sess ::= cur.reverse
      sess.foreach(_.sliding(3).foreach {
        case List(a, b, c) => counts(s"$a>$b>$c") += 1
        case _ =>
      })
    }
    val expect = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val got = QueriesStats.q285EventTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("q286 stream Bloom: no false negatives, measured FPs, real state") {
    val rows = QueriesStats.q286StreamBloom(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (mN, mPos, mPpm, bits) = rows("member")
    assert(mPos == mN && mPpm == 1000000L,
      "a seen user_id tested negative — Bloom false negative is impossible")
    val (aN, aPos, aPpm, _) = rows("absent")
    assert(aN == mN, "absent probe population must mirror members")
    // fp rate sanity: (bits/1024)^3 expected; allow a loose envelope
    // above it but NEVER ~100% (which would mean a saturated filter)
    assert(aPpm < 500000L, s"false-positive rate $aPpm ppm — saturated?")
    assert(bits > 0 && bits <= 1024, s"bits_set $bits out of range")
    assert(aPos >= 0)
  }

  test("q287 calibration: bin bounds, total row count, exact ratios") {
    val rows = QueriesStats.q287CalibrationBins(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalRows = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == totalRows,
      "bins must partition the scored rows exactly")
    rows.foreach { r =>
      val (bin, n, pred, act) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bin >= 0 && bin <= 9 && n > 0)
      // mean of scores inside an equal-width bin stays in the bin
      // (bin 9 also absorbs the pred=1e6 cap)
      assert(pred >= bin * 100000L &&
        (pred < (bin + 1) * 100000L || (bin == 9L && pred <= 1000000L)),
        s"bin $bin: avg_pred_ppm $pred outside its bin")
      assert(act >= 0 && act <= 1000000L)
    }
  }

  /** md5 32-bit prefix as unsigned long — the Scala-side twin of
    * [[graft.operators.Scale.md5Prefix32]] for brute-force replays. */
  private def md5p32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  test("q288 HITS ≡ brute-force 2 exact rounds + final L∞ micros") {
    val bip = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val a1 = bip.groupBy(_._2).map { case (p, xs) =>
      p -> BigInt(xs.size) * 1000000 }
    val h1 = bip.groupBy(_._1).map { case (o, xs) =>
      o -> xs.map(x => a1(x._2)).sum }
    val a2 = bip.groupBy(_._2).map { case (p, xs) =>
      p -> xs.map(x => h1(x._1)).sum }
    val mx = a2.values.max
    val auth = a2.map { case (p, a) => p -> (a * 1000000 / mx).toLong }
    val nOrders = bip.groupBy(_._2).map { case (p, xs) =>
      p -> xs.size.toLong }
    val expect = auth.toSeq.map { case (p, a) => (p, a, nOrders(p)) }
      .sortBy { case (p, a, _) => (-a, p) }.take(20)
    val got = QueriesStats.q288Hits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got.head._2 == 1000000L, "L∞ normalization: max must be 1e6")
  }

  test("q289 negative sampling ≡ brute-force replay, never in-basket") {
    val pos = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nParts = Tables.part(spark, sf).count()
    val baskets = pos.groupBy(_._1).map { case (o, xs) =>
      o -> xs.map(_._2).toSet }
    val expect = baskets.toSeq.flatMap { case (o, basket) =>
      (0 to 5).map(j => (md5p32(s"$o:$j") % nParts, j))
        .filterNot { case (cp, _) => basket.contains(cp) }
        .groupBy(_._1).map { case (cp, js) => (cp, js.map(_._2).min) }
        .toSeq.sortBy(_._2).take(2)
        .map { case (cp, slot) => (o, cp, slot.toLong) }
    }.sortBy(x => (x._1, x._3))
    val got = QueriesStats.q289NegativeSampling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect,
      s"sample drift: got ${got.size} rows, expect ${expect.size}")
    got.foreach { case (o, cp, _) =>
      assert(!baskets(o).contains(cp),
        s"order $o sampled its own basket item $cp as a negative")
    }
  }

  test("q290 SRM: cell identities and md5 assignment replay") {
    val rows = QueriesStats.q290SrmCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, a, b, chi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a + b == n, s"${r.getString(0)}: cells don't sum")
      val d = a - b
      assert(chi == d * d * 1000000L / n,
        s"${r.getString(0)}: chi2_ppm mismatch")
      assert(r.getBoolean(5) == (chi > 3841459L))
    }
    // replay the hash split for every order: per-nation n_a must match
    val brute = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("o_orderkey"))
      .collect()
      .map(r => (r.getString(0), md5p32(s"srm:${r.getLong(1)}") % 2))
      .groupBy(_._1).map { case (nat, xs) =>
        nat -> xs.count(_._2 == 0L).toLong }
    rows.foreach(r => assert(brute(r.getString(0)) == r.getLong(2),
      s"${r.getString(0)}: assignment replay drift"))
  }

  test("q291 Shapley ≡ brute-force over all 16 subsets; axioms hold") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bit = Map("click" -> 1L, "view" -> 2L, "signup" -> 4L,
      "error" -> 8L)
    val masks = ev.groupBy(_._1).values.flatMap { rows =>
      val purchases = rows.filter(_._2 == "purchase")
      if (purchases.isEmpty) None
      else {
        val fp = purchases.map(r => (r._3, r._4)).min
        Some(rows.filter(r => r._2 != "purchase" &&
            (r._3 < fp._1 || (r._3 == fp._1 && r._4 < fp._2)))
          .map(r => bit(r._2)).fold(0L)(_ | _))
      }
    }.toSeq
    def v(ss: Long): Long = masks.count(m => (m & (15L - ss)) == 0L)
    val w = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val expect = bit.map { case (ch, b) =>
      ch -> (0L to 15L).filter(ss => (ss & b) == 0L)
        .map(ss => w(java.lang.Long.bitCount(ss)) * (v(ss | b) - v(ss)))
        .sum
    }
    val got = QueriesStats.q291ShapleyAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.foreach { case (ch, phi, _, _) =>
      assert(phi == expect(ch), s"$ch: got $phi, brute ${expect(ch)}")
    }
    // efficiency axiom: Σφ·24 distributes exactly v(full) − v(∅)
    assert(got.map(_._2).sum == 24L * (got.head._3 - got.head._4),
      "Shapley efficiency axiom violated")
  }

  test("q292 skew audit ≡ brute-force multiplicity distribution") {
    val got = QueriesStats.q292SkewAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    def brute(df: org.apache.spark.sql.DataFrame, key: String) = {
      val counts = df.groupBy(key).count()
        .collect().map(_.getLong(1)).sorted
      val nKeys = counts.length.toLong
      val total = counts.sum
      def tile(k: Long) = counts((k - 1).toInt)
      (nKeys, total, counts.max,
        tile((nKeys + 1) / 2), tile((99 * nKeys + 99) / 100),
        counts.max * 1000000L / total)
    }
    assert(got("l_partkey") == brute(Tables.lineitem(spark, sf),
      "l_partkey"))
    assert(got("o_custkey") == brute(Tables.orders(spark, sf),
      "o_custkey"))
    assert(got("user_id") == brute(Tables.events(spark, sf),
      "user_id"))
  }

  test("q293 quantile effects ≡ brute-force per-variant type-1 tiles") {
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (md5p32(s"srm:${r.getLong(0)}") % 2, r.getLong(1)))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sorted }
    def tile(v: Long, q: Long): Long = {
      val xs = cents(v)
      xs(((q * xs.length + 99) / 100 - 1).toInt)
    }
    val got = QueriesStats.q293QuantileEffects(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(25L, 50L, 75L))
    got.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == tile(0L, q), s"p$q variant A")
      assert(r.getLong(2) == tile(1L, q), s"p$q variant B")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("q294 contamination ≡ brute-force trigram overlap") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.normalizeText(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tris = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val bench = tris.filter(_._1 % 50 == 0).values.flatten.toSet
    val got = QueriesStats.q294NgramContamination(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == tris.keySet.filter(_ % 50 != 0))
    got.foreach { case (id, (nTri, nOv, ppm)) =>
      val mine = tris(id)
      val ov = mine.count(bench.contains).toLong
      val expPpm = if (mine.nonEmpty) ov * 1000000L / mine.size else 0L
      assert((nTri, nOv, ppm) == ((mine.size.toLong, ov, expPpm)),
        s"doc $id: got ($nTri, $nOv, $ppm), " +
          s"brute (${mine.size}, $ov, $expPpm)")
    }
    // non-vacuity: synthetic docs share phrases — some overlap exists
    assert(got.values.exists(_._2 > 0), "no contamination signal")
  }

  test("q295 BPE roundtrip: lossless, and the merges are real") {
    val r = QueriesStats.q295BpeRoundtrip(spark, sf).collect().head
    assert(r.getLong(0) > 0 && r.getLong(0) == r.getLong(1)
      && r.getBoolean(2), s"roundtrip broken: $r")
    // guard vacuity: if no merge ever applied, roundtrip passes
    // trivially on the raw char split — require real fused tokens
    val docs = Tables.documents(spark, sf)
    val seg = graft.operators.TextAnalysis.bpeSegment(docs, "doc_id",
      "text", graft.operators.TextAnalysis.bpeTrain(docs, "doc_id",
        "text", merges = 20))
    val totals = seg.agg(sum("n_bpe_tokens"), sum("n_words")).collect().head
    val chars = docs.select(sum(length(
      graft.operators.TextAnalysis.normalizeText(col("text")))))
      .collect().head.getLong(0)
    assert(totals.getLong(0) < chars,
      "BPE produced as many tokens as characters — merges vacuous")
  }

  test("q296 split leakage ≡ exactly the cross-split subset of q55") {
    // sf0.01: sf0.001's corpus yields no ≥0.8 pairs (vacuous)
    val sf01 = "/root/testdata/sf0.01"
    def side(id: Long): String =
      if (md5p32(s"split:$id") % 5 == 4) "val" else "train"
    val all = QueriesText.q55MinhashPortable(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = all
      .filter { case (a, b, _) => side(a) != side(b) }
      .map { case (a, b, j) =>
        if (side(a) == "train") (a, b, j) else (b, a, j) }
      .sortBy(x => (x._1, x._2)).toSeq
    val got = QueriesStats.q296SplitLeakage(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect, s"got ${got.size}, expect ${expect.size}")
    assert(got.nonEmpty, "no cross-split near-dups at sf0.01 — vacuous")
    got.foreach { case (t, v, _) =>
      assert(side(t) == "train" && side(v) == "val",
        s"pair ($t, $v) does not cross the split as labeled")
    }
  }

  test("q297 post-stratified effect ≡ brute-force replay; ATE is the contribution sum") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), md5p32(s"srm:${r.getLong(1)}") % 2,
        r.getLong(2)))
    val n = rows.length.toLong
    val expect = rows.groupBy(_._1).map { case (seg, xs) =>
      val n1 = xs.count(_._2 == 1L).toLong
      val n0 = xs.count(_._2 == 0L).toLong
      val s1 = BigInt(xs.filter(_._2 == 1L).map(_._3).sum)
      val s0 = BigInt(xs.filter(_._2 == 0L).map(_._3).sum)
      val num = s1 * n0 - s0 * n1
      seg -> ((n1, n0,
        (num * 1000000 / (BigInt(n1) * n0)).toLong,
        (BigInt(n1 + n0) * 1000000 / n).toLong,
        (BigInt(n1 + n0) * num * 1000000 /
          (BigInt(n) * n1 * n0)).toLong))
    }
    val got = QueriesStats.q297PostStratifiedEffect(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    expect.foreach { case (seg, e) =>
      assert(got(seg) == e, s"$seg: got ${got(seg)}, brute $e")
    }
    val overall = got("__overall__")
    assert(overall._3 == expect.values.map(_._5).sum,
      "overall ATE must be the exact sum of strata contributions")
    assert(overall._1 == expect.values.map(_._1).sum &&
      overall._2 == expect.values.map(_._2).sum)
  }

  test("q282 backtest: WAPE identity and exact lag-52 alignment") {
    val rows = QueriesStats.q282ForecastBacktest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nW, sae, act, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nW > 0 && act > 0)
      assert(ppm == sae * 1000000L / act,
        s"${r.getString(0)}: wape_ppm ≠ 1e6·sae div actual")
    }
    // alignment: scoring weeks must be exactly those with a week−364
    // predecessor — brute-forced for the first nation
    val nation = rows.head.getString(0)
    val wks = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf),
        col("n_nationkey") === col("c_nationkey"))
      .filter(col("n_name") === nation)
      .select(to_date(date_trunc("week", col("o_orderdate"))).as("wk"))
      .distinct().collect().map(_.getDate(0).toLocalDate).toSet
    val expectN = wks.count(w => wks.contains(w.minusDays(364)))
    assert(rows.head.getLong(1) == expectN,
      s"$nation: scored ${rows.head.getLong(1)} weeks, expected $expectN")
  }
}
