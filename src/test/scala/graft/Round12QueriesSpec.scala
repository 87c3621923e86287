package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Independent in-JVM verification of the round-12 analytics batch
  * (q150–q157): each query's result is recomputed brute-force in plain
  * Scala from the collected base tables — a second implementation that
  * shares no Spark plan, no SQL, and no window machinery with the
  * query under test. (The DuckDB oracles are the cross-engine gate;
  * these are the cross-ALGORITHM gate: sweep vs dominance definition,
  * prefix-filter vs all-pairs, heap top-k vs sort top-k.)
  */
class Round12QueriesSpec extends AnyFunSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq

  private def shingles(text: String, n: Int): Set[String] =
    tokens(text).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet

  test("q150: bounded-heap stratified sample ≡ sort-based top-k per stratum") {
    val got = QueriesCore.q150StratifiedSample(spark, sf)
      .select("c_mktsegment", "c_custkey")
      .as[(String, Long)].collect().toSeq
    // brute force: full sort per stratum on the same portable hash
    val cust = Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"),
        graft.operators.Scale.md5Prefix32(col("c_custkey")).as("h"))
      .as[(String, Long, Long)].collect()
    val want = cust.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(20).map(r => (r._1, r._2))
    }.sortBy(identity)
    assert(got.sorted == want.sorted)
    assert(got.groupBy(_._1).values.forall(_.size <= 20))
  }

  test("q151: rolling 7-day distinct users ≡ brute-force per-day scan") {
    val got = QueriesCore.q151RollingDistinct(spark, sf)
      .select(col("day").cast("date").cast("string"), col("dau"), col("wau"))
      .as[(String, Long, Long)].collect().toMap2
    val grid = Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("user_id"))
      .as[(String, Long)].collect().toSet
    val days = grid.map(_._1)
    val want = days.map { d =>
      val dd = java.time.LocalDate.parse(d)
      val wauUsers = grid.collect { case (ad, u)
        if { val a = java.time.LocalDate.parse(ad)
             !a.isAfter(dd) && a.isAfter(dd.minusDays(7)) } => u }
      val dauUsers = grid.collect { case (ad, u) if ad == d => u }
      d -> ((dauUsers.size.toLong, wauUsers.size.toLong))
    }.toMap
    assert(got == want)
  }

  private implicit class ToMap2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("q152: skyline sweep ≡ quadratic dominance definition") {
    val got = QueriesCore.q152Skyline(spark, sf)
      .select("p_partkey").as[Long].collect().toSet
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[(Long, Double, Int)].collect()
    val want = parts.filter { p =>
      !parts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q153: prefix-filtered Jaccard join ≡ all-pairs exact Jaccard") {
    val got = QueriesText.q153SetsimJoin(spark, sf)
      .select("id_a", "id_b", "jac_micros")
      .as[(Long, Long, Long)].collect().toSet
    val sets = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> shingles(t, 3) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; union = sa.size + sb.size - inter
      if inter * 5 >= union * 4 // τ = 4/5 by cross-multiplication
    } yield (ia, ib, math.floor(inter * 1000000L / union.toDouble).toLong))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "corpus should contain qualifying near-dup pairs")
  }

  test("q154: gap-fill spine is contiguous, zero-filled, forward-filled") {
    val rows = QueriesCore.q154GapFill(spark, sf)
      .select(col("user_id"), col("day").cast("date").cast("string"),
        col("n_events"), col("is_gap"),
        col("last_active_day").cast("date").cast("string"),
        col("days_since_active"))
      .as[(Long, String, Long, Boolean, String, Int)].collect()
    val daily = Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // every user's spine is contiguous min..max and nothing more
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val ds = rs.map(r => java.time.LocalDate.parse(r._2)).sorted
      assert(ds.head.until(ds.last, java.time.temporal.ChronoUnit.DAYS)
        == ds.size - 1, s"user $u spine not contiguous")
    }
    rows.foreach { case (u, d, n, gap, last, since) =>
      assert(n == daily.getOrElse((u, d), 0L))
      assert(gap == (n == 0L))
      if (!gap) { assert(last == d); assert(since == 0) }
      else assert(java.time.LocalDate.parse(last)
        .plusDays(since).toString == d)
    }
    assert(rows.exists(_._4), "corpus should contain at least one gap day")
  }

  test("q155: trailing-frame median is the sorted-frame ordinal element") {
    val got = QueriesCore.q155MovingMedian(spark, sf)
      .select("user_id", "event_id", "n_window", "med7")
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect()
    evs.groupBy(_._1).foreach { case (u, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      ord.zipWithIndex.foreach { case (r, i) =>
        val frame = ord.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        val want = frame((frame.size + 1) / 2 - 1) // ceil(n/2), 1-based
        val (n, med) = got((u, r._3))
        assert(n == frame.size && med == want,
          s"user $u event ${r._3}: got ($n,$med) want (${frame.size},$want)")
      }
    }
  }

  test("q157: burst verdict is the exact cross-multiplied trailing mean") {
    val rows = QueriesCore.q157BurstDetection(spark, sf)
      .select(col("event_type"), col("day").cast("date").cast("string"),
        col("n"), col("prev7"), col("n_prev_days"), col("is_burst"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    val daily = rows.map(r => (r._1, java.time.LocalDate.parse(r._2)) -> r._3)
      .toMap
    rows.foreach { case (t, d, n, prev7, npd, burst) =>
      val dd = java.time.LocalDate.parse(d)
      val win = (1 to 7).flatMap(k => daily.get((t, dd.minusDays(k))))
      assert(prev7 == win.sum && npd == win.size)
      assert(burst == (npd >= 3 && n * npd > prev7 * 2))
    }
    assert(rows.exists(_._6), "testdata should exhibit at least one burst")
  }

  test("q158: SCD-2 intervals tile each key's history; one current row") {
    val rows = QueriesCore.q158Scd2Build(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("is_current"))
      .as[(Long, Long, String, Option[String], Boolean)].collect()
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val ord = rs.sortBy(r => (r._3, r._2))
      ord.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"key $k: end must meet next start")
          assert(!a._5)
        case _ =>
      }
      assert(ord.last._4.isEmpty && ord.last._5,
        s"key $k: exactly the last version is current")
    }
    val orders = Tables.orders(spark, sf).count()
    assert(rows.length == orders, "one version row per change record")
  }

  test("q159: chi-square cells match an exact-integer Scala recount") {
    val got = QueriesCore.q159ChiSquare(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSet
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), pmod(col("user_id"), lit(2)).cast("int"))
      .as[(String, Int)].collect()
    val cells = evs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    val want = cells.map { case ((t, ch), o) =>
      val num = o * n - r(t) * c(ch)
      (t, ch, o,
        math.floor(r(t) * c(ch) / n.toDouble * 1e6).toLong,
        math.floor(num * num / (n * r(t) * c(ch)).toDouble * 1e6).toLong)
    }.toSet
    assert(got == want)
  }

  test("q160: NOT-IN supplier diversity matches a Scala set recount") {
    val got = QueriesCore.q160SupplierDiversity(spark, sf)
      .as[(String, String, Int, Long)].collect().toSet
    val black = Tables.supplier(spark, sf).select("s_suppkey")
      .as[Long].collect().filter(_ % 13 == 0).toSet
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_type", "p_size")
      .as[(Long, String, String, Int)].collect()
      .filter(p => p._2 != "Brand#21" && !p._3.startsWith("SMALL") &&
        Set(1, 4, 9, 14, 19, 23, 36, 45)(p._4))
      .map(p => p._1 -> ((p._2, p._3, p._4))).toMap
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
      .as[(Long, Long)].collect()
    val want = li.filter(l => parts.contains(l._1) && !black(l._2))
      .map(l => parts(l._1) -> l._2).distinct
      .groupBy(_._1).map { case ((b, t, sz), ss) =>
        (b, t, sz, ss.length.toLong)
      }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q161: merged base+delta partials equal an unsplit Scala fold") {
    val got = QueriesCore.q161IncrementalAgg(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_totalprice")
      .as[(String, Double)].collect()
    val want = rows.groupBy(_._1).map { case (seg, rs) =>
      val cents = rs.map(r => math.round(r._2 * 100)) // 2dp exact
      val total = cents.sum / 100.0
      (seg, rs.size.toLong, total, rs.map(_._2).min, rs.map(_._2).max,
        total / rs.size)
    }.toSet
    assert(got == want)
  }

  test("q162: longest streaks match a Scala consecutive-day scan") {
    val got = QueriesCore.q162Streaks(spark, sf)
      .select(col("user_id"), col("n_streaks"), col("best_len"),
        col("streak_start").cast("date").cast("string"))
      .as[(Long, Long, Long, String)].collect().toSet
    val grid = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string"))
      .as[(Long, String)].collect().toSet
    val want = grid.groupBy(_._1).map { case (u, ds) =>
      val days = ds.map(d => java.time.LocalDate.parse(d._2)).toSeq.sorted
      val streaks = days.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc @ (cur :: rest), d)
          if cur.head.plusDays(1) == d => (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }.map(s => (s.size.toLong, s.last)) // (len, start)
      val best = streaks.minBy { case (len, start) =>
        (-len, start.toEpochDay)
      }
      (u, streaks.size.toLong, best._1, best._2.toString)
    }.toSet
    assert(got == want)
    assert(got.exists(_._3 > 1), "testdata should contain multi-day streaks")
  }

  test("q163: per-group mode matches a Scala histogram election") {
    val got = QueriesCore.q163GroupMode(spark, sf)
      .as[(String, Double, Long)].collect().toSet
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity")
      .as[(String, Double)].collect()
    val want = li.groupBy(_._1).map { case (f, rs) =>
      val hist = rs.groupBy(_._2).view.mapValues(_.size.toLong)
      val (q, c) = hist.toSeq.minBy { case (v, n) => (-n, v) }
      (f, q, c)
    }.toSet
    assert(got == want)
  }

  test("q166: first-seen cumulative curve equals a per-day distinct scan") {
    val got = QueriesCore.q166CumulativeDistinct(spark, sf)
      .select(col("day").cast("date").cast("string"), col("new_users"),
        col("cumulative_users"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val grid = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string"))
      .as[(Long, String)].collect().toSet
    val days = grid.map(_._2).toSeq.sorted
    val want = days.map { d =>
      val upTo = grid.collect { case (u, ad) if ad <= d => u }
      val before = grid.collect { case (u, ad) if ad < d => u }
      (d, (upTo -- before).size.toLong, upTo.size.toLong)
    }
    assert(got.toSeq == want)
    assert(got.last._3 == grid.map(_._1).size,
      "curve must end at the total distinct-user count")
  }

  test("q167: shares are exact micros of decimal cell/total ratios") {
    val got = QueriesCore.q167ShareOfTotal(spark, sf)
      .as[(String, String, Double, Long)].collect()
    val cents = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, String, Long)].collect()
    val cell = cents.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val segTot = cents.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    got.foreach { case (seg, pri, rev, share) =>
      assert(rev == cell((seg, pri)) / 100.0)
      assert(share ==
        math.floor((cell((seg, pri)) / 100.0) / (segTot(seg) / 100.0)
          * 1e6).toLong)
    }
    // shares within a segment sum to ~1e6 (floor leaves ≤ |cells| slack)
    got.groupBy(_._1).foreach { case (_, rs) =>
      val t = rs.map(_._4).sum
      assert(t <= 1000000L && t > 1000000L - rs.length)
    }
  }

  test("q179: CDC-to-SCD2 versions tile, deletes close, no current after D") {
    val rows = QueriesCore.q179CdcScd2(spark, sf)
      .as[(Long, Long, Option[Long], Double, Boolean)].collect()
    val feed = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).as[(Long, Long)]
      .collect()
      .map { case (ok, ck) =>
        (if (ok % 5 == 0) ck + 100000 else ck, ok, ok % 7 == 0)
      }
    val byKey = feed.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val hist = byKey(k).sortBy(_._2)
      val upserts = hist.filter(!_._3).map(_._2)
      assert(vs.map(_._2).sorted.toSeq == upserts.sorted.toSeq,
        s"key $k: one version per upsert")
      vs.foreach { v =>
        val next = hist.map(_._2).filter(_ > v._2)
        assert(v._3 == next.headOption.map(identity),
          s"key $k: valid_to must be the NEXT change of any kind")
        assert(v._5 == next.isEmpty)
      }
      // a key whose last change is a delete has no current version
      if (hist.last._3) assert(!vs.exists(_._5), s"key $k deleted")
    }
  }

  test("q180: bounce rate matches a Scala session scan") {
    val got = QueriesCore.q180BounceRate(spark, sf)
      .select(col("day").cast("date").cast("string"),
        col("n_sessions"), col("n_bounces"))
      .as[(String, Long, Long)].collect().toMap2
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      val breaks = ord.zip(ord.drop(1)).map { case (a, b) =>
        b._2 - a._2 >= 1800L * 1000000L }
      // split into runs at breaks
      val sizes = scala.collection.mutable.ArrayBuffer(1)
      val starts = scala.collection.mutable.ArrayBuffer(ord.head._2)
      breaks.zip(ord.drop(1)).foreach { case (brk, e) =>
        if (brk) { sizes += 1; starts += e._2 }
        else sizes(sizes.length - 1) += 1
      }
      sizes.zip(starts)
    }
    val want = sessions
      .groupBy { case (_, startUs) =>
        java.time.Instant.ofEpochSecond(startUs / 1000000L)
          .toString.take(10) }
      .map { case (d, ss) =>
        d -> ((ss.size.toLong, ss.count(_._1 == 1).toLong)) }
    assert(got == want)
  }

  test("q181: time-to-convert gaps and median match a Scala recount") {
    val got = QueriesCore.q181TimeToConvert(spark, sf)
      .as[(Long, Long, Long)].collect()
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val gaps = evs.groupBy(_._1).flatMap { case (u, rs) =>
      val v = rs.filter(_._2 == "view").map(_._3).minOption
      val p = rs.filter(_._2 == "purchase").map(_._3).minOption
      (v, p) match {
        case (Some(a), Some(b)) if b >= a =>
          Some(u -> math.floor((b - a) / 1e6).toLong)
        case _ => None
      }
    }.toSeq
    val sorted = gaps.sortBy { case (u, g) => (g, u) }
    val med = sorted((sorted.size + 1) / 2 - 1)._2
    assert(got.map(r => r._1 -> r._2).toMap == gaps.toMap)
    assert(got.forall(_._3 == med))
  }

  test("q178: cluster-quality stats match an exact BigInt recount") {
    val got = QueriesCore.q178ClusterQuality(spark, sf)
      .as[(Int, Long, Long, Int, Long)].collect().toSet
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1e6).cast("long")).as("v"))
      .as[(Long, Int, Seq[Long])].collect()
    val byLabel = vecs.groupBy(_._2)
    val cents = byLabel.view.mapValues { rs =>
      val n = rs.length
      val s = rs.toSeq.map(_._3).transpose.map(c => c.map(BigInt(_)).sum)
      (BigInt(n), s)
    }.toMap
    val want = byLabel.map { case (l, rs) =>
      val (n, s) = cents(l)
      val tot = rs.map { r =>
        r._3.zip(s).map { case (v, sd) =>
          val d = BigInt(v) * n - sd; d * d }.sum
      }.sum
      val intra = math.floor(
        tot.toDouble / (n * n * n).toDouble / 1e6).toLong
      val best = cents.keys.filter(_ != l).map { o =>
        val (no, so) = cents(o)
        val d2 = s.zip(so).map { case (a, b) =>
          val d = a * no - b * n; d * d }.sum
        val dist = d2.toDouble / (n * no).toDouble / (n * no).toDouble
        (o, dist)
      }.minBy { case (o, dist) => (dist, o) }
      val (nl, nd) = (best._1, math.floor(best._2 / 1e6).toLong)
      (l, rs.length.toLong, intra, nl, nd)
    }.toSet
    assert(got == want)
  }

  test("q177: sorted-neighborhood pairs match a Scala sliding scan") {
    val got = QueriesCore.q177SortedNeighborhood(spark, sf)
      .select("id_a", "id_b", "edit_dist")
      .as[(Long, Long, Int)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cs = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .as[(Long, String)].collect().sortBy(c => (c._2, c._1))
    val want = (for {
      i <- cs.indices; d <- 1 to 2 if i + d < cs.length
      e = lev(cs(i)._2, cs(i + d)._2) if e <= 2
    } yield (cs(i)._1, cs(i + d)._1, e)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q176: phrase occurrences match a Scala adjacency scan") {
    val got = QueriesText.q176PhraseSearch(spark, sf)
      .as[(Long, Long)].collect().toMap
    val want = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> tokens(t).sliding(2)
          .count(p => p == Seq("hash", "join")).toLong
      }.filter(_._2 > 0).toMap
    assert(got == want)
    assert(got.nonEmpty, "corpus should contain the probe phrase")
  }

  test("q174: decay scores match an exact BigInt weighted sum") {
    val got = QueriesCore.q174DecayScore(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    val evs = Tables.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"),
        datediff(lit("2024-01-30").cast("date"), to_date(col("ts")))
          .cast("int"))
      .as[(String, Long, Int)].collect()
    val want = evs.groupBy(_._1).map { case (t, rs) =>
      val s = rs.map { case (_, c, a) =>
        BigInt(c) * (16L >> (a / 7)) }.sum
      (t, rs.length.toLong,
        math.floor(s.toDouble / 1600.0 * 1e6).toLong)
    }.toSet
    assert(got == want)
  }

  test("q175: quartile bins tile the order set with ordinal boundaries") {
    val got = QueriesCore.q175QuartileBinning(spark, sf)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    val prices = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").as[(Long, Double)].collect()
      .sortBy(p => (p._2, p._1)).map(_._2)
    val n = prices.length
    val b = Seq(1, 2, 3).map(q => prices(math.ceil(q * n / 4.0).toInt - 1))
    val want = prices.groupBy { p =>
      if (p <= b(0)) 1 else if (p <= b(1)) 2 else if (p <= b(2)) 3 else 4
    }.toSeq.sortBy(_._1).map { case (q, ps) =>
      (q, ps.length.toLong, ps.min, ps.max)
    }
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == n, "bins must tile the whole relation")
  }

  test("q172: golden-record field elections match Scala survivorship rules") {
    val got = QueriesCore.q172GoldenRecord(spark, sf)
      .as[(Long, Long, String, Double, String, Long)].collect().toSet
    val cs = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .as[(Long, String, Double, String)].collect()
    val want = cs.groupBy(_._1 % 500).map { case (ek, rs) =>
      val latest = rs.maxBy(_._1)._2
      val mode = rs.groupBy(_._4).view.mapValues(_.size).toSeq
        .maxBy { case (seg, n) => (n, seg) }._1
      (ek, rs.length.toLong, latest, rs.map(_._3).max, mode,
        rs.map(_._4).distinct.size.toLong)
    }.toSet
    assert(got == want)
  }

  test("q173: allocations sum exactly to the budget, per segment") {
    val got = QueriesCore.q173LargestRemainder(spark, sf)
      .as[(String, String, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (seg, rs) =>
      assert(rs.map(_._4).sum == 1000000L,
        s"segment $seg allocations must sum to the budget exactly")
      // largest-remainder never moves a cell more than 1 unit
      rs.foreach { r => assert(r._4 - r._3 >= 0 && r._4 - r._3 <= 1) }
    }
    // proportionality: allocations recomputed from exact cents
    val cents = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, String, Long)].collect()
    val cell = cents.groupBy(r => (r._1, r._2)).view
      .mapValues(r => BigInt(r.map(_._3).sum)).toMap
    val tot = cents.groupBy(_._1).view
      .mapValues(r => BigInt(r.map(_._3).sum)).toMap
    got.foreach { case (seg, pri, base, _) =>
      assert(BigInt(base) == cell((seg, pri)) * 1000000 / tot(seg))
    }
  }

  test("q169: last-touch attribution matches a Scala event-history scan") {
    val got = QueriesCore.q169Attribution(spark, sf)
      .select("user_id", "event_id", "attributed", "gap_seconds")
      .as[(Long, Long, String, Option[Long])].collect().toSet
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val want = evs.groupBy(_._1).flatMap { case (u, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      ord.zipWithIndex.toSeq.collect {
        case ((_, ts, id, "purchase"), i) =>
          val lt = ord.take(i + 1)
            .filter(r => r._4 == "view" || r._4 == "click")
            .lastOption
          lt match {
            case Some((_, lts, _, ty)) if ts - lts <= 1800L * 1000000L =>
              (u, id, ty, Some(math.floor((ts - lts) / 1e6).toLong))
            case _ => (u, id, "direct", None)
          }
      }
    }.toSet
    assert(got == want)
    assert(got.exists(_._3 != "direct") && got.exists(_._3 == "direct"),
      "testdata should exercise both attribution outcomes")
  }

  test("q170: heatmap buckets match a Scala calendar recount") {
    val got = QueriesCore.q170TimeHeatmap(spark, sf)
      .select("dow", "hod", "n").as[(Int, Int, Long)].collect().toSet
    val evs = Tables.events(spark, sf)
      .select((dayofweek(col("ts")) - 1).cast("int"),
        hour(col("ts")).cast("int"))
      .as[(Int, Int)].collect()
    val want = evs.groupBy(identity).map { case ((d, h), rs) =>
      (d, h, rs.length.toLong)
    }.toSet
    assert(got == want)
    assert(got.map(_._1).subsetOf(Set(0, 1, 2, 3, 4, 5, 6)))
    assert(got.toSeq.map(_._3).sum == evs.length)
  }

  test("q171: WoW growth matches an exact-cents Scala series") {
    val got = QueriesCore.q171WowGrowth(spark, sf)
      .select(col("week").cast("date").cast("string"), col("revenue"),
        col("growth_micros"))
      .as[(String, Double, Option[Long])].collect().sortBy(_._1)
    val weekly = Tables.orders(spark, sf)
      .select(date_trunc("week", col("o_orderdate")).cast("date")
          .cast("string"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val weeks = weekly.keys.toSeq.sorted
    val want = weeks.zipWithIndex.map { case (wk, i) =>
      val c = weekly(wk)
      val g = if (i == 0) None else {
        val p = weekly(weeks(i - 1))
        Some(math.floor((c - p).toDouble / p.toDouble * 1e6).toLong)
      }
      (wk, c / 100.0, g)
    }
    assert(got.toSeq == want)
  }

  test("q164: 3-sigma verdicts match an exact BigInt recount") {
    val got = QueriesCore.q164SigmaOutliers(spark, sf)
      .select("event_type", "event_id", "above_mean", "z2_micros")
      .as[(String, Long, Boolean, Long)].collect().toSet
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    val want = evs.groupBy(_._1).flatMap { case (t, rs) =>
      val n = BigInt(rs.length)
      val s = rs.map(r => BigInt(r._3)).sum
      val s2 = rs.map(r => BigInt(r._3) * r._3).sum
      val varN2 = n * s2 - s * s
      rs.toSeq.flatMap { case (_, id, x) =>
        val d = n * x - s
        if (d * d > 9 * varN2)
          Some((t, id, d > 0,
            math.floor((d * d).toDouble / varN2.toDouble * 1e6).toLong))
        else None
      }
    }.toSet
    assert(got == want)
    assert(got.nonEmpty, "testdata should contain 3-sigma outliers")
  }

  test("q165: JSON field aggregates match a Scala parse") {
    val got = QueriesCore.q165JsonExtract(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val kPat = """"k"\s*:\s*(-?\d+)""".r
    val evs = Tables.events(spark, sf)
      .select("event_type", "props").as[(String, String)].collect()
      .map { case (t, p) =>
        (t, kPat.findFirstMatchIn(p).map(_.group(1).toLong))
      }
    val want = evs.groupBy(_._1).map { case (t, rs) =>
      val ks = rs.flatMap(_._2)
      (t, ks.size.toLong, ks.sum, ks.min, ks.max,
        ks.distinct.size.toLong)
    }.toSet
    assert(got == want)
  }

  test("prefixJaccardJoin: boundary pairs at exactly τ survive the filters") {
    // 11 shared words → 9 shingles each; b differs in the last word →
    // 8 common shingles, union 10: Jaccard = 8/10 = 4/5 EXACTLY (the
    // keep boundary). c differs in the last two words → 7/11 < 4/5.
    val ws = (1 to 11).map(i => s"w$i")
    val docs = Seq(
      (1L, ws.mkString(" ")),
      (2L, (ws.init :+ "xx").mkString(" ")),          // τ-boundary vs 1
      (3L, (ws.dropRight(2) ++ Seq("yy", "zz")).mkString(" ")), // below τ
      (4L, ws.mkString(" ")),                          // identical to 1
      (5L, ws.take(3).mkString(" ")),                  // size-ratio reject
      (6L, "a b")                                      // shorter than a shingle
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .prefixJaccardJoin(docs, "doc_id", "text", 3, 4, 5)
      .select("id_a", "id_b", "n_inter", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 8L, 10L), (2L, 4L, 8L, 10L),
      (1L, 4L, 9L, 9L)),
      s"exact-boundary and identical pairs must survive; got $got")
  }

  test("round-12 plans: custom exec, broadcast joins, no nested loops") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
    // q150 must run on the bounded-heap physical operator, not the
    // window-sort fallback
    assert(plan("q150_stratified_sample").contains("TopKPerKey"))
    // q160's blacklist and part dim both broadcast; the NOT-IN never
    // degenerates to a nested-loop join
    val p160 = plan("q160_supplier_diversity")
    assert("BroadcastHashJoin".r.findAllIn(p160).length >= 2)
    assert(!p160.contains("BroadcastNestedLoopJoin"))
    // q164/q167's dim/moment sides broadcast
    assert(plan("q164_sigma_outliers").contains("BroadcastHashJoin"))
    assert(plan("q167_share_of_total").contains("BroadcastHashJoin"))
    // the set-similarity join stays equi-join shaped end to end
    val p153 = plan("q153_setsim_join")
    assert(!p153.contains("BroadcastNestedLoopJoin") &&
      !p153.contains("CartesianProduct"))
    // q184/q187: dimension-sized stats sides broadcast
    assert(plan("q184_assoc_rules").contains("BroadcastHashJoin"))
    assert(plan("q187_target_encoding").contains("BroadcastHashJoin"))
    // q188's neighbor selection runs on the bounded-heap operator
    assert(plan("q188_knn_classify").contains("TopKPerKey"))
    // q189's posting probe and q191's as-of union never degenerate to
    // nested-loop shapes
    assert(!plan("q189_trigram_search").contains("BroadcastNestedLoopJoin"))
    val p191 = plan("q191_pit_join")
    assert(!p191.contains("BroadcastNestedLoopJoin") &&
      !p191.contains("CartesianProduct"))
    // q199: one aggregate pass — a single lineitem scan, no joins
    val p199 = plan("q199_corr_ingredients")
    assert("Scan parquet".r.findAllIn(p199).length == 1)
    assert(!p199.contains("Join"))
    // q200/q201/q208: every dimension side broadcast, never sort-merge
    assert(plan("q200_ols_trend").contains("BroadcastHashJoin"))
    assert(plan("q201_gini").contains("BroadcastHashJoin"))
    val p208 = plan("q208_nation_volume")
    assert("BroadcastHashJoin".r.findAllIn(p208).length >= 3)
    assert(!p208.contains("CartesianProduct"))
    // q207: the scalar-aggregate threshold broadcasts (1-row nested
    // loop is the correct shape); the NOT EXISTS is a hash anti join
    val p207 = plan("q207_idle_balance")
    assert(p207.contains("LeftAnti"))
  }

  test("q156: per-term argmax posting and counts match a Scala recount") {
    val got = QueriesText.q156InvertedIndex(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val tf = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, t) => tokens(t).map(w => (w, id)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupBy(_._1._1).view.mapValues(_.map { case ((_, id), n) => id -> n })
      .toMap
    val stats = tf.map { case (term, posts) =>
      val (topDoc, topTf) = posts.toSeq.sortBy { case (id, n) => (-n, id) }.head
      term -> ((posts.size.toLong, posts.values.sum, topDoc, topTf))
    }
    val want = stats.toSeq
      .sortBy { case (term, (df, _, _, _)) => (-df, term) }.take(100)
      .map { case (t, (df, cf, d, f)) => (t, df, cf, d, f) }
    assert(got.toSeq == want)
  }

  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .*(100).toLongExact

  /** SQL-standard ntile: the first (n mod k) buckets get one extra. */
  private def ntileOf[A](sorted: Seq[A], k: Int): Map[A, Int] = {
    val n = sorted.size; val base = n / k; val extra = n % k
    sorted.zipWithIndex.map { case (a, i) =>
      val bucket =
        if (i < (base + 1) * extra) i / (base + 1) + 1
        else (i - extra) / base + 1
      a -> bucket
    }.toMap
  }

  test("q182: RFM quintiles match a hand-rolled ntile over the rollup") {
    val got = QueriesCore.q182RfmSegments(spark, sf)
      .select("custkey", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val per = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_totalprice"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (ck, rows) =>
        (ck, rows.map(_._2).max, rows.size.toLong,
          rows.map(r => cents(r._3)).sum)
      }.toSeq
    val r = ntileOf(per.sortBy(p => (p._2, p._1)).map(_._1), 5)
    val f = ntileOf(per.sortBy(p => (p._3, p._1)).map(_._1), 5)
    val m = ntileOf(per.sortBy(p => (p._4, p._1)).map(_._1), 5)
    val want = per.map(_._1).sorted.map { ck =>
      (ck, r(ck).toLong, f(ck).toLong, m(ck).toLong,
        s"${r(ck)}${f(ck)}${m(ck)}")
    }
    assert(got == want)
  }

  test("q183: ABC classes match an exact BigInt cumulative-share scan") {
    val got = QueriesCore.q183AbcPareto(spark, sf)
      .select("partkey", "rev_cents", "cum_cents", "abc_class")
      .as[(Long, Long, Long, String)].collect().toSeq
    val rev = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_extendedprice").as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => BigInt(cents(r._2))).sum)
      .toSeq.sortBy { case (pk, r) => (-r, pk) }
    val tot = rev.map(_._2).sum
    var cum = BigInt(0)
    val want = rev.map { case (pk, r) =>
      cum += r
      val cls = if (cum * 10 <= tot * 8) "A"
        else if (cum * 20 <= tot * 19) "B" else "C"
      (pk, r.toLong, cum.toLong, cls)
    }.sortBy(_._1)
    assert(got == want)
  }

  test("q184: rule confidence/lift match a Scala basket recount") {
    val got = QueriesCore.q184AssocRules(spark, sf)
      .select("antecedent", "consequent", "n_ab", "conf_micros",
        "lift_micros")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().toSet
    val nBaskets = baskets.map(_._1).size
    val sup = baskets.groupBy(_._2).view.mapValues(_.size).toMap
    val byOrder = baskets.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val pairCount = byOrder.values.toSeq
      .flatMap { parts =>
        val freq = parts.filter(sup(_) >= 25)
        for (a <- freq; b <- freq if a < b) yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3)
    val want = pairCount.flatMap { case ((a, b), nab) =>
      Seq((a, b), (b, a)).map { case (ant, cons) =>
        (ant, cons, nab.toLong,
          (BigInt(nab) * 1000000 / sup(ant)).toLong,
          (BigInt(nab) * nBaskets * 1000000 /
            (BigInt(sup(ant)) * sup(cons))).toLong)
      }
    }.toSet
    assert(got == want)
  }

  test("q185: median/MAD/outlier flags match a sorted-seq recount") {
    val got = QueriesCore.q185MadOutliers(spark, sf)
      .select("c_custkey", "med_cents", "mad_cents", "is_outlier")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val bal = Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").as[(Long, Double)].collect()
      .map { case (ck, b) => (ck, cents(b)) }
    def ordinalMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1) // rn == ceil(n/2), 1-based
    }
    val med = ordinalMedian(bal.map(_._2).toSeq)
    val mad = ordinalMedian(bal.map(r => math.abs(r._2 - med)).toSeq)
    val want = bal.sortBy(_._1).map { case (ck, c) =>
      (ck, med, mad, math.abs(c - med) > 3 * mad)
    }.toSeq
    assert(got == want)
  }

  test("q186: l-diversity flags match a Scala distinct-band recount") {
    val got = QueriesCore.q186LDiversity(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("n_rows"), col("l_distinct"), col("is_diverse"))
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal")).as[(Long, String, Double)].collect()
    val want = cust.groupBy(r => (r._1, r._2)).map { case ((nk, seg), rows) =>
      val bands = rows.map { r =>
        val c = cents(r._3)
        if (c < 0) "neg" else if (c < 500000) "low" else "high"
      }.toSet
      (nk, seg, rows.size.toLong, bands.size.toLong, bands.size >= 3)
    }.toSet
    assert(got == want)
  }

  test("q187: LOO encoding excludes exactly the row's own target") {
    val got = QueriesCore.q187TargetEncoding(spark, sf)
      .select("c_custkey", "loo_sum_cents", "n_others", "loo_mean_micros")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
    val bySeg = cust.groupBy(_._2).view
      .mapValues(rs => (rs.map(r => cents(r._3)).sum, rs.size)).toMap
    val want = cust.filter(r => bySeg(r._2)._2 > 1).sortBy(_._1)
      .map { case (ck, seg, bal) =>
        val (s, n) = bySeg(seg)
        val loo = s - cents(bal)
        (ck, loo, (n - 1).toLong,
          math.floor(loo.toDouble / (n - 1).toDouble * 1e4).toLong)
      }.toSeq
    assert(got == want)
  }

  test("q188: kNN vote matches an all-pairs BigInt distance recount") {
    val got = QueriesSim.q188KnnClassify(spark, sf)
      .select(col("vec_id"), col("pred_label").cast("long"),
        col("correct"))
      .as[(Long, Long, Boolean)].collect().toSeq
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()
      .map { case (id, l, v) =>
        (id, l, v.map(x => math.floor(x * 1e6).toLong))
      }
    val (test0, train0) = vecs.partition(_._1 % 10 == 0)
    val want = test0.sortBy(_._1).map { case (qid, ql, qv) =>
      val top = train0.map { case (tid, tl, tv) =>
        val d2 = qv.zip(tv).map { case (a, b) =>
          BigInt(a - b) * BigInt(a - b) }.sum
        (d2, tid, tl)
      }.sortBy(t => (t._1, t._2)).take(5)
      val (bestLabel, n) = top.groupBy(_._3).view.mapValues(_.size)
        .toSeq.sortBy { case (l, c) => (-c, l) }.head
      (qid, bestLabel, bestLabel == ql, n)
    }
    assert(got == want.map(w => (w._1, w._2, w._3)).toSeq)
  }

  test("q190: confusion row equals set arithmetic over q153/q55 outputs") {
    val truth = QueriesText.q153SetsimJoin(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = QueriesText.q55MinhashPortable(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val tp = (truth & found).size.toLong
    val got = QueriesText.q190DedupEval(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val prec = if (found.isEmpty) 0L else tp * 1000000L / found.size
    val rec = if (truth.isEmpty) 0L else tp * 1000000L / truth.size
    assert(got == ((truth.size.toLong, found.size.toLong, tp,
      found.size - tp, truth.size - tp, prec, rec)))
    // both paths verify at exact jaccard >= 0.8 -> found ⊆ truth
    assert((found -- truth).isEmpty)
  }

  test("q191: PIT state matches a per-fact version scan with deletes") {
    val got = QueriesCore.q191PitJoin(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("ship_us"), col("has_state"), col("state_seq"),
        col("payload"))
      .as[(Long, Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().toSeq.sorted
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_totalprice")).as[(Long, Long, Long, Double)].collect()
    val byCust = orders.groupBy(_._2)
    val custOf = orders.map(o => o._1 -> o._2).toMap
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        unix_micros(col("l_shipdate").cast("timestamp")))
      .as[(Long, Long, Long)].collect()
    val want: Seq[(Long, Long, Long, Boolean, Option[Long], Option[Double])] =
      items.map { case (ok, ln, ft) =>
        val vs = byCust(custOf(ok)).filter(_._3 <= ft)
        val none = (ok, ln, ft, false,
          None: Option[Long], None: Option[Double])
        if (vs.isEmpty) none
        else {
          val v = vs.maxBy(o => (o._3, o._1)) // (t, vseq) — window order
          if (v._1 % 7 == 0) none // latest change is a delete
          else (ok, ln, ft, true, Some(v._1),
            Some(BigDecimal(v._4).setScale(2,
              BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }.toSeq.sorted
    assert(got == want)
  }

  test("q192: HLL registers match a MessageDigest recount; estimate sane") {
    val got = QueriesCore.q192HllRegisters(spark, sf)
      .select("bucket", "register", "n_exact", "est_micros")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.size == 64)
    val users = Tables.events(spark, sf).select("user_id")
      .as[Long].collect()
    def h32(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val regs = Array.fill(64)(0L)
    users.foreach { u =>
      val h = h32(u); val b = (h % 64).toInt; val rest = h / 64
      val rho = if (rest == 0) 27L
        else 26L - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > regs(b)) regs(b) = rho
    }
    assert(got.map(r => (r._1, r._2)) == regs.indices.map(i => (i, regs(i))))
    val nExact = users.toSet.size.toLong
    assert(got.head._3 == nExact)
    // m=64 HLL: expect the estimate within ~40% of truth on this corpus
    val est = got.head._4.toDouble / 1e6
    assert(est > nExact * 0.6 && est < nExact * 1.4)
  }

  test("q193: semi-additive rollup matches a last-order-per-month scan") {
    val got = QueriesCore.q193SemiAdditive(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_orderkey"), col("o_totalprice"))
      .as[(Long, String, Long, Long, Double)].collect()
    val want = orders.groupBy(o => (o._1, o._2)).toSeq
      .map { case ((_, month), rows) =>
        month -> cents(rows.maxBy(r => (r._3, r._4))._5)
      }
      .groupBy(_._1).toSeq.map { case (m, vs) =>
        (m, vs.size.toLong, vs.map(_._2).sum)
      }.sortBy(_._1)
    assert(got == want)
  }

  test("q194: open-order counts equal a direct per-day stabbing count") {
    val got = QueriesCore.q194ConcurrencySweep(spark, sf)
      .select(col("day").cast("date").cast("string"), col("open_eod"))
      .as[(String, Long)].collect().toMap
    val starts = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").cast("string"))
      .as[(Long, String)].collect().toMap
    val ends = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("e"))
      .select(col("l_orderkey"), col("e").cast("date").cast("string"))
      .as[(Long, String)].collect().toMap
      .map { case (ok, ed) => // end clamped to >= start (query rule)
        ok -> (if (ed < starts(ok)) starts(ok) else ed)
      }
    // half-open [start, end): open at EOD d  <=>  start <= d < end;
    // an order with NO ship events yet has no end — open from start on
    got.foreach { case (d, open) =>
      val want = starts.count { case (ok, sd) =>
        sd <= d && ends.get(ok).forall(_ > d)
      }
      assert(open == want.toLong, s"day $d")
    }
  }

  test("q195: weighted median matches a sorted accumulation scan") {
    val got = QueriesCore.q195WeightedMedian(spark, sf)
      .as[(Long, Long, Long)].collect().head
    val rows = Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_quantity")
      .as[(Double, Double)].collect()
      .map(r => (cents(r._1), BigDecimal(r._2).toLongExact))
    val byPrice = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val tot = byPrice.map(_._2).sum
    var cum = 0L
    val med = byPrice.find { case (_, w) => cum += w; cum * 2 >= tot }.get
    assert(got == ((med._1, cum, tot)))
  }

  private def md5Prefix32(s0: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(md.digest(s0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8), 16)
  }

  test("q196: seeded Laplace noise matches a scalar Scala replay") {
    val got = QueriesCore.q196DpCounts(spark, sf)
      .select(col("c_nationkey").cast("long"), col("true_count"),
        col("noisy_micros"))
      .as[(Long, Long, Long)].collect().toSeq
    val counts = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long")).as[Long].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq.sortBy(_._1).map { case (nk, n) =>
      val u = (md5Prefix32(s"dp:$nk").toDouble + 0.5) / 4294967296.0
      val t = u - 0.5
      val lap = -math.signum(t) * math.log(1.0 - math.abs(t) * 2.0)
      (nk, n, math.floor((n.toDouble + lap) * 1000000.0).toLong)
    }
    assert(got == want)
    // noise is bounded in probability but nonzero somewhere
    assert(got.exists(r => r._3 != r._2 * 1000000L))
  }

  test("q197: collision buckets match a MessageDigest vocabulary replay") {
    val got = QueriesCore.q197FeatureHashing(spark, sf)
      .select("bucket", "n_terms", "total_tf")
      .as[(Int, Long, Long)].collect().toSeq
    val tf = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(tokens).groupBy(identity).view.mapValues(_.size.toLong)
    val want = tf.toSeq
      .map { case (term, n) => ((md5Prefix32(term) % 64).toInt, term, n) }
      .groupBy(_._1).toSeq
      .map { case (b, ts) => (b, ts.size.toLong, ts.map(_._3).sum) }
      .filter(_._2 >= 2).sortBy(_._1)
    assert(got == want)
  }

  test("q198: Benford digits match a BigDecimal string replay") {
    val got = QueriesCore.q198BenfordAudit(spark, sf)
      .select("digit", "n", "share_micros")
      .as[(String, Long, Long)].collect().toSeq
    val digits = Tables.orders(spark, sf)
      .select("o_totalprice").as[Double].collect()
      .map(p => BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString.take(1))
    val tot = digits.length.toLong
    val want = digits.groupBy(identity).toSeq
      .map { case (d, xs) =>
        (d, xs.size.toLong, xs.size.toLong * 1000000L / tot) }
      .sortBy(_._1)
    assert(got == want)
  }

  test("q199: correlation ingredients match a plain-Scala moment sweep") {
    val got = QueriesCore.q199CorrIngredients(spark, sf)
      .select("pair", "n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2",
        "r_sign", "r2_micros")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .as[(Double, Double, Double)].collect()
      .map { case (q, p, d) =>
        (q.toLong, math.round(p * 100) / 100, math.round(d * 100)) }
    def moments(fx: ((Long, Long, Long)) => Long,
        fy: ((Long, Long, Long)) => Long) = {
      val n = rows.length.toLong
      val (sx, sy) = (rows.map(fx).sum, rows.map(fy).sum)
      val sxy = rows.map(r => BigInt(fx(r)) * fy(r)).sum
      val sxx = rows.map(r => BigInt(fx(r)) * fx(r)).sum
      val syy = rows.map(r => BigInt(fy(r)) * fy(r)).sum
      val num = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
      val d1 = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
      val d2 = (BigInt(n) * syy - BigInt(sy) * sy).toDouble
      (n, sx, sy, sxy.toLong, sxx.toLong, syy.toLong,
        math.signum(num).toLong,
        math.floor(num * num / (d1 * d2) * 1000000.0).toLong)
    }
    val want = Seq(
      ("price_disc", moments(_._2, _._3)),
      ("qty_disc", moments(_._1, _._3)),
      ("qty_price", moments(_._1, _._2))).map { case (p, m) =>
      (p, m._1, m._2, m._3, m._4, m._5, m._6, m._7, m._8)
    }
    assert(got == want)
    // r² is a correlation: bounded by 1
    assert(got.forall(_._9 <= 1000000L))
  }

  test("q200: OLS slope matches a BigInt least-squares replay") {
    val got = QueriesCore.q200OlsTrend(spark, sf)
      .select("n_name", "n_weeks", "rev_cents", "slope_sign",
        "slope_milli_abs")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val cn = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val nn = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val weekly = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice"))
      .as[(Long, String, Double)].collect()
      .map { case (ck, d, p) =>
        (nn(cn(ck)), java.time.LocalDate.parse(d).toEpochDay / 7,
          math.round(p * 100)) }
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toSeq
    val want = weekly.groupBy(_._1._1).toSeq.map { case (nat, ws) =>
      val minW = ws.map(_._1._2).min
      val pts = ws.map { case ((_, w), y) => (w - minW, y) }
      val n = BigInt(pts.length)
      val sx = BigInt(pts.map(_._1).sum)
      val sy = BigInt(pts.map(_._2).sum)
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      (nat, pts.length.toLong, sy.toLong, num.signum.toLong,
        (num.abs * 1000 / den).toLong)
    }.sortBy(_._1)
    assert(got == want)
  }

  test("q201: Gini matches a sorted-prefix BigInt recount; bounded") {
    val got = QueriesCore.q201Gini(spark, sf)
      .select("n_name", "n_customers", "spend_cents", "gini_micros")
      .as[(String, Long, Long, Long)].collect().toSeq
    val cn = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val nn = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val spend = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => math.round(r._2 * 100)).sum).toSeq
    val want = spend.groupBy(r => nn(cn(r._1))).toSeq.map { case (nat, cs) =>
      val xs = cs.sortBy(c => (c._2, c._1)).map(_._2)
      val n = BigInt(xs.length)
      val tot = BigInt(xs.sum)
      val w = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      (nat, xs.length.toLong, tot.toLong,
        ((2 * w - (n + 1) * tot) * 1000000 / (n * tot)).toLong)
    }.sortBy(_._1)
    assert(got == want)
    assert(got.forall(r => r._4 >= 0L && r._4 < 1000000L))
  }

  test("q202: t-closeness EMD matches a distribution replay") {
    val got = QueriesCore.q202TCloseness(spark, sf)
      .select("c_nationkey", "c_mktsegment", "n_rows", "emd_num",
        "emd_den", "emd_micros", "is_close")
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect().toSeq
    val rows = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
      .map { case (nk, seg, b) =>
        val c = math.round(b * 100)
        (nk, seg, if (c < 0) 0 else if (c < 500000L) 1 else 2) }
    val nTot = rows.length.toLong
    val glob = (0 to 2).map(b => rows.count(_._3 == b).toLong)
    val want = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((nk, seg), rs) =>
        val ng = rs.length.toLong
        val cnt = (0 to 2).map(b => rs.count(_._3 == b).toLong)
        val cums = (0 to 2).scanLeft(0L) { (acc, b) =>
          acc + cnt(b) * nTot - glob(b) * ng }.tail
        val num = cums.map(math.abs).sum
        val den = 2 * ng * nTot
        (nk, seg, ng, num, den, num * 1000000L / den, num * 100 <= den * 15)
      }.sortBy(r => (r._1, r._2))
    assert(got == want)
    // the last cumulative term is identically zero (both are distributions)
    assert(want.nonEmpty)
  }

  test("q203: KM risk table matches a per-user lifetime replay") {
    val got = QueriesCore.q203Survival(spark, sf)
      .select("dur_hours", "n_risk", "deaths", "censored", "hazard_micros")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val per = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"))
      .as[(Long, Long, Long)].collect()
    val h = per.map(_._3).max
    val lab = per.map { case (_, f, l) =>
      ((l - f) / 3600000000L, l < h - 24L * 3600000000L) }
    val want = lab.groupBy(_._1).toSeq.map { case (d, rs) =>
      val deaths = rs.count(_._2).toLong
      val nRisk = lab.count(_._1 >= d).toLong
      (d, nRisk, deaths, rs.size - deaths,
        deaths * 1000000L / nRisk)
    }.filter(_._3 > 0).map(r => (r._1, r._2, r._3, r._4.toLong, r._5))
      .sortBy(_._1)
    assert(got == want)
    // risk set shrinks as duration grows
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("q204: autocorrelation moments match a row-lag replay") {
    val got = QueriesCore.q204Autocorr(spark, sf)
      .select("lag", "n_pairs", "sum_y", "sum_prev", "sum_yp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val daily = Tables.events(spark, sf)
      .select(col("ts").cast("date").cast("string")).as[String].collect()
      .groupBy(identity).toSeq.map { case (d, xs) => (d, xs.size.toLong) }
      .sortBy(_._1).map(_._2)
    val want = Seq(1, 7).map { k =>
      val pairs = daily.drop(k).zip(daily.dropRight(k))
      (k.toLong, pairs.size.toLong, pairs.map(_._1).sum,
        pairs.map(_._2).sum, pairs.map(p => p._1 * p._2).sum)
    }
    assert(got == want)
  }

  test("q205: ordered concat matches a sorted-take replay") {
    val got = QueriesCore.q205Listagg(spark, sf)
      .select("c_mktsegment", "top5_names", "top5_bal_cents")
      .as[(String, String, Long)].collect().toSeq
    val cust = Tables.customer(spark, sf)
      .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
      .as[(String, Long, String, Double)].collect()
    val want = cust.groupBy(_._1).toSeq.map { case (seg, rs) =>
      val top = rs.sortBy(r => (-r._4, r._2)).take(5)
      (seg, top.map(_._3).mkString(","),
        top.map(r => math.round(r._4 * 100)).sum)
    }.sortBy(_._1)
    assert(got == want)
  }

  test("q206: RAKE scores match a brute-force phrase replay") {
    val got = QueriesText.q206RakeKeywords(spark, sf)
      .select("phrase", "n_occurrences", "score_micros")
      .as[(String, Long, Long)].collect().toSeq
    val stop = Set("the", "a", "an", "of", "to", "and", "in", "is", "on",
      "for", "with", "as", "by", "at", "it", "this", "that", "are", "be",
      "or", "from")
    val docs = Tables.documents(spark, sf)
      .select("text").as[String].collect()
    val phrases = docs.flatMap { t =>
      val ws = t.toLowerCase.trim.split("\\s+")
        .map(_.replaceAll("[^a-z0-9]", ""))
      // split into maximal non-stopword runs
      val runs = scala.collection.mutable.Buffer[Vector[String]]()
      var cur = Vector.empty[String]
      ws.foreach { w =>
        if (w.isEmpty || stop(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val deg = phrases.flatMap(p => p.map(w => (w, p.size.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val score = freq.keys.map(w => (w, deg(w) * 1000000L / freq(w))).toMap
    val want = phrases.map(p => (p.mkString(" "), p.map(score).sum))
      .groupBy(_._1).toSeq
      .map { case (ph, xs) => (ph, xs.size.toLong, xs.head._2) }
      .sortBy(r => (-r._3, r._1)).take(20)
    assert(got == want)
  }

  test("q207: idle-balance rollup matches a set-difference replay") {
    val got = QueriesCore.q207IdleBalance(spark, sf)
      .select("c_nationkey", "n_cust", "total_bal_cents")
      .as[(Long, Long, Long)].collect().toSeq
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2, math.round(r._3 * 100)))
    val pos = cust.map(_._3).filter(_ > 0)
    val (sp, np) = (pos.sum, pos.size.toLong)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select("o_custkey").as[Long].collect().toSet
    val want = cust
      .filter(r => r._3 * np > sp && !recent(r._1))
      .groupBy(_._2).toSeq
      .map { case (nk, rs) => (nk, rs.size.toLong, rs.map(_._3).sum) }
      .sortBy(_._1)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q208: nation-pair volume is symmetric-complete and year-bounded") {
    val got = QueriesCore.q208NationVolume(spark, sf)
      .select("supp_nation", "cust_nation", "l_year", "n_items")
      .as[(String, String, Int, Long)].collect().toSeq
    assert(got.forall(r => r._1 != r._2))
    assert(got.forall(r => r._3 == 1995 || r._3 == 1996))
    // cross-check total item count against a direct filtered join
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
    val sup = Tables.supplier(spark, sf)
      .select("s_suppkey", "s_nationkey").as[(Long, Long)].collect().toMap
    val cn = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val ok = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val items = li.select("l_orderkey", "l_suppkey")
      .as[(Long, Long)].collect()
      .count(r => sup(r._2) != cn(ok(r._1)))
    assert(got.map(_._4).sum == items)
  }

  test("q209: fixed-point percent_rank/cume_dist match a sort replay") {
    val got = QueriesCore.q209PercentRank(spark, sf)
      .select("c_custkey", "n_name", "rnk", "pct_rank_micros",
        "cume_dist_micros")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._2, r._1))
    val nn = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, nn(r._2), math.round(r._3 * 100)))
    val want = cust.groupBy(_._2).toSeq.flatMap { case (nat, rs) =>
      val n = rs.size.toLong
      rs.map { case (ck, _, bal) =>
        val below = rs.count(_._3 < bal).toLong
        val le = rs.count(_._3 <= bal).toLong
        (ck, nat, below + 1,
          (below * 1000000L) / (n - 1), (le * 1000000L) / n)
      }
    }.sortBy(r => (r._2, r._1))
    assert(got == want)
  }

  test("q210: SAX runs match an ordinal-binning replay; runs partition time") {
    val got = QueriesCore.q210SaxRuns(spark, sf)
      .select("run_id", "symbol", "n_days")
      .as[(Long, Int, Long)].collect().toSeq
    val daily = Tables.events(spark, sf)
      .select(col("ts").cast("date").cast("string")).as[String].collect()
      .groupBy(identity).toSeq.map { case (d, xs) => (d, xs.size.toLong) }
      .sortBy(_._1)
    val n = daily.size
    val rankOf = daily.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((d, _), i) => (d, i.toLong) }.toMap
    val syms = daily.map { case (d, _) => (rankOf(d) * 4 / n).toInt }
    val runs = syms.foldLeft(List.empty[(Int, Long)]) {
      case (acc, s) if acc.nonEmpty && acc.head._1 == s =>
        (s, acc.head._2 + 1) :: acc.tail
      case (acc, s) => (s, 1L) :: acc
    }.reverse.zipWithIndex.map { case ((s, c), i) => (i + 1L, s, c) }
    assert(got == runs)
    assert(got.map(_._3).sum == n.toLong)
  }

  test("q211: stationary vector matches a dense-matrix integer replay") {
    val got = QueriesCore.q211MarkovStationary(spark, sf)
      .as[(String, Long)].collect().toSeq
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val c = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = c.keys.map(_._1).toSeq.distinct.sorted
    val rowSum = states.map(s =>
      (s, c.collect { case ((a, _), v) if a == s => v }.sum)).toMap
    var pi = states.map(s => (s, 1000000L / 5)).toMap
    for (_ <- 1 to 6) {
      pi = states.map { dst =>
        (dst, states.map { src =>
          c.get((src, dst)).fold(0L)(cc =>
            pi.getOrElse(src, 0L) * cc / rowSum(src))
        }.sum)
      }.toMap.filter(_._2 != 0L)
    }
    assert(got == pi.toSeq.sortBy(_._1))
    // mass stays within floor-loss of 1.0
    assert(math.abs(got.map(_._2).sum - 1000000L) < 100L)
  }

  test("q212: information gain matches a Math.log replay; IG >= 0") {
    val got = QueriesCore.q212InfoGain(spark, sf)
      .select("feature", "n", "h_y_micros", "h_y_given_x_micros",
        "info_gain_micros")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val cust = Tables.customer(spark, sf)
      .select("c_mktsegment", "c_nationkey", "c_acctbal")
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2, math.round(r._3 * 100)))
    val nTot = cust.length.toLong
    val tot = cust.map(_._3).sum
    val y = cust.map(r => if (r._3 * nTot > tot) 1L else 0L)
    val n1 = y.sum
    def term(m: Long, base: Long): Long =
      if (m == 0) 0L
      else math.floor(m.toDouble * math.log(base.toDouble / m.toDouble) /
        (nTot.toDouble * math.log(2.0)) * 1000000.0).toLong
    val hY = term(n1, nTot) + term(nTot - n1, nTot)
    def gain(fx: ((String, Long, Long)) => String): (Long, Long) = {
      val hyx = cust.zip(y).groupBy(r => fx(r._1)).values.map { g =>
        val nx = g.size.toLong
        val nx1 = g.map(_._2).sum
        term(nx1, nx) + term(nx - nx1, nx)
      }.sum
      (hyx, hY - hyx)
    }
    val (hseg, igseg) = gain(_._1)
    val (hnat, ignat) = gain(_._2.toString)
    assert(got == Seq(
      ("c_mktsegment", nTot, hY, hseg, igseg),
      ("c_nationkey", nTot, hY, hnat, ignat)))
    assert(got.forall(_._5 >= 0L))
  }

  test("q213: calendar spine covers every day incl. empty; counts add up") {
    val got = QueriesCore.q213CalendarSpine(spark, sf)
      .select("isodow", "n_days", "n_order_days", "n_orders", "rev_cents")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    val days = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date").cast("string"), col("o_totalprice"))
      .as[(String, Double)].collect()
      .map(r => (java.time.LocalDate.parse(r._1), math.round(r._2 * 100)))
    val (lo, hi) = (days.map(_._1).min, days.map(_._1).max)
    val perDay = days.groupBy(_._1).view
      .mapValues(rs => (rs.size.toLong, rs.map(_._2).sum)).toMap
    val spine = Iterator.iterate(lo)(_.plusDays(1))
      .takeWhile(!_.isAfter(hi)).toSeq
    val want = spine.groupBy(_.getDayOfWeek.getValue).toSeq
      .map { case (dw, ds) =>
        val hits = ds.flatMap(perDay.get)
        (dw, ds.size.toLong, hits.size.toLong,
          hits.map(_._1).sum, hits.map(_._2).sum)
      }.sortBy(_._1)
    assert(got == want)
    assert(got.map(_._2).sum ==
      java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1)
  }

  test("q214: interpolated percentiles match a sorted-array replay") {
    val got = QueriesCore.q214PercentileCont(spark, sf)
      .select("l_returnflag", "p", "value_micros")
      .as[(String, Int, Long)].collect().toSeq
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice")
      .as[(String, Double)].collect()
      .map(r => (r._1, math.round(r._2 * 100)))
    val want = li.groupBy(_._1).toSeq.flatMap { case (f, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.length.toLong
      Seq(25, 50, 75, 90).map { p =>
        val pos = p * (n - 1)
        val lo = (pos / 100).toInt
        val rem = pos % 100
        val vlo = xs(lo)
        val vhi = if (rem == 0) xs(lo) else xs(lo + 1)
        (f, p, vlo * 1000000L + (vhi - vlo) * 1000000L * rem / 100)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
    // monotone in p within each flag
    got.groupBy(_._1).values.foreach { g =>
      val vs = g.sortBy(_._2).map(_._3)
      assert(vs == vs.sorted)
    }
  }

  test("q215: assortativity moments match a degree-map replay") {
    val got = QueriesCore.q215DegreeAssortativity(spark, sf)
      .select("n_edges", "sum_dsupp", "sum_dpart", "sum_dd")
      .as[(Long, Long, Long, Long)].collect().head
    val edges = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val ds = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val dp = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = (edges.length.toLong,
      edges.map(e => ds(e._1)).sum, edges.map(e => dp(e._2)).sum,
      edges.map(e => ds(e._1) * dp(e._2)).sum)
    assert(got == want)
  }

  test("q216: TWAP matches an interval-sweep BigInt replay") {
    val got = QueriesCore.q216Twap(spark, sf)
      .select("user_id", "n_intervals", "span_micros", "twap_micros")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val want = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      val s = es.sortBy(e => (e._2, e._3))
      val iv = s.zip(s.drop(1)).map { case (a, b) =>
        (math.floor(a._4 * 1000000.0).toLong, b._2 - a._2) }
      val den = iv.map(_._2).sum
      val num = iv.map(i => BigInt(i._1) * i._2).sum
      (u, iv.size.toLong, den, (num / den).toLong)
    }.sortBy(_._1)
    assert(got == want)
  }

  test("q217: aggregate-lambda EWMA equals a sequential Scala fold") {
    val got = QueriesCore.q217Ewma(spark, sf)
      .select("event_type", "n_days", "ewma_micros")
      .as[(String, Long, Long)].collect().toSeq
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").cast("string"))
      .as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), y) => (t, d, y) }
    val want = daily.groupBy(_._1).toSeq.map { case (t, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      val s = ys.tail.foldLeft(ys.head * 1000000L) { (acc, y) =>
        (y * 1000000L + 3L * acc) / 4L }
      (t, ys.size.toLong, s)
    }.sortBy(_._1)
    assert(got == want)
  }

  test("q218: log-domain stats match a Math.log replay; gm <= mean") {
    val got = QueriesCore.q218LogStats(spark, sf)
      .select("n_name", "n_orders", "sum_ln_micros", "geo_mean_x100")
      .as[(String, Long, Long, Long)].collect().toSeq
    val cn = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val nn = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val ords = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").as[(Long, Double)].collect()
      .map { case (ck, p) =>
        (nn(cn(ck)),
          math.floor(math.log(math.round(p * 100).toDouble) * 1e6).toLong,
          math.round(p * 100)) }
    val want = ords.groupBy(_._1).toSeq.map { case (nat, rs) =>
      val slm = rs.map(_._2).sum
      val n = rs.size.toLong
      (nat, n, slm,
        math.floor(math.exp((slm / n).toDouble / 1e6) * 100.0).toLong)
    }.sortBy(_._1)
    assert(got == want)
    // AM-GM: geometric mean never exceeds the arithmetic mean
    val am = ords.groupBy(_._1).view.mapValues(rs =>
      rs.map(_._3).sum / rs.size)
    assert(got.forall(r => r._4 <= am(r._1) * 100))
  }

  test("q219: FIFO allocation conserves min(returns, sales) per part") {
    val got = QueriesCore.q219FifoMatch(spark, sf)
      .select("l_partkey", "matched_qty")
      .as[(Long, Long)].collect().toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_returnflag", "l_quantity")
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2 == "R", r._3.toLong))
    val perPart = li.groupBy(_._1).view.mapValues { rs =>
      (rs.filter(_._2).map(_._3).sum, rs.filterNot(_._2).map(_._3).sum)
    }.toMap
    // total FIFO allocation per part = overlap of [0, R) and [0, S)
    perPart.foreach { case (pk, (r, s)) =>
      val expect = math.min(r, s)
      assert(got.getOrElse(pk, 0L) == expect,
        s"part $pk: matched=${got.get(pk)} expected=$expect")
    }
  }

  test("q220: bloom-pruned join result is EXACTLY the plain join") {
    val got = QueriesCore.q220RuntimeBloomJoin(spark, sf)
      .select("s_suppkey", "n_items", "rev_cents")
      .as[(Long, Long, Long)].collect().toSeq
    val dim = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") === 7)
      .select("s_suppkey").as[Long].collect().toSet
    val want = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_extendedprice")
      .as[(Long, Double)].collect()
      .filter(r => dim(r._1))
      .groupBy(_._1).toSeq
      .map { case (sk, rs) =>
        (sk, rs.size.toLong, rs.map(r => math.round(r._2 * 100)).sum) }
      .sortBy(_._1)
    assert(got == want)
  }

  test("q221: reconciliation recovers exactly the planted drift") {
    val got = QueriesCore.q221TableReconcile(spark, sf)
      .select("o_orderkey", "status")
      .as[(Long, String)].collect().toSet
    val keys = Tables.orders(spark, sf)
      .select("o_orderkey").as[Long].collect()
    val want = keys.collect {
      case k if k % 2003 == 0 => (k, "only_a")
      case k if k % 1009 == 0 => (k, "changed")
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q222: seasonal index matches a cross-multiplied replay") {
    val got = QueriesCore.q222SeasonalIndex(spark, sf)
      .select("isodow", "n_days", "rev_cents", "seasonal_index_micros")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice"))
      .as[(String, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (d, rs) =>
        (java.time.LocalDate.parse(d), rs.map(r => math.round(r._2 * 100)).sum) }
    val (nAll, tAll) = (daily.size.toLong, daily.map(_._2).sum)
    val want = daily.groupBy(_._1.getDayOfWeek.getValue).toSeq
      .map { case (dw, ds) =>
        val rd = ds.map(_._2).sum
        (dw, ds.size.toLong, rd,
          (BigInt(rd) * nAll * 1000000 /
            (BigInt(ds.size) * tAll)).toLong)
      }.sortBy(_._1)
    assert(got == want)
  }

  test("q223: streaming TWAP over 3 micro-batches equals the batch sweep") {
    val stream = QueriesCore.q223StreamTwap(spark, sf)
      .select("user_id", "n_intervals", "span_micros", "twap_micros")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = QueriesCore.q216Twap(spark, sf)
      .select("user_id", "n_intervals", "span_micros", "twap_micros")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("q224: quantile-normalized reference matches a three-sort replay") {
    val got = QueriesCore.q224QuantileNorm(spark, sf)
      .select("rank", "ref_micros").as[(Long, Long)].collect().toSeq
      .sortBy(_._1)
    val li = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_extendedprice", "l_discount")
      .as[(Double, Double, Double)].collect()
    val q = li.map(_._1.toLong).sorted
    val p = li.map(r => math.round(r._2 * 100)).sorted
    val d = li.map(r => math.round(r._3 * 100)).sorted
    val want = (0 until li.length).map(i =>
      (i + 1L, (q(i) + p(i) + d(i)) * 1000000L / 3))
    assert(got == want)
    // reference distribution is monotone by construction
    assert(got.map(_._2) == got.map(_._2).sorted)
  }

  test("q225: cohort LTV curve matches a per-customer replay") {
    val got = QueriesCore.q225CohortLtv(spark, sf)
      .select("cohort_month", "offset", "cohort_size", "cum_rev_cents")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long"),
        col("o_totalprice"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2, math.round(r._3 * 100)))
    val cm = o.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cm.values.groupBy(identity).view.mapValues(_.size.toLong)
    val cells = o.groupBy(r => (cm(r._1), r._2 - cm(r._1))).view
      .mapValues(_.map(_._3).sum).toSeq
    val want = cells.groupBy(_._1._1).toSeq.flatMap { case (c, rs) =>
      val sorted = rs.sortBy(_._1._2)
      sorted.scanLeft((0L, 0L)) { case ((_, acc), ((_, off), rev)) =>
        (off, acc + rev) }.tail
        .map { case (off, cum) => (c, off, sizes(c), cum) }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
    // cumulative revenue is monotone within each cohort
    got.groupBy(_._1).values.foreach { g =>
      val vs = g.sortBy(_._2).map(_._4)
      assert(vs == vs.sorted)
    }
  }

  test("q226: strict funnel matches an anchor-chain replay; monotone") {
    val got = QueriesCore.q226StrictFunnel(spark, sf)
      .as[(Long, Long, Long)].collect().head
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val day = 86400000000L
    val byUser = ev.groupBy(_._1)
    val t1 = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "signup").map(_._3).minOption.map(u -> _) }
    val t2 = t1.flatMap { case (u, a) =>
      byUser(u).filter(e => e._2 == "view" && e._3 > a && e._3 <= a + day)
        .map(_._3).minOption.map(u -> _) }
    val t3 = t2.flatMap { case (u, a) =>
      byUser(u).filter(e =>
        e._2 == "purchase" && e._3 > a && e._3 <= a + day)
        .map(_._3).minOption.map(u -> _) }
    assert(got == (t1.size.toLong, t2.size.toLong, t3.size.toLong))
    assert(got._1 >= got._2 && got._2 >= got._3)
  }

  test("q227: segment overlap matrix matches a set replay; symmetric-complete") {
    val got = QueriesCore.q227SegmentOverlap(spark, sf)
      .select("seg_a", "seg_b", "n_a", "n_b", "n_both")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val seg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").as[(Long, String)]
      .collect().toMap
    val ok = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val partsBySeg = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_orderkey").as[(Long, Long)].collect()
      .map(r => (seg(ok(r._2)), r._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (a, b, na, nb, nboth) =>
      assert(na == partsBySeg(a).size.toLong)
      assert(nb == partsBySeg(b).size.toLong)
      assert(nboth == (partsBySeg(a) & partsBySeg(b)).size.toLong)
    }
    assert(got.size == 10)
  }

  test("q228: count-product estimate equals the actual join size") {
    val got = QueriesCore.q228JoinSizeStats(spark, sf)
      .select("est", "actual", "top5_contrib", "top5_min")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._1 == got._2) // full count tables → estimator is exact
    val counts = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_returnflag").as[(Long, String)].collect()
    val ca = counts.groupBy(_._1).view.mapValues(_.size.toLong)
    val cb = counts.filter(_._2 == "R").groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val prods = ca.toSeq.flatMap { case (k, c) =>
      cb.get(k).map(c2 => (k, c * c2)) }
    assert(got._1 == prods.map(_._2).sum)
    assert(got._3 == prods.sortBy(r => (-r._2, r._1)).take(5).map(_._2).sum)
  }

  test("q229: banded duplicate pairs match a collision replay") {
    val got = QueriesCore.q229DupInvoices(spark, sf)
      .select("o_custkey", "k1", "k2")
      .as[(Long, Long, Long)].collect().toSet
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2, math.round(r._3 * 100) / 100000))
    val want = o.groupBy(r => (r._1, r._3)).values.flatMap { g0 =>
      val g = g0.toSeq
      for {
        a <- g; b <- g if a._2 < b._2
      } yield (a._1, a._2, b._2)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q230: PSI terms match a smoothed Math.log replay; PSI >= 0") {
    val got = QueriesCore.q230PsiDrift(spark, sf)
      .select("bin", "n_early", "n_late", "psi_term_micros")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val o = Tables.orders(spark, sf)
      .select(col("o_totalprice"), year(col("o_orderdate")))
      .as[(Double, Int)].collect()
      .map(r => (math.min(math.round(r._1 * 100) / 6000000, 9).toInt,
        r._2 <= 1997))
    val na = o.count(_._2).toLong
    val nb = o.size - na
    val want = (0 until 10).map { bin =>
      val a = o.count(r => r._1 == bin && r._2).toLong
      val b = o.count(r => r._1 == bin && !r._2).toLong
      val pa = (a + 1).toDouble / (na + 10)
      val pb = (b + 1).toDouble / (nb + 10)
      (bin, a, b,
        math.floor((pa - pb) * math.log(pa / pb) * 1000000.0).toLong)
    }
    assert(got == want)
    // each term is (x-y)·ln(x/y) ≥ 0 up to the micro floor
    assert(got.forall(_._4 >= -1L))
  }

  test("q231: rank-sum AUC equals the pairwise-comparison definition") {
    val got = QueriesCore.q231AucExact(spark, sf)
      .select("n_pos", "n_neg", "auc_micros")
      .as[(Long, Long, Long)].collect().head
    val sp = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"),
        (col("o_orderdate").cast("date") >= lit("2001-01-01").cast("date"))
          .cast("long"))
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1).toSeq.map { case (_, rs) =>
        (rs.map(r => math.round(r._2 * 100)).sum, rs.map(_._3).max) }
    val pos = sp.filter(_._2 == 1L).map(_._1)
    val neg = sp.filter(_._2 == 0L).map(_._1)
    // AUC = P(score⁺ > score⁻) + ½P(tie), counted pairwise
    val wins = pos.map(p => neg.count(_ < p).toLong).sum
    val ties = pos.map(p => neg.count(_ == p).toLong).sum
    val aucPairwise =
      (2 * wins + ties) * 1000000L / (2 * pos.size.toLong * neg.size)
    assert(got == (pos.size.toLong, neg.size.toLong, aucPairwise))
  }

  test("q232: decile lift table conserves counts and positives") {
    val got = QueriesCore.q232DecileLift(spark, sf)
      .select("decile", "n_customers", "n_pos", "cum_gain_micros")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val sp = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"),
        (col("o_orderdate").cast("date") >= lit("2001-01-01").cast("date"))
          .cast("long"))
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1).toSeq.map { case (ck, rs) =>
        (ck, rs.map(r => math.round(r._2 * 100)).sum, rs.map(_._3).max) }
    assert(got.map(_._2).sum == sp.size.toLong)
    assert(got.map(_._3).sum == sp.map(_._3).sum)
    // ordinal deciles replayed
    val byDec = sp.sortBy(r => (-r._2, r._1)).zipWithIndex
      .groupBy { case (_, i) => i * 10 / sp.size }
    got.foreach { case (d, n, p, _) =>
      assert(n == byDec(d).size.toLong)
      assert(p == byDec(d).map(_._1._3).sum)
    }
    // cumulative gain reaches 100% at the last decile
    assert(got.maxBy(_._1)._4 == 1000000L)
  }

  test("q233: frontier BFS matches an in-memory multi-source BFS") {
    val got = QueriesCore.q233BfsHops(spark, sf)
      .select("part_id", "hop").as[(Long, Long)].collect().toMap
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
      .distinct
    val freq = baskets.groupBy(_._2).filter(_._2.size >= 25).keySet
    val pruned = baskets.filter(r => freq(r._2))
    val edges = pruned.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.groupBy(identity).filter(_._2.size >= 3).keySet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = adj.keySet.filter(_ % 10 == 0).map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1L to 4L) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> h)
      frontier = next
    }
    assert(got == dist)
    assert(got.nonEmpty)
  }

  test("q235: KS statistic matches a sorted two-sample sweep") {
    val got = QueriesCore.q235KsTest(spark, sf)
      .select("n_early", "n_late", "ks_micros")
      .as[(Long, Long, Long)].collect().head
    val o = Tables.orders(spark, sf)
      .select(col("o_totalprice"), year(col("o_orderdate")))
      .as[(Double, Int)].collect()
      .map(r => (math.round(r._1 * 100), r._2 <= 1997))
    val a = o.filter(_._2).map(_._1).sorted
    val b = o.filterNot(_._2).map(_._1).sorted
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val values = (a ++ b).distinct.sorted
    val dnum = values.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      (BigInt(ca) * nb - BigInt(cb) * na).abs
    }.max
    assert(got == (na, nb, (dnum * 1000000 / (BigInt(na) * nb)).toLong))
    assert(got._3 >= 0L && got._3 <= 1000000L)
  }

  test("q236: Lorenz curve matches a sorted replay; convex to 100%") {
    val got = QueriesCore.q236LorenzCurve(spark, sf)
      .select("decile", "n_customers", "spend_cents", "cum_share_micros")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val spend = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (ck, rs) => (ck, rs.map(r => math.round(r._2 * 100)).sum) }
    val tot = spend.map(_._2).sum
    val sorted = spend.sortBy(r => (r._2, r._1))
    val byDec = sorted.zipWithIndex
      .groupBy { case (_, i) => i * 10 / sorted.size }
    var cum = 0L
    val want = (0 to 9).map { d =>
      val g = byDec(d)
      cum += g.map(_._1._2).sum
      (d, g.size.toLong, g.map(_._1._2).sum,
        (BigInt(cum) * 1000000 / tot).toLong)
    }
    assert(got == want)
    assert(got.last._4 == 1000000L)
    // ascending-sorted deciles → shares grow ever faster (convexity)
    val incs = got.map(_._4).prepended(0L).sliding(2).map(p => p(1) - p(0)).toSeq
    assert(incs == incs.sorted)
  }

  test("q237: SPRT walk matches a sequential Scala replay") {
    val got = QueriesCore.q237Sprt(spark, sf)
      .select("n_obs", "llr_micros", "decision")
      .as[(Long, Long, String)].collect().head
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")), col("event_id"),
        (col("event_type") === "error"))
      .as[(Long, Long, Boolean)].collect()
      .sortBy(e => (e._1, e._2))
    val se = math.floor(math.log(0.30 / 0.25) * 1e6).toLong
    val so = math.floor(math.log(0.70 / 0.75) * 1e6).toLong
    val bd = math.floor(math.log(19.0) * 1e6).toLong
    var cum = 0L; var n = 0L
    var hit: Option[(Long, Long)] = None
    for (e <- ev if hit.isEmpty) {
      cum += (if (e._3) se else so); n += 1
      if (cum >= bd || cum <= -bd) hit = Some((n, cum))
    }
    val want = hit match {
      case Some((nn, c)) =>
        (nn, c, if (c >= bd) "accept_h1" else "accept_h0")
      case None => (ev.size.toLong, cum, "continue")
    }
    assert(got == want)
  }

  test("q238: conformal band matches an ordinal residual replay") {
    val got = QueriesCore.q238ConformalInterval(spark, sf)
      .select("n_name", "n_customers", "median_cents", "q90_resid_cents")
      .as[(String, Long, Long, Long)].collect().toSeq
    val cn = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val nn = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val spend = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").as[(Long, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (ck, rs) =>
        (nn(cn(ck)), ck, rs.map(r => math.round(r._2 * 100)).sum) }
    val want = spend.groupBy(_._1).toSeq.map { case (nat, cs) =>
      val n = cs.size
      val med = cs.sortBy(c => (c._3, c._2)).apply((n + 1) / 2 - 1)._3
      val resid = cs.map(c => (math.abs(c._3 - med), c._2))
        .sortBy(identity)
      val ord = math.min(((n + 1) * 9 + 9) / 10, n)
      (nat, n.toLong, med, resid(ord - 1)._1)
    }.sortBy(_._1)
    assert(got == want)
    assert(got.forall(_._4 >= 0L))
  }

  test("q239: next-event accuracy matches a transition-argmax replay") {
    val got = QueriesCore.q239NextEventAccuracy(spark, sf)
      .select("src", "predicted", "n_transitions", "n_correct")
      .as[(String, String, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val pred = trans.groupBy(_._1).view.mapValues { ts =>
      ts.groupBy(_._2).toSeq.map { case (d, xs) => (d, xs.size) }
        .minBy { case (d, c) => (-c, d) }._1
    }.toMap
    val want = trans.groupBy(_._1).toSeq.map { case (src, ts) =>
      (src, pred(src), ts.size.toLong,
        ts.count(_._2 == pred(src)).toLong)
    }.sortBy(_._1)
    assert(got == want)
    // a majority-class predictor can't do worse than 1/k on its class
    assert(got.forall(r => r._4 > 0L))
  }

  test("q240: CSV lines round-trip through an RFC-4180 parser") {
    val got = QueriesCore.q240CsvExport(spark, sf)
      .select("doc_id", "csv_line").as[(Long, String)].collect().toSeq
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "text")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    def parse(line: String): Seq[String] = {
      val out = scala.collection.mutable.Buffer.empty[String]
      val sb = new StringBuilder
      var inQ = false; var i = 0
      while (i < line.length) {
        val c = line(i)
        if (inQ) {
          if (c == '"' && i + 1 < line.length && line(i + 1) == '"') {
            sb += '"'; i += 1
          } else if (c == '"') inQ = false
          else sb += c
        } else {
          if (c == '"') inQ = true
          else if (c == ',') { out += sb.result(); sb.clear() }
          else sb += c
        }
        i += 1
      }
      out += sb.result()
      out.toSeq
    }
    got.foreach { case (id, line) =>
      val d = docs(id)
      assert(parse(line) == Seq(id.toString, d._2, d._3, d._4),
        s"doc $id fails round-trip")
    }
    assert(got.size == docs.size)
  }

  test("q189: trigram-probed search equals the naive contains scan") {
    val got = QueriesText.q189TrigramSearch(spark, sf)
      .as[(String, Long)].collect().toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = (for {
      p <- Seq("window", "customer", "fast merge")
      (id, t) <- docs if t.contains(p)
    } yield (p, id)).toSet
    assert(got == want)
    assert(got.nonEmpty) // patterns chosen to hit the synthetic corpus
  }
}
