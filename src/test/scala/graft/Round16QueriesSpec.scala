package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Round-16 additions: the three §2 gate promotions (q298/q299/q300),
  * the eval-metric wave (q302 kappa, q305 pass@k, q306 Bradley–Terry),
  * and the q143 single-shuffle rework. The DuckDB gate pins exact
  * values at sf0.01; these specs pin the arithmetic independently —
  * a BigInt re-implementation of the MM rounds for q306, and exact
  * accounting identities for the rest.
  */
class Round16QueriesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("btRanking matches an independent BigInt MM simulation") {
    import spark.implicits._
    val duelList = List(("A", "B"), ("A", "B"), ("B", "A"),
      ("A", "C"), ("C", "B"))
    val got = QueriesStats.btRanking(spark, duelList.toDF("winner", "loser"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // independent simulation of the declared semantics: 3 synchronous
    // MM rounds, micro fixed-point, truncating integral division
    // (BigInt / truncates toward zero — all operands non-negative)
    val T = BigInt("1000000000000")
    val wins = duelList.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val pairs = duelList.map { case (w, l) => if (w < l) (w, l) else (l, w) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val players = (duelList.map(_._1) ++ duelList.map(_._2)).distinct.sorted
    var g: Map[String, BigInt] = players.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 3) {
      val terms = pairs.map { case ((a, b), nij) =>
        (a, b) -> (BigInt(nij) * T / (g(a) + g(b)))
      }
      val d = players.map { p =>
        p -> terms.collect { case ((a, b), t) if a == p || b == p => t }.sum
      }.toMap
      val raw = players.map { p =>
        p -> BigInt(wins.getOrElse(p, 0L)) * T / d(p)
      }.toMap
      val z = raw.values.sum
      g = players.map { p => p -> raw(p) * 1000000 * players.size / z }.toMap
    }
    val duelCounts = (duelList.map(_._1) ++ duelList.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (p <- players) {
      val (w, n, gamma) = got(p)
      assert(w == wins.getOrElse(p, 0L), s"$p wins")
      assert(n == duelCounts(p), s"$p duels")
      assert(gamma == g(p).toLong, s"$p gamma: got $gamma want ${g(p)}")
    }
    // A won 3 of its 4 duels, B won 1 of 4: strengths must order A > B
    assert(got("A")._3 > got("B")._3)
  }

  test("q302 kappa recomposes from its own po/pe outputs") {
    val rows = QueriesStats.q302CohenKappa(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (po, pe, k) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(po >= 0 && po <= 1000000)
      assert(pe > 0 && pe < 1000000)
      // po/pe are independently floored ppm, so recomposition carries
      // a few-ppm rounding band — the DuckDB gate pins exact values
      val recomposed = (po - pe).toDouble * 1000000 / (1000000 - pe)
      assert(math.abs(recomposed - k) <= 5,
        s"kappa $k vs recomposed $recomposed")
    }
  }

  test("q305 pass@k outputs stay in range with consistent eligibility") {
    val rows = QueriesStats.q305PassAtK(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, p1, n3) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p1 >= 0 && p1 <= 1000000)
      assert(n3 <= n)
      if (!r.isNullAt(4)) {
        val p3 = r.getLong(4)
        assert(p3 >= 0 && p3 <= 1000000)
        // pass@3 ≥ pass@1 holds per task; the rollup means share a
        // task population only when every task is 3-eligible
        if (n3 == n) assert(p3 >= p1, s"pass@3 $p3 < pass@1 $p1")
      }
    }
  }

  test("q306 strengths renormalize to N·1e6 within floor slack") {
    val rows = QueriesStats.q306BradleyTerry(spark, sf).collect()
    val n = rows.length
    assert(n > 1)
    val sum = rows.map(_.getLong(3)).sum
    assert(math.abs(sum - n.toLong * 1000000) <= n,
      s"sum gamma $sum vs ${n}e6")
    // wins never exceed duels; every player fought someone
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("q298 override accounting is internally consistent") {
    // gate scale (part is 2,000 rows there): at sf0.001 only one
    // known pair has an overrideable brand and it misses the override
    // subset, so the override branch can't be asserted fired there
    val sfGate = "/root/testdata/sf0.01"
    val rows = QueriesCore.q298JobcodeOverride(spark, sfGate).collect()
    val nParts = Tables.part(spark, sfGate).count()
    assert(rows.map(_.getLong(1)).sum == nParts)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1)) // profiled ≤ parts
      assert(r.getLong(3) + r.getLong(4) <= r.getLong(1))
    }
    // the override and unknown branches must both actually fire at
    // the gate sf — otherwise the query gates nothing (266 and 214
    // parts respectively at sf0.01, cross-checked in DuckDB)
    assert(rows.map(_.getLong(3)).sum > 0, "no override ever applied")
    assert(rows.map(_.getLong(4)).sum > 0, "no unknown pair ever hit")
  }

  test("q299 buffer→history split accounts for every change") {
    val rows = QueriesCore.q299ChangeConsumption(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    for (r <- rows) {
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        "changes = consumed + stale")
      assert(r.getLong(1) == r.getLong(4) + r.getLong(5),
        "changes = already + new history rows")
    }
  }

  test("q300 delete-recreate preserves the association multiset") {
    val rows = QueriesCore.q300DeleteRecreate(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nLines = Tables.lineitem(spark, sf).count()
    assert(rows("kept")._1 + rows("deleted")._1 == nLines)
    assert(rows("recreated")._1 <= rows("deleted")._1)
    assert(rows("recreated")._2 <= rows("deleted")._2)
  }

  test("q143 single-shuffle rework still elects sole returners") {
    val rows = QueriesCore.q143OnlyReturner(spark, sf).collect()
    assert(rows.nonEmpty)
    // numwait descending with name tiebreak — the declared order
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (n, s) => (-n, s) }))
  }
}
