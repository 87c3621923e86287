package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Property tests (SURVEY.md §5 test plan): the distributed operators
  * must agree with naive single-node reference implementations on
  * random inputs, at any partitioning.
  */
class PropertySpec extends AnyFunSuite {
  import spark.implicits._

  // scalatest/scalacheck bridge isn't on the offline classpath; drive
  // the generators directly with fixed seeds (deterministic cases)
  private def forAll[A](gen: Gen[A], cases: Int = 8)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val eventsGen: Gen[List[(Int, Int, String)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0, 3)
      ord <- Gen.choose(0, 1000000)
      v <- Gen.oneOf("a", "b", "c")
    } yield (key, ord, v))
  } yield rows.distinctBy(r => (r._1, r._2))

  test("sessionize agrees with the sequential reference algorithm") {
    forAll(eventsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("key", "ord", "v").repartition(5)
        val got = Relational.sessionize(df, Seq("key"), Seq(col("ord")),
            Seq("v"))
          .select("key", "ord", "session_id")
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
          .toMap
        // naive: walk each key's rows in ord order, bump id on change
        val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
          var last: Option[String] = None
          var id = 0L
          rs.sortBy(_._2).map { case (_, ord, v) =>
            if (!last.contains(v)) { id += 1; last = Some(v) }
            (k, ord) -> id
          }
        }
        assert(got == expected)
      }
    }
  }

  test("splitStints agrees with the sequential reference algorithm") {
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, 2)
        ord <- Gen.choose(0, 1000000)
        active <- Gen.oneOf(true, false)
        trunc <- Gen.frequency(4 -> false, 1 -> true)
      } yield (key, ord, active, trunc))
    } yield rows.distinctBy(r => (r._1, r._2))
    forAll(gen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("key", "ord", "active", "trunc").repartition(4)
        val got = Relational.splitStints(df, Seq("key"), Seq(col("ord")),
            col("active"), col("trunc"))
          .select("key", "ord", "stint_id")
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
          .toMap
        val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
          val sorted = rs.sortBy(_._2)
          val cut = sorted.indexWhere(_._4)
          val kept = if (cut >= 0) sorted.take(cut + 1) else sorted
          var id = 0L
          var prevActive: Option[Boolean] = None
          kept.map { case (_, ord, active, _) =>
            if (prevActive.isEmpty || (active && !prevActive.getOrElse(true)))
              id += 1
            prevActive = Some(active)
            (k, ord) -> id
          }
        }
        assert(got == expected)
      }
    }
  }

  test("electPrimary picks the unique minimum of the total order") {
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, 4)
        id <- Gen.choose(0, 1000000)
        score <- Gen.choose(1, 3)
      } yield (key, id, score))
    } yield rows.distinctBy(r => (r._1, r._2))
    forAll(gen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("key", "id", "score").repartition(4)
        val winners = Relational.electPrimary(df, Seq("key"),
            col("score"), Seq(col("id").asc))
          .filter(col("is_primary"))
          .select("key", "id").collect()
          .map(r => r.getInt(0) -> r.getInt(1)).toMap
        val expected = rows.groupBy(_._1).map { case (k, rs) =>
          k -> rs.minBy(r => (r._3, r._2))._2
        }
        assert(winners == expected)
      }
    }
  }

  test("exactSum is invariant under repartitioning") {
    val gen = Gen.listOfN(300, Gen.choose(-100000, 100000)
      .map(_ / 100.0))
    forAll(gen) { xs =>
      val sums = Seq(1, 3, 17).map { p =>
        xs.toDF("x").repartition(p)
          .agg(graft.functions.Fns.exactSum(col("x"))).first().getDouble(0)
      }
      assert(sums.distinct.size == 1)
    }
  }

  test("upsert is idempotent and preserves key completeness") {
    val gen = for {
      t <- Gen.listOfN(30, Gen.zip(Gen.choose(0, 20), Gen.alphaStr))
      u <- Gen.listOfN(10, Gen.zip(Gen.choose(0, 25), Gen.alphaStr))
    } yield (t.distinctBy(_._1), u.distinctBy(_._1))
    forAll(gen) { case (t, u) =>
      val target = t.toDF("k", "v")
      val updates = u.toDF("k", "v")
      val once = Relational.upsert(target, updates, Seq("k"))
      val twice = Relational.upsert(once, updates, Seq("k"))
      val a = once.as[(Int, String)].collect().toSet
      val b = twice.as[(Int, String)].collect().toSet
      assert(a == b)
      assert(a.map(_._1) == (t.map(_._1) ++ u.map(_._1)).toSet)
      // updated keys carry the update's value
      val got = a.toMap
      u.foreach { case (k, v) => assert(got(k) == v) }
    }
  }

  test("asOfJoin agrees with a sequential scan on random series") {
    // left events and right quotes with overlapping integer timestamps;
    // for each left row the expected payload is the greatest right ts
    // <= left ts within the key (ties to the largest payload hash —
    // mirror the operator's deterministic tie-break by picking a unique
    // max value per (key, ts) in the generator instead)
    val gen = for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 100)))
      r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 100)))
    } yield (l.distinct, r.distinctBy(x => (x._1, x._2)))
    forAll(gen, cases = 6) { case (lrows, rrows) =>
      whenever(lrows.nonEmpty) {
        val left = lrows.zipWithIndex
          .map { case ((k, ts), i) => (k, ts, i.toLong) }
          .toDF("key", "lts", "row_id").repartition(4)
        val right = rrows.map { case (k, ts) => (k, ts, s"v$k-$ts") }
          .toDF("key", "rts", "quote").repartition(3)
        val got = Relational.asOfJoin(left, right, Seq("key"),
            "lts", "rts", Seq("quote"))
          .select("row_id", "asof_quote")
          .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        val expected = lrows.zipWithIndex.map { case ((k, ts), i) =>
          val cands = rrows.filter(r => r._1 == k && r._2 <= ts)
          i.toLong -> (if (cands.isEmpty) None
            else {
              val best = cands.map(_._2).max
              Some(s"v$k-$best")
            })
        }.toMap
        assert(got == expected)
      }
    }
  }

  test("treeClosure agrees with a sequential DFS on random forests") {
    // random forest: node i's parent is uniform in {-1 (root)} ∪ [0, i)
    // — parents always precede children, so no cycles by construction
    val gen = for {
      n <- Gen.choose(1, 40)
      parents <- Gen.sequence[List[Int], Int](
        (0 until n).map(i => Gen.choose(-1, i - 1)))
    } yield parents
    forAll(gen) { parents =>
      val rows = parents.zipWithIndex.map { case (p, i) =>
        (s"n$i", if (p < 0) null else s"n$p")
      }
      val df = rows.toDF("id", "parent_id").repartition(4)
      val got = Relational.treeClosure(df)
        .select("id", "root_id", "depth")
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2)))
        .toMap
      // sequential reference: follow parent pointers
      val pmap = rows.map { case (id, p) => id -> Option(p) }.toMap
      val expected = rows.map { case (id, _) =>
        var cur = id; var depth = 0
        while (pmap(cur).isDefined) { cur = pmap(cur).get; depth += 1 }
        id -> (cur, depth)
      }.toMap
      assert(got == expected)
    }
  }

  test("errors accumulate: counts sum and first_seen/reported are stable") {
    // random occurrence streams over a small id space, split into three
    // runs — the accumulated table must equal one-shot totals on count
    // and never lose first_seen/reported
    val gen = for {
      occ <- Gen.listOfN(40, Gen.choose(0, 6))
      cut1 <- Gen.choose(0, 40)
      cut2 <- Gen.choose(0, 40)
    } yield (occ, math.min(cut1, cut2), math.max(cut1, cut2))
    val ts = (i: Int) => java.sql.Timestamp.valueOf(s"2026-01-0${i + 1} 00:00:00")
    forAll(gen, cases = 5) { case (occ, c1, c2) =>
      whenever(occ.nonEmpty) {
        def channel(ids: Seq[Int]) = ids.map(i => (s"e$i", "no_job_data",
            null: String, null: String))
          .toDF("emplid", "error_type", "jobcode", "deptid")
          .withColumn("jobcode_descr", lit(null).cast("string"))
          .withColumn("deptid_descr", lit(null).cast("string"))
          .withColumn("um_college", lit(null).cast("string"))
          .withColumn("um_college_descr", lit(null).cast("string"))
          .withColumn("um_campus", lit(null).cast("string"))
          .withColumn("um_campus_descr", lit(null).cast("string"))
        val eligible = Seq.empty[(String, String)].toDF("emplid", "deptid")
        val runs = Seq(occ.take(c1), occ.slice(c1, c2), occ.drop(c2))
        var table = Errors.firstRun(
          Errors.errorRecords(channel(runs.head), eligible), ts(0))
        for ((r, i) <- runs.tail.zipWithIndex)
          table = Errors.accumulate(table,
            Errors.errorRecords(channel(r), eligible), ts(i + 1))
        val acc = table.select("emplid", "count", "first_seen")
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getTimestamp(2))).toMap
        // counts match the one-shot totals
        val totals = occ.groupBy(i => s"e$i").view.mapValues(_.size.toLong)
        assert(acc.view.mapValues(_._1).toMap == totals.toMap)
        // first_seen is the timestamp of the first run containing the id
        occ.map(i => s"e$i").distinct.foreach { id =>
          val firstRunIdx = runs.indexWhere(_.exists(i => s"e$i" == id))
          assert(acc(id)._2 == ts(firstRunIdx), id)
        }
      }
    }
  }

  private val graphGen: Gen[(List[(Long, Long)], Int)] = for {
    n <- Gen.choose(2, 40)
    m <- Gen.choose(1, 80)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (math.min(a, b), math.max(a, b)))
    blocks <- Gen.choose(1, 7)
  } yield (edges.filter(e => e._1 != e._2).distinct, blocks)

  test("localContract + CC ≡ plain CC on random graphs, any blocking key") {
    forAll(graphGen, cases = 10) { case (edges, blocks) =>
      whenever(edges.nonEmpty) {
        val df = edges.toDF("id_a", "id_b").repartition(5)
        // sequential union-find reference
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map(id => id -> find(id)).toMap
        val got = Dedup.connectedComponents(
            Dedup.localContract(df, pmod(col("id_a"), lit(blocks))))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        nodes.foreach { id =>
          assert(got.getOrElse(id, id) == want(id),
            s"node $id: got ${got.getOrElse(id, id)}, want ${want(id)} " +
              s"(edges=$edges blocks=$blocks)")
        }
      }
    }
  }

  test("kTrussPeel refuses a hub node above the degree cap, loudly") {
    // one hub linked to 40 spokes: legal input, but its triangle
    // round would be O(deg(hub)^2) — the guard must fire BEFORE the
    // join, with an actionable message, not an executor OOM later
    val star = (1L to 40L).map(i => (0L, i)).toList
    val df = star.toDF("id_a", "id_b").repartition(5)
    val ex = intercept[IllegalArgumentException] {
      graft.QueriesData.kTrussPeel(df, maxDegreeCap = 16L)
    }
    assert(ex.getMessage.contains("max degree 40") &&
      ex.getMessage.contains("cap 16"))
    // at/below the cap the same star peels fine (to the empty truss:
    // a star has no triangles, so every edge drops)
    assert(graft.QueriesData.kTrussPeel(df, maxDegreeCap = 64L).isEmpty)
  }
}
