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
}
