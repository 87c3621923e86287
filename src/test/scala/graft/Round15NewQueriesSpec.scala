package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Property pins for the round-15 query additions (q265/q267/q268/
  * q269), beyond their DuckDB hash gates. Each test asserts the
  * MATHEMATICAL property the query exists to demonstrate — the
  * guarantee a user of the operator family relies on at 100 TB — so a
  * future edit that keeps the output hash-stable but breaks the
  * contract (e.g. re-sizing the CMS so collisions vanish and `sound`
  * becomes vacuous) still fails here.
  */
class Round15NewQueriesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("q265 CMS: one-sided error holds everywhere AND collisions are real") {
    val rows = QueriesText.q265CmsFrequency(spark, sf)
      .select("est_count", "exact_count", "sound").collect()
    assert(rows.nonEmpty)
    // the guarantee: a Count-Min estimate NEVER undercounts
    assert(rows.forall(r => r.getBoolean(2) && r.getLong(0) >= r.getLong(1)),
      "CMS under-estimated a bigram — min-of-rows or cell hashing broken")
    // the sizing: w=64 < 916 distinct sf0.001 bigrams, so at least one
    // estimate must carry collision inflation or `sound` tests nothing
    assert(rows.exists(r => r.getLong(0) > r.getLong(1)),
      "no collisions at w=64 — the one-sided guarantee is being " +
        "asserted vacuously; was the grid re-sized?")
  }

  test("q267 HLL: shard-merge ≡ direct everywhere, estimate inside the m=64 envelope") {
    val df = QueriesCore.q267HllShardMerge(spark, sf)
    val rows = df.select("event_type", "n_exact", "est_micros",
      "merge_consistent").collect()
    assert(rows.length == 5 * 64, "expected 5 event types x 64 buckets")
    assert(rows.forall(_.getBoolean(3)),
      "a shard-merged register drifted from the direct single-pass build")
    // estimator sanity per type (est_micros is constant across a
    // type's buckets): sf0.001 sits in the linear-counting regime
    // (n=15 « m=64), where the expected error is well under ±50%
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val exact = rs.head.getLong(1).toDouble
      val est = rs.head.getLong(2).toDouble / 1e6
      assert(rs.map(_.getLong(2)).distinct.length == 1,
        s"$t: est_micros not constant across buckets")
      assert(math.abs(est - exact) / exact <= 0.5,
        s"$t: HLL estimate $est vs exact $exact outside the envelope")
    }
  }

  test("q268 a-priori: pair-based candidate pruning is lossless vs the plain 3-way join") {
    // brute-force definition, in-engine at sf0.01 (sf0.001 yields no
    // triples at the floor — vacuous): frequent-item baskets,
    // unpruned 3-way self-join, HAVING the support floor
    val b = Tables.lineitem(spark, sf01)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val freq = b.groupBy("p").agg(count(lit(1)).as("s"))
      .filter(col("s") >= 25).select("p")
    val fb = b.join(freq, Seq("p")).localCheckpoint()
    val brute = fb.select(col("o"), col("p").as("part_a"))
      .join(fb.select(col("o"), col("p").as("part_b")), Seq("o"))
      .filter(col("part_a") < col("part_b"))
      .join(fb.select(col("o"), col("p").as("part_c")), Seq("o"))
      .filter(col("part_b") < col("part_c"))
      .groupBy("part_a", "part_b", "part_c")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select(col("part_a").cast("long"), col("part_b").cast("long"),
        col("part_c").cast("long"), col("support").cast("long"))
    val got = QueriesCore.q268AprioriTriples(spark, sf01)
      .select("part_a", "part_b", "part_c", "support")
    assert(got.count() > 0, "sf0.01 should yield triples at the floor")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "pruned candidate generation disagrees with the plain definition")
  }

  test("q270 KMV: sketch-merge ≡ direct union sketch, estimators in envelope") {
    val df = QueriesCore.q270KmvJaccard(spark, sf).collect()
    // the MERGE property — the reason KMV works at 100 TB: each
    // pair's (K, h_K) built from the two k-sketches must equal the
    // sketch a direct pass over the unioned raw part-hash sets builds
    val np = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey"))
      .join(Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("int").as("nk"),
        graft.operators.Scale.md5Prefix32(col("l_partkey")).as("h"))
      .distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
    val byNk = np.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // sf0.001's supplier table spans only ~10 nations — expect every
    // pair of nations that actually supply parts, derived from data
    val n = byNk.size
    assert(df.length == n * (n - 1) / 2,
      s"expected all ${n * (n - 1) / 2} nation pairs, got ${df.length}")
    df.foreach { r =>
      val (na, nb) = (r.getInt(0), r.getInt(1))
      val direct = (byNk(na) ++ byNk(nb)).toSeq.sorted.take(64)
      assert(r.getLong(2) == direct.length && r.getLong(3) == direct.max,
        s"pair ($na,$nb): merged sketch != direct union sketch")
      // estimator envelopes (k=64 → σ≈13%; bounds carry slack for the
      // max over 300 pairs; measured maxima 0.39 / 0.21 at sf0.01)
      val relErr = math.abs(r.getLong(5).toDouble - r.getLong(7)) /
        r.getLong(7)
      assert(relErr <= 0.6, s"pair ($na,$nb): union est rel err $relErr")
      val jaccErr = math.abs(r.getLong(6) - r.getLong(9)) / 1e6
      assert(jaccErr <= 0.35, s"pair ($na,$nb): jaccard abs err $jaccErr")
    }
  }

  test("q271 bootstrap: CI brackets the point estimate, full replicate set") {
    val rows = QueriesCore.q271PoissonBootstrap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nk, point, reps, lo, hi) = (r.getInt(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(reps == 64L, s"nation $nk: dropped replicates ($reps)")
      assert(lo < hi, s"nation $nk: degenerate CI [$lo,$hi]")
      // the percentile CI of a mean must bracket the sample mean at
      // these sizes (~60 orders/nation, B=64)
      assert(lo <= point && point <= hi,
        s"nation $nk: CI [$lo,$hi] excludes point $point")
    }
  }

  test("q272 equi-depth: boundaries match a literal sort, last bin = max") {
    val rows = QueriesCore.q272EquidepthStats(spark, sf)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 16)
    val cents = Tables.lineitem(spark, sf)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).collect().map(_.getLong(0)).sorted
    val n = cents.length
    rows.foreach { r =>
      val (bin, target, boundary) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(target == (bin.toLong * n + 15) / 16, s"bin $bin target")
      assert(boundary == cents(target.toInt - 1),
        s"bin $bin: boundary $boundary != sorted[$target]")
      assert(r.getLong(3) == n && r.getLong(5) == cents.head &&
        r.getLong(6) == cents.last, s"bin $bin: summary stats drifted")
    }
    assert(rows.map(_.getLong(2)).sliding(2).forall(p => p(0) <= p(1)),
      "boundaries not monotone")
    assert(rows.last.getLong(2) == cents.last, "16th boundary != max")
  }

  test("q273 streaming HLL: final state ≡ direct batch registers") {
    val rows = QueriesCore.q273StreamHll(spark, sf).collect()
    assert(rows.length == 5 * 64, "expected 5 event types x 64 buckets")
    // the order-free-merge property: max-merged state across arbitrary
    // micro-batch slicing must equal the direct single-pass registers
    val direct = Tables.events(spark, sf)
      .select(col("event_type"),
        graft.operators.Scale.md5Prefix32(col("user_id")).as("__h"))
      .select(col("event_type"),
        pmod(col("__h"), lit(64)).cast("int").as("bucket"),
        expr("CAST(__h DIV 64 AS BIGINT)").as("__rest"))
      .select(col("event_type"), col("bucket"),
        when(col("__rest") === 0L, lit(27L))
          .otherwise(lit(27L) - length(bin(col("__rest")))).as("__rho"))
      .groupBy("event_type", "bucket").agg(max(col("__rho")).as("r"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    rows.foreach { r =>
      val want = direct.getOrElse((r.getString(0), r.getInt(1)), 0L)
      assert(r.getLong(2) == want,
        s"(${r.getString(0)},${r.getInt(1)}): stream ${r.getLong(2)} != batch $want")
    }
  }

  test("q274 DBSCAN: role semantics hold against a literal neighbor recompute") {
    val rows = QueriesCore.q274Dbscan(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    assert(Set("core", "border", "noise").subsetOf(
      rows.values.map(_._1).toSet),
      "density tuned so all three roles appear at sf0.001")
    // literal recompute of eps-neighborhoods from the same points
    val side = math.ceil(math.sqrt(rows.size.toDouble)).toLong * 1000L
    def h(p: String, id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$id".getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % side
    }
    val pts = rows.keys.map(id => id -> (h("x", id), h("y", id))).toMap
    val nbrs = rows.keys.map { id =>
      val (x, y) = pts(id)
      id -> rows.keys.filter { o =>
        val (ox, oy) = pts(o)
        o != id && (x - ox) * (x - ox) + (y - oy) * (y - oy) <= 1000000L
      }.toSet
    }.toMap
    rows.foreach { case (id, (role, cluster)) =>
      val coreNbrs = nbrs(id).filter(o => rows(o)._1 == "core")
      role match {
        case "core" =>
          assert(nbrs(id).size >= 3, s"$id: core with ${nbrs(id).size} nbrs")
          // canonical label: min id over the core component ⇒ my
          // cluster can never exceed my own id
          assert(cluster <= id, s"$id: non-canonical cluster $cluster")
          assert(coreNbrs.forall(o => rows(o)._2 == cluster),
            s"$id: core neighbors in a different cluster")
        case "border" =>
          assert(nbrs(id).size < 3 && coreNbrs.nonEmpty,
            s"$id: border semantics violated")
          assert(cluster == coreNbrs.map(o => rows(o)._2).min,
            s"$id: border not assigned min core-neighbor cluster")
        case "noise" =>
          assert(coreNbrs.isEmpty && cluster == -1L,
            s"$id: noise with a core neighbor or a cluster")
      }
    }
  }

  test("q275 weighted paths: ≤6-edge min costs match a literal relaxation") {
    val got = QueriesCore.q275WeightedPaths(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val ids = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val side = math.ceil(math.sqrt(ids.length.toDouble)).toLong * 1000L
    def h(p: String, id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16) % side
    }
    val pts = ids.map(id => id -> (h("x", id), h("y", id))).toMap
    val edges = for {
      a <- ids; b <- ids if a < b
      (ax, ay) = pts(a); (bx, by) = pts(b)
      w = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) if w <= 1000000L
    } yield (a, b, w)
    var dist = ids.filter(_ % 50 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 6) {
      val relaxed = edges.flatMap { case (a, b, w) =>
        dist.get(a).map(c => b -> (c + w)).toSeq ++
          dist.get(b).map(c => a -> (c + w)).toSeq
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    assert(got == dist,
      s"mismatch: only-engine=${(got.keySet -- dist.keySet).take(5)} " +
        s"only-literal=${(dist.keySet -- got.keySet).take(5)}")
  }

  test("localContract preserves components under ANY blocking key") {
    import spark.implicits._
    // adversarial graph: long chains + stars + singleton edges, with a
    // blocking key that deliberately SPLITS every chain across blocks
    val edges = ((0L until 400L).sliding(2).map(s => (s(0), s(1))).toSeq ++
      (500L until 540L).map(i => (500L, i)) ++
      Seq((900L, 901L), (902L, 903L), (901L, 902L)))
      .toDF("id_a", "id_b")
    val plain = graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val contracted = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.localContract(edges, pmod(col("id_a"), lit(7))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contracted may omit nodes that became their own root with no
    // surviving edge — they are singleton-labeled by definition
    plain.foreach { case (id, comp) =>
      assert(contracted.getOrElse(id, id) == comp,
        s"node $id: contracted ${contracted.getOrElse(id, id)} != $comp")
    }
  }

  test("q269 RRF: rank arithmetic, list shape, and monotonic fusion") {
    val rows = QueriesText.q269RrfFusion(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size >= 5, "expected ~10 fused query lists at sf0.001")
    byQuery.foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.sameElements(1 to rs.length),
        s"query $q: fused_rank not contiguous 1..${rs.length}")
      assert(rs.length <= 10, s"query $q: more than top-10 returned")
      rs.foreach { r =>
        val (lex, dense, micros) = (r.getLong(3), r.getLong(4), r.getLong(5))
        val want = (if (lex > 0) 1000000L / (60 + lex) else 0L) +
          (if (dense > 0) 1000000L / (60 + dense) else 0L)
        assert(micros == want,
          s"query $q doc ${r.getLong(2)}: rrf_micros $micros != $want")
        assert(lex > 0 || dense > 0, "doc in neither source list")
      }
      // fused score non-increasing down the fused ranking
      val ordered = rs.sortBy(_.getInt(1)).map(_.getLong(5))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"query $q: fusion not ranked by descending rrf_micros")
    }
  }
}
