package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** SemDeDup ([[Similarity.semDeDup]]) semantics beyond the q87 oracle:
  * the hand-checkable election on a planted cluster, the paper's
  * remove-by-ANY-earlier rule (kept set is NOT an independent set),
  * and the trained-quantizer path the rows-only gate can't hash.
  */
class SemDeDupSpec extends AnyFunSuite {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  // two orthogonal directions → two clusters under any sane quantizer;
  // within cluster A three near-collinear vectors at distinct scales
  private val e1 = Seq(1.0, 0.0, 0.0, 0.0)
  private val e2 = Seq(0.0, 1.0, 0.0, 0.0)
  private def mix(a: Double, b: Double) =
    Seq(a, b, 0.0, 0.0)

  test("keep-lowest-centroid-cos election on a planted cluster") {
    // centroid supplied directly: cluster 0 = e1, cluster 1 = e2
    val cents = Seq((0, e1), (1, e2)).toDF("centroid_id", "cvec")
      .withColumn("cnorm", Similarity.l2norm(col("cvec")))
    // ids 10,11,12 all within cos>=0.99 of each other in cluster 0;
    // id 12 has the LOWEST centroid cosine → it must be the keeper.
    // id 20 alone in cluster 1 → trivially kept.
    val df = vecs(
      10L -> e1,                       // ccos 1.0
      11L -> mix(0.999, 0.01),         // ccos ~0.99995
      12L -> mix(0.98, 0.12),          // ccos lowest of the three
      20L -> e2)
    val out = Similarity.semDeDup(df, "vec_id", "embedding", cents,
        threshold = 0.99)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(10L -> false, 11L -> false, 12L -> true,
      20L -> true))
  }

  test("drop rule is ANY-earlier, not kept-only (the paper's implementation)") {
    // chain: a(ccos lowest) ~ b, b ~ c, but a !~ c. b is dropped by a;
    // c is dropped by b EVEN THOUGH b itself is dropped — exactly the
    // published pairwise-max-over-earlier construction.
    val cents = Seq((0, e1)).toDF("centroid_id", "cvec")
      .withColumn("cnorm", Similarity.l2norm(col("cvec")))
    val a = mix(0.80, 0.60)  // ccos 0.80  (earliest in election order)
    val b = mix(0.95, 0.3122498999)  // cos(a,b) ~ 0.947 >= 0.94
    val c = mix(1.0, 0.0)    // cos(b,c) = 0.95 >= 0.94; cos(a,c) = 0.80 < 0.94
    val out = Similarity.semDeDup(
        vecs(1L -> a, 2L -> b, 3L -> c), "vec_id", "embedding", cents,
        threshold = 0.94)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("plan: centroids broadcast, pair stage is an equi-join, no cartesian") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val plan = Similarity.semDeDup(emb, "vec_id", "embedding",
        Similarity.portableCentroids(spark, 8, 64), threshold = 0.42)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"corpus-side cartesian in:\n$plan")
    // the only nested-loop joins are the broadcast centroid attach;
    // the within-cluster pair stage must join ON centroid_id
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"no equi-join for the pair stage in:\n$plan")
  }

  test("trained quantizer path: every vector labeled, duplicates actually drop") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val out = Similarity.semDeDup(emb, "vec_id", "embedding", cents,
      threshold = 0.42).persist()
    try {
      val n = emb.count()
      assert(out.count() == n, "one row per input vector")
      val dropped = out.filter(!col("kept")).count()
      assert(dropped > 0, "sf0.1 embeddings contain >=0.42 near-dups (q41)")
      assert(dropped < n, "the election always keeps a cluster survivor")
      // every dropped vector has a same-cluster earlier witness within
      // threshold — re-derive the EXISTS independently
      val sets = out.join(emb, "vec_id")
        .select(col("vec_id"), col("centroid_id"), col("centroid_cos"),
          col("kept"), col("embedding"),
          Similarity.l2norm(col("embedding")).as("n"))
      val wit = sets.as("x").join(sets.as("y"), "centroid_id")
        .filter(col("x.centroid_cos") < col("y.centroid_cos") ||
          (col("x.centroid_cos") === col("y.centroid_cos") &&
            col("x.vec_id") < col("y.vec_id")))
        .filter(round(Similarity.dot(col("x.embedding"), col("y.embedding"))
          / (col("x.n") * col("y.n")), 6) >= 0.42)
        .select(col("y.vec_id")).distinct()
        .as[Long].collect().toSet
      val flagged = out.filter(!col("kept")).select("vec_id")
        .as[Long].collect().toSet
      assert(flagged == wit, "kept flags must equal the independent EXISTS")
    } finally out.unpersist()
  }
}
