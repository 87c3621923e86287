package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** 10×-scale smoke with PLANTED ground truth: 50k synthetic docs and
  * 20k synthetic vectors generated inside Spark (no driver-side data),
  * where every 1000th doc pair is a near-duplicate and every 2000th
  * vector pair is near-identical. The sketch/ANN operators must
  * recover the planted structure — the property that actually matters
  * at 100 TB, checked at the largest size a unit test can afford.
  */
class ScaleSmokeSpec extends AnyFunSuite {
  import spark.implicits._

  test("MinHash LSH recovers all planted near-dup pairs in 50k docs") {
    val n = 50000L
    // doc i%1000==1 clones doc i-1's 50 tokens and appends one extra
    // token: jaccard 50/51 ≈ 0.98; unrelated docs share only what the
    // 40k-word vocabulary forces (expected overlap ≪ threshold)
    val base = spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(1000)) === 1, col("id") - 1)
        .otherwise(col("id")).as("__seed"),
      (pmod(col("id"), lit(1000)) === 1).as("__planted"))
    val docs = base.select(col("doc_id"), col("__planted"),
      concat(
        array_join(transform(sequence(lit(0), lit(49)),
          j => concat(lit("w"), pmod(xxhash64(col("__seed") * 50 + j),
            lit(40000)))), " "),
        when(col("__planted"), lit(" extratoken")).otherwise(lit("")))
        .as("text"))
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (1L until n by 1000).map(i => (i - 1, i)).toSet
    assert((planted -- pairs).isEmpty,
      s"missed planted pairs: ${(planted -- pairs).take(5)}")
    // no false positives outside the planted structure
    assert((pairs -- planted).isEmpty,
      s"unexpected pairs: ${(pairs -- planted).take(5)}")
  }

  test("IVF top-k finds the planted twin in 20k vectors") {
    val n = 20000L
    val dim = 32
    // vector i%2000==1 is vector i-1 plus a small deterministic
    // perturbation: cosine ≈ 1, far above the background (~uniform
    // random directions in 32-d)
    val base = spark.range(n).select(col("id").as("vec_id"),
      when(pmod(col("id"), lit(2000)) === 1, col("id") - 1)
        .otherwise(col("id")).as("__seed"),
      (pmod(col("id"), lit(2000)) === 1).as("__planted"))
    val vecs = base.select(col("vec_id"), col("__planted"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => pmod(xxhash64(col("__seed") * dim + d), lit(2001L))
          .cast("double") / 1000.0 - 1.0 +
          when(col("__planted"),
            pmod(xxhash64(col("vec_id") * dim + d), lit(21L))
              .cast("double") / 1000.0).otherwise(lit(0.0)))
        .as("embedding"))
    val queries = vecs.filter(col("__planted")).drop("__planted")
    val corpus = vecs.drop("__planted")
    val top1 = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        k = 1, nCentroids = 32, nProbe = 4, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 10)
    val found = top1.count { case (q, nb) => nb == q - 1 }
    // IVF is approximate: the twin is missed only when quantization
    // splits the pair across non-probed lists
    assert(found >= 8, s"planted twins found: $found/10")
  }

  test("SemDeDup drops exactly one of each planted twin pair in 20k vectors") {
    val n = 20000L
    val dim = 32
    // same planted-twin construction as the IVF smoke: i%2000==1
    // clones i-1 with a tiny perturbation (cosine ≈ 1); background
    // pairs are ~uniform random 32-d directions (cosine ≪ 0.9)
    val base = spark.range(n).select(col("id").as("vec_id"),
      when(pmod(col("id"), lit(2000)) === 1, col("id") - 1)
        .otherwise(col("id")).as("__seed"),
      (pmod(col("id"), lit(2000)) === 1).as("__planted"))
    val vecs = base.select(col("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => pmod(xxhash64(col("__seed") * dim + d), lit(2001L))
          .cast("double") / 1000.0 - 1.0 +
          when(col("__planted"),
            pmod(xxhash64(col("vec_id") * dim + d), lit(21L))
              .cast("double") / 1000.0).otherwise(lit(0.0)))
        .as("embedding"))
    // 64 trained clusters ≈ 300 vectors each: the nCentroids knob
    // keeps the within-cluster pair stage ~n·300 instead of n² — the
    // SemDeDup scale posture exercised at 10× the gate size
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding",
      nCentroids = 64, iters = 2)
    val out = Similarity.semDeDup(vecs, "vec_id", "embedding", cents,
      threshold = 0.9).persist()
    try {
      assert(out.count() == n)
      val droppedIds = out.filter(!col("kept")).select("vec_id")
        .as[Long].collect().toSet
      // every planted pair loses exactly one member — IF the quantizer
      // put the twins in the same cluster (cosine-near vectors almost
      // always are; tolerate quantization splitting like the IVF smoke)
      val pairs = (1L until n by 2000).map(i => (i - 1, i))
      val separated = out.join(vecs.select("vec_id"), "vec_id")
        .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
      val coClustered = pairs.filter(p => separated(p._1) == separated(p._2))
      assert(coClustered.size >= 8, s"twins co-clustered: ${coClustered.size}/10")
      coClustered.foreach { case (a, b) =>
        assert(droppedIds.contains(a) ^ droppedIds.contains(b),
          s"pair ($a,$b): exactly one side must drop")
      }
      // background vectors are untouched: drops happen only where a
      // genuine twin exists
      val plantedIds = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      assert((droppedIds -- plantedIds).isEmpty,
        s"non-planted drops: ${(droppedIds -- plantedIds).take(5)}")
    } finally out.unpersist()
  }
}
