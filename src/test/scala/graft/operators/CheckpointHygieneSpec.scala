package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Block-manager hygiene for the iterative operators that
  * localCheckpoint per round: dead intermediates must be dropped by
  * the operator itself ([[Checkpoints.drop]]), so a long-lived session
  * holds only result-backing blocks — the leak class the bench harness
  * had to scrub externally in round 8.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("connectedComponents leaves only its result's checkpoint") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val before = persistedIds
    val labels = Dedup.connectedComponents(pairs)
    assert(labels.count() == 8)
    val leaked = persistedIds -- before
    assert(leaked.size <= 1, s"leaked persistent RDDs beyond the result: $leaked")
    // and the result itself is releasable, returning to baseline
    Checkpoints.drop(labels)
    assert((persistedIds -- before).isEmpty)
  }

  test("trainCentroids leaves only the final centroid checkpoint") {
    // +1 keeps every vector norm strictly positive (a zero-norm vector
    // would null the cosine under ANSI division)
    val vecs = (1 to 40)
      .map(i => (i.toLong, Array.tabulate(4)(d => (i * (d + 1) % 7 + 1).toDouble)))
      .toDF("id", "v")
    val before = persistedIds
    val cents = Similarity.trainCentroids(vecs, "id", "v",
      nCentroids = 3, iters = 3)
    assert(cents.count() == 3)
    val leaked = persistedIds -- before
    assert(leaked.size <= 1, s"leaked persistent RDDs beyond the result: $leaked")
    Checkpoints.drop(cents)
    assert((persistedIds -- before).isEmpty)
  }

  test("pqTrainCodebooks leaves only the final codebook checkpoint") {
    val vecs = (1 to 60)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * (d + 3)) % 11 + 1).toDouble)))
      .toDF("id", "v")
    val before = persistedIds
    val books = Similarity.pqTrainCodebooks(vecs, "id", "v",
      m = 2, ks = 4, subDim = 4, iters = 3)
    assert(books.count() == 8)
    // the exploded training frame and every per-iteration centroid
    // checkpoint must be gone; only the returned codebooks' blocks stay
    val leaked = persistedIds -- before
    assert(leaked.size <= 1, s"leaked persistent RDDs beyond the result: $leaked")
    Checkpoints.drop(books)
    assert((persistedIds -- before).isEmpty)
  }

  test("drop refuses a composite plan unless allowMultiple is passed") {
    val a = Seq((1L, "x")).toDF("id", "s").localCheckpoint(true)
    val b = Seq((1L, "y")).toDF("id", "t").localCheckpoint(true)
    val joined = a.join(b, "id")
    // two LogicalRDD leaves: a silent plan-wide release would kill the
    // live frame's blocks too — must be an explicit opt-in
    val e = intercept[IllegalArgumentException](Checkpoints.drop(joined))
    assert(e.getMessage.contains("LogicalRDD"))
    // both frames still alive after the refused drop
    assert(a.count() == 1 && b.count() == 1)
    Checkpoints.drop(joined, allowMultiple = true)
    Checkpoints.drop(a) // idempotent on already-released blocks
  }

  test("treeClosure keeps per-level frontiers only (edge set dropped)") {
    // 3-level tree: 1 -> {2,3}, 2 -> {4}
    val nodes = Seq(("1", null), ("2", "1"), ("3", "1"), ("4", "2"))
      .map { case (id, p) => (id, Option(p)) }.toDF("id", "parent_id")
    val before = persistedIds
    val closure = Relational.treeClosure(nodes)
    assert(closure.count() == 4)
    // depth-1 and depth-2 frontiers back the result; the edge set and
    // the final empty frontier must be gone
    val leaked = persistedIds -- before
    assert(leaked.size <= 2, s"expected <=2 frontier checkpoints, got: $leaked")
  }
}
