package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Driver-contract meta-spec: the invariants the verify/bench harness
  * depends on, checked without touching DuckDB.
  */
class SparkEntrySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("every oracle key has a query; names are well-formed") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(SparkEntry.queries.keys.forall(_.matches("q[0-9a-z_]+")))
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query analyzes and yields a non-empty, stable schema") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, name)
      // analysis must succeed twice with identical schemas (no
      // session-state leakage between query constructions)
      val again = fn(spark, sf)
      assert(df.schema == again.schema, s"$name schema unstable")
      // column names must be distinct (duplicate names break the
      // driver's sort-columns-then-hash compare)
      val names = df.schema.fieldNames.toSeq
      assert(names.distinct == names, s"$name has duplicate columns")
    }
  }

  test("rows-only queries (no oracle) are the documented hash-seeded set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q36_minhash_lsh", "q37_simhash",
      "q38_winnow_fingerprint", "q42_lsh_topk", "q46_ivf_topk",
      "q48_compression", "q54_media_features", "q81_pq_trained",
      "q85_ivfpq_trained", "q90_bpe_train", "q91_bpe_segment",
      "q102_bloom_decontaminate", "q118_image_dhash",
      // round 13: real MJPEG decode — a JPEG codec is not SQL, so the
      // gate is rows-only; pixel exactness lives in SourcesSpec +
      // Round13QueriesSpec. NOTE the decoded pixel values depend on
      // the JVM's bundled ImageIO JPEG decoder: a JDK upgrade that
      // changes IDCT rounding shifts q243's features — the pixel
      // specs pin the CURRENT JDK's output, not a codec-independent
      // truth.
      "q243_video_features"))
  }
}
