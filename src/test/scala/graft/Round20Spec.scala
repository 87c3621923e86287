package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Round-20 (optimization round 2) pins: the cycle's parallel
  * boundary-materialization hook is concurrency-only (par ≡
  * sequential), and the FeedMemo key boundary is closed (derived
  * inputs only — VERDICT r19 item 6).
  */
class Round20Spec extends AnyFunSuite {

  private val sf001 = "/root/testdata/sf0.001"

  test("the cycle's par hook is concurrency-only (par ≡ sequential)") {
    def canon(par: Boolean): Seq[String] =
      QueriesCycle.cycleRows(spark, sf001, _.localCheckpoint(), par)
        .collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getString(2)}")
        .sorted.toSeq
    assert(canon(par = false) == canon(par = true))
  }

  test("stateAfter's par hook is concurrency-only on the state handoff") {
    val base = QueriesCycle.cycle1Inputs(spark, sf001)
    val out = etl.Runner.syncCycle(base, _.localCheckpoint(), par = true)
    def canon(par: Boolean): Seq[Seq[String]] = {
      val st = QueriesCycle.stateAfter(base, out, _.localCheckpoint(), par)
      Seq(st.existingOrgs, st.existingPersons, st.existingPubs,
        st.personOrgs).map(_.collect().map(_.toString).sorted.toSeq)
    }
    assert(canon(par = false) == canon(par = true))
  }

  test("FeedMemo's key allowlist admits every live key family") {
    val live = Seq("q86_idx_base", "q86_docs_base", "q86_s0", "q93_s3",
      "q105_s1", "q113_s2", "q119_s0", "q128_s1", "q168_s0", "q223_s2",
      "q246_s1", "q261_s0", "q273_s1", "q281_s0", "q286_s2", "q333_s1",
      "bpe_merges20", "demog_1_100", "scival_3_300", "emp_1_100",
      "deptorg_3_300", "riorg_1_100", "rxorg_1_100", "riper_3_300",
      "rxper_1_100", "rpub_1_100", "eorg_3_300", "eper_1_100",
      "epub_3_300", "f2_riorg", "f2_riper", "f2_rxper", "f2_rpub",
      "f2_xlate", "f2_platep", "st1_eorg", "st1_eper", "st1_epub",
      "st1_porg", "delivery_0", "delivery_1")
    live.foreach { k =>
      assert(FeedMemo.allowedKey.pattern.matcher(k).matches(),
        s"live key '$k' must stay in the allowlist")
    }
  }

  test("FeedMemo can never be keyed by a declared query's own name") {
    // the boundary pin (VERDICT r19 item 6): the memo holds derived
    // INPUT renders only; a future attempt to memoize a declared
    // query's result under its own name must fail the require in
    // FeedMemo.path. The slice keys (q93_s0 &c.) are inputs TO a
    // query, not its output — the query names themselves never match.
    SparkEntry.queries.keySet.foreach { q =>
      assert(!FeedMemo.allowedKey.pattern.matcher(q).matches(),
        s"declared query name '$q' must not be a valid memo key")
    }
    val ex = intercept[IllegalArgumentException] {
      FeedMemo.path("/tmp/nowhere", "q342_runner_cycle")(
        spark.range(1).toDF())
    }
    assert(ex.getMessage.contains("allowlist"))
  }
}
