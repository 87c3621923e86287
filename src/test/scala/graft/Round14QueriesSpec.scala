package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Round-14 gates.
  *
  * (1) The globalOrdinals helper must reproduce the exact global
  * row_number / running-sum semantics it replaces, including negative
  * summands (the q237 log-likelihood walk).
  *
  * (2) The seven queries migrated off row-scale unpartitioned windows
  * (q175/q177/q181/q182/q185/q231/q232) plus q237's prefix-sum
  * composition must carry the PLAN property that motivated the
  * rewrite: no WindowExec with an empty partitionSpec except the
  * documented bounded frames (the |partitions|-row offset rollup and
  * value-bounded sweeps like the 10-row decile window).
  */
class Round14QueriesSpec extends AnyFunSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** WindowExec nodes in the EXECUTED plan whose partitionSpec is
    * empty, keyed by the window output columns (same probe as
    * Round13QueriesSpec).
    */
  private def unpartitionedWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] =
    // routed through PlanProbes: the naive executedPlan.collect is
    // VACUOUS under AQE (AdaptiveSparkPlanExec is a leaf) — round 15
    // fixed this probe in place
    PlanProbes.collectAll(PlanProbes.finalPlan(df)) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        // keyed by SORT-KEY attribute names: physical window output
        // names are opaque `_we0` aliases, sort keys keep their names
        w.orderSpec.flatMap(_.child.references.map(_.name)).mkString("+")
    }

  // the offset rollup inside globalOrdinals runs one unpartitioned
  // window over the |partitions|-row per-partition-totals rollup,
  // sorted by the partition id — bounded by construction
  private val boundedOffsets = Set("__gopid")

  private def assertNoRowScaleWindows(
      df: org.apache.spark.sql.DataFrame, extraAllow: Set[String] = Set()) = {
    val bad = unpartitionedWindows(df)
      .filterNot(k => boundedOffsets.contains(k) || extraAllow.contains(k))
    assert(bad.isEmpty, s"unpartitioned row-scale windows: $bad")
  }

  test("globalOrdinals ≡ global row_number + running sum (neg summands)") {
    // 1000 rows, shuffled key, value includes negatives
    val df = spark.range(1000)
      .select((col("id") * 7919 % 1000).as("k"),
        (pmod(col("id"), lit(7)) - 3).cast("long").as("v"))
    val got = graft.operators.Relational.globalOrdinals(df,
        Seq(col("k")), 32, "rn", runningSums = Seq("cs" -> col("v")))
      .select("k", "v", "rn", "cs")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    val want = df.as[(Long, Long)].collect().sortBy(_._1)
      .zipWithIndex.map { case ((k, v), i) => (k, v, i + 1L) }
    var acc = 0L
    val wantCs = want.map { case (k, v, rn) => acc += v; (k, v, rn, acc) }
    assert(got.toSeq == wantCs.toSeq)
  }

  test("globalOrdinals: ordinals exact with heavy ties across partitions") {
    // only 3 distinct keys over 32 range partitions — most partitions
    // empty, ties bigger than any single "fair" partition share
    val df = spark.range(999)
      .select(pmod(col("id"), lit(3)).as("k"), col("id").as("t"))
    val got = graft.operators.Relational.globalOrdinals(df,
        Seq(col("k"), col("t")), 32, "rn")
      .select("k", "t", "rn").as[(Long, Long, Long)]
      .collect().sortBy(_._3)
    val want = df.as[(Long, Long)].collect().sorted
      .zipWithIndex.map { case ((k, t), i) => (k, t, i + 1L) }
    assert(got.toSeq == want.toSeq)
  }

  test("q175: no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q175QuartileBinning(spark, sf))
  }

  test("q177: no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q177SortedNeighborhood(spark, sf))
  }

  test("q181: no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q181TimeToConvert(spark, sf))
  }

  test("q182: no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q182RfmSegments(spark, sf))
  }

  test("q185: no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q185MadOutliers(spark, sf))
  }

  test("q231: no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q231AucExact(spark, sf))
  }

  test("q232: only the 10-row decile sweep stays unpartitioned") {
    // the cumulative gain runs over the ≤10-row decile rollup —
    // bounded by the decile value space, the documented exception
    assertNoRowScaleWindows(QueriesCore.q232DecileLift(spark, sf),
      extraAllow = Set("decile"))
  }

  test("q237: prefix-sum composition, no row-scale unpartitioned window") {
    assertNoRowScaleWindows(QueriesCore.q237Sprt(spark, sf))
  }

  test("q182: tile formula ≡ SQL NTILE(5) on this frame") {
    // pin the integer ntile formula against Spark's own ntile() for
    // all three metrics (small frame, so the reference window is fine
    // in-test)
    import org.apache.spark.sql.expressions.Window
    val got = QueriesCore.q182RfmSegments(spark, sf)
      .select("custkey", "r_score", "f_score", "m_score")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(unix_micros(col("o_orderdate").cast("timestamp")))
          .as("last_order_us"),
        count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).as("__mon"))
    val want = per
      .withColumn("r", ntile(5).over(
        Window.orderBy(col("last_order_us"), col("custkey"))))
      .withColumn("f", ntile(5).over(
        Window.orderBy(col("n_orders"), col("custkey"))))
      .withColumn("m", ntile(5).over(
        Window.orderBy(col("__mon"), col("custkey"))))
      .select(col("custkey"), col("r").cast("long"),
        col("f").cast("long"), col("m").cast("long"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }
}
