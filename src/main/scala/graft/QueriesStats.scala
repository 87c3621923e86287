package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 continuation wave — graph analytics, rank statistics,
  * recommender normalization, changepoint detection, a streaming CMS
  * twin, and forecast backtesting. Same determinism contract as
  * [[QueriesCore]]: integer/decimal arithmetic end-to-end (cross-
  * multiplied ratios, ppm/e12 fixed-point via integral division),
  * explicit total orders, DuckDB oracle per query.
  *
  * Graph queries ride the q274/q275 constant-density md5 point grid
  * ([[QueriesCore.adaptiveGridPoints]] / [[QueriesCore.gridRadiusPairs]]):
  * expected degree ≈ π at EVERY scale ("more world, not denser"), so
  * per-node neighborhoods — and thus every self-join below — stay
  * bounded as the data grows 1000×.
  */
object QueriesStats {
  type Q = (SparkSession, String) => DataFrame

  /** Per-round frames in the iterative graph queries are tiny relative
    * to the cluster; 32-wide shuffles pay pure task-launch fixed costs
    * (q274's measured rationale). */
  private def narrow[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try { s.conf.set("spark.sql.shuffle.partitions", n.toString); body }
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** LABEL PROPAGATION community detection (Raghavan et al. 2007),
    * made deterministic the standard way: SYNCHRONOUS rounds, label =
    * most frequent neighbor label with ties broken by MIN label, a
    * fixed round budget as the semantics (like q275's hop bound — the
    * oracle unrolls the same 4 rounds, so "4 synchronous LPA rounds"
    * is what both engines compute, no convergence hand-waving).
    * Each round is one |edges| join + a (node,label) count + a
    * degree-bounded per-node window — all linear in |edges|, with the
    * frontier checkpointed so the loop's plan stays flat. Communities
    * are labeled by propagated customer ids (exact BIGINTs).
    */
  def q276LabelPropagation(s: SparkSession, dir: String): DataFrame =
    narrow(s, 8) {
      lpaFrom(Tables.customer(s, dir).select(col("c_custkey").as("id")))
    }

  /** q276's engine parametrized on the point-id population (the scale
    * probe feeds an N× world — q274's `dbscanFrom` convention). */
  private[graft] def lpaFrom(base: DataFrame): DataFrame = {
      val rounds = 4
      val pts = QueriesCore.adaptiveGridPoints(base)
      val pr = QueriesCore.gridRadiusPairs(pts, r = 1000L)
      val edges = pr.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pr.select(col("id_b").as("src"),
          col("id_a").as("dst")))
        .localCheckpoint() // probed once per round
      var labels = pts.select(col("id"), col("id").as("lbl"))
        .localCheckpoint()
      for (_ <- 1 to rounds) {
        val votes = edges
          .join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id"), col("lbl"))
          .agg(count(lit(1)).as("__c"))
        // per-node frame is degree-bounded (≈ Poisson(π) at any scale)
        val win = Window.partitionBy("id")
          .orderBy(col("__c").desc, col("lbl"))
        val winner = votes
          .withColumn("__rn", row_number().over(win))
          .filter(col("__rn") === 1)
          .select(col("id"), col("lbl").as("__new"))
        labels = labels.join(winner, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__new"), col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      labels.select(col("id").cast("bigint").as("id"),
          col("lbl").cast("bigint").as("community"))
        .orderBy("id")
    }

  /** LOCAL CLUSTERING COEFFICIENT per node — triangles through each
    * vertex over the proximity graph, emitted as exact integers plus
    * a ppm fixed-point ratio (2e6·tri DIV deg·(deg−1)); no floats.
    * Triangle enumeration is the oriented two-path join (a<b<c) with
    * a semi-join closing edge — on a constant-density graph the
    * two-path fan-out per node is deg² ≈ π², so the join output is
    * LINEAR in |V| at every scale (the same argument q256's probe
    * validated). Complements q134 (global triangle count) with the
    * per-node structural metric.
    */
  def q277LocalClustering(s: SparkSession, dir: String): DataFrame =
    narrow(s, 8) {
      localClusteringFrom(
        Tables.customer(s, dir).select(col("c_custkey").as("id")))
    }

  /** q277's engine parametrized on the point-id population (probe
    * convention as above). */
  private[graft] def localClusteringFrom(ids: DataFrame): DataFrame = {
      val pts = QueriesCore.adaptiveGridPoints(ids)
      val pairs = QueriesCore.gridRadiusPairs(pts, r = 1000L)
        .select("id_a", "id_b")
        .localCheckpoint() // degrees + two-path + closing semi-join
      val deg = pairs.select(col("id_a").as("id"))
        .unionByName(pairs.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tri = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .join(pairs.select(col("id_a").as("a"), col("id_b").as("c")),
          Seq("a"))
        .filter(col("b") < col("c"))
        .join(pairs.select(col("id_a").as("b"), col("id_b").as("c")),
          Seq("b", "c"), "left_semi")
      val triPerNode = tri.select(col("a").as("id"))
        .unionByName(tri.select(col("b").as("id")))
        .unionByName(tri.select(col("c").as("id")))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
      ids.join(deg, Seq("id"), "left")
        .join(triPerNode, Seq("id"), "left")
        .na.fill(0L, Seq("deg", "n_tri"))
        .select(col("id").cast("bigint").as("id"),
          col("deg").cast("bigint").as("deg"),
          col("n_tri").cast("bigint").as("n_tri"),
          when(col("deg") >= 2,
            expr("(2000000 * n_tri) DIV (deg * (deg - 1))"))
            .otherwise(lit(0L)).cast("bigint").as("clus_ppm"))
        .orderBy("id")
    }

  /** MANN–WHITNEY U rank-sum test per nation — returned ('R') vs
    * filled ('N') lineitem quantities. The naive formulation ranks
    * every lineitem inside a 25-partition window (a 4-TB-per-task
    * scale-killer at 100 TB); this one exploits that quantity is
    * VALUE-BOUNDED (1..50): rank arithmetic runs on the ≤ 25×50-row
    * (nation, qty) count rollup, where the midrank of a tie group is
    * (2·cumBefore + cnt + 1)/2 — carried ×2 so everything stays
    * integer (u_r_x2 = 2·U_R exactly). The only window is the 50-row
    * per-nation cumulative — the documented value-bounded pattern.
    */
  def q278MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val j = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_orderkey"), col("l_returnflag").as("flag"),
        col("l_quantity").cast("bigint").as("qty"))
      .join(Tables.orders(s, dir).select(col("o_orderkey")
        .as("l_orderkey"), col("o_custkey")), Seq("l_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey")
        .as("o_custkey"), col("c_nationkey")), Seq("o_custkey"))
      .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey")
        .as("c_nationkey"), col("n_name"))), Seq("c_nationkey"))
    val counts = j.groupBy(col("n_name").as("nation"), col("qty"))
      .agg(sum(when(col("flag") === "R", 1L).otherwise(0L)).as("c_r"),
        sum(when(col("flag") === "N", 1L).otherwise(0L)).as("c_n"))
      .withColumn("cnt", col("c_r") + col("c_n"))
    val cum = Window.partitionBy("nation").orderBy("qty")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts.withColumn("cb",
        coalesce(sum(col("cnt")).over(cum), lit(0L)))
      .withColumn("rank2", lit(2L) * col("cb") + col("cnt") + 1L)
    ranked.groupBy("nation")
      .agg(sum(col("c_r")).as("n_r"), sum(col("c_n")).as("n_n"),
        sum(col("c_r") * col("rank2")).as("__rr2"))
      .select(col("nation"),
        col("n_r").cast("bigint").as("n_r"),
        col("n_n").cast("bigint").as("n_n"),
        (col("__rr2") - col("n_r") * (col("n_r") + 1L))
          .cast("bigint").as("u_r_x2"),
        (lit(2L) * col("n_r") * col("n_n")
          - (col("__rr2") - col("n_r") * (col("n_r") + 1L)))
          .cast("bigint").as("u_n_x2"))
      .orderBy("nation")
  }

  /** ITEM–ITEM COSINE top-k — the classic co-occurrence recommender
    * normalization over order baskets: cosine(p,q) = co/√(n_p·n_q),
    * ranked per item WITHOUT floats by the e12 fixed-point
    * co²·10¹² DIV (n_p·n_q) (monotone in cosine², so the ranking is
    * exact; DECIMAL(38) intermediates — co²·10¹² overflows BIGINT at
    * ~1e5 co-orders, reachable at 100 TB). Pair generation is the
    * per-order self-join (basket² ≤ 7² per order — q149's bounded
    * pattern), and the top-3 window is keyed per item. Extends q149
    * (raw co-purchase counts) with the normalized, ranked operator a
    * recommender actually serves.
    */
  def q279ItemCosine(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // feeds item counts AND the pair self-join
    val n = bi.groupBy("p").agg(count(lit(1)).as("n_p"))
    val co = bi.select(col("o"), col("p").as("pa"))
      .join(bi.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("co"))
    val sym = co.unionByName(
      co.select(col("pb").as("pa"), col("pa").as("pb"), col("co")))
    val scored = sym
      .join(n.select(col("p").as("pa"), col("n_p").as("na")), Seq("pa"))
      .join(n.select(col("p").as("pb"), col("n_p").as("nb")), Seq("pb"))
      .withColumn("score_e12",
        expr("""CAST((CAST(co AS DECIMAL(38,0)) * co * 1000000000000)
                DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""))
    val win = Window.partitionBy("pa")
      .orderBy(col("score_e12").desc, col("pb"))
    scored.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= 3)
      .select(col("pa").cast("bigint").as("part"),
        col("pb").cast("bigint").as("neighbor"),
        col("co").cast("bigint").as("co_orders"),
        col("score_e12"),
        col("__rn").cast("bigint").as("rnk"))
      .orderBy("part", "rnk")
  }

  /** CUSUM CHANGEPOINT estimator per nation — argmax_t |n·S_t − t·S_n|
    * over the daily revenue series (the cross-multiplied form of the
    * classic max-|CUSUM| split-point statistic: exact BIGINT cents,
    * no mean, no division). Complements q255 (alarm-style CUSUM
    * prefix-minus-running-min) with the retrospective "WHERE did the
    * level shift" estimator. All windows partition by nation over the
    * calendar-day rollup — value-bounded frames (≤ ~2.4k days).
    */
  def q280Changepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey")
        .as("o_custkey"), col("c_nationkey")), Seq("o_custkey"))
      .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey")
        .as("c_nationkey"), col("n_name"))), Seq("c_nationkey"))
      .groupBy(col("n_name").as("nation"),
        col("o_orderdate").cast("date").as("d"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("rev"))
    val byDate = Window.partitionBy("nation").orderBy("d")
    val pre = byDate.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tot = daily.groupBy("nation")
      .agg(count(lit(1)).as("n_days"), sum(col("rev")).as("s_n"))
    val stats = daily
      .withColumn("t", row_number().over(byDate).cast("bigint"))
      .withColumn("s_t", sum(col("rev")).over(pre))
      .join(broadcast(tot), Seq("nation"))
      .filter(col("t") < col("n_days")) // the t=n split is vacuously 0
      .withColumn("stat",
        abs(col("n_days") * col("s_t") - col("t") * col("s_n")))
    val pick = Window.partitionBy("nation")
      .orderBy(col("stat").desc, col("d"))
    stats.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col("nation"),
        col("d").cast("timestamp_ntz").as("cp_date"),
        col("t").cast("bigint").as("t"),
        col("n_days").cast("bigint").as("n_days"),
        col("stat").cast("bigint").as("stat"))
      .orderBy("nation")
  }

  /** STREAMING Count-Min sketch — q265's counter grid maintained as
    * Structured Streaming aggregation state over the events stream:
    * per (row j, cell) counts are SUMS, so the standing state is
    * d·w = 256 integers at any stream length and any batch slicing
    * lands on identical counters (sum is order-free — the same
    * argument as q273's max-register HLL). Keys are
    * event_type:(user_id mod 97) — 485 » w=64, so collisions are real
    * and `sound` is non-vacuous. Finalization (exact audit + min-of-d
    * estimate) runs on the 256-row drained state.
    */
  def q281StreamCms(s: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 64L
    def key(c: Column, u: Column): Column =
      concat(c, lit(":"), pmod(u, lit(97L)).cast("string"))
    def cell(j: Column, k: Column): Column =
      pmod(graft.operators.Scale.md5Prefix32(
        concat(j.cast("string"), lit(":"), k)), lit(w))
    val ev = Tables.events(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("q281-stream").toString
    val src = s"$root/src"
    Seq(0, 1, 2).foreach { r =>
      ev.filter(pmod(col("event_id"), lit(3)) === r)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val name = java.nio.file.Paths.get(root).getFileName.toString
      .replaceAll("[^A-Za-z0-9_]", "_")
    try {
      val q = narrow(s, 4) {
        graft.streaming.EventsStream
          .readEvents(s, src, maxFilesPerTrigger = Some(1))
          .select(key(col("event_type"), col("user_id")).as("__k"))
          .select(explode(sequence(lit(0), lit(d - 1))).as("__j"),
            col("__k"))
          .select(col("__j"), cell(col("__j"), col("__k")).as("__c"))
          .groupBy("__j", "__c").agg(count(lit(1)).as("__n"))
          .writeStream.outputMode("complete").format("memory")
          .queryName(name).start()
      }
      q.processAllAvailable()
      q.stop()
      val counters = s.table(name)
      val exact = ev.select(key(col("event_type"), col("user_id"))
          .as("cms_key"))
        .groupBy("cms_key").agg(count(lit(1)).as("exact_count"))
      val out = exact
        .select(col("cms_key"), col("exact_count"),
          explode(sequence(lit(0), lit(d - 1))).as("__j"))
        .withColumn("__c", cell(col("__j"), col("cms_key")))
        .join(broadcast(counters), Seq("__j", "__c"))
        .groupBy("cms_key", "exact_count")
        .agg(min(col("__n")).as("est_count"))
        .select(col("cms_key"),
          col("est_count").cast("bigint").as("est_count"),
          col("exact_count").cast("bigint").as("exact_count"),
          (col("est_count") >= col("exact_count")).as("sound"))
        .orderBy(col("est_count").desc, col("cms_key"))
        .limit(100)
        .localCheckpoint(true) // materialize before the finally deletes
      s.catalog.dropTempView(name)
      out
    } finally TmpTrees.delete(root)
  }

  /** FORECAST BACKTEST — seasonal-naive (ŷ_w = y_{w−52 weeks}) over
    * per-nation weekly revenue, scored by WAPE carried as exact
    * integers: Σ|err| and Σactual in cents plus the ppm fixed-point
    * ratio (DECIMAL(38) cross-multiply — 10⁶·Σ|err| overflows BIGINT
    * at ~1e13 cents, reachable at 100 TB). The forecast join is by
    * exact date arithmetic (week − 364 days), not row-lag, so GAPS in
    * the weekly series never misalign the forecast. No windows at
    * all — two keyed aggregations and one keyed self-join.
    */
  def q282ForecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey")
        .as("o_custkey"), col("c_nationkey")), Seq("o_custkey"))
      .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey")
        .as("c_nationkey"), col("n_name"))), Seq("c_nationkey"))
      .groupBy(col("n_name").as("nation"),
        to_date(date_trunc("week", col("o_orderdate"))).as("wk"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("rev"))
      .localCheckpoint() // actuals AND the lag-52 self-join probe
    val scored = weekly
      .join(weekly.select(col("nation"),
          date_add(col("wk"), 364).as("wk"), col("rev").as("rev52")),
        Seq("nation", "wk"))
    scored.groupBy("nation")
      .agg(count(lit(1)).as("n_weeks"),
        sum(abs(col("rev") - col("rev52"))).as("sae_cents"),
        sum(col("rev")).as("actual_cents"))
      .select(col("nation"),
        col("n_weeks").cast("bigint").as("n_weeks"),
        col("sae_cents").cast("bigint").as("sae_cents"),
        col("actual_cents").cast("bigint").as("actual_cents"),
        expr("""CAST((CAST(sae_cents AS DECIMAL(38,0)) * 1000000)
                DIV actual_cents AS BIGINT)""").as("wape_ppm"))
      .orderBy("nation")
  }

  val queries: Map[String, Q] = Map(
    "q276_label_propagation" -> q276LabelPropagation _,
    "q277_local_clustering" -> q277LocalClustering _,
    "q278_mann_whitney" -> q278MannWhitney _,
    "q279_item_cosine" -> q279ItemCosine _,
    "q280_changepoint" -> q280Changepoint _,
    "q281_stream_cms" -> q281StreamCms _,
    "q282_forecast_backtest" -> q282ForecastBacktest _)
}
