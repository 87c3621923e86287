package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 continuation wave — the evaluation-metric surface a
  * model/data-quality pipeline reads off its own fact tables: Fleiss'
  * multi-rater agreement, mean average precision, threshold-sweep
  * confusion matrices, Brier/Murphy forecast decomposition, Spearman
  * rank correlation, PageRank over the constant-density grid graph,
  * Jensen–Shannon source drift, ROUGE lead-summary overlap, and
  * Theil–Sen robust trend slopes. Same determinism contract as
  * [[QueriesStats]]: integer/decimal arithmetic end-to-end (ppm/micro
  * fixed-point via cross-multiplied integral division, DECIMAL(38,0)
  * operands sized so products cannot overflow at fact scale), pinned
  * DECIMAL log terms where a metric is inherently logarithmic,
  * explicit total orders, and a DuckDB oracle twin per query.
  */
object QueriesEval {
  type Q = (SparkSession, String) => DataFrame

  /** FLEISS' KAPPA — multi-rater chance-corrected agreement (Fleiss
    * 1971), the labeling-QA metric when every item is judged by m > 2
    * raters: items are orders with ≥ 3 lines, the m = 3 raters are the
    * three lowest-linenumber lines, the category each rater assigns is
    * its return flag, and items group by order priority. Per item
    * Σ_c n_c(n_c−1) counts agreeing rater pairs (denominator
    * m(m−1) = 6); P̄o = Σᵢpairsᵢ/(6N), P̄e = Σ_c S_c²/(9N²) with S_c
    * the category's rater-vote total, and κ on the common denominator
    * 18N²: κ_ppm = (3N·Σpairs − 2ΣS²)·1e6 DIV (18N² − 2ΣS²) —
    * all-integer, nullif on the degenerate P̄e = 1. Shape: ONE
    * lineitem pass (order-keyed aggregate, map-side combined), one
    * co-partitioned fact-fact join to orders for the priority, then a
    * 5-row grid; operands DECIMAL(38,0) so 18N²·1e6 holds far past
    * 1e12 items.
    */
  def q309FleissKappa(s: SparkSession, dir: String): DataFrame = {
    val perItem = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("nl"),
        sum(when(col("l_linenumber") <= 3 && col("l_returnflag") === "R",
          1L).otherwise(0L)).as("nr"),
        sum(when(col("l_linenumber") <= 3 && col("l_returnflag") === "N",
          1L).otherwise(0L)).as("nn"),
        sum(when(col("l_linenumber") <= 3 && col("l_returnflag") === "A",
          1L).otherwise(0L)).as("na"))
      .filter(col("nl") >= 3)
    perItem
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority")), Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("nr") * (col("nr") - 1) + col("nn") * (col("nn") - 1)
          + col("na") * (col("na") - 1)).as("sp"),
        sum(col("nr")).as("sr"), sum(col("nn")).as("sn"),
        sum(col("na")).as("sa"))
      .select(col("o_orderpriority"),
        col("n").cast("bigint").as("n_items"),
        expr("CAST(CAST(sp AS DECIMAL(38,0)) * 1000000 DIV (6 * n) AS BIGINT)")
          .as("po_ppm"),
        expr("""CAST((CAST(sr AS DECIMAL(38,0)) * sr
                 + CAST(sn AS DECIMAL(38,0)) * sn
                 + CAST(sa AS DECIMAL(38,0)) * sa) * 1000000
                DIV (CAST(9 AS DECIMAL(38,0)) * n * n) AS BIGINT)""")
          .as("pe_ppm"),
        expr("""CAST((CAST(3 AS DECIMAL(38,0)) * n * sp
                 - 2 * (CAST(sr AS DECIMAL(38,0)) * sr
                        + CAST(sn AS DECIMAL(38,0)) * sn
                        + CAST(sa AS DECIMAL(38,0)) * sa)) * 1000000
                DIV nullif(CAST(18 AS DECIMAL(38,0)) * n * n
                 - 2 * (CAST(sr AS DECIMAL(38,0)) * sr
                        + CAST(sn AS DECIMAL(38,0)) * sn
                        + CAST(sa AS DECIMAL(38,0)) * sa), 0) AS BIGINT)""")
          .as("kappa_ppm"))
      .orderBy("o_orderpriority")
  }

  /** MEAN AVERAGE PRECISION — the IR/retrieval-eval headline number
    * (MAP): each customer is a query, its orders are the ranked list
    * (price-cents descending, orderkey tie-break), and an order is
    * relevant when its status is 'F'. AP per customer is the exact
    * per-hit precision sum (cumrel·1e6 DIV k at each relevant rank k,
    * floored per term — the documented fixed-point convention) DIV the
    * relevant count; customers with no relevant order are ineligible
    * (AP undefined) and counted separately. Shape: windows partition
    * by customer — bounded by the per-customer order count at ANY
    * corpus scale, never a global sort — then one customer-dim join
    * for the segment and a 5-row rollup.
    */
  def q310Map(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("__cents").desc, col("o_orderkey").asc)
    val ranked = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("rel"))
      .withColumn("k", row_number().over(w))
      .withColumn("cumrel", sum(col("rel")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val per = ranked.groupBy("o_custkey")
      .agg(sum(col("rel")).as("p"),
        sum(when(col("rel") === 1L, expr(
          "CAST(CAST(cumrel AS DECIMAL(38,0)) * 1000000 DIV k AS BIGINT)")))
          .as("sterm"))
      .withColumn("ap_ppm",
        when(col("p") > 0, expr("CAST(sterm DIV p AS BIGINT)")))
    per.join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(when(col("p") > 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_ranked"),
        sum(when(col("p") === 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_no_relevant"),
        expr("""CAST(sum(ap_ppm)
                DIV nullif(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT)""").as("mean_ap_ppm"))
      .orderBy("c_mktsegment")
  }

  /** CONFUSION-MATRIX THRESHOLD SWEEP — the classifier-eval table
    * (precision / recall / F1 / accuracy / Youden's J at each
    * operating point): the "score" is the line quantity (value-bounded
    * 1..50), the label is return-flag 'R', and the sweep predicts
    * positive at quantity > t for the fixed grid t ∈ {5,10,…,45}.
    * ONE fact pass collapses lineitem to the ≤ 50-row (quantity ×
    * label) grid with map-side combine; the 9-row threshold frame
    * cross-joins it broadcast, so the sweep costs the same single
    * scan however many thresholds are graded. All ratios are exact
    * integral ppm; F1 comes integrally from counts as
    * 2TP·1e6 DIV (2TP+FP+FN) — no floated intermediate.
    */
  def q311ConfusionSweep(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .groupBy(col("l_quantity").cast("bigint").as("q"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("pos"),
        sum(when(col("l_returnflag") === "R", 0L).otherwise(1L))
          .as("neg"))
      .localCheckpoint() // ≤ 50 rows; sweep + totals read it
    val tot = g.agg(sum("pos").as("__p"), sum("neg").as("__n"))
    val th = s.range(1, 10).select((col("id") * 5).as("threshold"))
    broadcast(th).crossJoin(g)
      .groupBy("threshold")
      .agg(sum(when(col("q") > col("threshold"), col("pos"))
          .otherwise(0L)).as("tp"),
        sum(when(col("q") > col("threshold"), col("neg"))
          .otherwise(0L)).as("fp"))
      .crossJoin(broadcast(tot))
      .select(col("threshold").cast("bigint").as("threshold"),
        col("tp").cast("bigint").as("tp"),
        col("fp").cast("bigint").as("fp"),
        (col("__p") - col("tp")).cast("bigint").as("fn"),
        (col("__n") - col("fp")).cast("bigint").as("tn"),
        expr("""CAST(CAST(tp AS DECIMAL(38,0)) * 1000000
                DIV nullif(tp + fp, 0) AS BIGINT)""")
          .as("precision_ppm"),
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV __p AS BIGINT)")
          .as("recall_ppm"),
        expr("""CAST(CAST(2 AS DECIMAL(38,0)) * tp * 1000000
                DIV nullif(2 * tp + fp + (__p - tp), 0) AS BIGINT)""")
          .as("f1_ppm"),
        expr("""CAST((CAST(tp AS DECIMAL(38,0)) + (__n - fp)) * 1000000
                DIV (__p + __n) AS BIGINT)""").as("accuracy_ppm"),
        expr("""CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV __p
                + CAST(__n - fp AS DECIMAL(38,0)) * 1000000 DIV __n
                - 1000000 AS BIGINT)""").as("youden_ppm"))
      .orderBy("threshold")
  }

  /** BRIER SCORE + MURPHY DECOMPOSITION — the forecast-calibration
    * readout (Murphy 1973: Brier = reliability − resolution +
    * uncertainty): the "forecast" is the line's discount restated as a
    * return probability (percent · 1e5 → exact ppm, 11 distinct
    * values), the outcome is return-flag 'R', and bins are the exact
    * forecast values per line status. ONE fact pass collapses lineitem
    * to the ≤ 22-row (status × forecast) grid; every component is then
    * integral off that grid: Brier from the per-bin exact sum
    * o_k(1e6−f_k)² + (n_k−o_k)f_k² DIV (N·1e6), reliability and
    * resolution from the FLOORED per-bin outcome means (the documented
    * ppm convention — Σ n_k·Δppm² DIV (N·1e6), operands sized so
    * N ≈ 1e12 rows still fit DECIMAL(38,0)), uncertainty as
    * O(N−O)·1e6 DIV N². The rel−res+unc identity then holds only to
    * the flooring band — the spec asserts the band, the oracle
    * restates the identical floors.
    */
  def q312BrierDecomposition(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .select(col("l_linestatus").as("ls"),
        (expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
          * 100000L).as("f"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("o"))
      .groupBy("ls", "f")
      .agg(count(lit(1)).as("nk"), sum(col("o")).as("ok"))
      .localCheckpoint() // ≤ 22 rows; totals + three component folds
    val tot = g.groupBy("ls").agg(sum("nk").as("n"), sum("ok").as("obig"))
    g.join(tot, Seq("ls"))
      .withColumn("obk", expr(
        "CAST(CAST(ok AS DECIMAL(38,0)) * 1000000 DIV nk AS BIGINT)"))
      .withColumn("obar", expr(
        "CAST(CAST(obig AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"))
      .groupBy("ls")
      .agg(first("n").as("n"), first("obig").as("obig"),
        first("obar").as("obar"),
        sum(expr("""CAST(ok AS DECIMAL(38,0)) * (1000000 - f) * (1000000 - f)
              + CAST(nk - ok AS DECIMAL(38,0)) * f * f""")).as("bsum"),
        sum(expr("CAST(nk AS DECIMAL(38,0)) * (f - obk) * (f - obk)"))
          .as("relsum"),
        sum(expr("CAST(nk AS DECIMAL(38,0)) * (obk - obar) * (obk - obar)"))
          .as("ressum"))
      .select(col("ls").as("l_linestatus"),
        col("n").cast("bigint").as("n"),
        col("obar").cast("bigint").as("mean_outcome_ppm"),
        expr("CAST(bsum DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("brier_ppm"),
        expr("CAST(relsum DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("reliability_ppm"),
        expr("CAST(ressum DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("resolution_ppm"),
        expr("""CAST(CAST(obig AS DECIMAL(38,0)) * (n - obig) * 1000000
                DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""")
          .as("uncertainty_ppm"))
      .orderBy("l_linestatus")
  }

  /** SPEARMAN RANK CORRELATION — the monotone-association readout
    * between two VALUE-BOUNDED line measures (quantity 1..50 vs
    * discount percent 0..10), per return flag, via the classic
    * d² formula ρ = 1 − 6Σd²/(n(n²−1)) on ×2-scaled midranks (q278's
    * integer-midrank device; the tie-correction term is deliberately
    * the textbook-omitted one — the CONVENTION IS THE SEMANTICS, and
    * the oracle restates it). ONE fact pass collapses lineitem to the
    * ≤ 550-cell (flag × qty × pct) grid; both marginal rank ladders
    * derive from that grid with windows over ≤ 50-row partitions, and
    * Σ cnt·d² is pre-floored by n (documented) so the cross-multiplied
    * ρ stays inside DECIMAL(38,0) at any fact scale.
    */
  def q313SpearmanRho(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("rf"),
        col("l_quantity").cast("bigint").as("q"),
        expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("d"))
      .groupBy("rf", "q", "d").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // ≤ 550 rows; both ladders + the d² fold
    def ladder(key: String): DataFrame = {
      val w = Window.partitionBy("rf").orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.groupBy("rf", key).agg(sum("cnt").as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        // midrank×2 = 2·(ranks before) + count + 1
        .select(col("rf"), col(key),
          (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L)
            .as(s"r2$key"))
    }
    cells
      .join(ladder("q"), Seq("rf", "q"))
      .join(ladder("d"), Seq("rf", "d"))
      .groupBy("rf")
      .agg(sum("cnt").as("n"),
        countDistinct(col("q")).as("n_qty_values"),
        countDistinct(col("d")).as("n_disc_values"),
        sum(expr("""CAST(cnt AS DECIMAL(38,0)) * (r2q - r2d)
                    * (r2q - r2d)""")).as("s4"))
      .select(col("rf").as("l_returnflag"),
        col("n").cast("bigint").as("n"),
        col("n_qty_values").cast("bigint").as("n_qty_values"),
        col("n_disc_values").cast("bigint").as("n_disc_values"),
        expr("""CAST(1000000 - (CAST(6 AS DECIMAL(38,0))
                 * (s4 DIV n) * 1000000)
                DIV nullif(CAST(4 AS DECIMAL(38,0)) * (CAST(n AS
                 DECIMAL(38,0)) * n - 1), 0) AS BIGINT)""")
          .as("rho_ppm"))
      .orderBy("l_returnflag")
  }

  /** KRIPPENDORFF'S ALPHA (nominal) — the agreement metric when the
    * rater count VARIES per item (Krippendorff 2004), complementing
    * q302 (two raters) and q309 (fixed m): items are orders with ≥ 2
    * lines, every line is a rater, categories are return flags.
    * α = 1 − D_o/D_e with D_o = (1/n)Σ_u Σ_c n_uc(m_u−n_uc)/(m_u−1)
    * over the n = Σm_u pairable values and D_e = Σ_c S_c(n−S_c) /
    * (n(n−1)). Per-item denominators are cleared EXACTLY by
    * L = lcm(1..20) = 232 792 560; items wider than 21 lines would
    * break that clearing, so they are excluded and REPORTED
    * (n_wide_items — 0 on any TPC-H-shaped fact, where order width is
    * data-bounded ≤ 13) rather than silently floored. α comes out as
    * 1e6 − (SD DIV L)·(n−1)·1e6 DIV SE (the documented pre-floor —
    * SD DIV L ≤ 400N keeps the cross-product inside DECIMAL(38,0) at
    * 1e12 items). Shape: ONE lineitem pass to per-order counts, a
    * co-partitioned join to orders for the priority, then a 5-row
    * grid.
    */
  def q314KrippendorffAlpha(s: SparkSession, dir: String): DataFrame = {
    val L = 232792560L // lcm(1..20)
    val perItem = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("m"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("nn"),
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("na"))
      .filter(col("m") >= 2)
    perItem
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority")), Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("m") <= 21, 1L).otherwise(0L)).as("n_items"),
        sum(when(col("m") > 21, 1L).otherwise(0L)).as("n_wide"),
        sum(when(col("m") <= 21, col("m")).otherwise(0L)).as("n"),
        sum(when(col("m") <= 21,
          expr(s"CAST($L DIV (m - 1) AS DECIMAL(38,0))") *
            (col("nr") * (col("m") - col("nr"))
              + col("nn") * (col("m") - col("nn"))
              + col("na") * (col("m") - col("na")))).otherwise(lit(0L)))
          .as("sd"),
        sum(when(col("m") <= 21, col("nr")).otherwise(0L)).as("sr"),
        sum(when(col("m") <= 21, col("nn")).otherwise(0L)).as("sn"),
        sum(when(col("m") <= 21, col("na")).otherwise(0L)).as("sa"))
      .withColumn("se", expr("""CAST(sr AS DECIMAL(38,0)) * (n - sr)
          + CAST(sn AS DECIMAL(38,0)) * (n - sn)
          + CAST(sa AS DECIMAL(38,0)) * (n - sa)"""))
      .select(col("o_orderpriority"),
        col("n_items").cast("bigint").as("n_items"),
        col("n_wide").cast("bigint").as("n_wide_items"),
        col("n").cast("bigint").as("n_values"),
        expr(s"CAST((sd DIV $L) * 1000000 DIV n AS BIGINT)").as("do_ppm"),
        // nullif: a 1-value group has no pairs — DuckDB's // by zero
        // yields NULL, Spark ANSI DIV throws, so the guard is needed
        // for engine parity on degenerate groups (seed-gate class)
        expr("""CAST(se * 1000000
                DIV nullif(CAST(n AS DECIMAL(38,0)) * (n - 1), 0)
                AS BIGINT)""")
          .as("de_ppm"),
        expr(s"""CAST(1000000 - (sd DIV $L) * (n - 1) * 1000000
                 DIV nullif(se, 0) AS BIGINT)""").as("alpha_ppm"))
      .orderBy("o_orderpriority")
  }

  /** JENSEN–SHANNON SOURCE DRIFT — the corpus-mixing diagnostic every
    * multi-source training pipeline tracks: JSD(source ‖ corpus) over
    * normalized-token unigram distributions, per source. The fact is
    * tokenized ONCE; per-(source, term) counts are vocab-bounded, the
    * corpus distribution derives from them (no second scan), and the
    * JSD splits exactly into (a) per-term double contributions
    * ((p·log2(p/m) + q·log2(q/m))/2, pinned by round(·,9) →
    * DECIMAL(18,9) — the q77/q88 established log convention — summed
    * exactly) and (b) the CLOSED-FORM tail for corpus terms absent
    * from the source, where q/m = 2 exactly, so the tail is the
    * integral (n_tot − Σ_{t∈src} c_t)·1e9 DIV (2·n_tot) nanos — no
    * full-outer join, no per-missing-term rows. Output in micros with
    * the q77 half-up nanos→micros fold.
    */
  def q315JsDivergence(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis.normalizeText
    val toks = Tables.documents(s, dir).select(col("source"),
      explode(filter(split(normalizeText(col("text")), " "),
        t => t =!= "")).as("term"))
    val cs = toks.groupBy("source", "term").agg(count(lit(1)).as("c"))
      .localCheckpoint() // corpus dist + per-source totals + terms
    val corpus = cs.groupBy("term").agg(sum("c").as("ct"))
    val ntot = corpus.agg(sum("ct").as("ntot"))
    val ns = cs.groupBy("source").agg(sum("c").as("nsrc"))
    cs.join(corpus, Seq("term"))
      .join(ns, Seq("source"))
      .crossJoin(broadcast(ntot))
      .withColumn("p", col("c").cast("double") / col("nsrc"))
      .withColumn("qq", col("ct").cast("double") / col("ntot"))
      .withColumn("mm", (col("p") + col("qq")) / lit(2.0))
      .withColumn("t", round((col("p") * log2(col("p") / col("mm"))
          + col("qq") * log2(col("qq") / col("mm"))) / lit(2.0), 9)
        .cast("decimal(18,9)"))
      .groupBy("source")
      .agg(first("nsrc").as("n_tokens"),
        count(lit(1)).as("n_terms"),
        first("ntot").as("__ntot"),
        sum("t").as("__tsum"),
        sum("ct").as("__ctsum"))
      .select(col("source"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        col("n_terms").cast("bigint").as("n_terms"),
        // per-term nanos (exact: scale-9 decimal × 1e9) + closed-form
        // missing-mass tail nanos, half-up to micros
        expr("""CAST((CAST(__tsum * 1000000000 AS DECIMAL(28,0))
                + CAST(__ntot - __ctsum AS DECIMAL(38,0)) * 1000000000
                  DIV (2 * __ntot)
                + 500) DIV 1000 AS BIGINT)""").as("jsd_micro"))
      .orderBy("source")
  }

  /** ROUGE-1/2 AGAINST A PER-LANGUAGE EXEMPLAR — the n-gram-overlap
    * summary metric (Lin 2004) in its corpus-audit posture: each
    * language's exemplar is its min-doc_id document, and every other
    * document of that language scores clipped unigram/bigram overlap
    * against it (recall = covered exemplar grams, precision = matching
    * candidate grams, F1 integral from counts as 2·ov·1e6 DIV
    * (n_cand + n_ref)). Shape: ONE tokenize pass (the token arrays are
    * localCheckpointed — the filter/transform lambdas would otherwise
    * re-run per consumer, the documented CollapseProject hazard);
    * unigrams and bigrams explode from that pinned frame; gram counts
    * are per-doc bounded; the exemplar side is ≤ langs × one-doc-vocab
    * rows and broadcasts. Clipping is Σ min(c_cand, c_ref) per gram —
    * exact multiset intersection.
    */
  /** (doc_id, lang, toks) with the one-pass normalized token arrays
    * PINNED by localCheckpoint — the filter lambda would otherwise
    * re-run per consumer (the documented CollapseProject hazard).
    * Shared base of the n-gram metric family (q316 ROUGE, q318
    * distinct-n, q321 BLEU).
    */
  private def tokenBase(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis.normalizeText
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        filter(split(normalizeText(col("text")), " "), t => t =!= "")
          .as("toks"))
      .localCheckpoint()
  }

  /** Exploded word n-gram rows (doc_id, lang, n, gram) off a
    * [[tokenBase]] frame — space-joined windows, empty for docs
    * shorter than n tokens.
    */
  private def gramRows(base: DataFrame, n: Int): DataFrame =
    if (n == 1)
      base.select(col("doc_id"), col("lang"), lit(1).as("n"),
        explode(col("toks")).as("gram"))
    else {
      val parts = (0 until n)
        .map(k => s"element_at(toks, i + $k)").mkString(", ' ', ")
      base.select(col("doc_id"), col("lang"), lit(n).as("n"),
        explode(expr(s"""CASE WHEN size(toks) < $n THEN array()
          ELSE transform(sequence(1, size(toks) - ${n - 1}),
            i -> concat($parts))
          END""")).as("gram"))
    }

  def q316RougeExemplar(s: SparkSession, dir: String): DataFrame = {
    val base = tokenBase(s, dir)
    val counts = gramRows(base, 1).unionByName(gramRows(base, 2))
      .groupBy("doc_id", "lang", "n", "gram")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // candidate side + exemplar side + totals
    val refIds = base.groupBy("lang").agg(min("doc_id").as("ref_id"))
    val refCounts = counts.join(broadcast(refIds),
        counts("doc_id") === refIds("ref_id") &&
          counts("lang") === refIds("lang"))
      .select(counts("lang"), col("n"), col("gram"), col("c").as("cref"))
    val refTotals = refCounts.groupBy("lang", "n")
      .agg(sum("cref").as("nref"))
    val cand = counts.join(broadcast(refIds), Seq("lang"))
      .filter(col("doc_id") =!= col("ref_id"))
    val ov = cand
      .join(broadcast(refCounts), Seq("lang", "n", "gram"), "left")
      .groupBy("doc_id", "lang", "n")
      .agg(sum("c").as("ncand"),
        sum(least(col("c"), coalesce(col("cref"), lit(0L)))).as("ov"))
      .join(broadcast(refTotals), Seq("lang", "n"))
    def ppm(num: String, den: String) = expr(
      s"CAST(CAST($num AS DECIMAL(38,0)) * 1000000 DIV nullif($den, 0) AS BIGINT)")
    ov.groupBy("doc_id", "lang")
      .agg(
        sum(when(col("n") === 1, ppm("ov", "ncand"))).as("r1_precision_ppm"),
        sum(when(col("n") === 1, ppm("ov", "nref"))).as("r1_recall_ppm"),
        sum(when(col("n") === 1,
          ppm("2 * ov", "ncand + nref"))).as("r1_f1_ppm"),
        sum(when(col("n") === 2, ppm("ov", "ncand"))).as("r2_precision_ppm"),
        sum(when(col("n") === 2, ppm("ov", "nref"))).as("r2_recall_ppm"),
        sum(when(col("n") === 2,
          ppm("2 * ov", "ncand + nref"))).as("r2_f1_ppm"))
      .orderBy("doc_id")
  }

  /** THEIL–SEN ROBUST TREND — the outlier-resistant slope estimator
    * (median of pairwise slopes) over each brand's monthly revenue
    * series: the classic "is this segment growing" readout that OLS
    * (q200) gets wrong under a few bad months. The fact collapses in
    * ONE pass (plus the co-partitioned orders join for the date) to
    * the ≤ brands × months grid; the pairwise self-join and median
    * window then live entirely on that dimension-bounded grid (≤ ~3.2k
    * pairs per brand at 80 months — bounded at ANY fact scale).
    * Slopes are exact micro-cents/month via signed integral division
    * (both engines truncate toward zero); the median is the LOWER
    * median, rank (n+1) DIV 2 under the explicit total order
    * (slope, m1, m2).
    */
  def q317TheilSen(s: SparkSession, dir: String): DataFrame = {
    val series = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("bigint").as("m"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("y"))
      .localCheckpoint() // ≤ brands × months rows; both join sides
    val pairs = series.select(col("p_brand"), col("m").as("m1"),
        col("y").as("y1"))
      .join(series.select(col("p_brand"), col("m").as("m2"),
        col("y").as("y2")), Seq("p_brand"))
      .filter(col("m1") < col("m2"))
      .select(col("p_brand"), col("m1"), col("m2"),
        expr("""CAST(CAST(y2 - y1 AS DECIMAL(38,0)) * 1000000
                DIV (m2 - m1) AS BIGINT)""").as("slope"))
    val w = Window.partitionBy("p_brand")
      .orderBy(col("slope"), col("m1"), col("m2"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("p_brand")))
      .filter(col("rn") === expr("(np + 1) DIV 2"))
      .join(series.groupBy("p_brand").agg(count(lit(1)).as("n_months")),
        Seq("p_brand"))
      .select(col("p_brand"),
        col("n_months").cast("bigint").as("n_months"),
        col("np").cast("bigint").as("n_pairs"),
        col("slope").cast("bigint").as("sen_slope_micro"))
      .orderBy("p_brand")
  }

  /** DISTINCT-N DIVERSITY — the generation-diversity readout (Li et
    * al. 2016): distinct n-grams over total n-grams, n = 1..3, per
    * language, plus token totals — the degenerate-repetition flag a
    * sampling/curation pipeline watches. One tokenize pass off
    * [[tokenBase]]; gram rows aggregate map-side to per-(source, n)
    * distinct/total counts (vocab-bounded distinct state); ratios are
    * exact integral ppm.
    */
  def q318DistinctN(s: SparkSession, dir: String): DataFrame = {
    val base = tokenBase(s, dir)
    val grams = (1 to 3).map(gramRows(base, _)).reduce(_.unionByName(_))
    grams.groupBy(col("lang").as("src_lang"), col("n"))
      .agg(count(lit(1)).as("total"),
        countDistinct(col("gram")).as("uniq"))
      .groupBy("src_lang")
      .agg(
        sum(when(col("n") === 1, col("total"))).cast("bigint")
          .as("n_tokens"),
        sum(when(col("n") === 1, col("uniq"))).cast("bigint")
          .as("n_types"),
        sum(when(col("n") === 1, expr(
          "CAST(CAST(uniq AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)")))
          .as("distinct1_ppm"),
        sum(when(col("n") === 2, expr(
          "CAST(CAST(uniq AS DECIMAL(38,0)) * 1000000 DIV nullif(total, 0) AS BIGINT)")))
          .as("distinct2_ppm"),
        sum(when(col("n") === 3, expr(
          "CAST(CAST(uniq AS DECIMAL(38,0)) * 1000000 DIV nullif(total, 0) AS BIGINT)")))
          .as("distinct3_ppm"))
      .select(col("src_lang").as("lang"), col("n_tokens"), col("n_types"),
        col("distinct1_ppm"), col("distinct2_ppm"), col("distinct3_ppm"))
      .orderBy("lang")
  }

  /** ZIPF SLOPE — the corpus-health power-law fit (Zipf 1949; a
    * healthy natural-language corpus runs slope ≈ −1, templated or
    * synthetic text drifts off): per language, OLS of log2(frequency)
    * on log2(rank) over the top-100 terms (count desc, term asc — an
    * explicit total order). Ranks live on vocab-bounded per-language
    * partitions; the fit uses the pinned-log convention (round(log2,9)
    * → DECIMAL(18,9), exact Σx/Σy/Σxy/Σx²) with ONE double division
    * at the end, rounded for display — the established q77/q88
    * arithmetic, applied to a regression.
    */
  def q319ZipfSlope(s: SparkSession, dir: String): DataFrame = {
    val base = tokenBase(s, dir)
    val counts = gramRows(base, 1)
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang")
      .orderBy(col("c").desc, col("gram").asc)
    counts.withColumn("r", row_number().over(w))
      .filter(col("r") <= 100)
      .withColumn("x", round(log2(col("r").cast("double")), 9)
        .cast("decimal(18,9)"))
      .withColumn("y", round(log2(col("c").cast("double")), 9)
        .cast("decimal(18,9)"))
      .groupBy("lang")
      .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("lang"), col("k").cast("bigint").as("n_terms"),
        // nullif: one distinct term ⇒ one rank point ⇒ zero OLS
        // denominator — same degenerate class the edge-seed gate hit
        // in q320; slope undefined, NULL (oracle mirrored)
        round((col("k") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          nullif((col("k") * col("sxx") - col("sx") * col("sx")), lit(0))
            .cast("double"),
          6).as("zipf_slope"))
      .orderBy("lang")
  }

  /** HEAPS' LAW — vocabulary growth V(N) ≈ k·N^β per language
    * (Heaps 1978; β ≈ 0.5 for natural text — a near-1 β flags
    * vocabulary explosion, near-0 flags template collapse), WITHOUT a
    * running window: 16 doc_id-threshold checkpoints (a broadcast
    * grid off max(doc_id)) turn the cumulative curve into conditional
    * sums — V(T) counts terms whose FIRST-occurrence doc ≤ T (one
    * vocab-bounded min aggregate), N(T) sums doc token counts ≤ T.
    * The β fit is the same pinned-log OLS as q319, over log2 V vs
    * log2 N at the non-empty checkpoints. Scale shape: no window ever
    * sees a fact-scale partition; everything is keyed aggregation +
    * one 16-row broadcast.
    */
  def q320HeapsLaw(s: SparkSession, dir: String): DataFrame = {
    val base = tokenBase(s, dir)
    val toks = gramRows(base, 1)
    val firstDoc = toks.groupBy("lang", "gram")
      .agg(min("doc_id").as("fd"))
    val docTok = toks.groupBy("lang", "doc_id")
      .agg(count(lit(1)).as("nt"))
      .localCheckpoint() // thresholds grid + the max-doc probe
    val maxDoc = docTok.agg(max("doc_id").as("__mx"))
    val grid = s.range(1, 17).crossJoin(broadcast(maxDoc))
      .select(col("id").as("ck"),
        expr("CAST(__mx * id DIV 16 AS BIGINT)").as("t"))
    val vPts = firstDoc.join(broadcast(grid), col("fd") <= col("t"))
      .groupBy("lang", "ck", "t").agg(count(lit(1)).as("v"))
    val nPts = docTok.join(broadcast(grid), col("doc_id") <= col("t"))
      .groupBy(col("lang").as("lang2"), col("ck").as("ck2"))
      .agg(sum("nt").as("ntok"))
    vPts.join(nPts, col("lang") === col("lang2") && col("ck") === col("ck2"))
      .filter(col("v") > 0 && col("ntok") > 0)
      .withColumn("x", round(log2(col("ntok").cast("double")), 9)
        .cast("decimal(18,9)"))
      .withColumn("y", round(log2(col("v").cast("double")), 9)
        .cast("decimal(18,9)"))
      .groupBy("lang")
      .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("lang"), col("k").cast("bigint").as("n_checkpoints"),
        // nullif: a language whose checkpoints all share one x (e.g. a
        // single-document language — every threshold sees the same
        // corpus) has a zero OLS denominator and NO defined slope;
        // emit NULL instead of the DIV-by-zero throw the edge-seed
        // gate hit (seed 99 --edge, r17). Mirrored in the oracle.
        round((col("k") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          nullif((col("k") * col("sxx") - col("sx") * col("sx")), lit(0))
            .cast("double"),
          6).as("heaps_beta"))
      .orderBy("lang")
  }

  /** CORPUS BLEU vs PER-LANGUAGE EXEMPLAR — the precision-oriented
    * complement of q316 (Papineni et al. 2002), at CORPUS granularity:
    * clipped n-gram matches (n = 1..4) of every non-exemplar document
    * against its language's exemplar are summed corpus-wide per
    * language before dividing — the standard corpus-BLEU pooling, not
    * a mean of per-doc scores. p_n are exact integral ppm; the final
    * geometric mean and the brevity penalty exp(1 − r/c) are computed
    * as ONE display double each (round 6), the established
    * final-column convention. Reference length r is |exemplar| per
    * candidate doc (summed), candidate length c is Σ|doc|.
    */
  def q321BleuCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = tokenBase(s, dir)
    val counts = (1 to 4).map(gramRows(base, _)).reduce(_.unionByName(_))
      .groupBy("doc_id", "lang", "n", "gram")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // candidate + exemplar sides
    val refIds = base.groupBy("lang").agg(min("doc_id").as("ref_id"))
    val refCounts = counts.join(broadcast(refIds),
        counts("doc_id") === refIds("ref_id") &&
          counts("lang") === refIds("lang"))
      .select(counts("lang"), col("n"), col("gram"), col("c").as("cref"))
    val cand = counts.join(broadcast(refIds), Seq("lang"))
      .filter(col("doc_id") =!= col("ref_id"))
    val pooled = cand
      .join(broadcast(refCounts), Seq("lang", "n", "gram"), "left")
      .groupBy("lang", "n")
      .agg(sum("c").as("ncand"),
        sum(least(col("c"), coalesce(col("cref"), lit(0L)))).as("ov"))
    val lens = base.join(broadcast(refIds), Seq("lang"))
      .withColumn("len", size(col("toks")).cast("long"))
    val refLen = lens.filter(col("doc_id") === col("ref_id"))
      .select(col("lang"), col("len").as("rlen"))
    val candLen = lens.filter(col("doc_id") =!= col("ref_id"))
      .groupBy("lang")
      .agg(sum("len").as("clen"), count(lit(1)).as("ndocs"))
    def p(n: Int) = sum(when(col("n") === n, expr(
      "CAST(CAST(ov AS DECIMAL(38,0)) * 1000000 DIV nullif(ncand, 0) AS BIGINT)")))
    pooled.groupBy("lang")
      .agg(p(1).as("p1_ppm"), p(2).as("p2_ppm"), p(3).as("p3_ppm"),
        p(4).as("p4_ppm"))
      .join(broadcast(refLen), Seq("lang"))
      .join(candLen, Seq("lang"))
      .withColumn("bp", round(
        when(col("clen") >= col("rlen") * col("ndocs"), 1.0)
          .otherwise(exp(lit(1.0) -
            (col("rlen") * col("ndocs")).cast("double") /
              col("clen").cast("double"))), 6))
      .select(col("lang"),
        col("p1_ppm"), col("p2_ppm"), col("p3_ppm"), col("p4_ppm"),
        col("bp"),
        round(when(col("p1_ppm") > 0 && col("p2_ppm") > 0 &&
            col("p3_ppm") > 0 && col("p4_ppm") > 0,
          col("bp") * pow(
            col("p1_ppm").cast("double") / 1e6 *
              (col("p2_ppm").cast("double") / 1e6) *
              (col("p3_ppm").cast("double") / 1e6) *
              (col("p4_ppm").cast("double") / 1e6), 0.25))
          .otherwise(0.0), 6).as("bleu"))
      .orderBy("lang")
  }

  /** SIGN-FLIP PERMUTATION TEST — the exact-under-H0 significance
    * check for an A/B readout (Fisher 1935 randomization; the
    * large-scale form studied for online experiments): the observed
    * assignment is the b = 0 hash split, and 32 REPLICATE assignments
    * (b = 1..32, independent md5 salts) rebuild the mean-difference
    * statistic under the null; p = (1 + #{|stat_b| ≥ |stat_0|}) /
    * (B + 1), the standard add-one permutation p-value, reported in
    * ppm. ONE fact pass: each order explodes to its 33 (b,
    * assignment) pairs — q271's bootstrap-replicate shape — and
    * map-side combine collapses straight to the (segment × 33 × 2)
    * grid; stats are floored microcent means, mirrored in the oracle.
    */
  def q322SignFlipTest(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey")
        .as("o_custkey"), col("c_mktsegment")), Seq("o_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    // spread before the ×33 digest fan-out (round 19, Tables.spread
    // contract): the single-row-group scan otherwise leaves ~5M md5
    // computations in a one-task stage when the dim join broadcasts
    val reps = Tables.spread(fact)
      .withColumn("b", explode(expr("sequence(0, 32)")))
      .withColumn("v", pmod(graft.operators.Scale.md5Prefix32(
        concat(lit("perm:"), col("b").cast("string"), lit(":"),
          col("o_orderkey").cast("string"))), lit(2L)))
      .groupBy("segment", "b")
      .agg(sum(when(col("v") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 1L, col("cents")).otherwise(0L)).as("s1"),
        sum(when(col("v") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 0L, col("cents")).otherwise(0L)).as("s0"))
      .withColumn("stat", expr(
        """CAST(CAST(s1 AS DECIMAL(38,0)) * 1000000 DIV nullif(n1, 0)
           - CAST(s0 AS DECIMAL(38,0)) * 1000000 DIV nullif(n0, 0)
           AS BIGINT)"""))
      .localCheckpoint() // 33 rows per segment; read twice below
    val obs = reps.filter(col("b") === 0)
      .select(col("segment"), col("stat").as("obs_stat"),
        col("n1").as("n_treat"), col("n0").as("n_control"))
    reps.filter(col("b") > 0)
      .join(obs, Seq("segment"))
      .groupBy("segment")
      .agg(first("obs_stat").as("obs_diff_microcents"),
        first("n_treat").as("nt"), first("n_control").as("nc"),
        sum(when(abs(col("stat")) >= abs(col("obs_stat")), 1L)
          .otherwise(0L)).as("n_extreme"))
      .select(col("segment"),
        col("nt").cast("bigint").as("n_treat"),
        col("nc").cast("bigint").as("n_control"),
        col("obs_diff_microcents").cast("bigint")
          .as("obs_diff_microcents"),
        col("n_extreme").cast("bigint").as("n_extreme"),
        expr("CAST((1 + n_extreme) * 1000000 DIV 33 AS BIGINT)")
          .as("p_value_ppm"))
      .orderBy("segment")
  }

  /** ISOTONIC CALIBRATION — the monotone recalibration step between
    * raw model scores and usable probabilities (Zadrozny & Elkan
    * 2002), computed by the EXACT minimax characterization instead of
    * the sequential PAV sweep: on the value-bounded forecast grid
    * (q312's ≤ 11 bins per status), the weighted isotonic fit at bin i
    * is max_{j≤i} min_{k≥i} mean(o over bins j..k) — a closed form
    * over the ≤ B³ interval lattice, embarrassingly relational where
    * PAV is inherently sequential. Interval means are FLOORED ppm (the
    * q312 convention, restated in the oracle); the max-of-min over
    * floored means is monotone by construction whatever the floors do.
    * Shape: ONE fact pass to the bin grid; the interval lattice and
    * both fold stages are dimension-sized at any corpus.
    */
  def q323IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .select(col("l_linestatus").as("ls"),
        (expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
          * 100000L).as("f"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("o"))
      .groupBy("ls", "f")
      .agg(count(lit(1)).as("nk"), sum(col("o")).as("ok"))
      .localCheckpoint() // ≤ 22 rows; cumulatives + the bin spine
    val w = Window.partitionBy("ls").orderBy("f")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cn", sum("nk").over(w))
      .withColumn("co", sum("ok").over(w))
      .localCheckpoint() // ≤ 22 rows; both interval endpoints
    val lo = cum.select(col("ls"), col("f").as("fj"),
      (col("cn") - col("nk")).as("cnj"), (col("co") - col("ok")).as("coj"))
    val hi = cum.select(col("ls").as("ls2"), col("f").as("fk"),
      col("cn").as("cnk"), col("co").as("cok"))
    val intervals = lo.join(hi,
        col("ls") === col("ls2") && col("fj") <= col("fk"))
      .select(col("ls"), col("fj"), col("fk"),
        expr("""CAST(CAST(cok - coj AS DECIMAL(38,0)) * 1000000
                DIV (cnk - cnj) AS BIGINT)""").as("m"))
    val fit = g.select(col("ls").as("ls3"), col("f").as("fi"))
      .join(intervals,
        col("ls3") === col("ls") && col("fj") <= col("fi") &&
          col("fk") >= col("fi"))
      .groupBy("ls3", "fi", "fj").agg(min("m").as("mn"))
      .groupBy("ls3", "fi").agg(max("mn").as("iso_ppm"))
    g.join(fit, col("ls") === col("ls3") && col("f") === col("fi"))
      .select(col("ls").as("l_linestatus"), col("f").as("forecast_ppm"),
        col("nk").cast("bigint").as("n"),
        expr("CAST(CAST(ok AS DECIMAL(38,0)) * 1000000 DIV nk AS BIGINT)")
          .as("raw_ppm"),
        col("iso_ppm").cast("bigint").as("iso_ppm"))
      .orderBy("l_linestatus", "forecast_ppm")
  }

  /** HYPERANF NEIGHBORHOOD FUNCTION — |B(v, h)| for h = 0..3 per node
    * by ITERATED HLL register merge (Boldi, Rosa & Vigna 2011), the
    * canonical way to read distances off a graph too big for exact
    * BFS frontiers: each node starts as the q100/q192 portable-HLL of
    * {itself} (m = 64, md5-prefix-32, integer-bit-length rho), and
    * each round elementwise-max-merges every neighbor's registers —
    * a keyed join + max aggregate, per-round state ≤ 64 rows per node,
    * on the constant-density grid graph whose degree never grows with
    * the corpus. Register absence IS value 0, so the harmonic sum
    * clears to Σ2^(27−reg) + (64−present)·2^27 WITHOUT a 64-bucket
    * spine join; the estimate (with the q100 linear-counting branch)
    * is the same pinned literal-product division. Registers are exact
    * integers — the oracle rebuilds every round bit-for-bit.
    */
  def q324Hyperanf(s: SparkSession, dir: String): DataFrame =
    hyperanfFrom(Tables.customer(s, dir).select(col("c_custkey").as("id")))

  /** q324's engine parametrized on the id population (the q274/q276
    * grid-probe convention) so the scale probe can feed an N× world
    * at constant density. */
  private[graft] def hyperanfFrom(base: DataFrame): DataFrame = {
    val pts = QueriesCore.adaptiveGridPoints(base)
    val pr = QueriesCore.gridRadiusPairs(pts, r = 1000L)
    val edges = pr.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pr.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint() // probed once per merge round
    val r0 = pts.select(col("id"),
        graft.operators.Scale.md5Prefix32(concat(lit("anf:"),
          col("id").cast("string"))).as("__h"))
      .select(col("id"),
        pmod(col("__h"), lit(64)).cast("int").as("bucket"),
        expr("""CASE WHEN __h DIV 64 = 0 THEN CAST(27 AS BIGINT)
                ELSE 27 - length(bin(__h DIV 64)) END""").as("reg"))
    var regs = r0.localCheckpoint()
    val perH = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def estimate(r: DataFrame, h: Int): DataFrame = r
      .groupBy("id")
      .agg(sum(expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(27 - reg AS INT))"))
          .as("__present_pow"),
        count(lit(1)).as("__nb"))
      .select(col("id"), lit(h.toLong).as("h"),
        (col("__present_pow") +
          (lit(64L) - col("__nb")) * lit(134217728L)).as("sum_pow"),
        (lit(64L) - col("__nb")).as("n_zero"))
    perH += estimate(regs, 0)
    for (h <- 1 to 3) {
      regs = regs
        .unionByName(edges
          .join(regs.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst").as("id"), col("bucket"), col("reg")))
        .groupBy("id", "bucket").agg(max("reg").as("reg"))
        .localCheckpoint()
      perH += estimate(regs, h)
    }
    val raw = ((lit(0.709) * 4096.0) * 134217728.0) /
      col("sum_pow").cast("double")
    perH.reduce(_.unionByName(_))
      .withColumn("est_micros",
        when(raw <= 160.0 && col("n_zero") > 0,
          floor(lit(64.0) * log(lit(64.0) / col("n_zero").cast("double"))
            * 1000000.0))
          .otherwise(floor(raw * 1000000.0)).cast("bigint"))
      .select(col("id").cast("bigint").as("id"), col("h"),
        col("sum_pow").cast("bigint").as("sum_pow"),
        col("n_zero").cast("bigint").as("n_zero"), col("est_micros"))
      .orderBy("id", "h")
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION — the principled multi-touch
    * model (Anderl et al. 2016) that q169's last-touch heuristic
    * approximates: user journeys (events to the FIRST purchase, else
    * to exhaustion) become a transition-count matrix over the ≤ 7
    * states {START, 4 channels, CONV, NULL}; conversion probability
    * from START is 6 synchronous power-iteration rounds in micro
    * fixed-point (p(CONV) ≡ 1e6, p(NULL) ≡ 0, pᵢ ← Σc(i,j)·pⱼ DIV
    * Σc(i,j)); each channel's removal effect re-runs the SAME rounds
    * on the matrix with that channel's rows/columns redirected to
    * NULL — five variants ride ONE frame with a variant key, so the
    * whole attribution is a single bounded fixed-point after ONE fact
    * pass (per-user ordered transitions via bounded per-user windows,
    * map-side combined to the count grid). Shares (removal effect
    * over Σ effects) are integral ppm.
    */
  def q325MarkovAttribution(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("__cumP", sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).over(wu.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      // keep events up to and including the first purchase
      .filter(col("__cumP") - when(col("event_type") === "purchase", 1L)
        .otherwise(0L) === 0L)
    val steps = ev
      .withColumn("__prev", lag("event_type", 1).over(wu))
      .withColumn("src", coalesce(col("__prev"), lit("START")))
      .withColumn("dst", col("event_type"))
    val lasts = ev
      .withColumn("__rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") === 1)
      .select(col("event_type").as("src"),
        when(col("event_type") === "purchase", "CONV")
          .otherwise("NULL").as("dst"))
    val trans = steps.select("src", "dst").unionByName(lasts)
      // a purchase row's outgoing edge is the absorbing CONV edge
      // added by `lasts`; purchase→x steps cannot exist (filtered)
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .localCheckpoint() // ≤ 7×7 rows; five variants read it
    val variants = s.range(0, 5).select(
      when(col("id") === 0, "__full__")
        .when(col("id") === 1, "click").when(col("id") === 2, "view")
        .when(col("id") === 3, "signup").otherwise("error")
        .as("removed"))
    val vTrans = broadcast(variants).crossJoin(trans)
      .filter(col("src") =!= col("removed"))
      .select(col("removed"), col("src"),
        when(col("dst") === col("removed"), "NULL").otherwise(col("dst"))
          .as("dst"),
        col("c"))
      .groupBy("removed", "src", "dst").agg(sum("c").as("c"))
      .localCheckpoint() // ≤ 5·49 rows; read every power round
    val states = vTrans.select(col("removed"), col("src").as("st"))
      .unionByName(vTrans.select(col("removed"), col("dst").as("st")))
      .distinct().localCheckpoint()
    def pOf(st: Column, p: Column): Column =
      when(st === "CONV", 1000000L).when(st === "NULL", 0L).otherwise(p)
    var p = states.select(col("removed"), col("st"),
      when(col("st") === "CONV", 1000000L).otherwise(0L).as("p"))
      .localCheckpoint()
    for (_ <- 1 to 6) {
      val nxt = vTrans
        .join(p.select(col("removed"), col("st").as("dst"),
          col("p").as("pd")), Seq("removed", "dst"))
        .groupBy(col("removed"), col("src").as("st"))
        .agg(expr("""CAST(sum(CAST(c AS DECIMAL(38,0)) * pd)
                     DIV sum(c) AS BIGINT)""").as("pn"))
      p = states.join(nxt, Seq("removed", "st"), "left")
        .select(col("removed"), col("st"),
          pOf(col("st"), coalesce(col("pn"), lit(0L))).as("p"))
        .localCheckpoint()
    }
    val pStart = p.filter(col("st") === "START")
      .select(col("removed"), col("p"))
    val full = pStart.filter(col("removed") === "__full__")
      .select(col("p").as("p_full"))
    val effects = pStart.filter(col("removed") =!= "__full__")
      .crossJoin(broadcast(full))
      .select(col("removed").as("channel"), col("p_full"),
        col("p").as("p_removed"),
        greatest(col("p_full") - col("p"), lit(0L)).as("effect"))
      .localCheckpoint() // 4 rows; totals + shares
    val tot = effects.agg(sum("effect").as("__te"))
    effects.crossJoin(broadcast(tot))
      .select(col("channel"),
        col("p_full").cast("bigint").as("p_conv_full_ppm"),
        col("p_removed").cast("bigint").as("p_conv_removed_ppm"),
        col("effect").cast("bigint").as("removal_effect_ppm"),
        expr("""CAST(CAST(effect AS DECIMAL(38,0)) * 1000000
                DIV nullif(__te, 0) AS BIGINT)""").as("share_ppm"))
      .orderBy("channel")
  }

  val queries: Map[String, Q] = Map(
    "q309_fleiss_kappa" -> q309FleissKappa _,
    "q310_map" -> q310Map _,
    "q311_confusion_sweep" -> q311ConfusionSweep _,
    "q312_brier_decomposition" -> q312BrierDecomposition _,
    "q313_spearman_rho" -> q313SpearmanRho _,
    "q314_krippendorff_alpha" -> q314KrippendorffAlpha _,
    "q315_js_divergence" -> q315JsDivergence _,
    "q316_rouge_exemplar" -> q316RougeExemplar _,
    "q317_theil_sen" -> q317TheilSen _,
    "q318_distinct_n" -> q318DistinctN _,
    "q319_zipf_slope" -> q319ZipfSlope _,
    "q320_heaps_law" -> q320HeapsLaw _,
    "q321_bleu_corpus" -> q321BleuCorpus _,
    "q322_sign_flip_test" -> q322SignFlipTest _,
    "q323_isotonic_calibration" -> q323IsotonicCalibration _,
    "q324_hyperanf" -> q324Hyperanf _,
    "q325_markov_attribution" -> q325MarkovAttribution _)
}
