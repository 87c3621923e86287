package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
        expr("""CAST(se * 1000000
                DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)""")
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
  def q316RougeExemplar(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis.normalizeText
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        filter(split(normalizeText(col("text")), " "), t => t =!= "")
          .as("toks"))
      .localCheckpoint()
    val uni = base.select(col("doc_id"), col("lang"), lit(1).as("n"),
      explode(col("toks")).as("gram"))
    val bi = base.select(col("doc_id"), col("lang"), lit(2).as("n"),
      explode(expr("""CASE WHEN size(toks) < 2 THEN array()
        ELSE transform(sequence(1, size(toks) - 1),
          i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
        END""")).as("gram"))
    val counts = uni.unionByName(bi)
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

  val queries: Map[String, Q] = Map(
    "q309_fleiss_kappa" -> q309FleissKappa _,
    "q310_map" -> q310Map _,
    "q311_confusion_sweep" -> q311ConfusionSweep _,
    "q312_brier_decomposition" -> q312BrierDecomposition _,
    "q313_spearman_rho" -> q313SpearmanRho _,
    "q314_krippendorff_alpha" -> q314KrippendorffAlpha _,
    "q315_js_divergence" -> q315JsDivergence _,
    "q316_rouge_exemplar" -> q316RougeExemplar _,
    "q317_theil_sen" -> q317TheilSen _)
}
