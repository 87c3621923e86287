package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 wave 5 — the crawl-curation / distribution-drift surface a
  * training-data pipeline runs upstream of dedup and mixing: URL
  * canonicalization (the first operator of any web-crawl pipeline),
  * 1-D Wasserstein source drift, Kruskal–Wallis and one-way ANOVA
  * group tests, Cliff's delta effect size, content-defined chunking
  * (storage-level dedup), and closed-form ridge regression folded to
  * sufficient statistics. Determinism contract as [[QueriesStats]] /
  * [[QueriesEval]]: integer/decimal arithmetic end-to-end (ppm/milli
  * fixed-point via cross-multiplied integral division, DECIMAL(38,0)
  * operands), explicit total orders, one DuckDB oracle twin per query.
  */
object QueriesData {
  type Q = (SparkSession, String) => DataFrame

  /** (doc_id, source, toks) token frame — the q330 chunking base; same
    * normalization as QueriesEval.tokenBase but keyed by source (the
    * curation axis) instead of lang.
    */
  private def docBase(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis.normalizeText
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        filter(split(normalizeText(col("text")), " "), t => t =!= "")
          .as("toks"))
  }

  /** URL CANONICALIZATION — the dedup key of every web-crawl corpus
    * (CommonCrawl-style pipelines fold billions of raw URLs to
    * canonical form before any content fetch/dedup): lowercase scheme
    * and host, strip default ports (80/http, 443/https), drop the
    * fragment, drop tracking params (utm_*, fbclid), sort the
    * remaining query params, collapse a trailing slash. Raw URLs are
    * derived deterministically from orders (mixed-case hosts, shuffled
    * param order, redundant ports — the mess a real frontier emits);
    * [[graft.functions.UrlFns.canonicalizeUrl]] is the operator under
    * test, a pure per-row map (no shuffle) followed by ONE keyed
    * aggregate. dup_ppm = URLs collapsed per registered domain.
    */
  def q326UrlCanonicalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UrlFns
    // the LOGICAL url derives from the customer (so many orders share
    // one canonical target); the MESS — scheme/host case, default
    // port, param order, tracking params, fragment — derives from the
    // orderkey, so raw variants of the same logical url abound and the
    // canonicalizer has real work to do. ok%16==0 injects a genuinely
    // distinct :8080 variant that must NOT collapse.
    val raw = Tables.orders(s, dir).select(expr(
      """concat(
        |  CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'HTTPS'
        |       WHEN 1 THEN 'https' ELSE 'Https' END, '://',
        |  CASE CAST(o_custkey % 2 AS INT) WHEN 0 THEN 'WWW.Shop'
        |       ELSE 'www.SHOP' END,
        |  CAST(o_custkey % 40 AS STRING),
        |  CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN '.COM'
        |       ELSE '.com' END,
        |  CASE WHEN o_orderkey % 16 = 0 THEN ':8080'
        |       WHEN o_orderkey % 4 = 1 THEN ':443' ELSE '' END,
        |  '/item/', CAST(o_custkey % 25 AS STRING),
        |  CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END,
        |  CASE CAST(o_orderkey % 3 AS INT)
        |    WHEN 0 THEN concat('?utm_source=news&id=',
        |      CAST(o_custkey % 100 AS STRING), '&ref=',
        |      CAST(o_custkey % 7 AS STRING))
        |    WHEN 1 THEN concat('?ref=', CAST(o_custkey % 7 AS STRING),
        |      '&id=', CAST(o_custkey % 100 AS STRING),
        |      '&utm_campaign=spring')
        |    ELSE concat('?id=', CAST(o_custkey % 100 AS STRING),
        |      '&ref=', CAST(o_custkey % 7 AS STRING)) END,
        |  CASE WHEN o_orderkey % 6 = 0 THEN '#section-2' ELSE '' END
        |)""".stripMargin).as("url"))
    // spread ahead of the interpreted canonicalize chain (single-row-
    // group scan would run it in ONE task), then dedup to the
    // (domain, canon, url) grid in a single keyed shuffle BEFORE any
    // distinct aggregation — the grid is O(distinct URLs), so the
    // distinct counts and min() run on deduped data, never through a
    // fact-scale Expand (measured 20.6 → 1.3 s at sf0.1). url
    // determines canon, so distinct urls per domain = grid rows.
    val grid = Tables.spread(raw)
      .withColumn("canon", UrlFns.canonicalizeUrl(col("url")))
      .withColumn("domain", UrlFns.registeredDomain(col("canon")))
      .groupBy("domain", "canon", "url")
      .agg(count(lit(1)).as("c"))
    grid.groupBy("domain")
      .agg(sum("c").as("n_urls"),
        count(lit(1)).as("n_raw_distinct"),
        countDistinct(col("canon")).as("n_canonical"),
        min(col("canon")).as("first_canon"))
      .select(col("domain"), col("n_urls").cast("bigint").as("n_urls"),
        col("n_raw_distinct").cast("bigint").as("n_raw_distinct"),
        col("n_canonical").cast("bigint").as("n_canonical"),
        expr("""CAST(CAST(n_raw_distinct - n_canonical AS DECIMAL(38,0))
                * 1000000 DIV n_raw_distinct AS BIGINT)""")
          .as("dup_ppm"),
        col("first_canon"))
      .orderBy("domain")
  }

  /** 1-D WASSERSTEIN (earth-mover) SOURCE DRIFT — per-source W1
    * distance between the source's document-length distribution and
    * the whole corpus, the drift metric that (unlike KS, q235) weighs
    * HOW FAR mass moved, not just the largest gap: on B = 20
    * equal-width n_chars bins, W1 = mean over bins of |F_src − F_corp|
    * (bin-width units, exact integers cross-multiplied: |cum_s·N −
    * cum_c·n_s| summed, ×1e6 DIV (n_s·N·B)). The max gap (the KS
    * statistic on the same bins) rides along. Shape: ONE documents
    * pass to a ≤ sources×B grid; cumulatives via bounded triangle
    * joins on the 20-bin grid — no window, no second fact pass.
    */
  def q327WassersteinDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("source"), col("n_chars"))
    val bounds = docs.agg(min("n_chars").as("__mn"), max("n_chars").as("__mx"))
    val binned = docs.crossJoin(broadcast(bounds))
      .select(col("source"),
        least(lit(19), expr(
          "CAST((n_chars - __mn) * 20 DIV (__mx - __mn + 1) AS BIGINT)"))
          .as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("c"))
      .localCheckpoint() // grid ≤ sources×20; consumed 3× below
    val bins = s.range(0, 20).select(col("id").as("i"))
    val srcTot = binned.groupBy("source").agg(sum("c").as("n_s"))
    val corpCum = binned.groupBy("bin").agg(sum("c").as("cc"))
      .join(broadcast(bins), col("bin") <= col("i"))
      .groupBy(col("i")).agg(sum("cc").as("cum_c"))
    val srcCum = srcTot.select(col("source").as("src2"), col("n_s"))
      .crossJoin(broadcast(bins))
      .join(binned, col("src2") === binned("source") &&
        binned("bin") <= col("i"), "left")
      .groupBy(col("src2"), col("i"), col("n_s"))
      .agg(coalesce(sum("c"), lit(0L)).as("cum_s"))
    val n = docs.agg(count(lit(1)).as("nn"))
    srcCum
      .join(broadcast(corpCum), Seq("i"))
      .crossJoin(broadcast(n))
      .groupBy(col("src2").as("source"))
      .agg(max("n_s").as("n_docs"),
        max("nn").as("nt"),
        sum(expr("""abs(CAST(cum_s AS DECIMAL(38,0)) * nn
                    - CAST(cum_c AS DECIMAL(38,0)) * n_s)""")).as("sd"),
        max(expr("""abs(CAST(cum_s AS DECIMAL(38,0)) * nn
                    - CAST(cum_c AS DECIMAL(38,0)) * n_s)""")).as("md"))
      .select(col("source"), col("n_docs").cast("bigint").as("n_docs"),
        expr("""CAST(sd * 1000000 DIV (CAST(n_docs AS DECIMAL(38,0))
                * nt * 20) AS BIGINT)""").as("w1_ppm"),
        expr("""CAST(md * 1000000 DIV (CAST(n_docs AS DECIMAL(38,0))
                * nt) AS BIGINT)""").as("ks_gap_ppm"))
      .orderBy("source")
  }

  /** KRUSKAL–WALLIS H — the k-group rank test (Kruskal & Wallis 1952),
    * the nonparametric ANOVA a pipeline runs when group distributions
    * are non-normal: does line quantity differ across order
    * priorities? Ranks never materialize per row: quantity is a ≤ 50
    * value grid, so midranks come from the grid's cumulative counts
    * (midrank×2 = 2·below + ties + 1, integer), S_j = 2·ranksum_j
    * folds from per-(priority, qty) counts, and H comes off per-group
    * MEAN ranks floored at milli (mr_j = S_j·1000 DIV n_j, so Σ n_j·
    * mr_j² ≈ 1e6·Σ S_j²/n_j stays DIV-quotient-safe at any N — Spark's
    * DIV on decimals returns BIGINT and SILENTLY WRAPS past 2⁶³, so
    * every quotient must be bounded by design, not by luck). Tie
    * correction divides by 1 − Σ(t³−t)/(N³−N), cross-multiplied.
    * Shape: one co-partitioned fact-fact join, one grid; nothing
    * row-scale after the first agg.
    */
  def q328KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val grid = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("bigint").as("q"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("prio"), col("q"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // ≤ priorities × 50 rows; consumed twice
    val qtot = grid.groupBy("q").agg(sum("c").as("t"))
    val below = qtot.select(col("q").as("q1"), col("t"))
      .join(qtot.select(col("q").as("q2"), col("t").as("t2")),
        col("q2") < col("q1"), "left")
      .groupBy(col("q1"), col("t"))
      .agg(coalesce(sum("t2"), lit(0L)).as("below"))
    val perGroup = grid
      .join(broadcast(below), col("q") === col("q1"))
      .groupBy("prio")
      .agg(sum("c").as("n_j"),
        sum(col("c") * (lit(2L) * col("below") + col("t") + lit(1L)))
          .as("s_j"))
    val summary = perGroup
      .agg(sum("n_j").as("n"),
        sum(expr("""CAST(CAST(s_j AS DECIMAL(38,0)) * 1000 DIV n_j
                    AS DECIMAL(38,0))
                  * CAST(CAST(s_j AS DECIMAL(38,0)) * 1000 DIV n_j
                    AS DECIMAL(38,0)) * n_j""")).as("u"))
      .crossJoin(broadcast(qtot.agg(
        sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).as("tt"))))
      .select(
        expr("""CAST(3 * u DIV (CAST(n AS DECIMAL(38,0)) * (n + 1))
                - 3 * (CAST(n AS DECIMAL(38,0)) + 1) * 1000000
                AS BIGINT)""").as("h_ppm"),
        expr("""CAST((3 * u DIV (CAST(n AS DECIMAL(38,0)) * (n + 1))
                - 3 * (CAST(n AS DECIMAL(38,0)) + 1) * 1000000)
                * (CAST(n AS DECIMAL(38,0)) * n * n - n)
                DIV (CAST(n AS DECIMAL(38,0)) * n * n - n - tt)
                AS BIGINT)""").as("h_tie_ppm"))
    perGroup
      .crossJoin(broadcast(summary))
      .select(col("prio"), col("n_j").cast("bigint").as("n_j"),
        expr("CAST(CAST(s_j AS DECIMAL(38,0)) * 1000 DIV (2 * n_j) AS BIGINT)")
          .as("mean_rank_milli"),
        col("h_ppm"), col("h_tie_ppm"))
      .orderBy("prio")
  }

  /** CLIFF'S DELTA — the ordinal effect size (Cliff 1993) a pipeline
    * reports beside any rank test: per supplier nation, how often does
    * a RETURNED line's quantity dominate a kept line's (δ = P(x>y) −
    * P(x<y))? All pair counting happens on the ≤ 50-value quantity
    * grid: gt/lt are grid×grid conditional products inside a nation
    * (≤ 50² rows each), never a row-level pair join. δ in ppm with the
    * standard |δ| magnitude bands (0.147/0.33/0.474, Romano et al.
    * 2006) decided by exact cross-multiplication.
    */
  def q329CliffsDelta(s: SparkSession, dir: String): DataFrame = {
    val grid = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        col("l_quantity").cast("bigint").as("q"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("cr"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
          .as("co"))
      .localCheckpoint() // ≤ nations × 50 rows; self-joined below
    val pairs = grid.select(col("nation"), col("q").as("q1"),
        col("cr"))
      .join(grid.select(col("nation").as("nation2"), col("q").as("q2"),
        col("co")), col("nation") === col("nation2"))
      .groupBy("nation")
      .agg(
        sum(when(col("q1") > col("q2"),
          expr("CAST(cr AS DECIMAL(38,0)) * co")).otherwise(lit(0)))
          .as("gt"),
        sum(when(col("q1") < col("q2"),
          expr("CAST(cr AS DECIMAL(38,0)) * co")).otherwise(lit(0)))
          .as("lt"))
    val tots = grid.groupBy(col("nation").as("nation3"))
      .agg(sum("cr").as("n_r"), sum("co").as("n_o"))
    pairs
      .join(tots, col("nation") === col("nation3"))
      .select(col("nation"), col("n_r").cast("bigint").as("n_returned"),
        col("n_o").cast("bigint").as("n_kept"),
        expr("""CAST((gt - lt) * 1000000
                DIV nullif(CAST(n_r AS DECIMAL(38,0)) * n_o, 0)
                AS BIGINT)""").as("delta_ppm"),
        expr("""CASE
                WHEN abs(gt - lt) * 1000 <
                  CAST(n_r AS DECIMAL(38,0)) * n_o * 147 THEN 'negligible'
                WHEN abs(gt - lt) * 100 <
                  CAST(n_r AS DECIMAL(38,0)) * n_o * 33 THEN 'small'
                WHEN abs(gt - lt) * 1000 <
                  CAST(n_r AS DECIMAL(38,0)) * n_o * 474 THEN 'medium'
                ELSE 'large' END""").as("magnitude"))
      .orderBy("nation")
  }

  /** CONTENT-DEFINED CHUNKING — the storage-dedup primitive (Muthitacharoen
    * et al. 2001, LBFS): chunk boundaries fall where a rolling window
    * hash of the last w = 4 tokens ≡ 0 (mod 16), so identical passages
    * chunk identically REGARDLESS of offset — the property fixed-width
    * chunking (q106) lacks and the reason CDC finds shared content
    * across shifted near-dup documents. Per source: chunks, distinct
    * chunk digests, dedup ppm, mean tokens/chunk. Shape: one token
    * explode (Tables.spread ahead of the per-row md5), a doc-bounded
    * running boundary count (window partitioned BY DOC), one keyed
    * reassembly (per-doc bounded collect_list, the established
    * pattern), one digest aggregate.
    */
  def q330CdcChunks(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.spread(docBase(s, dir))
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(1, size(toks)), i -> struct(
          |  i AS pos, element_at(toks, i) AS tok,
          |  CASE WHEN i >= 4 THEN concat_ws(' ',
          |    element_at(toks, i - 3), element_at(toks, i - 2),
          |    element_at(toks, i - 1), element_at(toks, i)) END AS gram))"""
          .stripMargin)).as("r"))
      .select(col("doc_id"), col("source"),
        col("r.pos").as("pos"), col("r.tok").as("tok"),
        when(col("r.gram").isNotNull,
          conv(substring(md5(col("r.gram")), 1, 8), 16, 10)
            .cast("long") % 16 === 0).otherwise(lit(false)).as("b"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = rows
      .withColumn("chunk",
        coalesce(sum(when(col("b"), 1L).otherwise(0L)).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("source"), col("chunk"))
      .agg(count(lit(1)).as("n_toks"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("digest"))
    chunks.groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("digest")).as("n_distinct"),
        sum("n_toks").as("n_toks"))
      .select(col("source"), col("n_chunks").cast("bigint").as("n_chunks"),
        col("n_distinct").cast("bigint").as("n_distinct"),
        expr("""CAST(CAST(n_chunks - n_distinct AS DECIMAL(38,0)) * 1000000
                DIV n_chunks AS BIGINT)""").as("dedup_ppm"),
        expr("CAST(CAST(n_toks AS DECIMAL(38,0)) * 1000 DIV n_chunks AS BIGINT)")
          .as("mean_toks_milli"))
      .orderBy("source")
  }

  /** RIDGE REGRESSION, CLOSED FORM — the distributed-ML fit pattern
    * that actually scales: the model (price ~ intercept + quantity +
    * discount, λ = 1 on the slope diagonal) never sees rows twice —
    * ONE fact pass folds the sufficient statistics (n, Σx, Σx², Σxy,
    * exact integers), means floor to micro fixed-point (bounded by the
    * DATA RANGE, not row count — the overflow-proof normal-equation
    * form at any N), and the 3×3 system solves by Cramer's rule in
    * DECIMAL(38,0) (entry ~1e12 → det ~1e31 « 1e38). Per market
    * segment; coefficients in micro units.
    */
  def q331RidgeRegression(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("l_quantity").cast("bigint").as("x1"),
        expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("x2"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("y"))
    val mom = facts.groupBy("segment")
      .agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
        sum(expr("x1 * x2")).as("s12"),
        sum(expr("CAST(x1 AS DECIMAL(38,0)) * y")).as("s1y"),
        sum(expr("CAST(x2 AS DECIMAL(38,0)) * y")).as("s2y"))
      // micro means (floored identically in both engines); +λ on the
      // slope diagonal only. a0=1e6 is the exact mean of x0².
      // Spark DIV yields LONG — re-widen every mean to DECIMAL(38,0)
      // so the Cramer products below stay in decimal arithmetic.
      .select(col("segment"), col("n"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * 1000000 DIV n AS DECIMAL(38,0))")
          .as("m1"),
        expr("CAST(CAST(s2 AS DECIMAL(38,0)) * 1000000 DIV n AS DECIMAL(38,0))")
          .as("m2"),
        expr("CAST(CAST(sy AS DECIMAL(38,0)) * 1000000 DIV n AS DECIMAL(38,0))")
          .as("my"),
        expr("""CAST(CAST(s11 AS DECIMAL(38,0)) * 1000000 DIV n
                + 1000000 AS DECIMAL(38,0))""").as("m11"),
        expr("""CAST(CAST(s22 AS DECIMAL(38,0)) * 1000000 DIV n
                + 1000000 AS DECIMAL(38,0))""").as("m22"),
        expr("CAST(CAST(s12 AS DECIMAL(38,0)) * 1000000 DIV n AS DECIMAL(38,0))")
          .as("m12"),
        expr("CAST(CAST(s1y AS DECIMAL(38,0)) * 1000000 DIV n AS DECIMAL(38,0))")
          .as("m1y"),
        expr("CAST(CAST(s2y AS DECIMAL(38,0)) * 1000000 DIV n AS DECIMAL(38,0))")
          .as("m2y"))
    // Cramer on [[1e6, m1, m2], [m1, m11, m12], [m2, m12, m22]] b =
    // [my, m1y, m2y]; determinants expanded literally (all DEC38).
    mom.select(col("segment"), col("n").cast("bigint").as("n"),
        expr("""CAST((my  * (m11 * m22 - m12 * m12)
                    - m1 * (m1y * m22 - m12 * m2y)
                    + m2 * (m1y * m12 - m11 * m2y)) * 1000000
                DIV (1000000 * (m11 * m22 - m12 * m12)
                    - m1 * (m1  * m22 - m12 * m2)
                    + m2 * (m1  * m12 - m11 * m2)) AS BIGINT)""")
          .as("b0_micro_cents"),
        expr("""CAST((1000000 * (m1y * m22 - m12 * m2y)
                    - my * (m1  * m22 - m12 * m2)
                    + m2 * (m1  * m2y - m1y * m2)) * 1000000
                DIV (1000000 * (m11 * m22 - m12 * m12)
                    - m1 * (m1  * m22 - m12 * m2)
                    + m2 * (m1  * m12 - m11 * m2)) AS BIGINT)""")
          .as("b1_micro_cents"),
        expr("""CAST((1000000 * (m11 * m2y - m1y * m12)
                    - m1 * (m1  * m2y - m1y * m2)
                    + my * (m1  * m12 - m11 * m2)) * 1000000
                DIV (1000000 * (m11 * m22 - m12 * m12)
                    - m1 * (m1  * m22 - m12 * m2)
                    + m2 * (m1  * m12 - m11 * m2)) AS BIGINT)""")
          .as("b2_micro_cents"))
      .orderBy("segment")
  }

  /** ONE-WAY ANOVA F — the parametric sibling of q328 (Fisher 1925):
    * does mean line revenue differ across order priorities? SSB/SSW
    * fold from per-group (n_j, Σx, Σx²) in exact integer DOLLARS
    * (floor(extendedprice) — floor of an identical IEEE double is
    * bit-deterministic in both engines); per-group S_j²/n_j terms
    * floor at integer dollars², keeping every DIV quotient ~n·mean²
    * « 2⁶³ at any realistic N (Spark DIV wraps silently past that).
    * F and η² are integral milli/ppm ratios. One co-partitioned
    * fact-fact join, one 5-row grid — the eternal shape of a
    * sufficient-statistic test at any N.
    */
  def q332AnovaF(s: SparkSession, dir: String): DataFrame = {
    val perGroup = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice")).cast("bigint").as("x"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n_j"), sum("x").as("s_j"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("ss_j"))
      .localCheckpoint() // 5 rows; summary + output both read it
    val summary = perGroup
      .agg(count(lit(1)).as("k"), sum("n_j").as("n"),
        sum("s_j").as("st"), sum("ss_j").as("sst"),
        sum(expr("""CAST(CAST(s_j AS DECIMAL(38,0)) * s_j
                    DIV n_j AS DECIMAL(38,0))""")).as("u"))
      .select(col("k"), col("n"),
        (col("u") - expr("CAST(st AS DECIMAL(38,0)) * st DIV n"))
          .as("ssb_u"),
        (col("sst").cast("decimal(38,0)") - col("u"))
          .as("ssw_u"))
      .select(
        (col("k") - 1).cast("bigint").as("df_between"),
        (col("n") - col("k")).cast("bigint").as("df_within"),
        expr("CAST(ssb_u * (n - k) * 1000 DIV (ssw_u * (k - 1)) AS BIGINT)")
          .as("f_milli"),
        expr("CAST(ssb_u * 1000000 DIV (ssb_u + ssw_u) AS BIGINT)")
          .as("eta2_ppm"))
    perGroup
      .crossJoin(broadcast(summary))
      .select(col("prio"), col("n_j").cast("bigint").as("n_j"),
        expr("CAST(CAST(s_j AS DECIMAL(38,0)) * 1000 DIV n_j AS BIGINT)")
          .as("mean_milli_dollars"),
        col("df_between"), col("df_within"), col("f_milli"),
        col("eta2_ppm"))
      .orderBy("prio")
  }

  val queries: Map[String, Q] = Map(
    "q326_url_canonicalize" -> q326UrlCanonicalize _,
    "q327_wasserstein_drift" -> q327WassersteinDrift _,
    "q328_kruskal_wallis" -> q328KruskalWallis _,
    "q329_cliffs_delta" -> q329CliffsDelta _,
    "q330_cdc_chunks" -> q330CdcChunks _,
    "q331_ridge_regression" -> q331RidgeRegression _,
    "q332_anova_f" -> q332AnovaF _)
}
