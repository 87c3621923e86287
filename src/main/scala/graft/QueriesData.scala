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
    // spread ahead of the per-row canonicalize (single-row-group scan
    // would run it in ONE task), then dedup to the
    // (domain, canon, url) grid in a single keyed shuffle BEFORE any
    // distinct aggregation — the grid is O(distinct URLs), so the
    // distinct counts and min() run on deduped data, never through a
    // fact-scale Expand (measured 20.6 → 1.3 s at sf0.1). url
    // determines canon, so distinct urls per domain = grid rows.
    // canon + domain are the one-pass codegen [[UrlCanon]]/[[UrlDomain]]
    // expressions (round 19): the composable UrlFns chain ran an
    // interpreted higher-order filter plus multi-pass regexps per row,
    // which made q326 the bench's box-noise magnifier (3-53 s swings
    // on unchanged code); both fused forms read the RAW url so
    // CollapseProject can't duplicate the canonicalization.
    val grid = Tables.spread(raw)
      .withColumn("canon", graft.functions.UrlCanon.urlCanonical(col("url")))
      .withColumn("domain", graft.functions.UrlCanon.urlDomain(col("url")))
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
    // min/max/count in ONE fold, checkpointed (1 row): the corpus
    // total is read again at the end — without the checkpoint that
    // reuse would re-scan documents a third time
    val bounds = docs.agg(min("n_chars").as("__mn"),
      max("n_chars").as("__mx"), count(lit(1)).as("__nn"))
      .localCheckpoint()
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
    val n = bounds.select(col("__nn").as("nn"))
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
    * 2006) decided by exact cross-multiplication; both δ and the band
    * are NULL when a nation has no returned or no kept lines (the
    * dominance probability is undefined on an empty side).
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
        // degenerate denominator (no returned or no kept lines): δ is
        // undefined (delta_ppm above is NULL via nullif) — without
        // this guard every '<' test is false and the band would read
        // 'large', a misleading label both engines would share
        expr("""CASE
                WHEN CAST(n_r AS DECIMAL(38,0)) * n_o = 0 THEN NULL
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
    // the empty-toks CASE guards a whitespace-only document:
    // sequence(1, 0) is DESCENDING [1, 0] in Spark, so the unguarded
    // transform would hit element_at(toks, 0) and throw (the DuckDB
    // twin's list_transform over [] is naturally empty)
    val rows = Tables.spread(docBase(s, dir))
      .select(col("doc_id"), col("source"), explode(expr(
        """CASE WHEN size(toks) = 0 THEN
          |array() ELSE transform(sequence(1, size(toks)), i -> struct(
          |  i AS pos, element_at(toks, i) AS tok,
          |  CASE WHEN i >= 4 THEN concat_ws(' ',
          |    element_at(toks, i - 3), element_at(toks, i - 2),
          |    element_at(toks, i - 1), element_at(toks, i)) END AS gram))
          |END""".stripMargin)).as("r"))
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

  /** BENJAMINI–HOCHBERG FDR — the multiple-testing control an
    * experiment platform applies before reading m parallel readouts
    * (Benjamini & Hochberg 1995): per customer NATION (m = 25
    * hypotheses), a permutation p-value for "do URGENT/HIGH orders
    * spend differently?" (the q322 machinery: observed label split at
    * b = 0, 32 md5-derived label shuffles at the same 2-of-5
    * proportion, add-one p in ppm), then the BH step-up at q = 10 % —
    * ranks and the cutoff rank computed by TRIANGLE JOINS on the
    * 25-row p-value frame (no window at all), the acceptance test
    * cross-multiplied exactly: p_(i)·m ≤ i·100000. One fact pass
    * fans out the 33 replicate assignments; everything after is
    * hypothesis-dimension-sized.
    */
  def q334BhFdr(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey")
        .as("o_custkey"), col("c_nationkey")), Seq("o_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        Seq("c_nationkey"))
      .select(col("n_name").as("nation"), col("o_orderkey"),
        (col("o_orderpriority") < "3").as("hi"), // '1-URGENT','2-HIGH'
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    // spread before the 33x md5 fan-out: the single-row-group scan
    // would run the whole explode+digest in ONE task (5.1 -> 1.5 s)
    val reps = Tables.spread(fact)
      .withColumn("b", explode(expr("sequence(0, 32)")))
      .withColumn("t", when(col("b") === 0, col("hi"))
        .otherwise(pmod(graft.operators.Scale.md5Prefix32(
          concat(lit("bh:"), col("b").cast("string"), lit(":"),
            col("o_orderkey").cast("string"))), lit(5L)) < 2))
      .groupBy("nation", "b")
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("t"), col("cents")).otherwise(0L)).as("s1"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("n0"),
        sum(when(!col("t"), col("cents")).otherwise(0L)).as("s0"))
      .withColumn("stat", expr(
        """CAST(CAST(s1 AS DECIMAL(38,0)) * 1000000 DIV nullif(n1, 0)
           - CAST(s0 AS DECIMAL(38,0)) * 1000000 DIV nullif(n0, 0)
           AS BIGINT)"""))
      .localCheckpoint() // 33 rows per nation; obs + permutation reads
    val obs = reps.filter(col("b") === 0)
      .select(col("nation"), col("stat").as("obs_stat"),
        col("n1").as("nt"), col("n0").as("nc"))
    val pvals = reps.filter(col("b") > 0)
      .join(obs, Seq("nation"))
      .groupBy("nation")
      .agg(first("obs_stat").as("obs_diff_microcents"),
        first("nt").as("n_treat"), first("nc").as("n_control"),
        expr("""CAST((1 + sum(CASE WHEN abs(stat) >= abs(obs_stat)
                THEN 1 ELSE 0 END)) * 1000000 DIV 33 AS BIGINT)""")
          .as("p_ppm"))
      .localCheckpoint() // 25 rows; three bounded self-joins below
    // rank by (p, nation) via triangle count — no window
    val ranked = pvals.select(col("nation").as("n1x"), col("p_ppm")
        .as("p1"))
      .join(pvals.select(col("nation").as("n2x"), col("p_ppm").as("p2")),
        col("p2") < col("p1") ||
          (col("p2") === col("p1") && col("n2x") <= col("n1x")))
      .groupBy(col("n1x").as("nation")).agg(count(lit(1)).as("p_rank"))
    // BH cutoff: the LARGEST rank i with p_(i)·m ≤ i·100000, m COUNTED
    // from the hypothesis frame (a nation absent from the facts must
    // shrink m, not leave a phantom hypothesis in the threshold)
    val mF = pvals.agg(count(lit(1)).as("m"))
    val cutoff = ranked.join(pvals, Seq("nation"))
      .crossJoin(broadcast(mF))
      .agg(max("m").as("m"),
        coalesce(max(when(
          col("p_ppm") * col("m") <= col("p_rank") * 100000L,
          col("p_rank"))), lit(0L)).as("cut_rank"))
    pvals.join(ranked, Seq("nation"))
      .crossJoin(broadcast(cutoff))
      .select(col("nation"),
        col("n_treat").cast("bigint").as("n_treat"),
        col("n_control").cast("bigint").as("n_control"),
        col("obs_diff_microcents").cast("bigint")
          .as("obs_diff_microcents"),
        col("p_ppm"), col("p_rank").cast("bigint").as("p_rank"),
        expr("CAST(p_rank * 100000 DIV m AS BIGINT)")
          .as("bh_threshold_ppm"),
        (col("p_rank") <= col("cut_rank")).as("rejected"))
      .orderBy("nation")
  }

  /** ZONE-MAP PRUNING ADVISOR — the physical-design question behind
    * every 100 TB table: which sort/cluster layout lets the most
    * zone-map (min/max) pruning happen for the actual workload? Three
    * candidate layouts (range-clustered by ship day, orderkey,
    * partkey; 64 equal-width zones each) are simulated in ONE fact
    * pass (a 3-way explode → (layout, zone) min/max of both workload
    * columns), then a 16-predicate ship-window family and a
    * 16-predicate partkey-range family (both derived from the
    * broadcast bounds, no literals to go stale) test zone overlap:
    * scanned = Σ zones whose [min,max] intersects the predicate.
    * Output: scan_fraction_ppm per (layout × family) — the advisor's
    * ranking. Everything after the first agg is 192 zone rows × 32
    * predicates.
    */
  def q335ZonemapAdvisor(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(datediff(to_date(col("l_shipdate")),
        lit("1992-01-01").cast("date")).cast("bigint").as("sd"),
        col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val bounds = li.agg(
      min("sd").as("sd_mn"), max("sd").as("sd_mx"),
      min("ok").as("ok_mn"), max("ok").as("ok_mx"),
      min("pk").as("pk_mn"), max("pk").as("pk_mx"))
    val zones = li.crossJoin(broadcast(bounds))
      .select(col("sd"), col("pk"), explode(array(
        struct(lit("by_shipday").as("layout"),
          expr("least(63, CAST((sd - sd_mn) * 64 DIV (sd_mx - sd_mn + 1) AS BIGINT))")
            .as("z")),
        struct(lit("by_orderkey").as("layout"),
          expr("least(63, CAST((ok - ok_mn) * 64 DIV (ok_mx - ok_mn + 1) AS BIGINT))")
            .as("z")),
        struct(lit("by_partkey").as("layout"),
          expr("least(63, CAST((pk - pk_mn) * 64 DIV (pk_mx - pk_mn + 1) AS BIGINT))")
            .as("z")))).as("lz"))
      .select(col("lz.layout").as("layout"), col("lz.z").as("z"),
        col("sd"), col("pk"))
      .groupBy("layout", "z")
      .agg(min("sd").as("sd_lo"), max("sd").as("sd_hi"),
        min("pk").as("pk_lo"), max("pk").as("pk_hi"))
      .localCheckpoint() // ≤192 rows; joined against both families
    val preds = s.range(0, 16).crossJoin(broadcast(bounds))
      .select(explode(array(
        struct(lit("ship_windows").as("family"),
          expr("sd_mn + (sd_mx - sd_mn + 1) * id DIV 32").as("lo"),
          expr("sd_mn + (sd_mx - sd_mn + 1) * (id + 2) DIV 32 - 1")
            .as("hi")),
        struct(lit("partkey_ranges").as("family"),
          expr("pk_mn + (pk_mx - pk_mn + 1) * id DIV 32").as("lo"),
          expr("pk_mn + (pk_mx - pk_mn + 1) * (id + 2) DIV 32 - 1")
            .as("hi")))).as("p"))
      .select(col("p.family").as("family"), col("p.lo").as("lo"),
        col("p.hi").as("hi"))
    val overlap = zones.crossJoin(broadcast(preds))
      .withColumn("scan", when(col("family") === "ship_windows",
        col("sd_lo") <= col("hi") && col("sd_hi") >= col("lo"))
        .otherwise(col("pk_lo") <= col("hi") && col("pk_hi") >= col("lo")))
    val nz = zones.groupBy("layout").agg(count(lit(1)).as("n_zones"))
    overlap.groupBy("layout", "family")
      .agg(sum(when(col("scan"), 1L).otherwise(0L)).as("zones_scanned"))
      .join(broadcast(nz), Seq("layout"))
      .select(col("layout"), col("family"),
        col("n_zones").cast("bigint").as("n_zones"),
        col("zones_scanned").cast("bigint").as("zones_scanned"),
        expr("""CAST(CAST(zones_scanned AS DECIMAL(38,0)) * 1000000
                DIV (n_zones * 16) AS BIGINT)""").as("scan_ppm"))
      .orderBy("layout", "family")
  }

  /** MATRYOSHKA TRUNCATION EVAL — the modern embedding-cost question
    * (Kusupati et al. 2022): how much ANN recall survives truncating
    * vectors to a prefix (the cheap first-stage at 100 TB)? For d ∈
    * {8, 16, 32}, exact cosine top-10 on the d-prefix (the gated
    * [[graft.operators.Similarity.topK]] machinery on sliced columns)
    * is compared to the full-64-dim top-10: per-dim recall@10 and
    * top-1 agreement, exact integers. Ranks are deterministic by the
    * established (rounded cos desc, id) total order.
    */
  def q336MatryoshkaEval(s: SparkSession, dir: String): DataFrame =
    matryoshkaEval(s, dir, Long.MaxValue)

  /** Probe entry (the q307/q308 capped convention): `cap` pins the
    * serving query batch to copy-0 ids so an N× replica measures
    * corpus growth at a CONSTANT query set. */
  private[graft] def matryoshkaEvalCapped(
      s: SparkSession, dir: String, cap: Long): DataFrame =
    matryoshkaEval(s, dir, cap)

  private def matryoshkaEval(
      s: SparkSession, dir: String, cap: Long): DataFrame = {
    import graft.operators.Similarity
    def at(d: Int): DataFrame = {
      val v = Tables.embeddings(s, dir).select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), 1, d)
          .as("embedding"))
      Similarity.topK(v, v.filter(pmod(col("vec_id"), lit(50)) === 0 &&
          col("vec_id") < cap),
        "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }
    val full = at(64).localCheckpoint() // compared against every d
    val truncated = Seq(8, 16, 32).map { d =>
      at(d).withColumn("d", lit(d))
    }.reduce(_.unionByName(_))
    val hits = truncated
      .join(full.select(col("query_id"),
        col("neighbor_id"), lit(1L).as("in_full")),
        Seq("query_id", "neighbor_id"), "left")
    val top1 = truncated.filter(col("rank") === 1)
      .join(full.filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("full_top1")),
        Seq("query_id"))
      .groupBy("d")
      .agg(sum(when(col("neighbor_id") === col("full_top1"), 1L)
        .otherwise(0L)).as("top1_matches"))
    hits.groupBy("d")
      .agg(countDistinct("query_id").as("n_queries"),
        sum(coalesce(col("in_full"), lit(0L))).as("overlap"))
      .join(top1, Seq("d"))
      .select(col("d").cast("bigint").as("dim"),
        col("n_queries").cast("bigint").as("n_queries"),
        col("overlap").cast("bigint").as("overlap_at_10"),
        expr("""CAST(CAST(overlap AS DECIMAL(38,0)) * 1000000
                DIV (n_queries * 10) AS BIGINT)""").as("recall_ppm"),
        col("top1_matches").cast("bigint").as("top1_matches"))
      .orderBy("dim")
  }

  /** PINBALL (QUANTILE) LOSS BACKTEST — the eval a probabilistic
    * forecaster ships beside q282's WAPE: the seasonal-naive forecast
    * scored at τ = 10/50/90 % with the pinball loss, all integer
    * cross-multiplied (100·loss = max(τ·d, (τ−100)·d), d in cents) —
    * under-forecasting hurts τ=90 most, over-forecasting hurts τ=10,
    * and the three totals expose the forecast's bias direction. Same
    * one-checkpoint weekly frame + date-arithmetic lag join as q282;
    * the τ grid is a 3-row broadcast.
    */
  def q337PinballEval(s: SparkSession, dir: String): DataFrame = {
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
    val taus = s.range(0, 3).select(
      (col("id") * 40 + 10).cast("bigint").as("tau_pct"))
    weekly
      .join(weekly.select(col("nation"),
          date_add(col("wk"), 364).as("wk"), col("rev").as("rev52")),
        Seq("nation", "wk"))
      .crossJoin(broadcast(taus))
      .groupBy("nation", "tau_pct")
      .agg(count(lit(1)).as("n_weeks"),
        sum(greatest(
          col("tau_pct") * (col("rev") - col("rev52")),
          (col("tau_pct") - 100) * (col("rev") - col("rev52"))))
          .as("pinball_x100_cents"))
      .select(col("nation"), col("tau_pct"),
        col("n_weeks").cast("bigint").as("n_weeks"),
        col("pinball_x100_cents").cast("bigint")
          .as("pinball_x100_cents"),
        expr("""CAST(CAST(pinball_x100_cents AS DECIMAL(38,0))
                DIV (n_weeks * 100) AS BIGINT)""")
          .as("mean_pinball_cents"))
      .orderBy("nation", "tau_pct")
  }

  /** RECOMMENDATION DIVERSITY — the beyond-accuracy eval (Ziegler et
    * al. 2005) for q279's item-cosine top-3: per seed-part brand,
    * intra-list diversity (mean over within-list pairs of 1e12 −
    * cosine_e12, a never-co-bought pair counting as fully diverse)
    * and catalog coverage (distinct recommended items over the whole
    * part catalog). Shape: the q279 scored frame built once and
    * checkpointed (recommendations AND pair-diversity lookups read
    * it); list pairs are ≤ C(3,2) per part; everything aggregates to
    * the brand grid.
    */
  def q338RecDiversity(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // item counts AND the pair self-join
    val n = bi.groupBy("p").agg(count(lit(1)).as("n_p"))
      .localCheckpoint() // part-dimension sized; broadcast twice below
    // ONE-PASS A/B (round 20, VERDICT r19 item 9 re-test): checkpoint
    // the SYMMETRIC scored frame once; both consumers (the top-3
    // window and the within-list pair lookup, which is its pa < pb
    // half) read the checkpoint
    // co is NOT separately checkpointed: the symmetric union's two
    // branches root in the IDENTICAL pair-count exchange, which
    // ReuseExchange dedupes inside `scored`'s one plan — a separate co
    // checkpoint was A/B'd at 2.86 s vs 2.58 s (it only adds a job)
    val co = bi.select(col("o"), col("p").as("pa"))
      .join(bi.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("co"))
    def scoreOf(df: DataFrame): DataFrame = df
      .join(broadcast(n.select(col("p").as("pa"), col("n_p").as("na"))),
        Seq("pa"))
      .join(broadcast(n.select(col("p").as("pb"), col("n_p").as("nb"))),
        Seq("pb"))
      .withColumn("score_e12",
        expr("""CAST((CAST(co AS DECIMAL(38,0)) * co * 1000000000000)
                DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""))
      .select("pa", "pb", "score_e12")
    val scored = scoreOf(co.unionByName(
      co.select(col("pb").as("pa"), col("pa").as("pb"), col("co"))))
      .localCheckpoint()
    val win = Window.partitionBy("pa")
      .orderBy(col("score_e12").desc, col("pb"))
    val recs = scored.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= 3)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey").as("pa"), col("p_brand"))), Seq("pa"))
      .localCheckpoint() // coverage aggregate AND the pair build
    // the within-list pairs are oriented nb1 < nb2, so the ASYMMETRIC
    // co frame already carries their scores — no symmetric pass needed
    val pairs = recs.select(col("p_brand"), col("pa"),
        col("pb").as("b1"), col("rnk").as("r1"))
      .join(recs.select(col("pa"), col("pb").as("b2"),
        col("rnk").as("r2")), Seq("pa"))
      .filter(col("r1") < col("r2"))
      .select(col("p_brand"),
        least(col("b1"), col("b2")).as("nb1"),
        greatest(col("b1"), col("b2")).as("nb2"))
      .join(scored.filter(col("pa") < col("pb"))
        .select(col("pa").as("nb1"), col("pb").as("nb2"),
          col("score_e12").as("pair_score")), Seq("nb1", "nb2"), "left")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_pairs"),
        sum(lit(1000000000000L) - coalesce(col("pair_score"), lit(0L)))
          .as("div_sum"))
    val catalog = Tables.part(s, dir).agg(count(lit(1)).as("n_cat"))
    recs.groupBy("p_brand")
      .agg(countDistinct(col("pa")).as("n_parts"),
        countDistinct(col("pb")).as("distinct_neighbors"))
      .join(pairs, Seq("p_brand"))
      .crossJoin(broadcast(catalog))
      .select(col("p_brand"),
        col("n_parts").cast("bigint").as("n_parts"),
        col("n_pairs").cast("bigint").as("n_pairs"),
        expr("CAST(CAST(div_sum AS DECIMAL(38,0)) DIV n_pairs AS BIGINT)")
          .as("ild_mean_e12"),
        col("distinct_neighbors").cast("bigint")
          .as("distinct_neighbors"),
        expr("""CAST(CAST(distinct_neighbors AS DECIMAL(38,0)) * 1000000
                DIV n_cat AS BIGINT)""").as("coverage_ppm"))
      .orderBy("p_brand")
  }

  /** EFFECTIVE SAMPLE SIZE — the importance-reweighting health check
    * (Kong 1992): when each source's documents are reweighted so every
    * LANGUAGE contributes equally (w ∝ 1/n_lang, the mixture-balancing
    * weights against the corpus's genuinely skewed language mix), ESS
    * = (Σw)²/Σw² says how many docs the reweighted source is really
    * worth — a source that over-samples the dominant language
    * collapses ESS long before anyone looks at a histogram. Weights
    * are floored ppt (1e12 DIV n_lang, identical in both engines —
    * see the overflow-budget note inline); ESS
    * folds from the source×lang grid in exact DECIMAL with every DIV
    * quotient bounded by n·1000. The dominant language share rides
    * along.
    */
  def q339EssDiagnostics(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("lang"), col("source"))
    // ppt (1e12) weight floor, not ppm: a 1e6 numerator floors to 0
    // once a language passes 1e6 docs, silently zeroing its mass and
    // eventually dividing by zero — 1e12 holds to a trillion docs per
    // language (every DIV quotient stays < L·1e12 « 2⁶³; the decimal
    // products top out ~L²·1e30 « 1e38)
    val w = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
      .withColumn("w", expr("CAST(1000000000000 DIV n_l AS BIGINT)"))
    docs.join(broadcast(w), Seq("lang"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("k"), max("w").as("ws"))
      .groupBy("source")
      .agg(sum("k").as("n_docs"),
        sum(expr("CAST(k AS DECIMAL(38,0)) * ws")).as("sw"),
        sum(expr("CAST(k AS DECIMAL(38,0)) * ws * ws")).as("sww"),
        max("k").as("max_k"),
        count(lit(1)).as("n_langs"))
      .select(col("source"), col("n_docs").cast("bigint").as("n_docs"),
        col("n_langs").cast("bigint").as("n_langs"),
        expr("CAST(sw * sw * 1000 DIV sww AS BIGINT)").as("ess_milli"),
        expr("CAST(sw * sw * 1000000 DIV (sww * n_docs) AS BIGINT)")
          .as("ess_ratio_ppm"),
        expr("""CAST(CAST(max_k AS DECIMAL(38,0)) * 1000000
                DIV n_docs AS BIGINT)""").as("dom_lang_ppm"))
      .orderBy("source")
  }

  /** Shared with the q340 oracle generator: the truss peel is
    * unrolled this many times there, so Spark must converge within
    * the same bound (measured: 3 rounds at sf0.01). */
  val trussMaxRounds = 12

  /** K-TRUSS (k = 4) of the q256 proximity graph — the EDGE-level
    * cohesion peel (Cohen 2008) completing the graph family's
    * node-level k-core (q257): repeatedly drop every edge lying in
    * fewer than k−2 = 2 triangles among the surviving edges. Each
    * round is one bounded triangle enumeration — edges ⋈ adjacency on
    * one endpoint, semi-joined back on the canonical closing edge —
    * over the constant-density grid graph (expected degree ≈ π at ANY
    * scale, so per-round cost stays O(|E|), never O(|E|·maxdeg)).
    * Converges ≤ [[trussMaxRounds]] rounds or fails loudly; the
    * DuckDB twin unrolls the same bound, so the engines can never
    * silently disagree on a non-converged state. Output: surviving
    * edges with their final in-truss support.
    */
  def q340KTruss(s: SparkSession, dir: String): DataFrame =
    kTrussPeel(QueriesCore.q256GridRadiusJoin(s, dir)
      .select(col("id_a"), col("id_b")))

  /** Core of q340, parametrized on the edge set for the scale probe
    * (the kCorePeel convention).
    *
    * Skew guard: each peel round enumerates triangles via an
    * edges ⋈ adjacency join whose cost is O(Σ deg²) — linear on the
    * constant-degree proximity grid this targets (deg ≈ π at any
    * scale), but quadratic-in-the-hub on a power-law graph, where it
    * would OOM an executor long after the plan looked fine. Rather
    * than fail deep inside round 1, we pre-compute the input's max
    * degree (one O(|E|) aggregate, amortized over ≥1 rounds of the
    * same cost) and refuse loudly when it exceeds `maxDegreeCap`:
    * callers with a genuine hub-heavy graph need a different
    * algorithm (hub-splitting / degree-ordered iteration), not this
    * peel. Degrees only shrink as edges peel, so the input check
    * bounds every round.
    */
  private[graft] def kTrussPeel(edgesIn: DataFrame,
      maxDegreeCap: Long = 1024L): DataFrame = {
    var e = edgesIn
      .select(col("id_a").as("ia"), col("id_b").as("ib"))
      .localCheckpoint()
    val maxDeg = e.select(col("ia").as("id"))
      .unionByName(e.select(col("ib").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .agg(max("deg")).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
    require(maxDeg <= maxDegreeCap,
      s"kTrussPeel: max degree $maxDeg exceeds cap $maxDegreeCap — " +
        "the per-round triangle join is O(sum deg^2) and unsafe on " +
        "hub-heavy graphs; split hubs or raise the cap deliberately")
    var sup: DataFrame = null
    var stable = false
    var round = 0
    // edge count carried across rounds (round 19): e is always the
    // previous round's survivor set, so e.count() re-counted what the
    // last sup.count() already knew — and the projection e needs no
    // second checkpoint, it is a narrow select over the checkpointed
    // sup (2 actions/round instead of 4)
    var eCount = e.count()
    while (round < trussMaxRounds && !stable) {
      val adj = e.select(col("ia").as("id"), col("ib").as("nb"))
        .unionByName(e.select(col("ib").as("id"), col("ia").as("nb")))
      sup = e.join(adj, col("ia") === col("id"))
        .filter(col("nb") =!= col("ib"))
        .join(e.select(col("ia").as("fa"), col("ib").as("fb")),
          least(col("ib"), col("nb")) === col("fa") &&
            greatest(col("ib"), col("nb")) === col("fb"))
        .groupBy(col("ia"), col("ib"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .localCheckpoint()
      val supCount = sup.count()
      stable = supCount == eCount
      eCount = supCount
      e = sup.select(col("ia"), col("ib"))
      round += 1
    }
    require(stable, s"k-truss did not converge in $trussMaxRounds rounds")
    sup.select(col("ia").cast("bigint").as("id_a"),
        col("ib").cast("bigint").as("id_b"),
        col("support").cast("bigint").as("support"))
      .orderBy("id_a", "id_b")
  }

  /** ORC ROUND-TRIP — the second columnar format a 100 TB lakehouse
    * actually runs (Spark ships the ORC source in-box): a lineitem
    * projection is written to ORC (4 files), read back THROUGH the ORC
    * scan with a pushed predicate (l_quantity ≥ 25 reaches the reader
    * as a PushedFilter — spec-asserted), and aggregated; the oracle
    * computes the same aggregate from the PARQUET source, so a
    * round-trip fidelity bug (type mapping, predicate semantics,
    * writer truncation) is a hash mismatch. Temp tree deleted in a
    * finally; the result is materialized first.
    */
  def q341OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("q341-orc").toString
    try {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
        .repartition(4)
        .write.mode("overwrite").orc(s"$root/li")
      s.read.orc(s"$root/li")
        .filter(col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("sum_cents"))
        .orderBy("l_returnflag")
        .localCheckpoint(true) // materialize before the finally deletes
    } finally TmpTrees.delete(root)
  }

  /** CSV ROUND-TRIP — q341's shape for the row-oriented interchange
    * format: the same lineitem projection is written as 4 CSV files
    * (header on), read back through the CSV scan with an EXPLICIT
    * schema (no inference pass — at 100 TB an inference scan doubles
    * the read) and a pushed predicate, and aggregated; the oracle
    * computes the same aggregate from the parquet source, so quoting,
    * numeric formatting, or header bugs hash-fail. Completes the
    * in-box format-fidelity family with q341 (ORC) / q344 (JSON).
    */
  def q343CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("q343-csv").toString
    try {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
        .repartition(4)
        .write.mode("overwrite").option("header", "true").csv(s"$root/li")
      s.read
        .schema("l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE," +
          " l_extendedprice DOUBLE, l_returnflag STRING")
        .option("header", "true").csv(s"$root/li")
        .filter(col("l_quantity") <= 20)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("sum_cents"))
        .orderBy("l_returnflag")
        .localCheckpoint(true)
    } finally TmpTrees.delete(root)
  }

  /** JSON-LINES ROUND-TRIP — q341's shape for the log-interchange
    * format every ingest pipeline still meets: 4 JSON-lines files
    * written, read back with an explicit schema and a pushed
    * predicate, aggregated against the parquet-derived oracle.
    */
  def q344JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("q344-json").toString
    try {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
        .repartition(4)
        .write.mode("overwrite").json(s"$root/li")
      s.read
        .schema("l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE," +
          " l_extendedprice DOUBLE, l_returnflag STRING")
        .json(s"$root/li")
        .filter(col("l_extendedprice") >= 50000.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("sum_cents"))
        .orderBy("l_returnflag")
        .localCheckpoint(true)
    } finally TmpTrees.delete(root)
  }

  val queries: Map[String, Q] = Map(
    "q343_csv_roundtrip" -> q343CsvRoundtrip _,
    "q344_json_roundtrip" -> q344JsonRoundtrip _,
    "q326_url_canonicalize" -> q326UrlCanonicalize _,
    "q327_wasserstein_drift" -> q327WassersteinDrift _,
    "q328_kruskal_wallis" -> q328KruskalWallis _,
    "q329_cliffs_delta" -> q329CliffsDelta _,
    "q330_cdc_chunks" -> q330CdcChunks _,
    "q331_ridge_regression" -> q331RidgeRegression _,
    "q332_anova_f" -> q332AnovaF _,
    "q334_bh_fdr" -> q334BhFdr _,
    "q335_zonemap_advisor" -> q335ZonemapAdvisor _,
    "q336_matryoshka_eval" -> q336MatryoshkaEval _,
    "q337_pinball_eval" -> q337PinballEval _,
    "q338_rec_diversity" -> q338RecDiversity _,
    "q339_ess_diagnostics" -> q339EssDiagnostics _,
    "q340_ktruss" -> q340KTruss _,
    "q341_orc_roundtrip" -> q341OrcRoundtrip _)
}
