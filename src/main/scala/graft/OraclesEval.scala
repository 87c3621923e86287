package graft

/** DuckDB oracle twins for [[QueriesEval]] — the same exact integer
  * arithmetic restated from first principles (HUGEINT where the Spark
  * side carries DECIMAL(38,0), `//` for integral division — both
  * engines truncate toward zero), every ranking given the same
  * explicit total order.
  */
object OraclesEval {

  /** Shared tokenization CTE (q316/q318/q319/q320/q321) — the DuckDB
    * twin of [[QueriesEval.tokenBase]]. */
  private val baseCte =
    """base AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(
      |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |      x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  /** Word n-gram rows off `base` — list_zip windows (empty below n
    * tokens), the twin of [[QueriesEval.gramRows]]. */
  private def gramCte(n: Int): String =
    if (n == 1) "SELECT doc_id, lang, 1 AS n, unnest(toks) AS gram FROM base"
    else {
      // every slice exactly len−n+1 elements — list_zip pads unequal
      // lists with NULLs, which would fabricate NULL grams
      val lists = (0 until n).map(k =>
        s"toks[${k + 1}:len(toks) - ${n - 1 - k}]").mkString(", ")
      val parts = (1 to n).map(k => s"x[$k]").mkString(" || ' ' || ")
      s"""SELECT doc_id, lang, $n AS n,
         |    unnest(list_transform(list_zip($lists),
         |      x -> $parts)) AS gram
         |  FROM base WHERE len(toks) >= $n""".stripMargin
    }

  val oracles: Map[String, String] = Map(
    // q309: the per-item rater-pair counts, category vote totals, and
    // the 18N² common-denominator kappa restated.
    "q309_fleiss_kappa" ->
      """WITH g AS MATERIALIZED (
        |  SELECT l_orderkey, count(*) AS nl,
        |    sum(CASE WHEN l_linenumber <= 3 AND l_returnflag = 'R'
        |        THEN 1 ELSE 0 END) AS nr,
        |    sum(CASE WHEN l_linenumber <= 3 AND l_returnflag = 'N'
        |        THEN 1 ELSE 0 END) AS nn,
        |    sum(CASE WHEN l_linenumber <= 3 AND l_returnflag = 'A'
        |        THEN 1 ELSE 0 END) AS na
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT o_orderpriority, count(*) AS n,
        |    sum(nr*(nr-1) + nn*(nn-1) + na*(na-1)) AS sp,
        |    sum(nr) AS sr, sum(nn) AS sn, sum(na) AS sa
        |  FROM g JOIN orders ON o_orderkey = l_orderkey WHERE nl >= 3
        |  GROUP BY 1)
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS n_items,
        |  CAST(sp::HUGEINT * 1000000 // (6 * n) AS BIGINT) AS po_ppm,
        |  CAST((sr::HUGEINT*sr + sn::HUGEINT*sn + sa::HUGEINT*sa)
        |    * 1000000 // (9::HUGEINT * n * n) AS BIGINT) AS pe_ppm,
        |  CAST((3::HUGEINT * n * sp
        |      - 2 * (sr::HUGEINT*sr + sn::HUGEINT*sn + sa::HUGEINT*sa))
        |    * 1000000
        |    // nullif(18::HUGEINT * n * n
        |      - 2 * (sr::HUGEINT*sr + sn::HUGEINT*sn + sa::HUGEINT*sa),
        |      0) AS BIGINT) AS kappa_ppm
        |FROM t ORDER BY 1""".stripMargin,

    // q310: the same per-customer rank windows and per-term floored
    // precision sum, then the segment rollup with eligibility split.
    "q310_map" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS rel,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |        AS BIGINT) DESC, o_orderkey) AS k,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY o_custkey
        |        ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT) DESC, o_orderkey
        |        ROWS UNBOUNDED PRECEDING) AS cumrel
        |  FROM orders),
        |per AS (SELECT o_custkey, sum(rel) AS p,
        |    sum(CASE WHEN rel = 1
        |        THEN cumrel::HUGEINT * 1000000 // k END) AS sterm
        |  FROM r GROUP BY 1),
        |ap AS (SELECT o_custkey, p,
        |    CASE WHEN p > 0 THEN sterm // p END AS ap_ppm FROM per)
        |SELECT c_mktsegment,
        |  CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ranked,
        |  CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_relevant,
        |  CAST(sum(ap_ppm)
        |    // nullif(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS mean_ap_ppm
        |FROM ap JOIN customer ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q311: the quantity×label grid, fixed threshold frame, and the
    // integral ppm ratios restated.
    "q311_confusion_sweep" ->
      """WITH g AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS neg
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(pos) AS p, sum(neg) AS n FROM g),
        |th AS (SELECT unnest([5,10,15,20,25,30,35,40,45]) AS t),
        |c AS (SELECT t,
        |    sum(CASE WHEN q > t THEN pos ELSE 0 END) AS tp,
        |    sum(CASE WHEN q > t THEN neg ELSE 0 END) AS fp
        |  FROM th CROSS JOIN g GROUP BY 1)
        |SELECT CAST(t AS BIGINT) AS threshold,
        |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(p - tp AS BIGINT) AS fn, CAST(n - fp AS BIGINT) AS tn,
        |  CAST(tp::HUGEINT * 1000000 // nullif(tp + fp, 0) AS BIGINT)
        |    AS precision_ppm,
        |  CAST(tp::HUGEINT * 1000000 // p AS BIGINT) AS recall_ppm,
        |  CAST(2::HUGEINT * tp * 1000000
        |    // nullif(2 * tp + fp + (p - tp), 0) AS BIGINT) AS f1_ppm,
        |  CAST((tp::HUGEINT + (n - fp)) * 1000000 // (p + n) AS BIGINT)
        |    AS accuracy_ppm,
        |  CAST(tp::HUGEINT * 1000000 // p
        |    + (n - fp)::HUGEINT * 1000000 // n - 1000000 AS BIGINT)
        |    AS youden_ppm
        |FROM c CROSS JOIN tot ORDER BY threshold""".stripMargin,

    // q312: the (status × forecast) grid, floored bin means, and the
    // three Murphy components restated with HUGEINT operands.
    "q312_brier_decomposition" ->
      """WITH g AS MATERIALIZED (
        |  SELECT l_linestatus AS ls,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 100000 AS f,
        |    count(*) AS nk,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ok
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT ls, sum(nk) AS n, sum(ok) AS obig FROM g
        |      GROUP BY 1),
        |b AS (SELECT g.ls, t.n, t.obig,
        |    obig::HUGEINT * 1000000 // n AS obar,
        |    ok::HUGEINT * 1000000 // nk AS obk,
        |    g.f, g.nk, g.ok
        |  FROM g JOIN t ON t.ls = g.ls)
        |SELECT ls AS l_linestatus, CAST(min(n) AS BIGINT) AS n,
        |  CAST(min(obar) AS BIGINT) AS mean_outcome_ppm,
        |  CAST(sum(ok::HUGEINT * (1000000 - f) * (1000000 - f)
        |      + (nk - ok)::HUGEINT * f * f)
        |    // (min(n)::HUGEINT * 1000000) AS BIGINT) AS brier_ppm,
        |  CAST(sum(nk::HUGEINT * (f - obk) * (f - obk))
        |    // (min(n)::HUGEINT * 1000000) AS BIGINT) AS reliability_ppm,
        |  CAST(sum(nk::HUGEINT * (obk - obar) * (obk - obar))
        |    // (min(n)::HUGEINT * 1000000) AS BIGINT) AS resolution_ppm,
        |  CAST(min(obig)::HUGEINT * (min(n) - min(obig)) * 1000000
        |    // (min(n)::HUGEINT * min(n)) AS BIGINT) AS uncertainty_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // q313: the (flag × qty × pct) cell grid, both ×2-midrank ladders,
    // and the pre-floored d² rho restated.
    "q313_spearman_rho" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS d,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2, 3),
        |lq AS (SELECT rf, q,
        |    2 * (sum(sum(cnt)) OVER (PARTITION BY rf ORDER BY q
        |      ROWS UNBOUNDED PRECEDING) - sum(cnt)) + sum(cnt) + 1
        |      AS r2q
        |  FROM cells GROUP BY 1, 2),
        |ld AS (SELECT rf, d,
        |    2 * (sum(sum(cnt)) OVER (PARTITION BY rf ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) - sum(cnt)) + sum(cnt) + 1
        |      AS r2d
        |  FROM cells GROUP BY 1, 2),
        |s AS (SELECT c.rf, sum(c.cnt) AS n,
        |    count(DISTINCT c.q) AS nq, count(DISTINCT c.d) AS nd,
        |    sum(c.cnt::HUGEINT * (r2q - r2d) * (r2q - r2d)) AS s4
        |  FROM cells c
        |  JOIN lq ON lq.rf = c.rf AND lq.q = c.q
        |  JOIN ld ON ld.rf = c.rf AND ld.d = c.d
        |  GROUP BY 1)
        |SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(nq AS BIGINT) AS n_qty_values,
        |  CAST(nd AS BIGINT) AS n_disc_values,
        |  CAST(1000000 - (6::HUGEINT * (s4 // n) * 1000000)
        |    // nullif(4::HUGEINT * (n::HUGEINT * n - 1), 0) AS BIGINT)
        |    AS rho_ppm
        |FROM s ORDER BY 1""".stripMargin,

    // q314: per-item disagreement with the lcm(1..20) denominator
    // clearing, the >21-line exclusion, and the pre-floored alpha
    // restated.
    "q314_krippendorff_alpha" ->
      """WITH g AS MATERIALIZED (
        |  SELECT l_orderkey, count(*) AS m,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nr,
        |    sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS nn,
        |    sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS na
        |  FROM lineitem GROUP BY 1 HAVING count(*) >= 2),
        |t AS (SELECT o_orderpriority,
        |    sum(CASE WHEN m <= 21 THEN 1 ELSE 0 END) AS n_items,
        |    sum(CASE WHEN m > 21 THEN 1 ELSE 0 END) AS n_wide,
        |    sum(CASE WHEN m <= 21 THEN m ELSE 0 END) AS n,
        |    sum(CASE WHEN m <= 21 THEN (232792560 // (m - 1))::HUGEINT
        |        * (nr*(m-nr) + nn*(m-nn) + na*(m-na)) ELSE 0 END) AS sd,
        |    sum(CASE WHEN m <= 21 THEN nr ELSE 0 END) AS sr,
        |    sum(CASE WHEN m <= 21 THEN nn ELSE 0 END) AS sn,
        |    sum(CASE WHEN m <= 21 THEN na ELSE 0 END) AS sa
        |  FROM g JOIN orders ON o_orderkey = l_orderkey GROUP BY 1),
        |e AS (SELECT *, sr::HUGEINT * (n - sr) + sn::HUGEINT * (n - sn)
        |    + sa::HUGEINT * (n - sa) AS se FROM t)
        |SELECT o_orderpriority, CAST(n_items AS BIGINT) AS n_items,
        |  CAST(n_wide AS BIGINT) AS n_wide_items,
        |  CAST(n AS BIGINT) AS n_values,
        |  CAST((sd // 232792560) * 1000000 // n AS BIGINT) AS do_ppm,
        |  CAST(se * 1000000 // (n::HUGEINT * (n - 1)) AS BIGINT)
        |    AS de_ppm,
        |  CAST(1000000 - (sd // 232792560) * (n - 1) * 1000000
        |    // nullif(se, 0) AS BIGINT) AS alpha_ppm
        |FROM e ORDER BY 1""".stripMargin,

    // q315: identical tokenization, per-term pinned-log contributions,
    // and the closed-form missing-mass tail restated.
    "q315_js_divergence" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |cs AS MATERIALIZED (
        |  SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
        |corpus AS MATERIALIZED (
        |  SELECT term, sum(c) AS ct FROM cs GROUP BY 1),
        |ntot AS (SELECT sum(ct) AS ntot FROM corpus),
        |ns AS (SELECT source, sum(c) AS nsrc FROM cs GROUP BY 1),
        |t0 AS (SELECT cs.source, cs.c, corpus.ct, ns.nsrc, ntot.ntot,
        |    CAST(cs.c AS DOUBLE) / ns.nsrc AS p,
        |    CAST(corpus.ct AS DOUBLE) / ntot.ntot AS qq
        |  FROM cs
        |  JOIN corpus USING (term)
        |  JOIN ns ON ns.source = cs.source
        |  CROSS JOIN ntot),
        |terms AS (SELECT source, c, ct, nsrc, ntot,
        |    CAST(round((p * log2(p / ((p + qq) / 2.0))
        |      + qq * log2(qq / ((p + qq) / 2.0))) / 2.0, 9)
        |      AS DECIMAL(18,9)) AS t
        |  FROM t0)
        |SELECT source, CAST(min(nsrc) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST((CAST(sum(t) * 1000000000 AS HUGEINT)
        |    + (min(ntot) - sum(ct))::HUGEINT * 1000000000
        |      // (2 * min(ntot))
        |    + 500) // 1000 AS BIGINT) AS jsd_micro
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,

    // q316: same tokenization; bigrams via list indexing over
    // generate_series (empty when < 2 tokens); clipped multiset
    // intersection against the min-doc_id exemplar per language.
    "q316_rouge_exemplar" ->
      """WITH base AS MATERIALIZED (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |uni AS (SELECT doc_id, lang, 1 AS n, unnest(toks) AS gram
        |        FROM base),
        |bi AS (SELECT doc_id, lang, 2 AS n,
        |    unnest(list_transform(
        |      list_zip(toks[1:len(toks) - 1], toks[2:]),
        |      x -> x[1] || ' ' || x[2])) AS gram
        |  FROM base),
        |counts AS MATERIALIZED (
        |  SELECT doc_id, lang, n, gram, count(*) AS c
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
        |  GROUP BY 1, 2, 3, 4),
        |refids AS (SELECT lang, min(doc_id) AS ref_id FROM base
        |           GROUP BY 1),
        |refc AS MATERIALIZED (
        |  SELECT c.lang, c.n, c.gram, c.c AS cref
        |  FROM counts c JOIN refids r
        |    ON r.lang = c.lang AND r.ref_id = c.doc_id),
        |reft AS (SELECT lang, n, sum(cref) AS nref FROM refc
        |         GROUP BY 1, 2),
        |ov AS (
        |  SELECT c.doc_id, c.lang, c.n, sum(c.c) AS ncand,
        |    sum(least(c.c, coalesce(rc.cref, 0))) AS ov
        |  FROM counts c
        |  JOIN refids r ON r.lang = c.lang AND c.doc_id <> r.ref_id
        |  LEFT JOIN refc rc
        |    ON rc.lang = c.lang AND rc.n = c.n AND rc.gram = c.gram
        |  GROUP BY 1, 2, 3)
        |SELECT o.doc_id, o.lang,
        |  CAST(sum(CASE WHEN o.n = 1 THEN o.ov::HUGEINT * 1000000
        |    // nullif(o.ncand, 0) END) AS BIGINT) AS r1_precision_ppm,
        |  CAST(sum(CASE WHEN o.n = 1 THEN o.ov::HUGEINT * 1000000
        |    // nullif(t.nref, 0) END) AS BIGINT) AS r1_recall_ppm,
        |  CAST(sum(CASE WHEN o.n = 1 THEN 2 * o.ov::HUGEINT * 1000000
        |    // nullif(o.ncand + t.nref, 0) END) AS BIGINT) AS r1_f1_ppm,
        |  CAST(sum(CASE WHEN o.n = 2 THEN o.ov::HUGEINT * 1000000
        |    // nullif(o.ncand, 0) END) AS BIGINT) AS r2_precision_ppm,
        |  CAST(sum(CASE WHEN o.n = 2 THEN o.ov::HUGEINT * 1000000
        |    // nullif(t.nref, 0) END) AS BIGINT) AS r2_recall_ppm,
        |  CAST(sum(CASE WHEN o.n = 2 THEN 2 * o.ov::HUGEINT * 1000000
        |    // nullif(o.ncand + t.nref, 0) END) AS BIGINT) AS r2_f1_ppm
        |FROM ov o JOIN reft t ON t.lang = o.lang AND t.n = o.n
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q317: the brand×month revenue grid, pairwise signed
    // trunc-division slopes, and the lower-median election under the
    // same (slope, m1, m2) total order.
    "q317_theil_sen" ->
      """WITH series AS MATERIALIZED (
        |  SELECT p_brand,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS m,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS y
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |pairs AS (SELECT a.p_brand, a.m AS m1, b.m AS m2,
        |    CAST((b.y - a.y)::HUGEINT * 1000000 // (b.m - a.m)
        |      AS BIGINT) AS slope
        |  FROM series a JOIN series b
        |    ON b.p_brand = a.p_brand AND a.m < b.m),
        |r AS (SELECT p_brand, slope,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY slope, m1, m2) AS rn,
        |    count(*) OVER (PARTITION BY p_brand) AS np
        |  FROM pairs),
        |nm AS (SELECT p_brand, count(*) AS n_months FROM series
        |       GROUP BY 1)
        |SELECT r.p_brand, CAST(n_months AS BIGINT) AS n_months,
        |  CAST(np AS BIGINT) AS n_pairs,
        |  CAST(slope AS BIGINT) AS sen_slope_micro
        |FROM r JOIN nm ON nm.p_brand = r.p_brand
        |WHERE rn = (np + 1) // 2
        |ORDER BY 1""".stripMargin,

    // q318: the 1/2/3-gram totals and distinct counts, pivoted to ppm
    // ratios.
    "q318_distinct_n" ->
      s"""WITH $baseCte,
         |g AS (${gramCte(1)}
         |  UNION ALL ${gramCte(2)}
         |  UNION ALL ${gramCte(3)}),
         |c AS (SELECT lang, n, count(*) AS total,
         |    count(DISTINCT gram) AS uniq
         |  FROM g GROUP BY 1, 2)
         |SELECT lang,
         |  CAST(sum(CASE WHEN n = 1 THEN total END) AS BIGINT)
         |    AS n_tokens,
         |  CAST(sum(CASE WHEN n = 1 THEN uniq END) AS BIGINT)
         |    AS n_types,
         |  CAST(sum(CASE WHEN n = 1 THEN uniq::HUGEINT * 1000000
         |    // total END) AS BIGINT) AS distinct1_ppm,
         |  CAST(sum(CASE WHEN n = 2 THEN uniq::HUGEINT * 1000000
         |    // nullif(total, 0) END) AS BIGINT) AS distinct2_ppm,
         |  CAST(sum(CASE WHEN n = 3 THEN uniq::HUGEINT * 1000000
         |    // nullif(total, 0) END) AS BIGINT) AS distinct3_ppm
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // q319: the top-100 rank ladder under the same (count desc, term)
    // order, pinned-log points, one final double division.
    "q319_zipf_slope" ->
      s"""WITH $baseCte,
         |u AS (${gramCte(1)}),
         |counts AS (SELECT lang, gram, count(*) AS c FROM u
         |           GROUP BY 1, 2),
         |r AS (SELECT lang, c, row_number() OVER (PARTITION BY lang
         |    ORDER BY c DESC, gram) AS r
         |  FROM counts),
         |pts AS (SELECT lang,
         |    CAST(round(log2(CAST(r AS DOUBLE)), 9) AS DECIMAL(18,9))
         |      AS x,
         |    CAST(round(log2(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))
         |      AS y
         |  FROM r WHERE r <= 100),
         |s AS (SELECT lang, count(*) AS k, sum(x) AS sx, sum(y) AS sy,
         |    sum(x * y) AS sxy, sum(x * x) AS sxx
         |  FROM pts GROUP BY 1)
         |SELECT lang, CAST(k AS BIGINT) AS n_terms,
         |  round(CAST(k * sxy - sx * sy AS DOUBLE)
         |    / CAST(nullif(k * sxx - sx * sx, 0) AS DOUBLE), 6)
         |    AS zipf_slope
         |FROM s ORDER BY 1""".stripMargin,

    // q320: first-occurrence docs, the 16-threshold grid, conditional
    // cumulative sums, and the same pinned-log OLS.
    "q320_heaps_law" ->
      s"""WITH $baseCte,
         |u AS (${gramCte(1)}),
         |fd AS MATERIALIZED (SELECT lang, gram, min(doc_id) AS fd
         |  FROM u GROUP BY 1, 2),
         |dt AS MATERIALIZED (SELECT lang, doc_id, count(*) AS nt
         |  FROM u GROUP BY 1, 2),
         |mx AS (SELECT max(doc_id) AS mx FROM dt),
         |grid AS (SELECT i AS ck, mx * i // 16 AS t
         |  FROM generate_series(1, 16) g(i) CROSS JOIN mx),
         |v AS (SELECT lang, ck, count(*) AS v
         |  FROM fd JOIN grid ON fd.fd <= grid.t GROUP BY 1, 2),
         |nn AS (SELECT lang, ck, sum(nt) AS ntok
         |  FROM dt JOIN grid ON dt.doc_id <= grid.t GROUP BY 1, 2),
         |pts AS (SELECT v.lang,
         |    CAST(round(log2(CAST(ntok AS DOUBLE)), 9)
         |      AS DECIMAL(18,9)) AS x,
         |    CAST(round(log2(CAST(v AS DOUBLE)), 9) AS DECIMAL(18,9))
         |      AS y
         |  FROM v JOIN nn ON nn.lang = v.lang AND nn.ck = v.ck
         |  WHERE v > 0 AND ntok > 0),
         |s AS (SELECT lang, count(*) AS k, sum(x) AS sx, sum(y) AS sy,
         |    sum(x * y) AS sxy, sum(x * x) AS sxx
         |  FROM pts GROUP BY 1)
         |SELECT lang, CAST(k AS BIGINT) AS n_checkpoints,
         |  round(CAST(k * sxy - sx * sy AS DOUBLE)
         |    / CAST(nullif(k * sxx - sx * sx, 0) AS DOUBLE), 6)
         |    AS heaps_beta
         |FROM s ORDER BY 1""".stripMargin,

    // q321: corpus-pooled clipped matches for n = 1..4, integral
    // p_n ppm, display-double brevity penalty and geometric mean in
    // the same operation order.
    "q321_bleu_corpus" ->
      s"""WITH $baseCte,
         |g AS (${gramCte(1)}
         |  UNION ALL ${gramCte(2)}
         |  UNION ALL ${gramCte(3)}
         |  UNION ALL ${gramCte(4)}),
         |counts AS MATERIALIZED (
         |  SELECT doc_id, lang, n, gram, count(*) AS c
         |  FROM g GROUP BY 1, 2, 3, 4),
         |refids AS (SELECT lang, min(doc_id) AS ref_id FROM base
         |           GROUP BY 1),
         |refc AS MATERIALIZED (
         |  SELECT c.lang, c.n, c.gram, c.c AS cref
         |  FROM counts c JOIN refids r
         |    ON r.lang = c.lang AND r.ref_id = c.doc_id),
         |pooled AS (
         |  SELECT c.lang, c.n, sum(c.c) AS ncand,
         |    sum(least(c.c, coalesce(rc.cref, 0))) AS ov
         |  FROM counts c
         |  JOIN refids r ON r.lang = c.lang AND c.doc_id <> r.ref_id
         |  LEFT JOIN refc rc
         |    ON rc.lang = c.lang AND rc.n = c.n AND rc.gram = c.gram
         |  GROUP BY 1, 2),
         |p AS (SELECT lang,
         |    sum(CASE WHEN n = 1 THEN ov::HUGEINT * 1000000
         |      // nullif(ncand, 0) END) AS p1_ppm,
         |    sum(CASE WHEN n = 2 THEN ov::HUGEINT * 1000000
         |      // nullif(ncand, 0) END) AS p2_ppm,
         |    sum(CASE WHEN n = 3 THEN ov::HUGEINT * 1000000
         |      // nullif(ncand, 0) END) AS p3_ppm,
         |    sum(CASE WHEN n = 4 THEN ov::HUGEINT * 1000000
         |      // nullif(ncand, 0) END) AS p4_ppm
         |  FROM pooled GROUP BY 1),
         |lens AS (SELECT b.lang, b.doc_id, r.ref_id,
         |    len(b.toks)::BIGINT AS len
         |  FROM base b JOIN refids r ON r.lang = b.lang),
         |rl AS (SELECT lang, len AS rlen FROM lens
         |       WHERE doc_id = ref_id),
         |cl AS (SELECT lang, sum(len) AS clen, count(*) AS ndocs
         |  FROM lens WHERE doc_id <> ref_id GROUP BY 1),
         |j AS (SELECT p.lang, p1_ppm, p2_ppm, p3_ppm, p4_ppm,
         |    round(CASE WHEN clen >= rlen * ndocs THEN 1.0
         |      ELSE exp(1.0 - CAST(rlen * ndocs AS DOUBLE)
         |        / CAST(clen AS DOUBLE)) END, 6) AS bp
         |  FROM p JOIN rl ON rl.lang = p.lang
         |  JOIN cl ON cl.lang = p.lang)
         |SELECT lang,
         |  CAST(p1_ppm AS BIGINT) AS p1_ppm,
         |  CAST(p2_ppm AS BIGINT) AS p2_ppm,
         |  CAST(p3_ppm AS BIGINT) AS p3_ppm,
         |  CAST(p4_ppm AS BIGINT) AS p4_ppm,
         |  bp,
         |  round(CASE WHEN p1_ppm > 0 AND p2_ppm > 0 AND p3_ppm > 0
         |      AND p4_ppm > 0
         |    THEN bp * pow(CAST(p1_ppm AS DOUBLE) / 1000000.0
         |      * (CAST(p2_ppm AS DOUBLE) / 1000000.0)
         |      * (CAST(p3_ppm AS DOUBLE) / 1000000.0)
         |      * (CAST(p4_ppm AS DOUBLE) / 1000000.0), 0.25)
         |    ELSE 0.0 END, 6) AS bleu
         |FROM j ORDER BY 1""".stripMargin,

    // q322: the 33-replicate hash assignments, floored microcent mean
    // diffs, and the add-one permutation p-value restated.
    "q322_sign_flip_test" ->
      """WITH f AS MATERIALIZED (
        |  SELECT c_mktsegment AS segment, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON c_custkey = o_custkey),
        |reps AS MATERIALIZED (
        |  SELECT segment, b,
        |    sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN v = 1 THEN cents ELSE 0 END) AS s1,
        |    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN v = 0 THEN cents ELSE 0 END) AS s0
        |  FROM (SELECT segment, cents, b,
        |      ('0x' || substr(md5('perm:' || b::VARCHAR || ':'
        |        || o_orderkey::VARCHAR), 1, 8))::BIGINT % 2 AS v
        |    FROM f CROSS JOIN generate_series(0, 32) g(b))
        |  GROUP BY 1, 2),
        |st AS (SELECT *,
        |    s1::HUGEINT * 1000000 // nullif(n1, 0)
        |      - s0::HUGEINT * 1000000 // nullif(n0, 0) AS stat
        |  FROM reps),
        |obs AS (SELECT segment, stat AS obs_stat, n1 AS nt, n0 AS nc
        |        FROM st WHERE b = 0)
        |SELECT st.segment,
        |  CAST(min(obs.nt) AS BIGINT) AS n_treat,
        |  CAST(min(obs.nc) AS BIGINT) AS n_control,
        |  CAST(min(obs.obs_stat) AS BIGINT) AS obs_diff_microcents,
        |  CAST(sum(CASE WHEN abs(st.stat) >= abs(obs.obs_stat)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
        |  CAST((1 + sum(CASE WHEN abs(st.stat) >= abs(obs.obs_stat)
        |    THEN 1 ELSE 0 END)) * 1000000 // 33 AS BIGINT)
        |    AS p_value_ppm
        |FROM st JOIN obs ON obs.segment = st.segment
        |WHERE st.b > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q323: the q312 bin grid, cumulative interval lattice, and the
    // minimax fold restated over floored ppm interval means.
    "q323_isotonic_calibration" ->
      """WITH g AS MATERIALIZED (
        |  SELECT l_linestatus AS ls,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 100000 AS f,
        |    count(*) AS nk,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ok
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS MATERIALIZED (SELECT ls, f, nk, ok,
        |    sum(nk) OVER (PARTITION BY ls ORDER BY f
        |      ROWS UNBOUNDED PRECEDING) AS cn,
        |    sum(ok) OVER (PARTITION BY ls ORDER BY f
        |      ROWS UNBOUNDED PRECEDING) AS co
        |  FROM g),
        |iv AS (SELECT a.ls, a.f AS fj, b.f AS fk,
        |    (b.co - (a.co - a.ok))::HUGEINT * 1000000
        |      // (b.cn - (a.cn - a.nk)) AS m
        |  FROM cum a JOIN cum b ON b.ls = a.ls AND a.f <= b.f),
        |fit AS (SELECT ls, fi, max(mn) AS iso_ppm FROM (
        |    SELECT iv.ls, g.f AS fi, iv.fj, min(iv.m) AS mn
        |    FROM g JOIN iv ON iv.ls = g.ls
        |      AND iv.fj <= g.f AND iv.fk >= g.f
        |    GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2)
        |SELECT g.ls AS l_linestatus, g.f AS forecast_ppm,
        |  CAST(nk AS BIGINT) AS n,
        |  CAST(ok::HUGEINT * 1000000 // nk AS BIGINT) AS raw_ppm,
        |  CAST(iso_ppm AS BIGINT) AS iso_ppm
        |FROM g JOIN fit ON fit.ls = g.ls AND fit.fi = g.f
        |ORDER BY 1, 2""".stripMargin,

    // q324: the q275/q276 md5 point grid + the q100 register scheme,
    // with each merge round rebuilt bit-for-bit and absence = 0
    // cleared in closed form.
    "q324_hyperanf" -> {
      def merge(prev: String, next: String): String =
        s"""$next AS MATERIALIZED (
           |  SELECT id, bucket, max(reg) AS reg FROM (
           |    SELECT * FROM $prev
           |    UNION ALL
           |    SELECT e.dst AS id, r.bucket, r.reg
           |    FROM edges e JOIN $prev r ON r.id = e.src)
           |  GROUP BY 1, 2)""".stripMargin
      def est(tbl: String, h: Int): String =
        s"""SELECT id, $h AS h,
           |    sum(1::BIGINT << CAST(27 - reg AS INTEGER))
           |      + (64 - count(*)) * 134217728 AS sum_pow,
           |    64 - count(*) AS n_zero
           |  FROM $tbl GROUP BY 1""".stripMargin
      s"""WITH ${OraclesStats.gridCtes},
         |r0 AS MATERIALIZED (
         |  SELECT id, hv % 64 AS bucket,
         |    CASE WHEN hv // 64 = 0 THEN 27
         |         ELSE 27 - length(bin(hv // 64)) END AS reg
         |  FROM (SELECT id,
         |      ('0x' || substr(md5('anf:' || id::VARCHAR), 1, 8))
         |        ::BIGINT AS hv
         |    FROM p)),
         |${merge("r0", "r1")},
         |${merge("r1", "r2")},
         |${merge("r2", "r3")},
         |s AS (${est("r0", 0)}
         |  UNION ALL ${est("r1", 1)}
         |  UNION ALL ${est("r2", 2)}
         |  UNION ALL ${est("r3", 3)})
         |SELECT CAST(id AS BIGINT) AS id, CAST(h AS BIGINT) AS h,
         |  CAST(sum_pow AS BIGINT) AS sum_pow,
         |  CAST(n_zero AS BIGINT) AS n_zero,
         |  CAST(CASE WHEN ((0.709::DOUBLE * 4096.0::DOUBLE)
         |      * 134217728.0::DOUBLE) / CAST(sum_pow AS DOUBLE)
         |      <= 160.0 AND n_zero > 0
         |    THEN floor(64.0::DOUBLE
         |      * ln(64.0::DOUBLE / CAST(n_zero AS DOUBLE))
         |      * 1000000.0::DOUBLE)
         |    ELSE floor((((0.709::DOUBLE * 4096.0::DOUBLE)
         |      * 134217728.0::DOUBLE) / CAST(sum_pow AS DOUBLE))
         |      * 1000000.0::DOUBLE)
         |  END AS BIGINT) AS est_micros
         |FROM s ORDER BY id, h""".stripMargin
    },

    // q325: journeys to first purchase, the transition grid, five
    // removal variants, and six unrolled power rounds in micro
    // fixed-point.
    "q325_markov_attribution" -> {
      def round(prev: String, next: String): String =
        s"""$next AS MATERIALIZED (
           |  SELECT st.removed, st.st,
           |    CASE WHEN st.st = 'CONV' THEN 1000000
           |         WHEN st.st = 'NULL' THEN 0
           |         ELSE coalesce(nx.pn, 0) END AS p
           |  FROM states st LEFT JOIN (
           |    SELECT v.removed, v.src AS st,
           |      CAST(sum(v.c::HUGEINT * pv.p) // sum(v.c) AS BIGINT)
           |        AS pn
           |    FROM vt v JOIN $prev pv
           |      ON pv.removed = v.removed AND pv.st = v.dst
           |    GROUP BY 1, 2) nx
           |    ON nx.removed = st.removed AND nx.st = st.st)""".stripMargin
      s"""WITH ev AS MATERIALIZED (
         |  SELECT user_id, ts, event_id, event_type
         |  FROM (SELECT user_id, ts, event_id, event_type,
         |      sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS UNBOUNDED PRECEDING) AS cp
         |    FROM events)
         |  WHERE cp - (CASE WHEN event_type = 'purchase' THEN 1
         |              ELSE 0 END) = 0),
         |steps AS (
         |  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id), 'START') AS src,
         |    event_type AS dst
         |  FROM ev),
         |lasts AS (
         |  SELECT event_type AS src,
         |    CASE WHEN event_type = 'purchase' THEN 'CONV'
         |         ELSE 'NULL' END AS dst
         |  FROM (SELECT event_type, row_number() OVER (
         |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
         |      AS rn FROM ev)
         |  WHERE rn = 1),
         |trans AS MATERIALIZED (
         |  SELECT src, dst, count(*) AS c FROM (
         |    SELECT * FROM steps UNION ALL SELECT * FROM lasts)
         |  GROUP BY 1, 2),
         |vr AS (SELECT unnest(['__full__', 'click', 'view', 'signup',
         |                      'error']) AS removed),
         |vt AS MATERIALIZED (
         |  SELECT removed, src,
         |    CASE WHEN dst = removed THEN 'NULL' ELSE dst END AS dst,
         |    sum(c) AS c
         |  FROM vr CROSS JOIN trans WHERE src <> removed
         |  GROUP BY 1, 2, 3),
         |states AS MATERIALIZED (SELECT DISTINCT removed, st FROM (
         |  SELECT removed, src AS st FROM vt
         |  UNION ALL SELECT removed, dst FROM vt)),
         |p0 AS (SELECT removed, st,
         |    CASE WHEN st = 'CONV' THEN 1000000 ELSE 0 END AS p
         |  FROM states),
         |${round("p0", "p1")},
         |${round("p1", "p2")},
         |${round("p2", "p3")},
         |${round("p3", "p4")},
         |${round("p4", "p5")},
         |${round("p5", "p6")},
         |ps AS (SELECT removed, p FROM p6 WHERE st = 'START'),
         |eff AS MATERIALIZED (
         |  SELECT a.removed AS channel, f.p AS p_full,
         |    a.p AS p_removed,
         |    greatest(f.p - a.p, 0) AS effect
         |  FROM ps a CROSS JOIN (SELECT p FROM ps
         |    WHERE removed = '__full__') f
         |  WHERE a.removed <> '__full__')
         |SELECT channel,
         |  CAST(p_full AS BIGINT) AS p_conv_full_ppm,
         |  CAST(p_removed AS BIGINT) AS p_conv_removed_ppm,
         |  CAST(effect AS BIGINT) AS removal_effect_ppm,
         |  CAST(effect::HUGEINT * 1000000
         |    // nullif((SELECT sum(effect) FROM eff), 0) AS BIGINT)
         |    AS share_ppm
         |FROM eff ORDER BY channel""".stripMargin
    })
}
