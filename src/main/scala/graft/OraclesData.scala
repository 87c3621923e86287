package graft

/** DuckDB oracle twins for [[QueriesData]] (round-16 wave 5) — same
  * derivations, same integer fixed-point arithmetic, same total
  * orders, token-for-token where the dialects share syntax.
  */
object OraclesData {

  /** The q326 raw-URL derivation, shared text in both dialects (CASE
    * on small modulo classes + string concat). */
  private val urlDerivation =
    """concat(
      |  CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'HTTPS'
      |       WHEN 1 THEN 'https' ELSE 'Https' END, '://',
      |  CASE CAST(o_custkey % 2 AS INT) WHEN 0 THEN 'WWW.Shop'
      |       ELSE 'www.SHOP' END,
      |  CAST(o_custkey % 40 AS VARCHAR),
      |  CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN '.COM'
      |       ELSE '.com' END,
      |  CASE WHEN o_orderkey % 16 = 0 THEN ':8080'
      |       WHEN o_orderkey % 4 = 1 THEN ':443' ELSE '' END,
      |  '/item/', CAST(o_custkey % 25 AS VARCHAR),
      |  CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END,
      |  CASE CAST(o_orderkey % 3 AS INT)
      |    WHEN 0 THEN concat('?utm_source=news&id=',
      |      CAST(o_custkey % 100 AS VARCHAR), '&ref=',
      |      CAST(o_custkey % 7 AS VARCHAR))
      |    WHEN 1 THEN concat('?ref=', CAST(o_custkey % 7 AS VARCHAR),
      |      '&id=', CAST(o_custkey % 100 AS VARCHAR),
      |      '&utm_campaign=spring')
      |    ELSE concat('?id=', CAST(o_custkey % 100 AS VARCHAR),
      |      '&ref=', CAST(o_custkey % 7 AS VARCHAR)) END,
      |  CASE WHEN o_orderkey % 6 = 0 THEN '#section-2' ELSE '' END
      |)""".stripMargin

  val oracles: Map[String, String] = Map(

    // q326: same derivation, same canonicalization staged through
    // chained CTEs (lowercase scheme/host, default-port strip,
    // fragment drop, utm_*/fbclid drop, param sort, trailing-slash
    // collapse), same registered-domain key.
    "q326_url_canonicalize" ->
      s"""WITH raw AS (SELECT $urlDerivation AS url FROM orders),
         |s1 AS (SELECT url, split_part(url, '#', 1) AS nofrag FROM raw),
         |s2 AS (SELECT url, nofrag,
         |    lower(split_part(nofrag, '://', 1)) AS scheme,
         |    substr(nofrag,
         |      length(split_part(nofrag, '://', 1)) + 4) AS rest
         |  FROM s1),
         |s3 AS (SELECT *, split_part(rest, '/', 1) AS hostport,
         |    substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
         |  FROM s2),
         |s4 AS (SELECT *, lower(split_part(hostport, ':', 1)) AS host,
         |    split_part(hostport, ':', 2) AS port,
         |    split_part(pathq, '?', 1) AS path0,
         |    CASE WHEN length(pathq) > length(split_part(pathq, '?', 1))
         |      THEN substr(pathq, length(split_part(pathq, '?', 1)) + 2)
         |      ELSE '' END AS qs
         |  FROM s3),
         |s5 AS (SELECT *,
         |    CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
         |      OR (scheme = 'http' AND port = '80') THEN ''
         |      ELSE ':' || port END AS portc,
         |    CASE WHEN regexp_replace(path0, '/$$', '') = '' THEN '/'
         |      ELSE regexp_replace(path0, '/$$', '') END AS pathc,
         |    array_to_string(list_sort(list_filter(string_split(qs, '&'),
         |      p -> NOT starts_with(p, 'utm_')
         |        AND NOT starts_with(p, 'fbclid')
         |        AND p <> '')), '&') AS qj
         |  FROM s4),
         |c AS (SELECT url, scheme || '://' || host || portc || pathc ||
         |    CASE WHEN qj = '' THEN '' ELSE '?' || qj END AS canon
         |  FROM s5),
         |g AS (SELECT url, canon,
         |    regexp_extract(split_part(split_part(split_part(canon,
         |      '://', 2), '/', 1), ':', 1),
         |      '([^.]+\\.[^.]+)$$', 1) AS domain
         |  FROM c)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
         |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
         |  CAST((count(DISTINCT url) - count(DISTINCT canon))::HUGEINT
         |    * 1000000 // count(DISTINCT url) AS BIGINT) AS dup_ppm,
         |  min(canon) AS first_canon
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // q327: same 20 equal-width bins, same triangle-join cumulatives,
    // same |cum_s·N − cum_c·n_s| cross-multiplication.
    "q327_wasserstein_drift" ->
      """WITH b AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx,
        |    count(*) AS nn FROM documents),
        |grid AS MATERIALIZED (
        |  SELECT source, least(19, CAST((n_chars - mn) * 20
        |    // (mx - mn + 1) AS BIGINT)) AS bin, count(*) AS c
        |  FROM documents, b GROUP BY 1, 2),
        |bins AS (SELECT i FROM range(0, 20) t(i)),
        |srctot AS (SELECT source, sum(c) AS n_s FROM grid GROUP BY 1),
        |corpcum AS (SELECT i, sum(cc) AS cum_c FROM
        |  (SELECT bin, sum(c) AS cc FROM grid GROUP BY 1) t, bins
        |  WHERE bin <= i GROUP BY 1),
        |srccum AS (SELECT st.source, bins.i, st.n_s,
        |    coalesce(sum(g.c), 0) AS cum_s
        |  FROM srctot st CROSS JOIN bins
        |  LEFT JOIN grid g ON g.source = st.source AND g.bin <= bins.i
        |  GROUP BY 1, 2, 3)
        |SELECT s.source, CAST(max(s.n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(abs(s.cum_s::HUGEINT * b.nn
        |      - c.cum_c::HUGEINT * s.n_s)) * 1000000
        |    // (max(s.n_s)::HUGEINT * max(b.nn) * 20) AS BIGINT)
        |    AS w1_ppm,
        |  CAST(max(abs(s.cum_s::HUGEINT * b.nn
        |      - c.cum_c::HUGEINT * s.n_s)) * 1000000
        |    // (max(s.n_s)::HUGEINT * max(b.nn)) AS BIGINT)
        |    AS ks_gap_ppm
        |FROM srccum s JOIN corpcum c ON c.i = s.i CROSS JOIN b
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q328: same grid midranks (2·below + ties + 1), same
    // milli-floored mean ranks squared (u = Σ n_j·mr_j², the
    // DIV-quotient-safe form), same tie-corrected cross-multiplication.
    "q328_kruskal_wallis" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT o_orderpriority AS prio, CAST(l_quantity AS BIGINT) AS q,
        |    count(*) AS c
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |qtot AS MATERIALIZED (SELECT q, sum(c) AS t FROM grid GROUP BY 1),
        |below AS (SELECT a.q AS q1, a.t, coalesce(sum(b.t), 0) AS below
        |  FROM qtot a LEFT JOIN qtot b ON b.q < a.q GROUP BY 1, 2),
        |pg AS MATERIALIZED (SELECT prio, sum(c) AS n_j,
        |    sum(c * (2 * below + t + 1)) AS s_j
        |  FROM grid JOIN below ON q1 = q GROUP BY 1),
        |s AS (SELECT sum(n_j) AS n,
        |    sum((s_j::HUGEINT * 1000 // n_j)
        |      * (s_j::HUGEINT * 1000 // n_j) * n_j) AS u FROM pg),
        |tt AS (SELECT sum(t::HUGEINT * t * t - t) AS tt FROM qtot),
        |h AS (SELECT
        |    3 * u // (n::HUGEINT * (n + 1))
        |      - 3 * (n::HUGEINT + 1) * 1000000 AS h_ppm,
        |    (3 * u // (n::HUGEINT * (n + 1))
        |      - 3 * (n::HUGEINT + 1) * 1000000)
        |      * (n::HUGEINT * n * n - n)
        |      // (n::HUGEINT * n * n - n - tt) AS h_tie_ppm
        |  FROM s, tt)
        |SELECT prio, CAST(n_j AS BIGINT) AS n_j,
        |  CAST(s_j::HUGEINT * 1000 // (2 * n_j) AS BIGINT)
        |    AS mean_rank_milli,
        |  CAST(h_ppm AS BIGINT) AS h_ppm,
        |  CAST(h_tie_ppm AS BIGINT) AS h_tie_ppm
        |FROM pg, h ORDER BY 1""".stripMargin,

    // q329: same nation×quantity grid, same grid×grid dominance
    // products, same magnitude bands by cross-multiplication.
    "q329_cliffs_delta" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT n_name AS nation, CAST(l_quantity AS BIGINT) AS q,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr,
        |    sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS co
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  GROUP BY 1, 2),
        |p AS (SELECT a.nation,
        |    sum(CASE WHEN a.q > b.q THEN a.cr::HUGEINT * b.co
        |        ELSE 0 END) AS gt,
        |    sum(CASE WHEN a.q < b.q THEN a.cr::HUGEINT * b.co
        |        ELSE 0 END) AS lt
        |  FROM grid a JOIN grid b ON b.nation = a.nation GROUP BY 1),
        |t AS (SELECT nation AS nation3, sum(cr) AS n_r, sum(co) AS n_o
        |  FROM grid GROUP BY 1)
        |SELECT nation, CAST(n_r AS BIGINT) AS n_returned,
        |  CAST(n_o AS BIGINT) AS n_kept,
        |  CAST((gt - lt) * 1000000
        |    // nullif(n_r::HUGEINT * n_o, 0) AS BIGINT) AS delta_ppm,
        |  CASE
        |    WHEN abs(gt - lt) * 1000 < n_r::HUGEINT * n_o * 147
        |      THEN 'negligible'
        |    WHEN abs(gt - lt) * 100 < n_r::HUGEINT * n_o * 33
        |      THEN 'small'
        |    WHEN abs(gt - lt) * 1000 < n_r::HUGEINT * n_o * 474
        |      THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM p JOIN t ON t.nation3 = p.nation ORDER BY 1""".stripMargin,

    // q330: same tokenization, same w=4 rolling md5 boundary
    // (hash % 16 = 0), same doc-bounded running chunk id, same
    // ordered reassembly and digest accounting.
    "q330_cdc_chunks" ->
      """WITH base AS MATERIALIZED (
        |  SELECT doc_id, source,
        |    list_filter(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |    unnest(list_transform(toks, (x, i) -> struct_pack(
        |      pos := i, tok := x,
        |      g := CASE WHEN i >= 4
        |        THEN array_to_string(toks[i-3:i], ' ') END))) AS u
        |  FROM base),
        |rw AS (SELECT doc_id, source, u.pos AS pos, u.tok AS tok,
        |    CASE WHEN u.g IS NOT NULL AND
        |      ('0x' || substr(md5(u.g), 1, 8))::BIGINT % 16 = 0
        |      THEN 1 ELSE 0 END AS b
        |  FROM r),
        |ch AS (SELECT doc_id, source, pos, tok,
        |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk
        |  FROM rw),
        |chunks AS (SELECT doc_id, source, chunk, count(*) AS n_toks,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
        |  FROM ch GROUP BY 1, 2, 3)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct,
        |  CAST((count(*) - count(DISTINCT digest))::HUGEINT * 1000000
        |    // count(*) AS BIGINT) AS dedup_ppm,
        |  CAST(sum(n_toks)::HUGEINT * 1000 // count(*) AS BIGINT)
        |    AS mean_toks_milli
        |FROM chunks GROUP BY 1 ORDER BY 1""".stripMargin,

    // q331: same sufficient statistics, same micro-floored means with
    // λ = 1e6 micro on the slope diagonal, same literal Cramer
    // expansion (HUGEINT ≡ DECIMAL(38,0) at these magnitudes).
    "q331_ridge_regression" ->
      """WITH f AS (SELECT c_mktsegment AS segment,
        |    CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS y
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey),
        |mom0 AS (SELECT segment, count(*) AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
        |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
        |    sum(x1 * x2) AS s12,
        |    sum(x1::HUGEINT * y) AS s1y, sum(x2::HUGEINT * y) AS s2y
        |  FROM f GROUP BY 1),
        |m AS (SELECT segment, n,
        |    s1::HUGEINT * 1000000 // n AS m1,
        |    s2::HUGEINT * 1000000 // n AS m2,
        |    sy::HUGEINT * 1000000 // n AS my,
        |    s11::HUGEINT * 1000000 // n + 1000000 AS m11,
        |    s22::HUGEINT * 1000000 // n + 1000000 AS m22,
        |    s12::HUGEINT * 1000000 // n AS m12,
        |    s1y::HUGEINT * 1000000 // n AS m1y,
        |    s2y::HUGEINT * 1000000 // n AS m2y
        |  FROM mom0)
        |SELECT segment, CAST(n AS BIGINT) AS n,
        |  CAST((my  * (m11 * m22 - m12 * m12)
        |      - m1 * (m1y * m22 - m12 * m2y)
        |      + m2 * (m1y * m12 - m11 * m2y)) * 1000000
        |    // (1000000 * (m11 * m22 - m12 * m12)
        |      - m1 * (m1  * m22 - m12 * m2)
        |      + m2 * (m1  * m12 - m11 * m2)) AS BIGINT)
        |    AS b0_micro_cents,
        |  CAST((1000000 * (m1y * m22 - m12 * m2y)
        |      - my * (m1  * m22 - m12 * m2)
        |      + m2 * (m1  * m2y - m1y * m2)) * 1000000
        |    // (1000000 * (m11 * m22 - m12 * m12)
        |      - m1 * (m1  * m22 - m12 * m2)
        |      + m2 * (m1  * m12 - m11 * m2)) AS BIGINT)
        |    AS b1_micro_cents,
        |  CAST((1000000 * (m11 * m2y - m1y * m12)
        |      - m1 * (m1  * m2y - m1y * m2)
        |      + my * (m1  * m12 - m11 * m2)) * 1000000
        |    // (1000000 * (m11 * m22 - m12 * m12)
        |      - m1 * (m1  * m22 - m12 * m2)
        |      + m2 * (m1  * m12 - m11 * m2)) AS BIGINT)
        |    AS b2_micro_cents
        |FROM m ORDER BY 1""".stripMargin,

    // q332: same floored-dollar sufficient statistics, same
    // dollar²-floored S²/n terms, same integral F and η².
    "q332_anova_f" ->
      """WITH pg AS MATERIALIZED (
        |  SELECT o_orderpriority AS prio, count(*) AS n_j,
        |    sum(CAST(floor(l_extendedprice) AS BIGINT)) AS s_j,
        |    sum(CAST(floor(l_extendedprice) AS BIGINT)::HUGEINT
        |      * CAST(floor(l_extendedprice) AS BIGINT)) AS ss_j
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1),
        |s AS (SELECT count(*) AS k, sum(n_j) AS n, sum(s_j) AS st,
        |    sum(ss_j) AS sst,
        |    sum(s_j::HUGEINT * s_j // n_j) AS u
        |  FROM pg),
        |d AS (SELECT k, n,
        |    u - st::HUGEINT * st // n AS ssb_u,
        |    sst::HUGEINT - u AS ssw_u
        |  FROM s),
        |fr AS (SELECT CAST(k - 1 AS BIGINT) AS df_between,
        |    CAST(n - k AS BIGINT) AS df_within,
        |    CAST(ssb_u * (n - k) * 1000 // (ssw_u * (k - 1)) AS BIGINT)
        |      AS f_milli,
        |    CAST(ssb_u * 1000000 // (ssb_u + ssw_u) AS BIGINT)
        |      AS eta2_ppm
        |  FROM d)
        |SELECT prio, CAST(n_j AS BIGINT) AS n_j,
        |  CAST(s_j::HUGEINT * 1000 // n_j AS BIGINT)
        |    AS mean_milli_dollars,
        |  df_between, df_within, f_milli, eta2_ppm
        |FROM pg, fr ORDER BY 1""".stripMargin)
}
