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

  /** q340's oracle: the truss peel unrolled
    * [[QueriesData.trussMaxRounds]]+1 times over the brute-force edge
    * set (the q257 k-core oracle scheme — Spark REQUIRES convergence
    * within the same bound, so the engines can never disagree on a
    * non-converged state; the extra round re-derives the final
    * supports on the converged edge set).
    */
  private def kTrussOracle: String = {
    val rounds = (1 to QueriesData.trussMaxRounds + 1).map { i =>
      s"""a${i - 1} AS (SELECT ia AS id, ib AS nb FROM e${i - 1}
         |  UNION ALL SELECT ib, ia FROM e${i - 1}),
         |t$i AS MATERIALIZED (
         |  SELECT e.ia, e.ib, count(*) AS sup
         |  FROM e${i - 1} e
         |  JOIN a${i - 1} x ON x.id = e.ia AND x.nb <> e.ib
         |  JOIN e${i - 1} f ON f.ia = least(e.ib, x.nb)
         |    AND f.ib = greatest(e.ib, x.nb)
         |  GROUP BY 1, 2),
         |e$i AS MATERIALIZED (SELECT ia, ib FROM t$i WHERE sup >= 2)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT c_custkey AS id,
       |    ('0x' || substr(md5('x:' || CAST(c_custkey AS VARCHAR)),
       |      1, 8))::BIGINT % 100000 AS x,
       |    ('0x' || substr(md5('y:' || CAST(c_custkey AS VARCHAR)),
       |      1, 8))::BIGINT % 100000 AS y
       |  FROM customer),
       |e0 AS MATERIALIZED (
       |  SELECT a.id AS ia, b.id AS ib
       |  FROM p a JOIN p b ON a.id < b.id
       |  WHERE (a.x - b.x) * (a.x - b.x)
       |    + (a.y - b.y) * (a.y - b.y) <= 4000000),
       |$rounds
       |SELECT CAST(ia AS BIGINT) AS id_a, CAST(ib AS BIGINT) AS id_b,
       |  CAST(sup AS BIGINT) AS support
       |FROM t${QueriesData.trussMaxRounds + 1} WHERE sup >= 2
       |ORDER BY 1, 2""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    // q340: the truss peel unrolled over the brute-force proximity
    // edges — see kTrussOracle.
    "q340_ktruss" -> kTrussOracle,

    // q341: the same aggregate straight off the parquet source — a
    // round-trip fidelity bug in the ORC path is a hash mismatch.
    "q341_orc_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem WHERE l_quantity >= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q343/q344: q341's parquet-derived aggregate for the CSV and
    // JSON round-trips (different pushed predicates so the three
    // format gates never share a literal).
    "q343_csv_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem WHERE l_quantity <= 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q344_json_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem WHERE l_extendedprice >= 50000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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
        |    WHEN n_r::HUGEINT * n_o = 0 THEN NULL
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

    // q334: same per-nation permutation p-values (q322 machinery,
    // observed labels at b=0), same triangle-join ranks, same
    // cross-multiplied BH step-up.
    "q334_bh_fdr" ->
      """WITH f AS MATERIALIZED (
        |  SELECT n_name AS nation, o_orderkey,
        |    (o_orderpriority < '3') AS hi,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey),
        |reps AS MATERIALIZED (
        |  SELECT nation, b,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN t THEN cents ELSE 0 END) AS s1,
        |    sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN NOT t THEN cents ELSE 0 END) AS s0
        |  FROM (SELECT nation, cents, b,
        |      CASE WHEN b = 0 THEN hi ELSE
        |        ('0x' || substr(md5('bh:' || b::VARCHAR || ':'
        |          || o_orderkey::VARCHAR), 1, 8))::BIGINT % 5 < 2 END
        |        AS t
        |    FROM f CROSS JOIN generate_series(0, 32) g(b))
        |  GROUP BY 1, 2),
        |st AS (SELECT *,
        |    s1::HUGEINT * 1000000 // nullif(n1, 0)
        |      - s0::HUGEINT * 1000000 // nullif(n0, 0) AS stat
        |  FROM reps),
        |obs AS (SELECT nation, stat AS obs_stat, n1 AS nt, n0 AS nc
        |        FROM st WHERE b = 0),
        |pv AS MATERIALIZED (SELECT st.nation,
        |    min(obs.nt) AS n_treat, min(obs.nc) AS n_control,
        |    min(obs.obs_stat) AS obs_diff,
        |    CAST((1 + sum(CASE WHEN abs(st.stat) >= abs(obs.obs_stat)
        |      THEN 1 ELSE 0 END)) * 1000000 // 33 AS BIGINT) AS p_ppm
        |  FROM st JOIN obs ON obs.nation = st.nation
        |  WHERE st.b > 0 GROUP BY 1),
        |rk AS MATERIALIZED (SELECT a.nation, count(*) AS p_rank
        |  FROM pv a JOIN pv b ON b.p_ppm < a.p_ppm
        |    OR (b.p_ppm = a.p_ppm AND b.nation <= a.nation)
        |  GROUP BY 1),
        |m AS (SELECT count(*) AS m FROM pv),
        |cut AS (SELECT coalesce(max(CASE
        |    WHEN pv.p_ppm * m.m <= rk.p_rank * 100000
        |    THEN rk.p_rank END), 0) AS cut_rank
        |  FROM pv JOIN rk ON rk.nation = pv.nation CROSS JOIN m)
        |SELECT pv.nation, CAST(n_treat AS BIGINT) AS n_treat,
        |  CAST(n_control AS BIGINT) AS n_control,
        |  CAST(obs_diff AS BIGINT) AS obs_diff_microcents,
        |  p_ppm, CAST(p_rank AS BIGINT) AS p_rank,
        |  CAST(p_rank * 100000 // m.m AS BIGINT) AS bh_threshold_ppm,
        |  p_rank <= cut_rank AS rejected
        |FROM pv JOIN rk ON rk.nation = pv.nation
        |CROSS JOIN cut CROSS JOIN m
        |ORDER BY 1""".stripMargin,

    // q335: same one-pass three-layout zoning (UNION ALL instead of
    // the explode), same bound-derived predicate grids, same overlap
    // test.
    "q335_zonemap_advisor" ->
      """WITH li AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1992-01-01',
        |      CAST(l_shipdate AS DATE))::BIGINT AS sd,
        |    l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |b AS (SELECT min(sd) AS sd_mn, max(sd) AS sd_mx,
        |    min(ok) AS ok_mn, max(ok) AS ok_mx,
        |    min(pk) AS pk_mn, max(pk) AS pk_mx FROM li),
        |z AS MATERIALIZED (
        |  SELECT layout, z, min(sd) AS sd_lo, max(sd) AS sd_hi,
        |    min(pk) AS pk_lo, max(pk) AS pk_hi
        |  FROM (
        |    SELECT 'by_shipday' AS layout,
        |      least(63, (sd - sd_mn) * 64 // (sd_mx - sd_mn + 1)) AS z,
        |      sd, pk FROM li, b
        |    UNION ALL SELECT 'by_orderkey',
        |      least(63, (ok - ok_mn) * 64 // (ok_mx - ok_mn + 1)),
        |      sd, pk FROM li, b
        |    UNION ALL SELECT 'by_partkey',
        |      least(63, (pk - pk_mn) * 64 // (pk_mx - pk_mn + 1)),
        |      sd, pk FROM li, b)
        |  GROUP BY 1, 2),
        |p AS (SELECT 'ship_windows' AS family,
        |    sd_mn + (sd_mx - sd_mn + 1) * i // 32 AS lo,
        |    sd_mn + (sd_mx - sd_mn + 1) * (i + 2) // 32 - 1 AS hi
        |  FROM range(0, 16) t(i), b
        |  UNION ALL SELECT 'partkey_ranges',
        |    pk_mn + (pk_mx - pk_mn + 1) * i // 32,
        |    pk_mn + (pk_mx - pk_mn + 1) * (i + 2) // 32 - 1
        |  FROM range(0, 16) t(i), b),
        |nz AS (SELECT layout, count(*) AS n_zones FROM z GROUP BY 1),
        |sc AS (SELECT layout, family,
        |    sum(CASE WHEN (family = 'ship_windows'
        |        AND sd_lo <= hi AND sd_hi >= lo)
        |      OR (family = 'partkey_ranges'
        |        AND pk_lo <= hi AND pk_hi >= lo)
        |      THEN 1 ELSE 0 END) AS zones_scanned
        |  FROM z CROSS JOIN p GROUP BY 1, 2)
        |SELECT sc.layout, sc.family,
        |  CAST(n_zones AS BIGINT) AS n_zones,
        |  CAST(zones_scanned AS BIGINT) AS zones_scanned,
        |  CAST(zones_scanned::HUGEINT * 1000000 // (n_zones * 16)
        |    AS BIGINT) AS scan_ppm
        |FROM sc JOIN nz ON nz.layout = sc.layout
        |ORDER BY 1, 2""".stripMargin,

    // q336: per-prefix-dim exact top-10 under the q40 rounded-cosine
    // total order, overlap vs the full-dim top-10.
    "q336_matryoshka_eval" -> {
      def topCte(name: String, d: Int) =
        s"""$name AS MATERIALIZED (
           |  SELECT query_id, neighbor_id,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY round(list_cosine_similarity(
           |        qv[1:$d], cv[1:$d]), 6) DESC, neighbor_id)
           |      AS INTEGER) AS rank
           |  FROM q, c WHERE query_id <> neighbor_id
           |  QUALIFY rank <= 10)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e
         |      WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e),
         |${topCte("t8", 8)},
         |${topCte("t16", 16)},
         |${topCte("t32", 32)},
         |${topCte("tf", 64)},
         |tr AS (SELECT 8 AS d, * FROM t8
         |  UNION ALL SELECT 16, * FROM t16
         |  UNION ALL SELECT 32, * FROM t32),
         |ov AS (SELECT tr.d,
         |    count(DISTINCT tr.query_id) AS n_queries,
         |    sum(CASE WHEN tf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS overlap
         |  FROM tr LEFT JOIN tf ON tf.query_id = tr.query_id
         |    AND tf.neighbor_id = tr.neighbor_id
         |  GROUP BY 1),
         |t1 AS (SELECT tr.d, sum(CASE WHEN tr.neighbor_id =
         |      tf.neighbor_id THEN 1 ELSE 0 END) AS top1_matches
         |  FROM tr JOIN tf ON tf.query_id = tr.query_id
         |    AND tf.rank = 1
         |  WHERE tr.rank = 1 GROUP BY 1)
         |SELECT CAST(ov.d AS BIGINT) AS dim,
         |  CAST(n_queries AS BIGINT) AS n_queries,
         |  CAST(overlap AS BIGINT) AS overlap_at_10,
         |  CAST(overlap::HUGEINT * 1000000 // (n_queries * 10)
         |    AS BIGINT) AS recall_ppm,
         |  CAST(top1_matches AS BIGINT) AS top1_matches
         |FROM ov JOIN t1 ON t1.d = ov.d ORDER BY 1""".stripMargin
    },

    // q337: the q282 weekly frame and date-arithmetic lag join, scored
    // with the integral pinball loss on a 3-row tau grid.
    "q337_pinball_eval" ->
      """WITH weekly AS MATERIALIZED (
        |  SELECT n_name AS nation,
        |    CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS rev
        |  FROM orders
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  GROUP BY 1, 2),
        |sc AS (SELECT a.nation, a.rev, b.rev AS rev52
        |  FROM weekly a JOIN weekly b
        |    ON b.nation = a.nation AND b.wk + 364 = a.wk),
        |t AS (SELECT unnest([10, 50, 90]) AS tau_pct)
        |SELECT nation, CAST(tau_pct AS BIGINT) AS tau_pct,
        |  CAST(count(*) AS BIGINT) AS n_weeks,
        |  CAST(sum(greatest(tau_pct * (rev - rev52),
        |    (tau_pct - 100) * (rev - rev52))) AS BIGINT)
        |    AS pinball_x100_cents,
        |  CAST(sum(greatest(tau_pct * (rev - rev52),
        |    (tau_pct - 100) * (rev - rev52)))::HUGEINT
        |    // (count(*) * 100) AS BIGINT) AS mean_pinball_cents
        |FROM sc CROSS JOIN t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q338: the q279 scored pipeline extended with within-list pair
    // diversity and brand-grid coverage.
    "q338_rec_diversity" ->
      """WITH bi AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |np AS MATERIALIZED (SELECT p, count(*) AS n_p FROM bi
        |                    GROUP BY 1),
        |co AS (SELECT a.p AS pa, b.p AS pb, count(*) AS co
        |  FROM bi a JOIN bi b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2),
        |sc AS MATERIALIZED (SELECT s.pa, s.pb,
        |    CAST((s.co::HUGEINT * s.co * 1000000000000)
        |      // (na.n_p::HUGEINT * nb.n_p) AS BIGINT) AS score_e12
        |  FROM (SELECT pa, pb, co FROM co
        |        UNION ALL SELECT pb, pa, co FROM co) s
        |  JOIN np na ON na.p = s.pa
        |  JOIN np nb ON nb.p = s.pb),
        |recs AS MATERIALIZED (SELECT pa, pb, rnk, p_brand FROM
        |  (SELECT pa, pb,
        |     row_number() OVER (PARTITION BY pa
        |       ORDER BY score_e12 DESC, pb) AS rnk
        |   FROM sc) r JOIN part ON p_partkey = pa
        |  WHERE rnk <= 3),
        |prs AS (SELECT a.p_brand,
        |    1000000000000 - coalesce(s2.score_e12, 0) AS div_e12
        |  FROM recs a JOIN recs b ON b.pa = a.pa AND a.rnk < b.rnk
        |  LEFT JOIN sc s2 ON s2.pa = a.pb AND s2.pb = b.pb),
        |pg AS (SELECT p_brand, count(*) AS n_pairs,
        |    sum(div_e12::HUGEINT) AS div_sum
        |  FROM prs GROUP BY 1),
        |cv AS (SELECT p_brand, count(DISTINCT pa) AS n_parts,
        |    count(DISTINCT pb) AS distinct_neighbors
        |  FROM recs GROUP BY 1),
        |cat AS (SELECT count(*) AS n_cat FROM part)
        |SELECT cv.p_brand,
        |  CAST(n_parts AS BIGINT) AS n_parts,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(div_sum // n_pairs AS BIGINT) AS ild_mean_e12,
        |  CAST(distinct_neighbors AS BIGINT) AS distinct_neighbors,
        |  CAST(distinct_neighbors::HUGEINT * 1000000 // n_cat
        |    AS BIGINT) AS coverage_ppm
        |FROM cv JOIN pg ON pg.p_brand = cv.p_brand CROSS JOIN cat
        |ORDER BY 1""".stripMargin,

    // q339: same ppm-floored language-balancing weights, same exact
    // ESS fold off the source×lang grid.
    "q339_ess_diagnostics" ->
      """WITH w AS (SELECT lang, count(*) AS n_l,
        |    1000000000000 // count(*) AS ws
        |  FROM documents GROUP BY 1),
        |g AS (SELECT d.source, d.lang, count(*) AS k, max(ws) AS ws
        |  FROM documents d JOIN w ON w.lang = d.lang
        |  GROUP BY 1, 2)
        |SELECT source, CAST(sum(k) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_langs,
        |  CAST(sum(k::HUGEINT * ws) * sum(k::HUGEINT * ws) * 1000
        |    // sum(k::HUGEINT * ws * ws) AS BIGINT) AS ess_milli,
        |  CAST(sum(k::HUGEINT * ws) * sum(k::HUGEINT * ws) * 1000000
        |    // (sum(k::HUGEINT * ws * ws) * sum(k)) AS BIGINT)
        |    AS ess_ratio_ppm,
        |  CAST(max(k)::HUGEINT * 1000000 // sum(k) AS BIGINT)
        |    AS dom_lang_ppm
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

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
