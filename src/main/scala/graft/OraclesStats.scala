package graft

/** DuckDB oracle twins for [[QueriesStats]] — exact integer arithmetic
  * end-to-end (HUGEINT on this side where the Spark side carries
  * DECIMAL(38)), every ranking given the same explicit total order.
  * The graph oracles rebuild the q274/q275 md5 point grid from first
  * principles (the established q275 pattern) so nothing Spark-side is
  * trusted.
  */
object OraclesStats {

  /** DuckDB twin of [[graft.operators.TextAnalysis.normalizeText]]
    * (QueriesText's established `norm` literal). */
  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Shared md5 point grid + eps=1000 proximity edges (q275's oracle
    * geometry, verbatim — any drift here would break BOTH q276 and
    * q277 against their Spark twins, which is the point).
    */
  private[graft] val gridCtes =
    """n AS (SELECT CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)))
      |        AS BIGINT) * 1000 AS side
      |      FROM customer),
      |p AS MATERIALIZED (
      |  SELECT c_custkey AS id,
      |    ('0x' || substr(md5('x:' || c_custkey::VARCHAR), 1, 8))
      |      ::BIGINT % side AS x,
      |    ('0x' || substr(md5('y:' || c_custkey::VARCHAR), 1, 8))
      |      ::BIGINT % side AS y
      |  FROM customer CROSS JOIN n),
      |pr AS MATERIALIZED (
      |  SELECT a.id AS id_a, b.id AS id_b
      |  FROM p a JOIN p b ON a.id < b.id
      |    AND (a.x - b.x) * (a.x - b.x)
      |      + (a.y - b.y) * (a.y - b.y) <= 1000000),
      |edges AS MATERIALIZED (
      |  SELECT id_a AS src, id_b AS dst FROM pr
      |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pr)""".stripMargin

  /** One synchronous LPA round: mode of neighbor labels, ties to MIN
    * label, nodes with no neighbors keep their label. */
  private def lpaRound(cur: String, next: String): String =
    s"""$next AS MATERIALIZED (
       |  SELECT l.id, coalesce(w.lbl, l.lbl) AS lbl
       |  FROM $cur l LEFT JOIN (
       |    SELECT id, lbl FROM (
       |      SELECT id, lbl,
       |        row_number() OVER (PARTITION BY id
       |          ORDER BY c DESC, lbl) AS rn
       |      FROM (SELECT e.dst AS id, x.lbl, count(*) AS c
       |            FROM edges e JOIN $cur x ON x.id = e.src
       |            GROUP BY 1, 2))
       |    WHERE rn = 1) w ON w.id = l.id)""".stripMargin

  /** One Bradley–Terry MM round (q306): per-pair integral-division
    * terms off `prev`'s strengths, per-player denominator sum, raw
    * update Wᵢ·1e12 DIV dᵢ, then renormalization to Σγ = N·1e6 —
    * the identical micro fixed-point arithmetic the Spark side runs.
    */
  private def btRound(prev: String, next: String): String =
    s"""t_$next AS (SELECT a, b,
       |    nij::HUGEINT * 1000000000000 // (ga.g + gb.g) AS t
       |  FROM pairs JOIN $prev ga ON ga.brand = a
       |  JOIN $prev gb ON gb.brand = b),
       |d_$next AS (SELECT brand, sum(t) AS d FROM (
       |    SELECT a AS brand, t FROM t_$next
       |    UNION ALL SELECT b, t FROM t_$next) GROUP BY 1),
       |r_$next AS (SELECT p.brand,
       |    coalesce(w.w, 0)::HUGEINT * 1000000000000
       |      // nullif(d.d, 0) AS gr
       |  FROM players p
       |  LEFT JOIN wins w ON w.brand = p.brand
       |  LEFT JOIN d_$next d ON d.brand = p.brand),
       |z_$next AS (SELECT sum(gr) AS z, count(*) AS np FROM r_$next),
       |$next AS MATERIALIZED (SELECT brand,
       |    gr::HUGEINT * 1000000 * np // nullif(z, 0) AS g
       |  FROM r_$next CROSS JOIN z_$next)""".stripMargin

  val oracles: Map[String, String] = Map(
    // q306: duels via per-order rank windows (min_by/max_by twins),
    // then the 3 MM rounds unrolled with btRound.
    "q306_bradley_terry" ->
      s"""WITH li AS MATERIALIZED (
         |  SELECT l_orderkey,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS cents,
         |    l_linenumber, p_brand
         |  FROM lineitem JOIN part ON p_partkey = l_partkey),
         |d0 AS (SELECT l_orderkey, p_brand,
         |    row_number() OVER (PARTITION BY l_orderkey
         |      ORDER BY cents, l_linenumber) AS ra,
         |    row_number() OVER (PARTITION BY l_orderkey
         |      ORDER BY cents DESC, l_linenumber DESC) AS rb
         |  FROM li),
         |duels AS MATERIALIZED (
         |  SELECT w.p_brand AS winner, l.p_brand AS loser
         |  FROM (SELECT l_orderkey, p_brand FROM d0 WHERE ra = 1) w
         |  JOIN (SELECT l_orderkey, p_brand FROM d0 WHERE rb = 1) l
         |    USING (l_orderkey)
         |  WHERE w.p_brand <> l.p_brand),
         |wins AS (SELECT winner AS brand, count(*) AS w
         |  FROM duels GROUP BY 1),
         |pairs AS MATERIALIZED (
         |  SELECT least(winner, loser) AS a,
         |    greatest(winner, loser) AS b, count(*) AS nij
         |  FROM duels GROUP BY 1, 2),
         |players AS (SELECT DISTINCT brand FROM (
         |  SELECT a AS brand FROM pairs
         |  UNION ALL SELECT b FROM pairs
         |  UNION ALL SELECT brand FROM wins)),
         |gi AS (SELECT brand, 1000000::HUGEINT AS g FROM players),
         |${btRound("gi", "g1")},
         |${btRound("g1", "g2")},
         |${btRound("g2", "g3")},
         |totals AS (SELECT brand, count(*) AS n_duels FROM (
         |  SELECT winner AS brand FROM duels
         |  UNION ALL SELECT loser FROM duels) GROUP BY 1)
         |SELECT g3.brand AS brand,
         |  CAST(coalesce(w.w, 0) AS BIGINT) AS n_wins,
         |  CAST(t.n_duels AS BIGINT) AS n_duels,
         |  CAST(g3.g AS BIGINT) AS gamma_micro
         |FROM g3
         |LEFT JOIN wins w ON w.brand = g3.brand
         |JOIN totals t ON t.brand = g3.brand
         |ORDER BY gamma_micro DESC, brand""".stripMargin,

    // q302: the contingency grid, diagonal, and marginal product
    // restated; HUGEINT sums stand in for Spark's DECIMAL(38,0).
    "q302_cohen_kappa" ->
      """WITH g AS MATERIALIZED (
        |  SELECT l_linestatus AS ls, l_returnflag AS ra,
        |    CASE WHEN l_quantity <= 16 THEN 'R'
        |         WHEN l_quantity <= 33 THEN 'N' ELSE 'A' END AS rb,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2, 3),
        |tot AS (SELECT ls, sum(c) AS n,
        |    sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS agree
        |  FROM g GROUP BY 1),
        |ma AS (SELECT ls, ra, sum(c) AS na FROM g GROUP BY 1, 2),
        |mb AS (SELECT ls, rb, sum(c) AS nb FROM g GROUP BY 1, 2),
        |pe AS (SELECT ma.ls, sum(na::HUGEINT * nb) AS penum
        |  FROM ma JOIN mb ON mb.ls = ma.ls AND mb.rb = ma.ra
        |  GROUP BY 1)
        |SELECT tot.ls AS l_linestatus, CAST(n AS BIGINT) AS n,
        |  CAST(agree::HUGEINT * 1000000 // n AS BIGINT) AS po_ppm,
        |  CAST(penum * 1000000 // (n::HUGEINT * n) AS BIGINT) AS pe_ppm,
        |  CAST((n::HUGEINT * agree - penum) * 1000000
        |    // nullif(n::HUGEINT * n - penum, 0) AS BIGINT) AS kappa_ppm
        |FROM tot JOIN pe ON pe.ls = tot.ls
        |ORDER BY 1""".stripMargin,

    // q305: the falling-factorial pass@k rational per task, then the
    // segment rollup with the same eligibility split.
    "q305_pass_at_k" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey, count(*) AS n,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c
        |  FROM orders GROUP BY 1),
        |p AS (SELECT o_custkey, n,
        |    CAST(c::HUGEINT * 1000000 // n AS BIGINT) AS pass1_ppm,
        |    CASE WHEN n >= 3 THEN CAST(
        |      (n::HUGEINT * (n-1) * (n-2)
        |       - (n-c)::HUGEINT * (n-c-1) * (n-c-2)) * 1000000
        |      // (n::HUGEINT * (n-1) * (n-2)) AS BIGINT) END AS pass3_ppm
        |  FROM per)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_tasks,
        |  CAST(sum(pass1_ppm) // count(*) AS BIGINT) AS mean_pass1_ppm,
        |  CAST(sum(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tasks_k3,
        |  CAST(sum(pass3_ppm)
        |    // nullif(sum(CASE WHEN n >= 3 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS mean_pass3_ppm
        |FROM p JOIN customer ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q276_label_propagation" ->
      s"""WITH $gridCtes,
         |l0 AS (SELECT id, id AS lbl FROM p),
         |${lpaRound("l0", "l1")},
         |${lpaRound("l1", "l2")},
         |${lpaRound("l2", "l3")},
         |${lpaRound("l3", "l4")}
         |SELECT CAST(id AS BIGINT) AS id,
         |  CAST(lbl AS BIGINT) AS community
         |FROM l4 ORDER BY id""".stripMargin,

    "q277_local_clustering" ->
      s"""WITH $gridCtes,
         |deg AS (SELECT src AS id, count(*) AS deg FROM edges
         |        GROUP BY 1),
         |tri AS (
         |  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
         |  FROM pr e1 JOIN pr e2
         |    ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
         |  WHERE EXISTS (SELECT 1 FROM pr e3
         |    WHERE e3.id_a = e1.id_b AND e3.id_b = e2.id_b)),
         |tpn AS (SELECT id, count(*) AS n_tri FROM (
         |    SELECT a AS id FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri)
         |  GROUP BY 1)
         |SELECT CAST(cu.c_custkey AS BIGINT) AS id,
         |  CAST(coalesce(d.deg, 0) AS BIGINT) AS deg,
         |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST(CASE WHEN coalesce(d.deg, 0) >= 2
         |    THEN (2000000 * coalesce(t.n_tri, 0))
         |      // (d.deg * (d.deg - 1))
         |    ELSE 0 END AS BIGINT) AS clus_ppm
         |FROM customer cu
         |LEFT JOIN deg d ON d.id = cu.c_custkey
         |LEFT JOIN tpn t ON t.id = cu.c_custkey
         |ORDER BY id""".stripMargin,

    // Midrank×2 from the (nation, qty) value-bounded rollup — the
    // same arithmetic the Spark side runs, derived independently.
    "q278_mann_whitney" ->
      """WITH j AS (
        |  SELECT n_name, l_returnflag AS flag,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  WHERE l_returnflag IN ('R', 'N')),
        |r AS (SELECT n_name AS nation, qty,
        |    sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS c_r,
        |    sum(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS c_n
        |  FROM j GROUP BY 1, 2),
        |w AS (SELECT nation, qty, c_r, c_n, c_r + c_n AS cnt,
        |    coalesce(sum(c_r + c_n) OVER (PARTITION BY nation
        |      ORDER BY qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cb
        |  FROM r)
        |SELECT nation,
        |  CAST(sum(c_r) AS BIGINT) AS n_r,
        |  CAST(sum(c_n) AS BIGINT) AS n_n,
        |  CAST(((sum(c_r * (2 * cb + cnt + 1))
        |      - sum(c_r) * (sum(c_r) + 1))::HUGEINT * 1000000)
        |    // (sum(c_r)::HUGEINT * sum(c_n)) - 1000000 AS BIGINT)
        |    AS rank_biserial_ppm
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q279_item_cosine" ->
      """WITH bi AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |np AS MATERIALIZED (SELECT p, count(*) AS n_p FROM bi
        |                    GROUP BY 1),
        |co AS (SELECT a.p AS pa, b.p AS pb, count(*) AS co
        |  FROM bi a JOIN bi b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2),
        |sym AS (SELECT pa, pb, co FROM co
        |        UNION ALL SELECT pb, pa, co FROM co),
        |sc AS (SELECT s.pa, s.pb, s.co,
        |    CAST((s.co::HUGEINT * s.co * 1000000000000)
        |      // (na.n_p::HUGEINT * nb.n_p) AS BIGINT) AS score_e12
        |  FROM sym s
        |  JOIN np na ON na.p = s.pa
        |  JOIN np nb ON nb.p = s.pb),
        |rk AS (SELECT pa, pb, co, score_e12,
        |    row_number() OVER (PARTITION BY pa
        |      ORDER BY score_e12 DESC, pb) AS rn
        |  FROM sc)
        |SELECT CAST(pa AS BIGINT) AS part,
        |  CAST(pb AS BIGINT) AS neighbor,
        |  CAST(co AS BIGINT) AS co_orders,
        |  score_e12,
        |  CAST(rn AS BIGINT) AS rnk
        |FROM rk WHERE rn <= 3
        |ORDER BY part, rnk""".stripMargin,

    "q280_changepoint" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS d,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS rev
        |  FROM orders
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  GROUP BY 1, 2),
        |w AS (SELECT nation, d,
        |    CAST(row_number() OVER (PARTITION BY nation ORDER BY d)
        |      AS BIGINT) AS t,
        |    CAST(sum(rev) OVER (PARTITION BY nation ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS s_t,
        |    CAST(count(*) OVER (PARTITION BY nation) AS BIGINT)
        |      AS n_days,
        |    CAST(sum(rev) OVER (PARTITION BY nation) AS BIGINT)
        |      AS s_n
        |  FROM daily),
        |st AS (SELECT nation, d, t, n_days,
        |    abs(n_days::HUGEINT * s_t - t::HUGEINT * s_n) // n_days
        |      AS stat_cents
        |  FROM w WHERE t < n_days),
        |pick AS (SELECT nation, d, t, n_days, stat_cents,
        |    row_number() OVER (PARTITION BY nation
        |      ORDER BY stat_cents DESC, d) AS rn
        |  FROM st)
        |SELECT nation, CAST(d AS TIMESTAMP) AS cp_date, t,
        |  CAST(n_days AS BIGINT) AS n_days,
        |  CAST(stat_cents AS BIGINT) AS stat_cents
        |FROM pick WHERE rn = 1 ORDER BY nation""".stripMargin,

    // Streaming CMS ≡ batch CMS by construction (per-cell sums are
    // order-free), so the oracle rebuilds the counters from the batch
    // events table — q265's scheme with the events key.
    "q281_stream_cms" ->
      """WITH e AS MATERIALIZED (
        |  SELECT event_type || ':' || CAST(user_id % 97 AS VARCHAR)
        |    AS cms_key
        |  FROM events),
        |j AS (SELECT unnest(range(0, 4)) AS j),
        |cells AS (
        |  SELECT j.j,
        |    ('0x' || substr(md5(j.j::VARCHAR || ':' || e.cms_key),
        |      1, 8))::BIGINT % 64 AS c
        |  FROM e CROSS JOIN j),
        |counters AS (SELECT j, c, count(*) AS n FROM cells
        |             GROUP BY 1, 2),
        |exact AS (SELECT cms_key, count(*) AS exact_count FROM e
        |          GROUP BY 1),
        |est AS (
        |  SELECT x.cms_key, x.exact_count, min(ct.n) AS est_count
        |  FROM exact x CROSS JOIN j
        |  JOIN counters ct ON ct.j = j.j
        |    AND ct.c = ('0x' || substr(md5(j.j::VARCHAR || ':'
        |      || x.cms_key), 1, 8))::BIGINT % 64
        |  GROUP BY 1, 2)
        |SELECT cms_key,
        |  CAST(est_count AS BIGINT) AS est_count,
        |  CAST(exact_count AS BIGINT) AS exact_count,
        |  est_count >= exact_count AS sound
        |FROM est
        |ORDER BY est_count DESC, cms_key
        |LIMIT 100""".stripMargin,

    "q297_post_stratified_effect" ->
      """WITH a AS (SELECT c_mktsegment AS segment,
        |    ('0x' || substr(md5('srm:' || o_orderkey::VARCHAR), 1, 8))
        |      ::BIGINT % 2 AS variant,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM orders JOIN customer ON c_custkey = o_custkey),
        |g AS (SELECT segment,
        |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN variant = 1 THEN c ELSE 0 END) AS s1,
        |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN variant = 0 THEN c ELSE 0 END) AS s0
        |  FROM a GROUP BY 1),
        |tot AS (SELECT sum(n1 + n0) AS n FROM g),
        |per AS (SELECT segment,
        |    CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |    CAST(((s1::HUGEINT * n0 - s0::HUGEINT * n1) * 1000000)
        |      // (n1::HUGEINT * n0) AS BIGINT) AS effect_microcents,
        |    CAST(((n1 + n0)::HUGEINT * 1000000)
        |      // (SELECT n FROM tot) AS BIGINT) AS weight_ppm,
        |    CAST(((n1 + n0)::HUGEINT
        |      * (s1::HUGEINT * n0 - s0::HUGEINT * n1) * 1000000)
        |      // ((SELECT n FROM tot)::HUGEINT * n1 * n0) AS BIGINT)
        |      AS contribution_microcents
        |  FROM g)
        |SELECT * FROM (
        |  SELECT segment, n1, n0, effect_microcents, weight_ppm,
        |    contribution_microcents FROM per
        |  UNION ALL
        |  SELECT '__overall__', CAST(sum(n1) AS BIGINT),
        |    CAST(sum(n0) AS BIGINT),
        |    CAST(sum(contribution_microcents) AS BIGINT),
        |    CAST(sum(weight_ppm) AS BIGINT),
        |    CAST(sum(contribution_microcents) AS BIGINT)
        |  FROM per)
        |ORDER BY segment""".stripMargin,

    // q296: q55's full portable-MinHash oracle (shingles → affine
    // 32-bit min-hashes → 4-band keys → candidates → exact-Jaccard
    // verify) restricted to pairs crossing the md5 80/20 split and
    // normalized to (train_id, val_id).
    "q296_split_leakage" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |    x -> x <> '') AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(t) - 3 + 2),
         |    i -> array_to_string(t[i:i+2], ' '))) AS s
         |  FROM toks WHERE len(t) >= 3),
         |mins AS (
         |  SELECT doc_id, s, list_transform(range(0, 16), i ->
         |    list_min(list_transform(s, x ->
         |      (((('0x' || substr(md5('a:' || i), 1, 7))::BIGINT | 1)
         |         * ('0x' || substr(md5(x), 1, 8))::BIGINT
         |         + ('0x' || substr(md5('b:' || i), 1, 8))::BIGINT)
         |        & 4294967295)))) AS m
         |  FROM sh),
         |banded AS (
         |  SELECT doc_id, b.band_idx,
         |    array_to_string(m[b.band_idx*4+1 : b.band_idx*4+4], ',')
         |      AS band_key
         |  FROM mins, range(0, 4) AS b(band_idx)),
         |cand AS (
         |  SELECT DISTINCT b1.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM banded b1 JOIN banded b2 USING (band_idx, band_key)
         |  WHERE b1.doc_id < b2.doc_id),
         |verified AS (
         |  SELECT id_a, id_b,
         |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |          / len(list_distinct(list_concat(a.s, b.s))), 6)
         |      AS jaccard
         |  FROM cand JOIN sh a ON id_a = a.doc_id
         |  JOIN sh b ON id_b = b.doc_id),
         |sided AS (
         |  SELECT v.id_a, v.id_b, v.jaccard,
         |    CASE WHEN ('0x' || substr(md5('split:' || v.id_a::VARCHAR),
         |      1, 8))::BIGINT % 5 = 4 THEN 'val' ELSE 'train' END AS sa,
         |    CASE WHEN ('0x' || substr(md5('split:' || v.id_b::VARCHAR),
         |      1, 8))::BIGINT % 5 = 4 THEN 'val' ELSE 'train' END AS sb
         |  FROM verified v WHERE v.jaccard >= 0.8)
         |SELECT
         |  CAST(CASE WHEN sa = 'train' THEN id_a ELSE id_b END
         |    AS BIGINT) AS train_id,
         |  CAST(CASE WHEN sa = 'val' THEN id_a ELSE id_b END
         |    AS BIGINT) AS val_id,
         |  jaccard
         |FROM sided WHERE sa <> sb
         |ORDER BY train_id, val_id""".stripMargin,

    "q294_ngram_contamination" ->
      s"""WITH l AS (SELECT doc_id,
         |    list_filter(string_split($normSql, ' '), x -> x <> '')
         |      AS l
         |  FROM documents),
         |tri AS MATERIALIZED (
         |  SELECT DISTINCT doc_id,
         |    l[pos] || ' ' || l[pos + 1] || ' ' || l[pos + 2] AS tri
         |  FROM (SELECT doc_id,
         |          unnest(generate_series(1, len(l) - 2)) AS pos, l
         |        FROM l WHERE len(l) >= 3)),
         |bench AS (SELECT DISTINCT tri FROM tri WHERE doc_id % 50 = 0),
         |ev AS (SELECT * FROM tri WHERE doc_id % 50 <> 0),
         |total AS (SELECT doc_id, count(*) AS n_tri FROM ev
         |          GROUP BY 1),
         |hits AS (SELECT ev.doc_id, count(*) AS n_overlap
         |  FROM ev JOIN bench ON bench.tri = ev.tri GROUP BY 1)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  CAST(CASE WHEN coalesce(t.n_tri, 0) > 0
         |    THEN (coalesce(h.n_overlap, 0) * 1000000) // t.n_tri
         |    ELSE 0 END AS BIGINT) AS overlap_ppm
         |FROM documents d
         |LEFT JOIN total t ON t.doc_id = d.doc_id
         |LEFT JOIN hits h ON h.doc_id = d.doc_id
         |WHERE d.doc_id % 50 <> 0
         |ORDER BY doc_id""".stripMargin,

    // q295: DuckDB cannot run the BPE fold, but it CAN independently
    // count the distinct normalized tokens — and the roundtrip
    // identity is pinned (n_roundtrip_ok = n_words, all_ok TRUE), so
    // a lossy segmentation hash-fails (the q254 pattern).
    "q295_bpe_roundtrip" ->
      s"""WITH w AS (SELECT DISTINCT unnest(list_filter(
         |    string_split($normSql, ' '), x -> x <> '')) AS word
         |  FROM documents)
         |SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
         |  TRUE AS all_ok
         |FROM w""".stripMargin,

    "q292_skew_audit" ->
      (Seq(("lineitem", "l_partkey"), ("orders", "o_custkey"),
        ("events", "user_id")).map { case (table, key) =>
        s"""SELECT * FROM (
           |WITH counts AS (SELECT $key AS k, count(*) AS cnt
           |  FROM $table GROUP BY 1),
           |ladder AS (SELECT cnt, count(*) AS nk FROM counts
           |  GROUP BY 1),
           |tot AS (SELECT count(*) AS n_keys, sum(cnt) AS total,
           |  max(cnt) AS max_cnt FROM counts),
           |ranked AS (SELECT cnt, nk, sum(nk) OVER (ORDER BY cnt
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |  AS ccum FROM ladder),
           |p50 AS (SELECT min(cnt) AS p50_cnt FROM ranked, tot
           |  WHERE ccum >= (n_keys + 1) // 2),
           |p99 AS (SELECT min(cnt) AS p99_cnt FROM ranked, tot
           |  WHERE ccum >= (99 * n_keys + 99) // 100)
           |SELECT '$key' AS audited, CAST(n_keys AS BIGINT) AS n_keys,
           |  CAST(total AS BIGINT) AS total_rows,
           |  CAST(max_cnt AS BIGINT) AS max_cnt,
           |  CAST(p50_cnt AS BIGINT) AS p50_cnt,
           |  CAST(p99_cnt AS BIGINT) AS p99_cnt,
           |  CAST((max_cnt::HUGEINT * 1000000) // total AS BIGINT)
           |    AS max_share_ppm
           |FROM tot, p50, p99)""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY audited"),

    "q293_quantile_effects" ->
      """WITH a AS (SELECT
        |    ('0x' || substr(md5('srm:' || o_orderkey::VARCHAR), 1, 8))
        |      ::BIGINT % 2 AS variant,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM orders),
        |ladder AS (SELECT variant, c, count(*) AS cnt FROM a
        |  GROUP BY 1, 2),
        |tot AS (SELECT variant, count(*) AS n FROM a GROUP BY 1),
        |ranked AS (SELECT l.variant, l.c, l.cnt,
        |    sum(l.cnt) OVER (PARTITION BY l.variant ORDER BY l.c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS ccum
        |  FROM ladder l),
        |qs AS (SELECT unnest([25, 50, 75]) AS q),
        |tiles AS (SELECT qs.q, r.variant, min(r.c) AS c
        |  FROM ranked r JOIN tot t ON t.variant = r.variant
        |  CROSS JOIN qs
        |  WHERE r.ccum >= (qs.q * t.n + 99) // 100
        |  GROUP BY 1, 2)
        |SELECT CAST(a1.q AS BIGINT) AS q,
        |  CAST(a1.c AS BIGINT) AS a_cents,
        |  CAST(b1.c AS BIGINT) AS b_cents,
        |  CAST(a1.c - b1.c AS BIGINT) AS diff_cents
        |FROM tiles a1 JOIN tiles b1 ON b1.q = a1.q
        |WHERE a1.variant = 0 AND b1.variant = 1
        |ORDER BY q""".stripMargin,

    "q290_srm_check" ->
      """WITH a AS (SELECT n_name AS nation,
        |    ('0x' || substr(md5('srm:' || o_orderkey::VARCHAR), 1, 8))
        |      ::BIGINT % 2 AS v
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey),
        |g AS (SELECT nation, count(*) AS n,
        |    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a
        |  FROM a GROUP BY 1)
        |SELECT nation, CAST(n AS BIGINT) AS n,
        |  CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n - n_a AS BIGINT) AS n_b,
        |  CAST(((2 * n_a - n)::HUGEINT * (2 * n_a - n) * 1000000)
        |    // n AS BIGINT) AS chi2_ppm,
        |  (((2 * n_a - n)::HUGEINT * (2 * n_a - n) * 1000000) // n)
        |    > 3841459 AS srm_suspect
        |FROM g ORDER BY nation""".stripMargin,

    // q291: exposure strictly before the first purchase in
    // (ts, event_id) order; subsets as a 16-row spine; weights are
    // |S|!·(3−|S|)! over 4! = 24, all integers.
    "q291_shapley_attribution" ->
      """WITH fp AS (SELECT user_id,
        |    min(struct_pack(ts := ts, eid := event_id)) AS fpk
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |bits AS (SELECT e.user_id,
        |    bit_or(CASE e.event_type WHEN 'click' THEN 1
        |      WHEN 'view' THEN 2 WHEN 'signup' THEN 4 ELSE 8 END)
        |      AS mask
        |  FROM events e JOIN fp ON fp.user_id = e.user_id
        |  WHERE e.event_type <> 'purchase'
        |    AND (e.ts < fp.fpk.ts
        |      OR (e.ts = fp.fpk.ts AND e.event_id < fp.fpk.eid))
        |  GROUP BY 1),
        |m AS (SELECT coalesce(b.mask, 0) AS mask, count(*) AS cnt
        |  FROM fp LEFT JOIN bits b ON b.user_id = fp.user_id
        |  GROUP BY 1),
        |ss AS (SELECT unnest(range(0, 16)) AS ss),
        |v AS MATERIALIZED (SELECT ss.ss, coalesce(sum(m.cnt), 0) AS v
        |  FROM ss LEFT JOIN m ON (m.mask & (15 - ss.ss)) = 0
        |  GROUP BY 1),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2),
        |  ('signup', 4), ('error', 8)) c(channel, bit)),
        |mar AS (SELECT c.channel,
        |    sum((CASE bit_count(v1.ss) WHEN 0 THEN 6 WHEN 1 THEN 2
        |      WHEN 2 THEN 2 ELSE 6 END) * (v2.v - v1.v)) AS phi_x24
        |  FROM ch c JOIN v v1 ON (v1.ss & c.bit) = 0
        |  JOIN v v2 ON v2.ss = (v1.ss | c.bit)
        |  GROUP BY 1)
        |SELECT channel, CAST(phi_x24 AS BIGINT) AS phi_x24,
        |  CAST((SELECT v FROM v WHERE ss = 15) AS BIGINT) AS v_full,
        |  CAST((SELECT v FROM v WHERE ss = 0) AS BIGINT) AS v_empty
        |FROM mar ORDER BY channel""".stripMargin,

    // q288: both HITS rounds unrolled with exact HUGEINT accumulation
    // and ONE final L∞ micros normalization, mirroring the Spark
    // side's DECIMAL(38) (q115's integer fixed-point discipline).
    "q288_hits" ->
      """WITH bip AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |a1 AS MATERIALIZED (SELECT p,
        |  count(*)::HUGEINT * 1000000 AS a FROM bip GROUP BY 1),
        |h1 AS MATERIALIZED (SELECT o, sum(a) AS h
        |  FROM bip JOIN a1 USING (p) GROUP BY 1),
        |a2 AS MATERIALIZED (SELECT p, sum(h) AS a2
        |  FROM bip JOIN h1 USING (o) GROUP BY 1),
        |n AS (SELECT p, count(*) AS n_orders FROM bip GROUP BY 1)
        |SELECT CAST(p AS BIGINT) AS part,
        |  CAST((a2 * 1000000) // (SELECT max(a2) FROM a2) AS BIGINT)
        |    AS authority_micros,
        |  CAST(n_orders AS BIGINT) AS n_orders
        |FROM a2 JOIN n USING (p)
        |ORDER BY authority_micros DESC, part LIMIT 20""".stripMargin,

    "q289_negative_sampling" ->
      """WITH pos AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |np AS (SELECT count(*) AS np FROM part),
        |j AS (SELECT unnest(range(0, 6)) AS j),
        |cand AS (SELECT od.o, j.j,
        |    ('0x' || substr(md5(od.o::VARCHAR || ':'
        |      || j.j::VARCHAR), 1, 8))::BIGINT % np.np AS cp
        |  FROM (SELECT DISTINCT o FROM pos) od
        |  CROSS JOIN j CROSS JOIN np),
        |surv AS (SELECT c.o, c.cp, min(c.j) AS slot
        |  FROM cand c LEFT JOIN pos ON pos.o = c.o AND pos.p = c.cp
        |  WHERE pos.p IS NULL GROUP BY 1, 2),
        |rk AS (SELECT o, cp, slot,
        |    row_number() OVER (PARTITION BY o ORDER BY slot) AS rn
        |  FROM surv)
        |SELECT CAST(o AS BIGINT) AS o_orderkey,
        |  CAST(cp AS BIGINT) AS neg_partkey,
        |  CAST(slot AS BIGINT) AS slot
        |FROM rk WHERE rn <= 2 ORDER BY o_orderkey, slot""".stripMargin,

    // q283: the oracle states the type-1 quantile DEFINITION with one
    // plain ladder window (DuckDB-side scale is not a constraint), so
    // the Spark side's two-level dollar-bracket scheme is verified
    // against the spec, not against itself.
    "q283_winsorize" ->
      """WITH cents AS MATERIALIZED (
        |  SELECT n_name AS nation,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey),
        |tot AS (SELECT nation, count(*) AS n,
        |    (count(*) + 19) // 20 AS k05,
        |    (19 * count(*) + 19) // 20 AS k95
        |  FROM cents GROUP BY 1),
        |ladder AS (SELECT nation, c, count(*) AS cnt FROM cents
        |           GROUP BY 1, 2),
        |cum AS (SELECT nation, c, cnt,
        |    sum(cnt) OVER (PARTITION BY nation ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS ccum
        |  FROM ladder),
        |p05 AS (SELECT cum.nation, min(c) AS p05_cents
        |  FROM cum JOIN tot USING (nation) WHERE ccum >= k05
        |  GROUP BY 1),
        |p95 AS (SELECT cum.nation, min(c) AS p95_cents
        |  FROM cum JOIN tot USING (nation) WHERE ccum >= k95
        |  GROUP BY 1)
        |SELECT c.nation, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(p05_cents) AS BIGINT) AS p05_cents,
        |  CAST(min(p95_cents) AS BIGINT) AS p95_cents,
        |  CAST(sum(c.c) AS BIGINT) AS sum_cents,
        |  CAST(sum(greatest(least(c.c, p95_cents), p05_cents))
        |    AS BIGINT) AS winsorized_cents
        |FROM cents c JOIN p05 USING (nation) JOIN p95 USING (nation)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q284_kendall_tau" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT n_name AS nation, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS y,
        |    count(*) AS cnt
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  GROUP BY 1, 2, 3),
        |pairs AS (SELECT g1.nation,
        |    sum(CASE WHEN g2.y > g1.y THEN g1.cnt * g2.cnt ELSE 0 END)
        |      AS nc,
        |    sum(CASE WHEN g2.y < g1.y THEN g1.cnt * g2.cnt ELSE 0 END)
        |      AS nd
        |  FROM grid g1 JOIN grid g2
        |    ON g2.nation = g1.nation AND g2.x > g1.x
        |  GROUP BY 1),
        |tot AS (SELECT nation, sum(cnt) AS n FROM grid GROUP BY 1)
        |SELECT nation, CAST(n AS BIGINT) AS n,
        |  CAST((nc::HUGEINT * 2000000)
        |    // (n::HUGEINT * (n - 1)) AS BIGINT) AS conc_ppm,
        |  CAST((nd::HUGEINT * 2000000)
        |    // (n::HUGEINT * (n - 1)) AS BIGINT) AS disc_ppm,
        |  CAST(((nc - nd)::HUGEINT * 2000000)
        |    // (n::HUGEINT * (n - 1)) AS BIGINT) AS tau_a_ppm
        |FROM pairs JOIN tot USING (nation) ORDER BY nation""".stripMargin,

    // q285: || propagates NULL through an incomplete tail trigram, so
    // WHERE trigram IS NOT NULL is exactly the Spark side's lead-2
    // null filter.
    "q285_event_trigrams" ->
      """WITH x AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM x),
        |t AS (SELECT event_type || '>' || lead(event_type, 1) OVER w2
        |    || '>' || lead(event_type, 2) OVER w2 AS trigram
        |  FROM s
        |  WINDOW w2 AS (PARTITION BY user_id, sess
        |    ORDER BY ts, event_id))
        |SELECT trigram, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM t WHERE trigram IS NOT NULL
        |GROUP BY 1 ORDER BY n_occurrences DESC, trigram
        |LIMIT 20""".stripMargin,

    // q286: stream ≡ batch by construction (BIT_OR is order-free), so
    // the oracle rebuilds the 32-word filter from the batch events.
    "q286_stream_bloom" ->
      """WITH j AS (SELECT unnest(range(0, 3)) AS j),
        |bits0 AS (
        |  SELECT ('0x' || substr(md5(j.j::VARCHAR || ':'
        |    || e.user_id::VARCHAR), 1, 8))::BIGINT % 1024 AS p
        |  FROM events e CROSS JOIN j),
        |words AS (SELECT p // 32 AS word_idx,
        |    bit_or(1::BIGINT << (p % 32)) AS bits
        |  FROM bits0 GROUP BY 1),
        |m AS (SELECT DISTINCT user_id FROM events),
        |probes AS (
        |  SELECT 'member' AS kind, user_id AS probe FROM m
        |  UNION ALL SELECT 'absent',
        |    user_id + (SELECT max(user_id) + 1 FROM events) FROM m),
        |pp AS (SELECT kind, probe,
        |    ('0x' || substr(md5(j.j::VARCHAR || ':'
        |      || probe::VARCHAR), 1, 8))::BIGINT % 1024 AS p
        |  FROM probes CROSS JOIN j),
        |pr AS (SELECT kind, probe,
        |    min(CASE WHEN (coalesce(w.bits, 0)
        |        & (1::BIGINT << (pp.p % 32)))
        |      = (1::BIGINT << (pp.p % 32)) THEN 1 ELSE 0 END) AS hit
        |  FROM pp LEFT JOIN words w ON w.word_idx = pp.p // 32
        |  GROUP BY 1, 2),
        |pc AS (SELECT sum(bit_count(bits)) AS bits_set FROM words)
        |SELECT kind, CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(sum(hit) AS BIGINT) AS n_positive,
        |  CAST((sum(hit)::HUGEINT * 1000000) // count(*) AS BIGINT)
        |    AS positive_ppm,
        |  CAST(min(bits_set) AS BIGINT) AS bits_set
        |FROM pr CROSS JOIN pc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q287_calibration_bins" ->
      """WITH li AS MATERIALIZED (
        |  SELECT o_custkey AS cust,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
        |rate AS (SELECT cust,
        |    CAST((sum(ret) * 1000000) // count(*) AS BIGINT)
        |      AS pred_ppm
        |  FROM li GROUP BY 1)
        |SELECT CAST(least(pred_ppm // 100000, 9) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pred_ppm) // count(*) AS BIGINT) AS avg_pred_ppm,
        |  CAST((sum(ret) * 1000000) // count(*) AS BIGINT)
        |    AS actual_ppm
        |FROM li JOIN rate USING (cust)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q282_forecast_backtest" ->
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
        |    ON b.nation = a.nation AND b.wk + 364 = a.wk)
        |SELECT nation,
        |  CAST(count(*) AS BIGINT) AS n_weeks,
        |  CAST(sum(abs(rev - rev52)) AS BIGINT) AS sae_cents,
        |  CAST(sum(rev) AS BIGINT) AS actual_cents,
        |  CAST((sum(abs(rev - rev52))::HUGEINT * 1000000)
        |    // sum(rev) AS BIGINT) AS wape_ppm
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    // q333: the oracle is the EXACT top-20 (the q112 contract) — the
    // streaming Misra-Gries state only prunes candidates, so
    // hash-equality proves the sketch's coverage held.
    "q333_stream_heavy_hitters" ->
      """SELECT event_type || ':' || (user_id % 13)::VARCHAR AS item,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1
        |ORDER BY n DESC, item LIMIT 20""".stripMargin)
}
