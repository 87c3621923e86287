package graft

/** DuckDB oracle twins for [[QueriesStats]] — exact integer arithmetic
  * end-to-end (HUGEINT on this side where the Spark side carries
  * DECIMAL(38)), every ranking given the same explicit total order.
  * The graph oracles rebuild the q274/q275 md5 point grid from first
  * principles (the established q275 pattern) so nothing Spark-side is
  * trusted.
  */
object OraclesStats {

  /** Shared md5 point grid + eps=1000 proximity edges (q275's oracle
    * geometry, verbatim — any drift here would break BOTH q276 and
    * q277 against their Spark twins, which is the point).
    */
  private val gridCtes =
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

  val oracles: Map[String, String] = Map(
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
        |  CAST(sum(c_r * (2 * cb + cnt + 1))
        |    - sum(c_r) * (sum(c_r) + 1) AS BIGINT) AS u_r_x2,
        |  CAST(2 * sum(c_r) * sum(c_n)
        |    - (sum(c_r * (2 * cb + cnt + 1))
        |       - sum(c_r) * (sum(c_r) + 1)) AS BIGINT) AS u_n_x2
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
        |    abs(n_days * s_t - t * s_n) AS stat
        |  FROM w WHERE t < n_days),
        |pick AS (SELECT nation, d, t, n_days, stat,
        |    row_number() OVER (PARTITION BY nation
        |      ORDER BY stat DESC, d) AS rn
        |  FROM st)
        |SELECT nation, CAST(d AS TIMESTAMP) AS cp_date, t,
        |  CAST(n_days AS BIGINT) AS n_days,
        |  CAST(stat AS BIGINT) AS stat
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
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)
}
