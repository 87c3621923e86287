package graft

/** DuckDB oracle SQL for [[QueriesCore]] — semantically identical ANSI
  * SQL over the same parquet tables, with types pinned to match Spark's
  * output schema exactly (BIGINT for counts, INTEGER where Spark emits
  * int, DOUBLE via decimal(18,2) for money sums, naive TIMESTAMP for
  * Spark's timestamp_ntz). DuckDB quirks handled: `regexp_replace`
  * needs the 'g' flag (Spark replaces globally by default); `length()`
  * and window `sum(int)` return BIGINT/HUGEINT and are cast.
  */
object OraclesCore {

  /** DuckDB twin of [[graft.sources.XmlSync.esc]]: jinja2-autoescape
    * entity replacement, `&` first so it never double-escapes, null →
    * empty like the Scala side. `chr(39)` keeps the single quote out
    * of SQL-literal quoting.
    */
  private def xesc(x: String): String =
    s"replace(replace(replace(replace(replace(coalesce($x,'')," +
      "'&','&amp;'),'<','&lt;'),'>','&gt;'),'\"','&#34;'),chr(39),'&#39;')"

  /** DuckDB twin of QueriesCore.gridPoints — the md5-prefix grid
    * projection shared by q256 and q257.
    */
  private val GridPointsCte: String =
    """p AS (
      |  SELECT c_custkey AS id,
      |    ('0x' || substr(md5('x:' || CAST(c_custkey AS VARCHAR)),
      |      1, 8))::BIGINT % 100000 AS x,
      |    ('0x' || substr(md5('y:' || CAST(c_custkey AS VARCHAR)),
      |      1, 8))::BIGINT % 100000 AS y
      |  FROM customer)""".stripMargin

  /** q257's oracle: the 3-core peel unrolled
    * [[QueriesCore.kCoreMaxRounds]] times over the brute-force edge
    * set — each round one degree aggregation restricted to the
    * previous survivors, exactly the definition the Spark loop
    * iterates (which REQUIRES convergence within the same bound, so
    * the two can never silently disagree on a non-converged state).
    */
  private def kCoreOracle: String = {
    val rounds = (1 to QueriesCore.kCoreMaxRounds + 1).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT adj.id, count(*) AS dg
         |  FROM adj
         |  JOIN s${i - 1} u ON u.id = adj.id
         |  JOIN s${i - 1} v ON v.id = adj.nb
         |  GROUP BY 1),
         |s$i AS MATERIALIZED (SELECT id FROM d$i WHERE dg >= 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH $GridPointsCte,
       |e AS MATERIALIZED (
       |  SELECT a.id AS ia, b.id AS ib
       |  FROM p a JOIN p b ON a.id < b.id
       |  WHERE (a.x - b.x) * (a.x - b.x)
       |    + (a.y - b.y) * (a.y - b.y) <= 4000000),
       |adj AS MATERIALIZED (SELECT ia AS id, ib AS nb FROM e
       |  UNION ALL SELECT ib, ia FROM e),
       |s0 AS (SELECT id FROM p),
       |$rounds
       |SELECT CAST(id AS BIGINT) AS id, CAST(dg AS BIGINT) AS core_degree
       |FROM d${QueriesCore.kCoreMaxRounds + 1} WHERE dg >= 3
       |ORDER BY id""".stripMargin
  }

  /** Shared by q255 (batch CUSUM) and q261 (its streaming twin —
    * streaming-maintained state must land exactly on the batch
    * definition): closed-form CUSUM over the daily event-count
    * series.
    */
  private val cusumOracle: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |t AS (SELECT count(*) AS nd, sum(n) AS tot FROM d),
      |p AS (
      |  SELECT day, n, t.nd, t.tot,
      |    sum(n * t.nd - t.tot) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      |  FROM d CROSS JOIN t),
      |m AS (
      |  SELECT day, n, nd, tot, pre,
      |    least(min(pre) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |      0) AS rmin
      |  FROM p)
      |SELECT CAST(day AS TIMESTAMP) AS day,
      |  CAST(n AS BIGINT) AS n_events,
      |  CAST(pre - rmin AS BIGINT) AS cusum_dev,
      |  (pre - rmin) * 5 > tot * nd AS alarm
      |FROM m ORDER BY day""".stripMargin

  /** Shared by q45 and q45b: a skew-salted join (either overload) must
    * produce exactly the plain inner join's result.
    */
  private val saltedJoinOracle: String =
    """WITH li AS (
      |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0
      |              ELSE l_orderkey END AS k, l_quantity
      |  FROM lineitem),
      |o AS (
      |  SELECT k, min(o_orderpriority) AS priority,
      |         count(*) AS n_orders
      |  FROM (SELECT CASE WHEN o_orderkey % 4 = 0 THEN 0
      |               ELSE o_orderkey END AS k, o_orderpriority
      |        FROM orders)
      |  GROUP BY k)
      |SELECT li.k, priority, n_orders,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_items
      |FROM li JOIN o USING (k)
      |GROUP BY li.k, priority, n_orders
      |ORDER BY li.k""".stripMargin

  /** q136's Morton interleave as portable SQL bit math: bit i of x
    * lands at position 2i, bit i of y at 2i+1 — disjoint powers of
    * two, so the sum equals the bitwise-or and both engines agree
    * exactly.
    */
  private def zInterleave(xc: String, yc: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($xc >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($yc >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  private val twapSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS v,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nt
      |  FROM events),
      |iv AS (
      |  SELECT user_id, v, nt - epoch_us(ts) AS dt
      |  FROM e WHERE nt IS NOT NULL)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(dt) AS BIGINT) AS span_micros,
      |  CAST(sum(CAST(v AS HUGEINT) * dt)
      |    // sum(dt) AS BIGINT) AS twap_micros
      |FROM iv GROUP BY 1 ORDER BY user_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // q298: both dim levels restated as CTEs over part; the CASE
    // mirrors the overrideable → known-pair → coalesce(override,
    // default) decision ladder exactly.
    "q298_jobcode_override" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_size FROM part),
        |d AS (SELECT p_brand,
        |    count(*) % 2 = 0 AS overrideable,
        |    CAST(sum(p_size) AS BIGINT) % 3 = 0 AS dflt
        |  FROM p GROUP BY 1),
        |pr AS (SELECT p_brand, p_size, count(*) AS cnt,
        |    CAST(sum(p_partkey) AS BIGINT) AS sk
        |  FROM p GROUP BY 1, 2),
        |k AS (SELECT p_brand, p_size, TRUE AS known FROM pr
        |  WHERE cnt >= 2),
        |o AS (SELECT p_brand, p_size, sk % 2 = 0 AS ov FROM pr
        |  WHERE cnt >= 2 AND sk % 3 = 0),
        |eff AS (SELECT p.p_brand,
        |    CASE WHEN d.overrideable AND k.known IS NOT NULL
        |      THEN coalesce(o.ov, d.dflt) ELSE d.dflt END AS e,
        |    d.overrideable AND k.known IS NOT NULL
        |      AND o.ov IS NOT NULL AS used_ov,
        |    d.overrideable AND k.known IS NULL AS unknown
        |  FROM p
        |  JOIN d USING (p_brand)
        |  LEFT JOIN k ON k.p_brand = p.p_brand AND k.p_size = p.p_size
        |  LEFT JOIN o ON o.p_brand = p.p_brand AND o.p_size = p.p_size)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_profiled,
        |  CAST(sum(CASE WHEN used_ov THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overridden,
        |  CAST(sum(CASE WHEN unknown THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unknown_pair
        |FROM eff GROUP BY 1 ORDER BY 1""".stripMargin,

    // q299: the per-uuid consumption verdict as a CTE, then the
    // family rollup — version ≡ 0 mod 7 marks the simulated
    // already-in-history rows on both sides.
    "q299_change_consumption" ->
      """WITH per AS (
        |  SELECT event_type AS family, user_id, count(*) AS n,
        |    max(event_id) AS maxv,
        |    sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
        |      AS already
        |  FROM events GROUP BY 1, 2)
        |SELECT family, CAST(sum(n) AS BIGINT) AS n_changes,
        |  CAST(count(*) AS BIGINT) AS n_consumed,
        |  CAST(sum(n - 1) AS BIGINT) AS n_stale,
        |  CAST(sum(already) AS BIGINT) AS n_already_in_hst,
        |  CAST(sum(n) - sum(already) AS BIGINT) AS n_new_hst,
        |  CAST(sum(maxv) AS BIGINT) AS consumed_version_sum
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // q300: the three origins stated as explicit UNION ALL branches
    // over the batch-flagged association rows (Spark fans the same
    // row out via a conditional-array explode — identical multiset).
    "q300_delete_recreate" ->
      """WITH batch AS (SELECT o_orderkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |old AS (SELECT l_orderkey, l_suppkey, l_linenumber,
        |    l_returnflag,
        |    l_orderkey IN (SELECT o_orderkey FROM batch) AS b
        |  FROM lineitem),
        |tagged AS (
        |  SELECT 'kept' AS origin, l_orderkey, l_suppkey, l_linenumber
        |    FROM old WHERE NOT b
        |  UNION ALL
        |  SELECT 'deleted', l_orderkey, l_suppkey, l_linenumber
        |    FROM old WHERE b
        |  UNION ALL
        |  SELECT 'recreated', l_orderkey, l_suppkey, l_linenumber
        |    FROM old WHERE b AND l_returnflag <> 'R')
        |SELECT origin, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_docs,
        |  CAST(sum(l_suppkey) AS BIGINT) AS supp_sum,
        |  CAST(sum(l_linenumber) AS BIGINT) AS line_sum
        |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,
    // q239: same transition counts, same (-count, dst) argmin model,
    // same eval fold.
    "q239_next_event_accuracy" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |t AS (
        |  SELECT prev AS src, event_type AS dst FROM ev
        |  WHERE prev IS NOT NULL),
        |c AS (SELECT src, dst, count(*) AS c FROM t GROUP BY 1, 2),
        |m AS (
        |  SELECT src, dst AS predicted,
        |    row_number() OVER (PARTITION BY src
        |      ORDER BY c DESC, dst) AS rk
        |  FROM c)
        |SELECT t.src, m.predicted,
        |  CAST(count(*) AS BIGINT) AS n_transitions,
        |  CAST(sum(CASE WHEN t.dst = m.predicted THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  CAST(sum(CASE WHEN t.dst = m.predicted THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS accuracy_micros
        |FROM t JOIN m ON t.src = m.src AND m.rk = 1
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q240: same doubling-and-wrapping quoting rules, byte for byte.
    // NULLs coalesce to '' before quoting (|| would null the line) and
    // a bare CR triggers quoting, both mirroring the Spark side.
    "q240_csv_export" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(lang, '') AS lang,
        |    coalesce(source, '') AS source, coalesce(text, '') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(doc_id AS VARCHAR) || ',' ||
        |  (CASE WHEN lang LIKE '%,%' OR lang LIKE '%"%'
        |      OR lang LIKE '%' || chr(10) || '%'
        |      OR lang LIKE '%' || chr(13) || '%'
        |    THEN '"' || replace(lang, '"', '""') || '"' ELSE lang END)
        |  || ',' ||
        |  (CASE WHEN source LIKE '%,%' OR source LIKE '%"%'
        |      OR source LIKE '%' || chr(10) || '%'
        |      OR source LIKE '%' || chr(13) || '%'
        |    THEN '"' || replace(source, '"', '""') || '"'
        |    ELSE source END)
        |  || ',' ||
        |  (CASE WHEN text LIKE '%,%' OR text LIKE '%"%'
        |      OR text LIKE '%' || chr(10) || '%'
        |      OR text LIKE '%' || chr(13) || '%'
        |    THEN '"' || replace(text, '"', '""') || '"' ELSE text END)
        |  AS csv_line
        |FROM d ORDER BY doc_id""".stripMargin,

    // q236: same ascending ordinal deciles and cross-multiplied
    // cumulative shares.
    "q236_lorenz_curve" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY x, o_custkey) AS rk,
        |    count(*) OVER () AS n
        |  FROM sp),
        |t AS (SELECT sum(x) AS t FROM sp),
        |g AS (
        |  SELECT CAST((rk - 1) * 10 // n AS INTEGER) AS decile,
        |    count(*) AS nd, sum(x) AS sd
        |  FROM r GROUP BY 1)
        |SELECT decile, CAST(nd AS BIGINT) AS n_customers,
        |  CAST(sd AS BIGINT) AS spend_cents,
        |  CAST(CAST(sum(sd) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000
        |    // t.t AS BIGINT) AS cum_share_micros
        |FROM g CROSS JOIN t ORDER BY decile""".stripMargin,

    // q237: identical two pinned step constants, integer walk, first
    // crossing.
    "q237_sprt" ->
      """WITH c AS (
        |  SELECT CAST(floor(ln(0.30 / 0.25) * 1000000.0) AS BIGINT)
        |      AS se,
        |    CAST(floor(ln(0.70 / 0.75) * 1000000.0) AS BIGINT) AS so,
        |    CAST(floor(ln(19.0) * 1000000.0) AS BIGINT) AS bd),
        |w AS (
        |  SELECT row_number() OVER (ORDER BY epoch_us(ts), event_id)
        |      AS rn,
        |    sum(CASE WHEN event_type = 'error' THEN c.se ELSE c.so END)
        |      OVER (ORDER BY epoch_us(ts), event_id
        |        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM events CROSS JOIN c),
        |f AS (
        |  SELECT rn, cum FROM w CROSS JOIN c
        |  WHERE cum >= c.bd OR cum <= -c.bd
        |  ORDER BY rn LIMIT 1),
        |l AS (SELECT rn, cum FROM w ORDER BY rn DESC LIMIT 1)
        |SELECT CAST(coalesce(f.rn, l.rn) AS BIGINT) AS n_obs,
        |  CAST(coalesce(f.cum, l.cum) AS BIGINT) AS llr_micros,
        |  CASE WHEN f.rn IS NULL THEN 'continue'
        |    WHEN f.cum >= c.bd THEN 'accept_h1'
        |    ELSE 'accept_h0' END AS decision
        |FROM l LEFT JOIN f ON true CROSS JOIN c""".stripMargin,

    // q238: same ordinal median and ceil-ordinal residual quantile.
    "q238_conformal_interval" ->
      """WITH sp AS (
        |  SELECT n.n_name, o.o_custkey,
        |    sum(CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS x
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY n_name
        |      ORDER BY x, o_custkey) AS rk,
        |    count(*) OVER (PARTITION BY n_name) AS n
        |  FROM sp),
        |med AS (
        |  SELECT n_name, x AS med, n FROM r WHERE rk = (n + 1) // 2),
        |res AS (
        |  SELECT sp.n_name, sp.o_custkey, abs(sp.x - med.med) AS rr,
        |    med.med, med.n
        |  FROM sp JOIN med ON sp.n_name = med.n_name),
        |rr AS (
        |  SELECT *, row_number() OVER (PARTITION BY n_name
        |    ORDER BY rr, o_custkey) AS rrk
        |  FROM res)
        |SELECT n_name, CAST(n AS BIGINT) AS n_customers,
        |  CAST(med AS BIGINT) AS median_cents,
        |  CAST(rr AS BIGINT) AS q90_resid_cents
        |FROM rr
        |WHERE rrk = least(((n + 1) * 9 + 9) // 10, n)
        |ORDER BY n_name""".stripMargin,

    // q235: same merged value ladder and cross-multiplied CDF gap.
    "q235_ks_test" ->
      """WITH o AS (
        |  SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS v,
        |    year(o_orderdate) <= 1997 AS early
        |  FROM orders),
        |pv AS (
        |  SELECT v, sum(CASE WHEN early THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN early THEN 0 ELSE 1 END) AS b
        |  FROM o GROUP BY 1),
        |c AS (
        |  SELECT v,
        |    sum(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
        |    sum(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
        |  FROM pv),
        |t AS (
        |  SELECT sum(CASE WHEN early THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN early THEN 0 ELSE 1 END) AS nb
        |  FROM o)
        |SELECT CAST(t.na AS BIGINT) AS n_early,
        |  CAST(t.nb AS BIGINT) AS n_late,
        |  CAST(max(abs(CAST(c.ca AS HUGEINT) * t.nb
        |      - CAST(c.cb AS HUGEINT) * t.na)) * 1000000
        |    // (CAST(t.na AS HUGEINT) * t.nb) AS BIGINT) AS ks_micros
        |FROM c CROSS JOIN t
        |GROUP BY t.na, t.nb""".stripMargin,

    // q233: same edge build; the traversal replayed as a hop-bounded
    // recursive CTE folded to min hop.
    "q233_bfs_hops" ->
      """WITH RECURSIVE b AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |f AS (
        |  SELECT l_partkey FROM b GROUP BY 1 HAVING count(*) >= 25),
        |p AS (SELECT b.* FROM b JOIN f USING (l_partkey)),
        |pr AS (
        |  SELECT a.l_partkey AS pa, c.l_partkey AS pb
        |  FROM p a JOIN p c ON a.l_orderkey = c.l_orderkey
        |    AND a.l_partkey < c.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |e AS (
        |  SELECT pa AS src, pb AS dst FROM pr
        |  UNION ALL SELECT pb, pa FROM pr),
        |bfs AS (
        |  SELECT DISTINCT src AS id, 0 AS hop FROM e
        |  WHERE src % 10 = 0
        |  UNION ALL
        |  SELECT e.dst, b.hop + 1 FROM bfs b
        |  JOIN e ON e.src = b.id WHERE b.hop < 4)
        |SELECT CAST(id AS BIGINT) AS part_id,
        |  CAST(min(hop) AS BIGINT) AS hop
        |FROM bfs GROUP BY 1 ORDER BY 1""".stripMargin,

    // q231: same integer tie-averaged rank sum.
    "q231_auc_exact" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS score,
        |    max(CASE WHEN o_orderdate >= DATE '2001-01-01'
        |      THEN 1 ELSE 0 END) AS y
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT *, rank() OVER (ORDER BY score) AS rk,
        |    count(*) OVER (PARTITION BY score) AS tc
        |  FROM sp),
        |m AS (
        |  SELECT sum(CASE WHEN y = 1 THEN 2 * rk + tc - 1 END) AS sr2,
        |    sum(y) AS np, sum(1 - y) AS nn
        |  FROM r)
        |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |  CAST((CAST(sr2 AS HUGEINT) - CAST(np AS HUGEINT) * (np + 1))
        |    * 1000000 // (CAST(2 AS HUGEINT) * np * nn) AS BIGINT)
        |    AS auc_micros
        |FROM m""".stripMargin,

    // q232: same ordinal deciles and cross-multiplied rates.
    "q232_decile_lift" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS score,
        |    max(CASE WHEN o_orderdate >= DATE '2001-01-01'
        |      THEN 1 ELSE 0 END) AS y
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY score DESC, o_custkey) AS rk,
        |    count(*) OVER () AS n
        |  FROM sp),
        |d AS (
        |  SELECT CAST((rk - 1) * 10 // n AS INTEGER) AS decile, y
        |  FROM r),
        |t AS (SELECT count(*) AS nn, sum(y) AS np FROM sp),
        |g AS (
        |  SELECT decile, count(*) AS nd, sum(y) AS pd FROM d GROUP BY 1),
        |c AS (
        |  SELECT g.*, t.nn, t.np,
        |    sum(pd) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |      AS cp
        |  FROM g CROSS JOIN t)
        |SELECT decile, CAST(nd AS BIGINT) AS n_customers,
        |  CAST(pd AS BIGINT) AS n_pos,
        |  CAST(pd * 1000000 // nd AS BIGINT) AS response_micros,
        |  CAST(CAST(pd AS HUGEINT) * nn * 1000000
        |    // (CAST(nd AS HUGEINT) * np) AS BIGINT) AS lift_micros,
        |  CAST(cp * 1000000 // np AS BIGINT) AS cum_gain_micros
        |FROM c ORDER BY decile""".stripMargin,

    // q228: estimate from count-table products; actual from the real
    // join; both exact.
    "q228_join_size_stats" ->
      """WITH a AS (SELECT l_partkey FROM lineitem),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
        |ca AS (SELECT l_partkey, count(*) AS c FROM a GROUP BY 1),
        |cb AS (SELECT l_partkey, count(*) AS c FROM b GROUP BY 1),
        |ct AS (
        |  SELECT ca.l_partkey, ca.c * cb.c AS p
        |  FROM ca JOIN cb ON ca.l_partkey = cb.l_partkey),
        |t5 AS (
        |  SELECT p FROM ct ORDER BY p DESC, l_partkey LIMIT 5)
        |SELECT CAST((SELECT sum(p) FROM ct) AS BIGINT) AS est,
        |  CAST((SELECT count(*) FROM a JOIN b USING (l_partkey))
        |    AS BIGINT) AS actual,
        |  CAST((SELECT sum(p) FROM t5) AS BIGINT) AS top5_contrib,
        |  CAST((SELECT min(p) FROM t5) AS BIGINT) AS top5_min""".stripMargin,

    // q229: same banded business-key equi-join.
    "q229_dup_invoices" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) // 100000 AS band
        |  FROM orders)
        |SELECT a.o_custkey, a.band AS amount_band,
        |  a.o_orderkey AS k1, b.o_orderkey AS k2,
        |  CAST(abs(date_diff('day', a.d, b.d)) AS BIGINT) AS day_gap
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey AND a.band = b.band
        |  AND a.o_orderkey < b.o_orderkey
        |ORDER BY a.o_custkey, k1, k2""".stripMargin,

    // q230: same fixed bins + Laplace smoothing, per-bin pinned term
    // micros.
    "q230_psi_drift" ->
      """WITH o AS (
        |  SELECT least(CAST(CAST(CAST(CAST(o_totalprice
        |      AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS BIGINT)
        |      // 6000000 AS INTEGER), 9) AS bin,
        |    year(o_orderdate) <= 1997 AS early
        |  FROM orders),
        |c AS (
        |  SELECT bin,
        |    sum(CASE WHEN early THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN early THEN 0 ELSE 1 END) AS b
        |  FROM o GROUP BY 1),
        |n AS (
        |  SELECT sum(CASE WHEN early THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN early THEN 0 ELSE 1 END) AS nb
        |  FROM o),
        |f AS (
        |  SELECT s.bin, coalesce(c.a, 0) AS a, coalesce(c.b, 0) AS b,
        |    n.na, n.nb
        |  FROM (SELECT unnest(range(0, 10)) AS bin) s
        |  LEFT JOIN c ON c.bin = s.bin CROSS JOIN n),
        |x AS (
        |  SELECT bin, a, b,
        |    CAST(a + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE) AS pa,
        |    CAST(b + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE) AS pb
        |  FROM f)
        |SELECT CAST(bin AS INTEGER) AS bin, CAST(a AS BIGINT) AS n_early,
        |  CAST(b AS BIGINT) AS n_late,
        |  CAST(floor((pa - pb) * ln(pa / pb) * 1000000.0) AS BIGINT)
        |    AS psi_term_micros
        |FROM x ORDER BY bin""".stripMargin,

    // q224: same per-column row_number ranks (tie order is irrelevant
    // to the rank→value mapping), same integer rank-wise mean.
    "q224_quantile_norm" ->
      """WITH li AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS p,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d
        |  FROM lineitem),
        |rq AS (SELECT row_number() OVER (ORDER BY q) AS rank, q AS v
        |  FROM li),
        |rp AS (SELECT row_number() OVER (ORDER BY p) AS rank, p AS v
        |  FROM li),
        |rd AS (SELECT row_number() OVER (ORDER BY d) AS rank, d AS v
        |  FROM li)
        |SELECT CAST(rq.rank AS BIGINT) AS rank,
        |  CAST(((rq.v + rp.v + rd.v) * 1000000) // 3 AS BIGINT)
        |    AS ref_micros
        |FROM rq JOIN rp USING (rank) JOIN rd USING (rank)
        |ORDER BY rank""".stripMargin,

    // q225: same cohort fold, same integer month arithmetic, same
    // cumulative window and per-capita DIV.
    "q225_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |      AS m,
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS c
        |  FROM orders),
        |ch AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
        |sz AS (SELECT cm, count(*) AS sz FROM ch GROUP BY 1),
        |cell AS (
        |  SELECT ch.cm, o.m - ch.cm AS "offset", sum(o.c) AS rev
        |  FROM o JOIN ch ON o.o_custkey = ch.o_custkey
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cm, "offset",
        |    sum(rev) OVER (PARTITION BY cm ORDER BY "offset"
        |      ROWS UNBOUNDED PRECEDING) AS cumrev
        |  FROM cell)
        |SELECT cm AS cohort_month, "offset",
        |  CAST(sz.sz AS BIGINT) AS cohort_size,
        |  CAST(cumrev AS BIGINT) AS cum_rev_cents,
        |  CAST(CAST(cumrev AS HUGEINT) * 1000000 // sz.sz AS BIGINT)
        |    AS ltv_micros
        |FROM cum JOIN sz USING (cm)
        |ORDER BY cohort_month, "offset"""".stripMargin,

    // q226: same conditional-min anchors and 24 h windows.
    "q226_strict_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |s1 AS (
        |  SELECT user_id, min(t) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.t) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.t > s1.t1
        |    AND e.t <= s1.t1 + 86400000000
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.t) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.t > s2.t2
        |    AND e.t <= s2.t2 + 86400000000
        |  GROUP BY 1)
        |SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
        |  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view_24h,
        |  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_24h
        |""".stripMargin,

    // q227: same two-aggregate flag/product pipeline, 10 pairs, no
    // pairwise join.
    "q227_segment_overlap" -> {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")
      val flagCols = segs.map(g =>
        s"max(CASE WHEN c_mktsegment = '$g' THEN 1 ELSE 0 END) AS f_$g")
        .mkString(",\n        |    ")
      val unions = segs.combinations(2).toSeq.map { case Seq(a, b) =>
        s"""SELECT '$a' AS seg_a, '$b' AS seg_b,
           |  CAST(sum(f_$a) AS BIGINT) AS n_a,
           |  CAST(sum(f_$b) AS BIGINT) AS n_b,
           |  CAST(sum(f_$a * f_$b) AS BIGINT) AS n_both,
           |  CAST(sum(f_$a * f_$b) * 1000000
           |    // (sum(f_$a) + sum(f_$b) - sum(f_$a * f_$b))
           |    AS BIGINT) AS jaccard_micros
           |FROM fl""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH fl AS (
         |  SELECT l.l_partkey,
         |    $flagCols
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1)
         |$unions
         |ORDER BY seg_a, seg_b""".stripMargin
    },

    // q220: the oracle is the PLAIN join — proving the Bloom prune
    // changed nothing.
    "q220_runtime_bloom_join" ->
      """SELECT s.s_suppkey, s.s_name,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |    * 100 AS DECIMAL(18,0)) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE s.s_nationkey = 7
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q221: same planted drift, same md5-prefix digests, same
    // chunk-summary-then-drill protocol.
    "q221_table_reconcile" ->
      """WITH a AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS c
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 1009 = 0 THEN c + 1 ELSE c END AS c
        |  FROM a WHERE o_orderkey % 2003 <> 0),
        |pa AS (
        |  SELECT o_orderkey, o_orderkey // 1000 AS chunk,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |      || CAST(c AS VARCHAR)), 1, 8))::BIGINT AS d
        |  FROM a),
        |pb AS (
        |  SELECT o_orderkey, o_orderkey // 1000 AS chunk,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |      || CAST(c AS VARCHAR)), 1, 8))::BIGINT AS d
        |  FROM b),
        |ca AS (SELECT chunk, count(*) AS na, sum(d) AS da
        |  FROM pa GROUP BY 1),
        |cb AS (SELECT chunk, count(*) AS nb, sum(d) AS db
        |  FROM pb GROUP BY 1),
        |bad AS (
        |  SELECT coalesce(ca.chunk, cb.chunk) AS chunk
        |  FROM ca FULL OUTER JOIN cb ON ca.chunk = cb.chunk
        |  WHERE coalesce(na, -1) <> coalesce(nb, -1)
        |    OR coalesce(da, -1) <> coalesce(db, -1)),
        |ra AS (SELECT pa.* FROM pa JOIN bad USING (chunk)),
        |rb AS (SELECT pb.* FROM pb JOIN bad USING (chunk))
        |SELECT coalesce(ra.o_orderkey, rb.o_orderkey) AS o_orderkey,
        |  CAST(ra.chunk AS BIGINT) AS chunk,
        |  CASE WHEN rb.o_orderkey IS NULL THEN 'only_a'
        |    WHEN ra.o_orderkey IS NULL THEN 'only_b'
        |    ELSE 'changed' END AS status
        |FROM ra FULL OUTER JOIN rb ON ra.o_orderkey = rb.o_orderkey
        |WHERE ra.d IS NULL OR rb.d IS NULL OR ra.d <> rb.d
        |ORDER BY 1""".stripMargin,

    // q222: same daily fold and cross-multiplied index.
    "q222_seasonal_index" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS r
        |  FROM orders GROUP BY 1),
        |a AS (SELECT count(*) AS n, sum(r) AS t FROM d)
        |SELECT CAST(isodow(day) AS INTEGER) AS isodow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(r) AS BIGINT) AS rev_cents,
        |  CAST((CAST(sum(r) AS HUGEINT) * max(a.n) * 1000000)
        |    // (CAST(count(*) AS HUGEINT) * max(a.t)) AS BIGINT)
        |    AS seasonal_index_micros
        |FROM d CROSS JOIN a
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q217: the same integer recurrence replayed as a recursive CTE
    // (row rn joins to rn+1), floor-division per step.
    "q217_ewma" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |o AS (
        |  SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |r AS (
        |  SELECT event_type, rn, n, y * 1000000 AS s
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.event_type, o.rn, o.n,
        |    (o.y * 1000000 + 3 * r.s) // 4
        |  FROM r JOIN o ON o.event_type = r.event_type
        |    AND o.rn = r.rn + 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(s AS BIGINT) AS ewma_micros
        |FROM r WHERE rn = n ORDER BY event_type""".stripMargin,

    // q218: same per-row floored ln micros, same single
    // re-exponentiation from the integer mean-log.
    "q218_log_stats" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(floor(ln(CAST(CAST(CAST(CAST(o_totalprice
        |      AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS BIGINT)
        |      AS DOUBLE)) * 1000000.0) AS BIGINT) AS lnm
        |  FROM orders),
        |g AS (
        |  SELECT n.n_name, count(*) AS n_orders, sum(lnm) AS slm
        |  FROM o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(slm AS BIGINT) AS sum_ln_micros,
        |  CAST(floor(exp(CAST(CAST(slm AS HUGEINT) // n_orders
        |    AS DOUBLE) / 1000000.0) * 100.0) AS BIGINT)
        |    AS geo_mean_x100
        |FROM g ORDER BY n_name""".stripMargin,

    // q219: same cumulative half-open intervals, same overlap
    // allocation.
    "q219_fifo_match" ->
      """WITH r AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_quantity AS BIGINT)) OVER w
        |      - CAST(l_quantity AS BIGINT) AS r_start,
        |    sum(CAST(l_quantity AS BIGINT)) OVER w AS r_end
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING)),
        |s AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_quantity AS BIGINT)) OVER w
        |      - CAST(l_quantity AS BIGINT) AS s_start,
        |    sum(CAST(l_quantity AS BIGINT)) OVER w AS s_end
        |  FROM lineitem WHERE l_returnflag <> 'R'
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT r.l_partkey, CAST(count(*) AS BIGINT) AS n_matches,
        |  CAST(sum(least(r.r_end, s.s_end)
        |    - greatest(r.r_start, s.s_start)) AS BIGINT) AS matched_qty
        |FROM r JOIN s ON r.l_partkey = s.l_partkey
        |  AND r.r_start < s.s_end AND s.s_start < r.r_end
        |GROUP BY 1 ORDER BY r.l_partkey""".stripMargin,

    // q213: same generated day spine (both ends inclusive), same ISO
    // weekday fold.
    "q213_calendar_spine" ->
      """WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS c
        |  FROM orders),
        |pd AS (
        |  SELECT day, count(*) AS n, sum(c) AS r FROM o GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM o),
        |sp AS (
        |  SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b)
        |SELECT CAST(isodow(sp.day) AS INTEGER) AS isodow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN pd.n IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_order_days,
        |  CAST(coalesce(sum(pd.n), 0) AS BIGINT) AS n_orders,
        |  CAST(coalesce(sum(pd.r), 0) AS BIGINT) AS rev_cents
        |FROM sp LEFT JOIN pd ON sp.day = pd.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q214: same rank ordinals, same integer interpolation.
    "q214_percentile_cont" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS c
        |  FROM lineitem),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY c) AS rn
        |  FROM li),
        |st AS (SELECT l_returnflag, max(rn) AS n FROM r GROUP BY 1),
        |ps AS (
        |  SELECT st.l_returnflag, p.p, st.n,
        |    CAST(p.p AS BIGINT) * (st.n - 1) AS pos
        |  FROM st CROSS JOIN (SELECT unnest([25, 50, 75, 90]) AS p) p),
        |e AS (
        |  SELECT *, pos // 100 AS lo, pos % 100 AS rem,
        |    CASE WHEN pos % 100 = 0 THEN pos // 100 + 1
        |      ELSE pos // 100 + 2 END AS hi_rn
        |  FROM ps)
        |SELECT e.l_returnflag, CAST(e.p AS INTEGER) AS p,
        |  CAST(e.n AS BIGINT) AS n,
        |  CAST(rl.c * 1000000 +
        |    ((rh.c - rl.c) * 1000000 * e.rem) // 100 AS BIGINT)
        |    AS value_micros
        |FROM e
        |JOIN r rl ON rl.l_returnflag = e.l_returnflag
        |  AND rl.rn = e.lo + 1
        |JOIN r rh ON rh.l_returnflag = e.l_returnflag
        |  AND rh.rn = e.hi_rn
        |ORDER BY e.l_returnflag, e.p""".stripMargin,

    // q215: same distinct edge list, HUGEINT moments, pinned double
    // r².
    "q215_degree_assortativity" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
        |ds AS (SELECT l_suppkey, count(*) AS d FROM e GROUP BY 1),
        |dp AS (SELECT l_partkey, count(*) AS d FROM e GROUP BY 1),
        |m AS (
        |  SELECT count(*) AS n, sum(ds.d) AS sx, sum(dp.d) AS sy,
        |    sum(CAST(ds.d AS HUGEINT) * dp.d) AS sxy,
        |    sum(CAST(ds.d AS HUGEINT) * ds.d) AS sxx,
        |    sum(CAST(dp.d AS HUGEINT) * dp.d) AS syy
        |  FROM e JOIN ds USING (l_suppkey) JOIN dp USING (l_partkey)),
        |x AS (
        |  SELECT *,
        |    CAST(CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS d1,
        |    CAST(CAST(n AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS d2
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n_edges,
        |  CAST(sx AS BIGINT) AS sum_dsupp,
        |  CAST(sy AS BIGINT) AS sum_dpart,
        |  CAST(sxy AS BIGINT) AS sum_dd,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS r_sign,
        |  CAST(floor(num * num / (d1 * d2) * 1000000.0) AS BIGINT)
        |    AS r2_micros
        |FROM x""".stripMargin,

    // q216: same micro-floored values, same lead-defined intervals,
    // one DIV at the end. q223 (the streaming TWAP) shares this SQL
    // verbatim: the stream must reproduce the batch sweep exactly.
    "q216_twap" -> twapSql,
    "q223_stream_twap" -> twapSql,

    
    // q210: same ordinal symbols, same lag/cumsum run numbering.
    "q210_sax_runs" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT day,
        |    CAST((row_number() OVER (ORDER BY y, day) - 1) * 4
        |      // count(*) OVER () AS INTEGER) AS symbol
        |  FROM d),
        |c AS (
        |  SELECT *, CASE WHEN lag(symbol) OVER (ORDER BY day) IS NULL
        |      OR symbol <> lag(symbol) OVER (ORDER BY day)
        |    THEN 1 ELSE 0 END AS chg
        |  FROM s),
        |r AS (
        |  SELECT *, sum(chg) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM c)
        |SELECT CAST(run_id AS BIGINT) AS run_id,
        |  CAST(min(symbol) AS INTEGER) AS symbol,
        |  CAST(min(day) AS TIMESTAMP) AS start_day,
        |  CAST(max(day) AS TIMESTAMP) AS end_day,
        |  CAST(count(*) AS BIGINT) AS n_days
        |FROM r GROUP BY run_id ORDER BY run_id""".stripMargin,

    // q211: same transition counts and six unrolled integer-micro
    // power-iteration rounds (the q115 fixed-point convention).
    "q211_markov_stationary" -> {
      val round = (i: Int) =>
        s"""p$i AS (
           |  SELECT e.dst AS event_type,
           |    sum(CAST(p.pi_micros * e.c AS HUGEINT) // e.s)
           |      AS pi_micros
           |  FROM e JOIN p${i - 1} p ON e.src = p.event_type
           |  GROUP BY 1)"""
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev
         |  FROM events),
         |t AS (
         |  SELECT prev AS src, event_type AS dst, count(*) AS c
         |  FROM ev WHERE prev IS NOT NULL GROUP BY 1, 2),
         |e AS (
         |  SELECT t.src, t.dst, t.c, s.s
         |  FROM t JOIN (SELECT src, sum(c) AS s FROM t GROUP BY 1) s
         |    ON t.src = s.src),
         |p0 AS (
         |  SELECT DISTINCT src AS event_type,
         |    CAST(1000000 // 5 AS BIGINT) AS pi_micros
         |  FROM e),
         |${(1 to 6).map(round).mkString(",\n")}
         |SELECT event_type, CAST(pi_micros AS BIGINT) AS pi_micros
         |FROM p6 ORDER BY event_type""".stripMargin
    },

    // q212: same cross-multiplied label, same per-term floored-micros
    // entropy, integer term sums.
    "q212_info_gain" -> {
      val term = (m: String, base: String) =>
        s"""CASE WHEN $m = 0 THEN 0 ELSE CAST(floor(
           |    CAST($m AS DOUBLE) * ln(CAST($base AS DOUBLE)
           |      / CAST($m AS DOUBLE))
           |    / (CAST(nn AS DOUBLE) * ln(2.0)) * 1000000.0)
           |  AS BIGINT) END""".stripMargin
      val gain = (f: String) =>
        s"""SELECT '$f' AS feature, CAST(max(nn) AS BIGINT) AS n,
           |  CAST(max(${term("n1", "nn")} +
           |    ${term("nn - n1", "nn")}) AS BIGINT) AS h_y_micros,
           |  CAST(sum(${term("nx1", "nx")} +
           |    ${term("nx - nx1", "nx")}) AS BIGINT)
           |    AS h_y_given_x_micros,
           |  CAST(max(${term("n1", "nn")} + ${term("nn - n1", "nn")})
           |    - sum(${term("nx1", "nx")} + ${term("nx - nx1", "nx")})
           |    AS BIGINT) AS info_gain_micros
           |FROM (
           |  SELECT CAST($f AS VARCHAR) AS x, count(*) AS nx,
           |    sum(y) AS nx1, max(nn) AS nn, max(n1) AS n1
           |  FROM lab GROUP BY 1) g"""
      s"""WITH c AS (
         |  SELECT c_mktsegment, c_nationkey,
         |    CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
         |      AS DECIMAL(18,0)) AS BIGINT) AS cents
         |  FROM customer),
         |tot AS (SELECT count(*) AS nn, sum(cents) AS t FROM c),
         |lab0 AS (
         |  SELECT c.*, tot.nn, tot.t,
         |    CASE WHEN c.cents * tot.nn > tot.t THEN 1 ELSE 0 END AS y
         |  FROM c CROSS JOIN tot),
         |lab AS (
         |  SELECT *, (SELECT sum(y) FROM lab0) AS n1 FROM lab0)
         |${gain("c_mktsegment")}
         |UNION ALL
         |${gain("c_nationkey")}
         |ORDER BY feature""".stripMargin
    },

    // q207: same cross-multiplied above-positive-average cut, same
    // anti join, same country-code rollup.
    "q207_idle_balance" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS cents
        |  FROM customer),
        |p AS (
        |  SELECT sum(cents) AS sp, count(*) AS np
        |  FROM c WHERE cents > 0)
        |SELECT c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(cents) AS BIGINT) AS total_bal_cents
        |FROM c CROSS JOIN p
        |WHERE c.cents * p.np > p.sp
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= DATE '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q208: the same dual-role nation join and decimal(18,4) revenue.
    "q208_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        |  CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= DATE '1995-01-01'
        |  AND l.l_shipdate < DATE '1997-01-01'
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // q209: same rank / tie-inclusive RANGE count, same DIV fixed
    // point.
    "q209_percent_rank" ->
      """WITH c AS (
        |  SELECT c_custkey, n.n_name,
        |    CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS bal_cents
        |  FROM customer
        |  JOIN nation n ON c_nationkey = n.n_nationkey),
        |w AS (
        |  SELECT *,
        |    rank() OVER (PARTITION BY n_name ORDER BY bal_cents) AS rnk,
        |    count(*) OVER (PARTITION BY n_name) AS n,
        |    count(*) OVER (PARTITION BY n_name ORDER BY bal_cents
        |      RANGE UNBOUNDED PRECEDING) AS le
        |  FROM c)
        |SELECT c_custkey, n_name, bal_cents, CAST(rnk AS BIGINT) AS rnk,
        |  CAST(CASE WHEN n = 1 THEN 0
        |    ELSE (rnk - 1) * 1000000 // (n - 1) END AS BIGINT)
        |    AS pct_rank_micros,
        |  CAST(le * 1000000 // n AS BIGINT) AS cume_dist_micros
        |FROM w ORDER BY n_name, bal_cents, c_custkey""".stripMargin,

    // q203: same lifetime fold in elapsed hours, same 24-hour
    // censoring horizon, same descending-cumulative risk counts.
    "q203_survival" ->
      """WITH per AS (
        |  SELECT user_id, min(ts) AS f, max(ts) AS l
        |  FROM events GROUP BY 1),
        |h AS (SELECT max(l) AS h FROM per),
        |lab AS (
        |  SELECT CAST((epoch_us(l) - epoch_us(f)) // 3600000000
        |      AS BIGINT) AS dur_hours,
        |    l < h.h - INTERVAL 24 HOUR AS died
        |  FROM per CROSS JOIN h),
        |pd AS (
        |  SELECT dur_hours,
        |    sum(CASE WHEN died THEN 1 ELSE 0 END) AS deaths,
        |    sum(CASE WHEN died THEN 0 ELSE 1 END) AS censored,
        |    count(*) AS n
        |  FROM lab GROUP BY 1),
        |r AS (
        |  SELECT *, sum(n) OVER (ORDER BY dur_hours DESC
        |    ROWS UNBOUNDED PRECEDING) AS n_risk
        |  FROM pd)
        |SELECT dur_hours, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(deaths AS BIGINT) AS deaths,
        |  CAST(censored AS BIGINT) AS censored,
        |  CAST(CAST(deaths * 1000000 AS HUGEINT) // n_risk AS BIGINT)
        |    AS hazard_micros
        |FROM r WHERE deaths > 0 ORDER BY dur_hours""".stripMargin,

    // q204: same daily fold, same row-lag pairs, same moment sums and
    // pinned double r².
    "q204_autocorr" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT 1 AS lag, y,
        |    lag(y, 1) OVER (ORDER BY day) AS p FROM d
        |  UNION ALL
        |  SELECT 7, y, lag(y, 7) OVER (ORDER BY day) FROM d),
        |m AS (
        |  SELECT lag, count(*) AS n, sum(y) AS sy, sum(p) AS sp,
        |    sum(CAST(y AS HUGEINT) * p) AS syp,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(p AS HUGEINT) * p) AS spp
        |  FROM l WHERE p IS NOT NULL GROUP BY 1),
        |x AS (
        |  SELECT lag, n, sy, sp, syp, syy, spp,
        |    CAST(CAST(n AS HUGEINT) * syp
        |      - CAST(sy AS HUGEINT) * sp AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS d1,
        |    CAST(CAST(n AS HUGEINT) * spp
        |      - CAST(sp AS HUGEINT) * sp AS DOUBLE) AS d2
        |  FROM m)
        |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
        |  CAST(sy AS BIGINT) AS sum_y, CAST(sp AS BIGINT) AS sum_prev,
        |  CAST(syp AS BIGINT) AS sum_yp, CAST(syy AS BIGINT) AS sum_y2,
        |  CAST(spp AS BIGINT) AS sum_prev2,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS r_sign,
        |  CAST(floor(num * num / (d1 * d2) * 1000000.0) AS BIGINT)
        |    AS r2_micros
        |FROM x ORDER BY lag""".stripMargin,

    // q205: same rank cut, string_agg in the same total rank order.
    "q205_listagg" ->
      """WITH r AS (
        |  SELECT c_mktsegment, c_name,
        |    CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY rn) AS top5_names,
        |  CAST(sum(cents) AS BIGINT) AS top5_bal_cents
        |FROM r WHERE rn <= 5
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    // q199: identical integer quantization (whole dollars via floor
    // division, basis points), HUGEINT sufficient statistics, and the
    // same pinned double expression for r²·10⁶.
    "q199_corr_ingredients" ->
      """WITH b AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) // 100 AS p,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d
        |  FROM lineitem),
        |m AS (
        |  SELECT count(*) AS n,
        |    sum(q) AS s_q, sum(p) AS s_p, sum(d) AS s_d,
        |    sum(CAST(q AS HUGEINT) * q) AS ss_q,
        |    sum(CAST(p AS HUGEINT) * p) AS ss_p,
        |    sum(CAST(d AS HUGEINT) * d) AS ss_d,
        |    sum(CAST(q AS HUGEINT) * p) AS sp_qp,
        |    sum(CAST(q AS HUGEINT) * d) AS sp_qd,
        |    sum(CAST(p AS HUGEINT) * d) AS sp_pd
        |  FROM b),
        |u AS (
        |  SELECT 'qty_price' AS pair, n, s_q AS sum_x, s_p AS sum_y,
        |    sp_qp AS sum_xy, ss_q AS sum_x2, ss_p AS sum_y2,
        |    CAST(CAST(n AS HUGEINT) * sp_qp
        |      - CAST(s_q AS HUGEINT) * s_p AS DOUBLE) AS num,
        |    CAST(CAST(n AS HUGEINT) * ss_q
        |      - CAST(s_q AS HUGEINT) * s_q AS DOUBLE) AS den1,
        |    CAST(CAST(n AS HUGEINT) * ss_p
        |      - CAST(s_p AS HUGEINT) * s_p AS DOUBLE) AS den2
        |  FROM m
        |  UNION ALL
        |  SELECT 'qty_disc', n, s_q, s_d, sp_qd, ss_q, ss_d,
        |    CAST(CAST(n AS HUGEINT) * sp_qd
        |      - CAST(s_q AS HUGEINT) * s_d AS DOUBLE),
        |    CAST(CAST(n AS HUGEINT) * ss_q
        |      - CAST(s_q AS HUGEINT) * s_q AS DOUBLE),
        |    CAST(CAST(n AS HUGEINT) * ss_d
        |      - CAST(s_d AS HUGEINT) * s_d AS DOUBLE)
        |  FROM m
        |  UNION ALL
        |  SELECT 'price_disc', n, s_p, s_d, sp_pd, ss_p, ss_d,
        |    CAST(CAST(n AS HUGEINT) * sp_pd
        |      - CAST(s_p AS HUGEINT) * s_d AS DOUBLE),
        |    CAST(CAST(n AS HUGEINT) * ss_p
        |      - CAST(s_p AS HUGEINT) * s_p AS DOUBLE),
        |    CAST(CAST(n AS HUGEINT) * ss_d
        |      - CAST(s_d AS HUGEINT) * s_d AS DOUBLE)
        |  FROM m)
        |SELECT pair, CAST(n AS BIGINT) AS n,
        |  CAST(sum_x AS BIGINT) AS sum_x, CAST(sum_y AS BIGINT) AS sum_y,
        |  CAST(sum_xy AS BIGINT) AS sum_xy,
        |  CAST(sum_x2 AS BIGINT) AS sum_x2,
        |  CAST(sum_y2 AS BIGINT) AS sum_y2,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS r_sign,
        |  CAST(floor(num * num / (den1 * den2) * 1000000.0) AS BIGINT)
        |    AS r2_micros
        |FROM u ORDER BY pair""".stripMargin,

    // q200: same weekly rollup, same per-nation recentering, same
    // HUGEINT moments and sign/abs-DIV slope.
    "q200_ols_trend" ->
      """WITH wk AS (
        |  SELECT n.n_name,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o.o_orderdate AS DATE)) AS BIGINT) // 7 AS wk,
        |    sum(CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS y
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT n_name, wk - min(wk) OVER (PARTITION BY n_name) AS x, y
        |  FROM wk),
        |m AS (
        |  SELECT n_name, count(*) AS n_weeks, sum(x) AS sx, sum(y) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM r GROUP BY 1)
        |SELECT n_name, CAST(n_weeks AS BIGINT) AS n_weeks,
        |  CAST(sy AS BIGINT) AS rev_cents,
        |  CAST(CASE
        |    WHEN CAST(n_weeks AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy > 0 THEN 1
        |    WHEN CAST(n_weeks AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS slope_sign,
        |  CAST(abs(CAST(n_weeks AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy) * 1000
        |    // (CAST(n_weeks AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_milli_abs
        |FROM m ORDER BY n_name""".stripMargin,

    // q201: same per-customer fold, same (spend, custkey)-total rank,
    // same closed-form integer Gini.
    "q201_gini" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT n.n_name, sp.x,
        |    row_number() OVER (PARTITION BY n.n_name
        |      ORDER BY sp.x, sp.o_custkey) AS i
        |  FROM sp
        |  JOIN customer c ON sp.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |m AS (
        |  SELECT n_name, count(*) AS n_customers, sum(x) AS tot,
        |    sum(CAST(i AS HUGEINT) * x) AS w
        |  FROM r GROUP BY 1)
        |SELECT n_name, CAST(n_customers AS BIGINT) AS n_customers,
        |  CAST(tot AS BIGINT) AS spend_cents,
        |  CAST((CAST(2 AS HUGEINT) * w
        |      - (CAST(n_customers AS HUGEINT) + 1) * tot) * 1000000
        |    // (CAST(n_customers AS HUGEINT) * tot) AS BIGINT)
        |    AS gini_micros
        |FROM m ORDER BY n_name""".stripMargin,

    // q202: same banding as q186, same cleared-denominator cumulative
    // EMD with a 3-band spine per class.
    "q202_t_closeness" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CASE WHEN CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |        AS DECIMAL(18,0)) AS BIGINT) < 0 THEN 0
        |      WHEN CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |        AS DECIMAL(18,0)) AS BIGINT) < 500000 THEN 1
        |      ELSE 2 END AS band
        |  FROM customer),
        |gb AS (
        |  SELECT c_nationkey, c_mktsegment, band, count(*) AS cg
        |  FROM b GROUP BY 1, 2, 3),
        |ng AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS ng
        |  FROM b GROUP BY 1, 2),
        |gl AS (SELECT band, count(*) AS c FROM b GROUP BY 1),
        |nn AS (SELECT count(*) AS nn FROM b),
        |sp AS (
        |  SELECT ng.c_nationkey, ng.c_mktsegment, ng.ng, s.band,
        |    coalesce(gb.cg, 0) AS cg, gl.c, nn.nn
        |  FROM ng
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS band) s
        |  LEFT JOIN gb ON gb.c_nationkey = ng.c_nationkey
        |    AND gb.c_mktsegment = ng.c_mktsegment AND gb.band = s.band
        |  JOIN gl ON gl.band = s.band
        |  CROSS JOIN nn),
        |cm AS (
        |  SELECT c_nationkey, c_mktsegment, ng, nn,
        |    sum(cg * nn - c * ng) OVER (
        |      PARTITION BY c_nationkey, c_mktsegment ORDER BY band
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM sp)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(ng AS BIGINT) AS n_rows,
        |  CAST(sum(abs(cum)) AS BIGINT) AS emd_num,
        |  CAST(max(2 * ng * nn) AS BIGINT) AS emd_den,
        |  CAST(sum(abs(cum)) * 1000000 // max(2 * ng * nn) AS BIGINT)
        |    AS emd_micros,
        |  sum(abs(cum)) * 100 <= max(2 * ng * nn) * 15 AS is_close
        |FROM cm GROUP BY 1, 2, ng
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // q196: same md5-seeded exact-double uniform, same one-expression
    // inverse-CDF Laplace.
    "q196_dp_counts" ->
      """WITH g AS (
        |  SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1),
        |u AS (
        |  SELECT c_nationkey, n,
        |    (('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)),
        |      1, 8))::BIGINT::DOUBLE + 0.5) / 4294967296.0::DOUBLE
        |      AS uv
        |  FROM g)
        |SELECT c_nationkey, CAST(n AS BIGINT) AS true_count,
        |  CAST(floor((CAST(n AS DOUBLE) + (-sign(uv - 0.5::DOUBLE))
        |    * ln(1.0::DOUBLE - abs(uv - 0.5::DOUBLE) * 2.0::DOUBLE))
        |    * 1000000.0::DOUBLE) AS BIGINT) AS noisy_micros
        |FROM u ORDER BY c_nationkey""".stripMargin,

    // q197: same md5 bucket mapping; only colliding buckets survive.
    "q197_feature_hashing" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |    x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT term, count(*) AS tf FROM toks GROUP BY 1),
        |b AS (
        |  SELECT term, tf,
        |    ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS bucket
        |  FROM tf)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(tf) AS BIGINT) AS total_tf,
        |  min(term) AS first_term
        |FROM b GROUP BY bucket HAVING count(*) >= 2
        |ORDER BY bucket""".stripMargin,

    // q198: digit from the decimal string; reference via the same
    // ln-ratio expression.
    "q198_benford_audit" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    AS VARCHAR), 1, 1) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(n) AS tot FROM d)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  CAST((n * 1000000) // tot AS BIGINT) AS share_micros,
        |  CAST(floor(ln(1.0::DOUBLE + 1.0::DOUBLE
        |    / CAST(digit AS DOUBLE)) / ln(10.0::DOUBLE)
        |    * 1000000.0::DOUBLE) AS BIGINT) AS benford_micros
        |FROM d CROSS JOIN t ORDER BY digit""".stripMargin,

    // q192: identical md5-derived registers; the estimate is the same
    // pinned literal-product-over-integer IEEE division.
    "q192_hll_registers" ->
      """WITH h AS (
        |  SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS hv
        |  FROM events),
        |r AS (
        |  SELECT hv % 64 AS bucket,
        |    CASE WHEN hv // 64 = 0 THEN 27
        |         ELSE 26 - CAST(floor(log2(hv // 64)) AS BIGINT)
        |    END AS rho
        |  FROM h),
        |regs AS (SELECT bucket, max(rho) AS register FROM r GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 64)) AS bucket),
        |f AS (
        |  SELECT s.bucket, coalesce(regs.register, 0) AS register
        |  FROM spine s LEFT JOIN regs ON s.bucket = regs.bucket),
        |summ AS (
        |  SELECT sum(1::BIGINT << CAST(27 - register AS INTEGER))
        |      AS sum_pow,
        |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS n_zero
        |  FROM f),
        |ex AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
        |SELECT CAST(f.bucket AS INTEGER) AS bucket,
        |  CAST(f.register AS BIGINT) AS register,
        |  CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(sum_pow AS BIGINT) AS sum_pow,
        |  CAST(n_zero AS BIGINT) AS n_zero,
        |  CAST(CASE WHEN ((0.709::DOUBLE * 4096.0::DOUBLE)
        |      * 134217728.0::DOUBLE) / CAST(sum_pow AS DOUBLE) <= 160.0
        |      AND n_zero > 0
        |    THEN floor(64.0::DOUBLE
        |      * ln(64.0::DOUBLE / CAST(n_zero AS DOUBLE))
        |      * 1000000.0::DOUBLE)
        |    ELSE floor((((0.709::DOUBLE * 4096.0::DOUBLE)
        |      * 134217728.0::DOUBLE) / CAST(sum_pow AS DOUBLE))
        |      * 1000000.0::DOUBLE)
        |  END AS BIGINT) AS est_micros
        |FROM f CROSS JOIN summ CROSS JOIN ex
        |ORDER BY bucket""".stripMargin,

    // q193: the same (t, seq) argmax per (customer, month) via a
    // row_number replay, then the month rollup.
    "q193_semi_additive" ->
      """WITH o AS (
        |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
        |    epoch_us(o_orderdate) AS t, o_orderkey AS seq,
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS c
        |  FROM orders),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey, month
        |    ORDER BY t DESC, seq DESC) AS rn
        |  FROM o)
        |SELECT month, CAST(count(*) AS BIGINT) AS n_accounts,
        |  CAST(sum(c) AS BIGINT) AS eom_balance_cents
        |FROM r WHERE rn = 1 GROUP BY month ORDER BY month""".stripMargin,

    // q194: same per-day net deltas, same ROWS running sum.
    "q194_concurrency_sweep" ->
      """WITH st AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS ns
        |  FROM orders GROUP BY 1),
        |en AS (
        |  SELECT day, count(*) AS ne FROM (
        |    SELECT e.l_orderkey,
        |      greatest(e.sd, CAST(o.o_orderdate AS DATE)) AS day
        |    FROM (SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) AS sd
        |          FROM lineitem GROUP BY 1) e
        |    JOIN orders o ON e.l_orderkey = o.o_orderkey) x
        |  GROUP BY 1),
        |j AS (
        |  SELECT coalesce(st.day, en.day) AS day,
        |    coalesce(ns, 0) AS ns, coalesce(ne, 0) AS ne
        |  FROM st FULL OUTER JOIN en ON st.day = en.day)
        |SELECT CAST(day AS TIMESTAMP) AS day,
        |  CAST(ns AS BIGINT) AS n_starts, CAST(ne AS BIGINT) AS n_ends,
        |  CAST(sum(ns - ne) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_eod
        |FROM j ORDER BY day""".stripMargin,

    // q195: same (value, weight) rollup and cross-multiplied cut.
    "q195_weighted_median" ->
      """WITH g AS (
        |  SELECT CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS price_cents,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT price_cents,
        |    sum(w) OVER (ORDER BY price_cents ROWS UNBOUNDED PRECEDING)
        |      AS cum,
        |    sum(w) OVER () AS tot
        |  FROM g)
        |SELECT price_cents, CAST(cum AS BIGINT) AS cum_weight,
        |  CAST(tot AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |ORDER BY price_cents LIMIT 1""".stripMargin,

    // q191: the identical union + ignore-nulls-last window — same
    // (t, src, vseq) tie pinning, same delete semantics.
    "q191_pit_join" ->
      """WITH v AS (
        |  SELECT o_custkey AS key, epoch_us(o_orderdate) AS t,
        |    0 AS src, o_orderkey AS vseq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS pay,
        |    CAST(NULL AS BIGINT) AS l_orderkey,
        |    CAST(NULL AS INTEGER) AS l_linenumber
        |  FROM orders),
        |f AS (
        |  SELECT o.o_custkey AS key, epoch_us(l.l_shipdate) AS t,
        |    1 AS src, CAST(NULL AS BIGINT) AS vseq,
        |    CAST(NULL AS VARCHAR) AS op,
        |    CAST(NULL AS DECIMAL(18,2)) AS pay,
        |    l.l_orderkey, l.l_linenumber
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |u AS (SELECT * FROM v UNION ALL SELECT * FROM f),
        |wn AS (
        |  SELECT *,
        |    last_value(op IGNORE NULLS) OVER w AS lop,
        |    last_value(pay IGNORE NULLS) OVER w AS lpay,
        |    last_value(CASE WHEN src = 0 THEN t END IGNORE NULLS)
        |      OVER w AS lt,
        |    last_value(vseq IGNORE NULLS) OVER w AS lseq
        |  FROM u
        |  WINDOW w AS (PARTITION BY key
        |    ORDER BY t, src, coalesce(vseq, 0)
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT l_orderkey, l_linenumber, key, t AS ship_us,
        |  coalesce(lop = 'U', false) AS has_state,
        |  CASE WHEN lop = 'U' THEN lt END AS state_from_us,
        |  CASE WHEN lop = 'U' THEN lseq END AS state_seq,
        |  CAST(CASE WHEN lop = 'U' THEN lpay END AS DOUBLE) AS payload
        |FROM wn WHERE src = 1
        |ORDER BY l_orderkey, l_linenumber, ship_us""".stripMargin,

    // q186: same exact-cents banding, count + count-distinct per QI
    // class.
    "q186_l_diversity" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CASE WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |           AS DECIMAL(18,0)) < 0 THEN 'neg'
        |         WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |           AS DECIMAL(18,0)) < 500000 THEN 'low'
        |         ELSE 'high' END AS bal_band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT bal_band) AS BIGINT) AS l_distinct,
        |  count(DISTINCT bal_band) >= 3 AS is_diverse
        |FROM b GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // q187: same cents sums; the one division is the identical
    // floored IEEE expression.
    "q187_target_encoding" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS x
        |  FROM customer),
        |a AS (
        |  SELECT c_mktsegment, sum(x) AS s, count(*) AS n
        |  FROM c GROUP BY 1)
        |SELECT c_custkey, c.c_mktsegment, x AS bal_cents,
        |  CAST(s - x AS BIGINT) AS loo_sum_cents,
        |  CAST(n - 1 AS BIGINT) AS n_others,
        |  CAST(floor(CAST(s - x AS DOUBLE) / CAST(n - 1 AS DOUBLE)
        |    * 1e4) AS BIGINT) AS loo_mean_micros
        |FROM c JOIN a ON c.c_mktsegment = a.c_mktsegment
        |WHERE n > 1 ORDER BY c_custkey""".stripMargin,

    // q182: same per-customer rollup, same (metric, custkey)-pinned
    // ntile(5) windows, monetary in exact cents.
    "q182_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey,
        |    max(epoch_us(o_orderdate)) AS last_order_us,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |sc AS (
        |  SELECT custkey, last_order_us, CAST(n_orders AS BIGINT)
        |      AS n_orders, monetary_cents,
        |    ntile(5) OVER (ORDER BY last_order_us, custkey) AS r,
        |    ntile(5) OVER (ORDER BY n_orders, custkey) AS f,
        |    ntile(5) OVER (ORDER BY monetary_cents, custkey) AS m
        |  FROM per)
        |SELECT custkey, last_order_us, n_orders, monetary_cents,
        |  CAST(r AS BIGINT) AS r_score, CAST(f AS BIGINT) AS f_score,
        |  CAST(m AS BIGINT) AS m_score,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) ||
        |    CAST(m AS VARCHAR) AS segment
        |FROM sc ORDER BY custkey""".stripMargin,

    // q183: same per-part cents rollup, explicit ROWS running sum,
    // the same cross-multiplied 80/95 boundaries.
    "q183_abc_pareto" ->
      """WITH rev AS (
        |  SELECT l_partkey AS partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT partkey, rev_cents,
        |    sum(rev_cents) OVER (ORDER BY rev_cents DESC, partkey
        |      ROWS UNBOUNDED PRECEDING) AS cum_cents,
        |    sum(rev_cents) OVER () AS tot
        |  FROM rev)
        |SELECT partkey, rev_cents, CAST(cum_cents AS BIGINT)
        |    AS cum_cents,
        |  CASE WHEN cum_cents * 10 <= tot * 8 THEN 'A'
        |       WHEN cum_cents * 20 <= tot * 19 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c ORDER BY partkey""".stripMargin,

    // q184: q149's pruned pair pass widened to both rule directions;
    // conf/lift via integer // (positive operands, = Spark's DIV).
    "q184_assoc_rules" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |sup AS (
        |  SELECT l_partkey, count(*) AS n FROM baskets GROUP BY 1),
        |pruned AS (
        |  SELECT b.l_orderkey, b.l_partkey FROM baskets b
        |  JOIN sup ON b.l_partkey = sup.l_partkey AND sup.n >= 25),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    count(*) AS n_ab
        |  FROM pruned a JOIN pruned b
        |    ON a.l_orderkey = b.l_orderkey
        |      AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |rules AS (
        |  SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
        |  UNION ALL
        |  SELECT pb, pa, n_ab FROM pairs),
        |nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem)
        |SELECT r.antecedent, r.consequent,
        |  CAST(r.n_ab AS BIGINT) AS n_ab,
        |  CAST(sa.n AS BIGINT) AS n_ant,
        |  CAST(sc.n AS BIGINT) AS n_cons,
        |  CAST((r.n_ab * 1000000) // sa.n AS BIGINT) AS conf_micros,
        |  CAST((r.n_ab * nb.n * 1000000) // (sa.n * sc.n) AS BIGINT)
        |    AS lift_micros
        |FROM rules r
        |  JOIN sup sa ON r.antecedent = sa.l_partkey
        |  JOIN sup sc ON r.consequent = sc.l_partkey
        |  CROSS JOIN nb
        |ORDER BY conf_micros DESC, antecedent, consequent""".stripMargin,

    // q185: both medians by the same rn == ceil(n/2) ordinal over
    // (value, custkey); pure integer outlier comparison.
    "q185_mad_outliers" ->
      """WITH c AS (
        |  SELECT c_custkey, CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2))
        |    * 100 AS DECIMAL(18,0)) AS BIGINT) AS bal_cents
        |  FROM customer),
        |r1 AS (
        |  SELECT *, row_number() OVER (ORDER BY bal_cents, c_custkey)
        |      AS rn,
        |    count(*) OVER () AS n
        |  FROM c),
        |m1 AS (
        |  SELECT *, max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
        |    THEN bal_cents END) OVER () AS med_cents
        |  FROM r1),
        |d AS (
        |  SELECT c_custkey, bal_cents, med_cents,
        |    abs(bal_cents - med_cents) AS dev_cents, n
        |  FROM m1),
        |r2 AS (
        |  SELECT *, row_number() OVER (ORDER BY dev_cents, c_custkey)
        |      AS rn2
        |  FROM d),
        |m2 AS (
        |  SELECT *, max(CASE WHEN rn2 = CAST(ceil(n / 2.0) AS BIGINT)
        |    THEN dev_cents END) OVER () AS mad_cents
        |  FROM r2)
        |SELECT c_custkey, bal_cents, med_cents, dev_cents,
        |  CAST(mad_cents AS BIGINT) AS mad_cents,
        |  dev_cents > mad_cents * 3 AS is_outlier
        |FROM m2 ORDER BY c_custkey""".stripMargin,

    // q179: same feed synthesis as q148, one lead window, U-only
    // versions with delete-closed intervals.
    "q179_cdc_scd2" ->
      """WITH feed AS (
        |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 100000
        |    ELSE o_custkey END AS key,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS payload
        |  FROM orders),
        |v AS (
        |  SELECT key, seq, op, payload,
        |    lead(seq, 1) OVER (PARTITION BY key ORDER BY seq)
        |      AS next_seq
        |  FROM feed)
        |SELECT key, CAST(seq AS BIGINT) AS valid_from_seq,
        |  CAST(next_seq AS BIGINT) AS valid_to_seq,
        |  CAST(payload AS DOUBLE) AS payload,
        |  (next_seq IS NULL) AS is_current
        |FROM v WHERE op = 'U'
        |ORDER BY key, valid_from_seq""".stripMargin,

    // q180: q116's lag/cumsum sessionization, rolled up to days with
    // the same cross-multiplied micros rate.
    "q180_bounce_rate" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sid, CAST(min(ts) AS DATE) AS day,
        |    count(*) AS n
        |  FROM s GROUP BY 1, 2)
        |SELECT CAST(day AS TIMESTAMP) AS day,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  CAST(floor(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) * 1e6) AS BIGINT) AS bounce_micros
        |FROM sess GROUP BY day ORDER BY day""".stripMargin,

    // q181: the same conditional-min elections and type-1 ordinal
    // median over integer second gaps.
    "q181_time_to_convert" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |        THEN epoch_us(ts) END) AS v,
        |    min(CASE WHEN event_type = 'purchase'
        |        THEN epoch_us(ts) END) AS p
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT user_id,
        |    CAST(floor((p - v) / 1e6) AS BIGINT) AS gap_seconds
        |  FROM f
        |  WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY gap_seconds, user_id)
        |      AS rn,
        |    count(*) OVER () AS n
        |  FROM g)
        |SELECT user_id, gap_seconds,
        |  CAST(max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
        |    THEN gap_seconds END) OVER () AS BIGINT)
        |    AS median_gap_seconds
        |FROM r ORDER BY user_id""".stripMargin,

    // q178: same cleared-denominator distances in HUGEINT; dim is
    // 1-based here vs 0-based posexplode — internal join key only.
    "q178_cluster_quality" ->
      """WITH comp AS (
        |  SELECT vec_id, label, u.i AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
        |      AS v
        |  FROM embeddings CROSS JOIN
        |    unnest(range(1, len(embedding) + 1)) AS u(i)),
        |ns AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |cent AS (
        |  SELECT label, dim, sum(v) AS sd FROM comp GROUP BY 1, 2),
        |intra AS (
        |  SELECT c.label, ns.n,
        |    sum(CAST((c.v * ns.n - ct.sd) AS HUGEINT)
        |      * CAST((c.v * ns.n - ct.sd) AS HUGEINT)) AS tot
        |  FROM comp c
        |    JOIN cent ct ON c.label = ct.label AND c.dim = ct.dim
        |    JOIN ns ON c.label = ns.label
        |  GROUP BY 1, 2),
        |inter AS (
        |  SELECT a.label AS la, b.label AS lb, na.n AS nna,
        |    nb.n AS nnb,
        |    sum(CAST((a.sd * nb.n - b.sd * na.n) AS HUGEINT)
        |      * CAST((a.sd * nb.n - b.sd * na.n) AS HUGEINT)) AS d2
        |  FROM cent a JOIN cent b ON a.dim = b.dim
        |      AND a.label <> b.label
        |    JOIN ns na ON a.label = na.label
        |    JOIN ns nb ON b.label = nb.label
        |  GROUP BY 1, 2, 3, 4),
        |nearest AS (
        |  SELECT la, lb, d2, nna, nnb,
        |    row_number() OVER (PARTITION BY la ORDER BY
        |      CAST(d2 AS DOUBLE) / (nna * nnb) / (nna * nnb), lb)
        |      AS rn
        |  FROM inter)
        |SELECT i.label, CAST(i.n AS BIGINT) AS n_vectors,
        |  CAST(floor(CAST(tot AS DOUBLE)
        |    / CAST(i.n * i.n * i.n AS DOUBLE) / 1e6) AS BIGINT)
        |    AS avg_sq_dist_micros,
        |  CAST(nr.lb AS INTEGER) AS nearest_label,
        |  CAST(floor(CAST(nr.d2 AS DOUBLE) / (nr.nna * nr.nnb)
        |    / (nr.nna * nr.nnb) / 1e6) AS BIGINT)
        |    AS nearest_sq_dist_micros
        |FROM intra i JOIN nearest nr ON i.label = nr.la AND nr.rn = 1
        |ORDER BY i.label""".stripMargin,

    // q177: identical (name, custkey)-sorted window, the same two
    // forward leads and edit-distance verify.
    "q177_sorted_neighborhood" ->
      """WITH s AS (
        |  SELECT c_custkey, c_name,
        |    lead(c_custkey, 1) OVER w AS k1,
        |    lead(c_name, 1) OVER w AS n1,
        |    lead(c_custkey, 2) OVER w AS k2,
        |    lead(c_name, 2) OVER w AS n2
        |  FROM customer
        |  WINDOW w AS (ORDER BY c_name, c_custkey)),
        |u AS (
        |  SELECT c_custkey AS id_a, c_name AS name_a,
        |    k1 AS id_b, n1 AS name_b FROM s
        |  UNION ALL
        |  SELECT c_custkey, c_name, k2, n2 FROM s)
        |SELECT id_a, id_b, name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS INTEGER) AS edit_dist
        |FROM u
        |WHERE id_b IS NOT NULL AND levenshtein(name_a, name_b) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // q174: same bucketed power-of-two weights, exact HUGEINT sum,
    // one floored double division at the end.
    "q174_decay_score" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS c,
        |    ([16, 8, 4, 2, 1])[CAST(floor(date_diff('day',
        |       CAST(ts AS DATE), DATE '2024-01-30') / 7.0)
        |       AS INTEGER) + 1] AS w
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-31 00:00:00')
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(floor(CAST(sum(c * w) AS DOUBLE) / (16.0 * 100.0) * 1e6)
        |    AS BIGINT) AS score_micros
        |FROM e GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // q175: identical type-1 ordinal boundaries (ceil(q·n/4)-th value
    // under the same total order) and boundary comparisons.
    "q175_quartile_binning" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey)
        |      AS rn,
        |    count(*) OVER () AS n
        |  FROM orders),
        |b AS (
        |  SELECT max(CASE WHEN rn = CAST(ceil(1 * n / 4.0) AS BIGINT)
        |           THEN o_totalprice END) AS b1,
        |    max(CASE WHEN rn = CAST(ceil(2 * n / 4.0) AS BIGINT)
        |           THEN o_totalprice END) AS b2,
        |    max(CASE WHEN rn = CAST(ceil(3 * n / 4.0) AS BIGINT)
        |           THEN o_totalprice END) AS b3
        |  FROM r),
        |a AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CASE WHEN o_totalprice <= b1 THEN 1
        |         WHEN o_totalprice <= b2 THEN 2
        |         WHEN o_totalprice <= b3 THEN 3
        |         ELSE 4 END AS quartile
        |  FROM orders CROSS JOIN b)
        |SELECT CAST(quartile AS INTEGER) AS quartile,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM a GROUP BY quartile
        |ORDER BY quartile""".stripMargin,

    // q172: per-field elections replayed as window ranks; mode
    // tie-break lexically LAST, mirroring the struct-max.
    "q172_golden_record" ->
      """WITH c AS (
        |  SELECT *, c_custkey % 500 AS ek FROM customer),
        |latest AS (
        |  SELECT ek, c_name,
        |    row_number() OVER (PARTITION BY ek
        |      ORDER BY c_custkey DESC) AS rn
        |  FROM c),
        |seg AS (
        |  SELECT ek, c_mktsegment,
        |    row_number() OVER (PARTITION BY ek
        |      ORDER BY count(*) DESC, c_mktsegment DESC) AS rn
        |  FROM c GROUP BY ek, c_mktsegment),
        |base AS (
        |  SELECT ek, count(*) AS n_members,
        |    max(c_acctbal) AS best_acctbal,
        |    count(DISTINCT c_mktsegment) AS n_segments
        |  FROM c GROUP BY ek)
        |SELECT CAST(b.ek AS BIGINT) AS entity_key,
        |  CAST(n_members AS BIGINT) AS n_members,
        |  l.c_name AS golden_name,
        |  best_acctbal,
        |  s.c_mktsegment AS mode_segment,
        |  CAST(n_segments AS BIGINT) AS n_segments
        |FROM base b
        |  JOIN latest l ON b.ek = l.ek AND l.rn = 1
        |  JOIN seg s ON b.ek = s.ek AND s.rn = 1
        |ORDER BY entity_key""".stripMargin,

    // q173: the same remainder-first exact floor division in HUGEINT,
    // leftover units by the same (remainder desc, priority) rank.
    "q173_largest_remainder" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS HUGEINT)) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |t AS (
        |  SELECT *, sum(c) OVER (PARTITION BY c_mktsegment) AS tot,
        |    c * 1000000 AS prod
        |  FROM cells),
        |b AS (
        |  SELECT *, prod // tot AS base, prod % tot AS rem,
        |    1000000 - sum(prod // tot)
        |      OVER (PARTITION BY c_mktsegment) AS leftover
        |  FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY rem DESC, o_orderpriority) AS rk
        |  FROM b)
        |SELECT c_mktsegment, o_orderpriority,
        |  CAST(base AS BIGINT) AS base_units,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc_units
        |FROM r ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    // q169: same union-and-window construction — running struct-max
    // of touches over the identical (ts, event_id) total order, gap
    // in exact epoch micros.
    "q169_attribution" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    max(CASE WHEN event_type IN ('view', 'click') THEN
        |      {'ts': ts, 'id': event_id, 'ty': event_type} END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS lt
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id,
        |    lt IS NOT NULL AND
        |      epoch_us(ts) - epoch_us((lt).ts) <= 1800 * 1000000
        |      AS hit,
        |    epoch_us(ts) - epoch_us((lt).ts) AS gap_us,
        |    (lt).ty AS ty
        |  FROM e WHERE event_type = 'purchase')
        |SELECT user_id, event_id,
        |  CASE WHEN hit THEN ty ELSE 'direct' END AS attributed,
        |  CASE WHEN hit THEN CAST(floor(gap_us / 1e6) AS BIGINT)
        |       END AS gap_seconds
        |FROM p ORDER BY user_id, event_id""".stripMargin,

    // q170: dow pinned 0=Sunday (Spark dayofweek−1 ≡ DuckDB dow).
    "q170_time_heatmap" ->
      """SELECT CAST(date_part('dow', ts) AS INTEGER) AS dow,
        |  CAST(date_part('hour', ts) AS INTEGER) AS hod,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY dow, hod""".stripMargin,

    // q171: identical exact-cents weekly rollup, one lag, the same
    // floored micros division.
    "q171_wow_growth" ->
      """WITH weekly AS (
        |  SELECT date_trunc('week', o_orderdate) AS week,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |l AS (
        |  SELECT week, cents,
        |    lag(cents, 1) OVER (ORDER BY week) AS prev
        |  FROM weekly)
        |SELECT CAST(week AS TIMESTAMP) AS week,
        |  CAST(cents AS DOUBLE) / 100 AS revenue,
        |  CAST(cents - prev AS DOUBLE) / 100 AS delta,
        |  CAST(floor(CAST(cents - prev AS DOUBLE)
        |    / CAST(prev AS DOUBLE) * 1e6) AS BIGINT) AS growth_micros
        |FROM l ORDER BY week""".stripMargin,

    // q168: the BATCH full recompute — equality with the streaming
    // state after three arbitrary micro-batch slices proves the
    // engine's incremental maintenance implements the same algebra.
    "q168_stream_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    AS avg_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // q166: same first-seen construction — min(day) per user, per-day
    // new-user counts, running sum over observed days.
    "q166_cumulative_distinct" ->
      """WITH grid AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |firsts AS (
        |  SELECT day, count(*) AS nw FROM (
        |    SELECT user_id, min(day) AS day FROM grid GROUP BY 1)
        |  GROUP BY 1),
        |days AS (SELECT DISTINCT day FROM grid)
        |SELECT CAST(d.day AS TIMESTAMP) AS day,
        |  CAST(coalesce(f.nw, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(f.nw, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cumulative_users
        |FROM days d LEFT JOIN firsts f ON d.day = f.day
        |ORDER BY day""".stripMargin,

    // q167: identical decimal cell/total rollup; the share is the
    // same single floored double division.
    "q167_share_of_total" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, o_orderpriority,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(floor(CAST(rev AS DOUBLE)
        |    / CAST(sum(rev) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
        |    * 1e6) AS BIGINT) AS share_micros
        |FROM cells
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    // q164: HUGEINT replays the same cleared-denominator test —
    // exact 128-bit integers on both sides, no float boundary.
    "q164_sigma_outliers" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n, sum(x) AS s,
        |    sum(x * x) AS s2
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, e.event_id, e.value,
        |  (m.n * e.x > m.s) AS above_mean,
        |  CAST(floor(
        |    CAST((m.n * e.x - m.s) * (m.n * e.x - m.s) AS DOUBLE)
        |      / CAST(m.n * m.s2 - m.s * m.s AS DOUBLE) * 1e6)
        |    AS BIGINT) AS z2_micros
        |FROM e JOIN m ON e.event_type = m.event_type
        |WHERE (m.n * e.x - m.s) * (m.n * e.x - m.s)
        |      > 9 * (m.n * m.s2 - m.s * m.s)
        |ORDER BY e.event_type, e.event_id""".stripMargin,

    // q165: ->> extraction mirrors get_json_object; counts BIGINT.
    "q165_json_extract" ->
      """WITH e AS (
        |  SELECT event_type, CAST(props->>'k' AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(k) AS BIGINT) AS n_parsed,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(max(k) AS BIGINT) AS max_k,
        |  CAST(count(DISTINCT k) AS BIGINT) AS distinct_k
        |FROM e GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // q161: the FULL aggregate, computed directly — equality with
    // Spark's merged base+delta partials proves the maintenance
    // algebra, not just engine agreement.
    "q161_incremental_agg" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // q162: identical islands construction (idx − row_number), the
    // same max(struct)-shaped election via window rank.
    "q162_streaks" ->
      """WITH grid AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g2 AS (
        |  SELECT user_id, day,
        |    date_diff('day', DATE '2024-01-01', day) AS idx
        |  FROM grid),
        |isl AS (
        |  SELECT user_id, day, idx,
        |    idx - row_number() OVER (PARTITION BY user_id
        |      ORDER BY idx) AS island
        |  FROM g2),
        |st AS (
        |  SELECT user_id, island, count(*) AS len,
        |    min(day) AS s, max(day) AS e, min(idx) AS sidx
        |  FROM isl GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, len, s, e,
        |    count(*) OVER (PARTITION BY user_id) AS n_streaks,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, sidx) AS rn
        |  FROM st)
        |SELECT user_id, CAST(n_streaks AS BIGINT) AS n_streaks,
        |  CAST(len AS BIGINT) AS best_len,
        |  CAST(s AS TIMESTAMP) AS streak_start,
        |  CAST(e AS TIMESTAMP) AS streak_end
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // q163: the mode election replayed as a window rank over the
    // value histogram.
    "q163_group_mode" ->
      """WITH h AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, l_quantity, c,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY c DESC, l_quantity) AS rn
        |  FROM h)
        |SELECT l_returnflag, l_quantity AS mode_qty,
        |  CAST(c AS BIGINT) AS mode_count
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    // q158: lead() over the same total (date, orderkey) order; the
    // exclusive end bound and NULL-current convention are identical.
    "q158_scd2_build" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus AS status,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMP) AS valid_from,
        |  CAST(lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS TIMESTAMP) AS valid_to,
        |  (lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
        |FROM orders
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    // q159: margins and χ² numerators as exact integers, one double
    // division per cell, floor-micros on both sides.
    "q159_chi_square" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS cohort,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
        |c AS (SELECT cohort, sum(o) AS c FROM cells GROUP BY 1),
        |n AS (SELECT sum(o) AS n FROM cells)
        |SELECT cells.event_type, cells.cohort,
        |  CAST(o AS BIGINT) AS o,
        |  CAST(floor(r.r * c.c / CAST(n.n AS DOUBLE) * 1e6) AS BIGINT)
        |    AS e_micros,
        |  CAST(floor((o * n.n - r.r * c.c) * (o * n.n - r.r * c.c)
        |    / CAST(n.n * r.r * c.c AS DOUBLE) * 1e6) AS BIGINT)
        |    AS chi2_micros
        |FROM cells JOIN r ON cells.event_type = r.event_type
        |  JOIN c ON cells.cohort = c.cohort CROSS JOIN n
        |ORDER BY cells.event_type, cells.cohort""".stripMargin,

    // q160: the Q16 NOT-IN form verbatim — Spark's broadcast anti-join
    // must agree with the correlated NOT IN.
    "q160_supplier_diversity" ->
      """SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#21'
        |  AND p_type NOT LIKE 'SMALL%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // q150: same portable md5-prefix order (hash parity with
    // Scale.md5Prefix32 is established — q110 uses the identical twin),
    // materialized as the window-sort plan; Spark's bounded-heap
    // TopKPerKey must elect the same rows.
    "q150_stratified_sample" ->
      """WITH h AS (
        |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |      AS hk
        |  FROM customer),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY hk, c_custkey) AS rn
        |  FROM h)
        |SELECT c_mktsegment, c_custkey, c_name, c_acctbal
        |FROM r WHERE rn <= 20
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    // q151: identical dedup-grid + 7-day fan-out construction; the
    // sliding-distinct has no window form in either engine, so both
    // compute it the same declarative way.
    "q151_rolling_distinct" ->
      """WITH grid AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM grid),
        |fan AS (
        |  SELECT g.user_id, g.day + CAST(o.o AS INTEGER) AS day
        |  FROM grid g CROSS JOIN
        |    (SELECT unnest(generate_series(0, 6)) AS o) o),
        |w AS (
        |  SELECT f.day, count(DISTINCT f.user_id) AS wau
        |  FROM fan f JOIN days d ON f.day = d.day GROUP BY f.day),
        |d2 AS (
        |  SELECT day, count(DISTINCT user_id) AS dau
        |  FROM grid GROUP BY day)
        |SELECT CAST(w.day AS TIMESTAMP) AS day,
        |  CAST(d2.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau
        |FROM w JOIN d2 ON w.day = d2.day
        |ORDER BY day""".stripMargin,

    // q154: identical spine/zero-fill/running-max construction — the
    // forward-fill is max(CASE) over the running frame on both sides,
    // sidestepping IGNORE-NULLS dialect differences.
    "q154_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT user_id, CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |f AS (
        |  SELECT s.user_id, s.day, d.n,
        |    max(CASE WHEN d.n IS NOT NULL THEN s.day END)
        |      OVER (PARTITION BY s.user_id ORDER BY s.day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_active
        |  FROM spine s LEFT JOIN daily d
        |    ON s.user_id = d.user_id AND s.day = d.day)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |  (n IS NULL) AS is_gap,
        |  CAST(last_active AS TIMESTAMP) AS last_active_day,
        |  CAST(date_diff('day', last_active, day) AS INTEGER)
        |    AS days_since_active
        |FROM f ORDER BY user_id, day""".stripMargin,

    // q155: same sorted-frame-array ordinal selection (type-1 median,
    // no interpolation); list indexing is 1-based in both engines and
    // the elected double is selected, never computed.
    "q155_moving_median" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    list_sort(array_agg(value) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM events)
        |SELECT user_id, ts, event_id, value,
        |  CAST(len(arr) AS INTEGER) AS n_window,
        |  arr[CAST(ceil(len(arr) / 2.0) AS INTEGER)] AS med7
        |FROM f ORDER BY user_id, ts, event_id""".stripMargin,

    // q157: identical rollup-then-RANGE-frame construction; the burst
    // verdict is the same integer cross-multiplication.
    "q157_burst_detection" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx
        |  FROM events GROUP BY 1, 2, 4),
        |w AS (
        |  SELECT event_type, day, n,
        |    coalesce(sum(n) OVER fr, 0) AS prev7,
        |    count(n) OVER fr AS n_prev_days
        |  FROM daily
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY idx
        |                RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, CAST(day AS TIMESTAMP) AS day,
        |  CAST(n AS BIGINT) AS n, CAST(prev7 AS BIGINT) AS prev7,
        |  CAST(n_prev_days AS BIGINT) AS n_prev_days,
        |  (n_prev_days >= 3 AND n * n_prev_days > prev7 * 2) AS is_burst
        |FROM w ORDER BY event_type, day""".stripMargin,

    // q152: the textbook quadratic dominance DEFINITION — Spark runs
    // the O(n log n) distinct-price sweep; matching row sets prove the
    // sweep implements the definition (comparisons only, no double
    // arithmetic on either side).
    "q152_skyline" ->
      """SELECT p.p_partkey, p.p_name, p.p_retailprice,
        |  CAST(p.p_size AS INTEGER) AS p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |         OR q.p_size > p.p_size))
        |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin,

    // q141: same letter-string base as q130; regexp_extract_all under
    // RE2 shares Java regex's leftmost-greedy non-overlapping scan for
    // these alternation-free patterns, so the counts are engine-exact.
    "q141_kleene_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'v+c*p')) AS BIGINT)
        |    AS n_kleene_funnels,
        |  CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
        |    AS n_error_bursts,
        |  CAST(coalesce(list_max(list_transform(
        |      regexp_extract_all(seq, 'c+'), m -> length(m))), 0)
        |    AS BIGINT) AS max_click_run
        |FROM s ORDER BY user_id""".stripMargin,

    // q148: net-effect reduce as a window (seq unique per key, so
    // row_number desc = max_by), then the three MERGE arms verbatim.
    "q148_merge_cdc" ->
      """WITH raw AS (
        |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 100000
        |    ELSE o_custkey END AS k,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS bal
        |  FROM orders),
        |net AS (
        |  SELECT k, op, bal FROM (
        |    SELECT k, op, bal,
        |      row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |    FROM raw) WHERE rn = 1),
        |merged AS (
        |  SELECT c.c_custkey AS k, c.c_name AS name,
        |    CAST(c.c_nationkey AS INT) AS nk,
        |    CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal,
        |    c.c_mktsegment AS seg
        |  FROM customer c LEFT JOIN net ON c.c_custkey = net.k
        |  WHERE net.k IS NULL
        |  UNION ALL
        |  SELECT net.k,
        |    coalesce(c.c_name, 'NEW#' || CAST(net.k AS VARCHAR)),
        |    CAST(coalesce(c.c_nationkey, net.k % 25) AS INT),
        |    net.bal,
        |    coalesce(c.c_mktsegment, 'CDC')
        |  FROM net LEFT JOIN customer c ON net.k = c.c_custkey
        |  WHERE net.op = 'U')
        |SELECT k AS c_custkey, name AS c_name, nk AS c_nationkey,
        |  CAST(bal AS DOUBLE) AS c_acctbal, seg AS c_mktsegment
        |FROM merged ORDER BY c_custkey""".stripMargin,

    // q149: identical a-priori prune-then-pair over distinct baskets.
    "q149_copurchase_pairs" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |f AS (
        |  SELECT l_partkey FROM b GROUP BY l_partkey
        |  HAVING count(*) >= 25),
        |p AS (
        |  SELECT b.l_orderkey, b.l_partkey FROM b
        |  JOIN f ON b.l_partkey = f.l_partkey)
        |SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM p a JOIN p c ON a.l_orderkey = c.l_orderkey
        |  AND a.l_partkey < c.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY n_orders DESC, part_a, part_b""".stripMargin,

    // q146: DuckDB CUBE + GROUPING() — identical margin set.
    "q146_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,

    // q147: IS NOT DISTINCT FROM is DuckDB's null-safe <=>; the
    // null↔null group must come back matched in both engines.
    "q147_null_semantics" ->
      """WITH c AS (
        |  SELECT CASE WHEN c_nationkey % 7 = 0 THEN NULL
        |    ELSE c_nationkey END AS nk, count(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |s AS (
        |  SELECT CASE WHEN s_nationkey % 7 = 0 THEN NULL
        |    ELSE s_nationkey END AS snk, count(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT CAST(nk AS INT) AS nk,
        |  CAST(n_cust AS BIGINT) AS n_cust,
        |  CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
        |  n_supp IS NOT NULL AS matched
        |FROM c LEFT JOIN s ON nk IS NOT DISTINCT FROM snk
        |ORDER BY nk NULLS FIRST""".stripMargin,

    // q143: the correlated EXISTS/NOT-EXISTS pair stated directly —
    // DuckDB decorrelates it itself; distinct pair sets first, so the
    // exists tests are per-(order, supplier) exactly as in Spark.
    "q143_only_returner" ->
      """WITH al AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |rl AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |  WHERE l_returnflag = 'R')
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM rl JOIN supplier ON rl.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM al
        |    WHERE al.l_orderkey = rl.l_orderkey
        |      AND al.l_suppkey <> rl.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM rl r2
        |    WHERE r2.l_orderkey = rl.l_orderkey
        |      AND r2.l_suppkey <> rl.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // q144: Q13 phrased with the classic left join; the Spark side's
    // pre-aggregation is plan shape only — same histogram.
    "q144_count_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        |  CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // q145: identical ordinal construction — row_number + count over
    // the same partition, integer ceil-division positions.
    "q145_exact_quantiles" ->
      """WITH r AS (
        |  SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS b,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer)
        |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN b END) AS DOUBLE)
        |    AS median_bal,
        |  CAST(max(CASE WHEN rn = (n * 9 + 9) // 10 THEN b END) AS DOUBLE)
        |    AS p90_bal
        |FROM r GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // q241: the ordinal DEFINITION of the same quantiles q145 pins —
    // the engine side brackets a histogram, the oracle proves the
    // bracket ≡ value-at-sorted-position.
    "q241_quantile_histogram" ->
      """WITH r AS (
        |  SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS b,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer)
        |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN b END) AS DOUBLE)
        |    AS median_bal,
        |  CAST(max(CASE WHEN rn = (n * 9 + 9) // 10 THEN b END) AS DOUBLE)
        |    AS p90_bal
        |FROM r GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // q244: identical sweep — strictly-preceding running max end,
    // cumulative new-segment flags, two folds, exact micros.
    "q244_interval_coverage" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    epoch_us(ts) + 1800000000 AS en
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, t, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |  FROM e),
        |f AS (
        |  SELECT user_id, event_id, t, en,
        |    CASE WHEN pe IS NULL OR t > pe THEN 1 ELSE 0 END AS nw
        |  FROM m),
        |seg AS (
        |  SELECT user_id, t, en,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |sess AS (
        |  SELECT user_id, sid, min(t) AS s, max(en) AS x
        |  FROM seg GROUP BY 1, 2)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(x - s) AS BIGINT) AS covered_micros,
        |  CAST(max(x - s) AS BIGINT) AS longest_micros
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,

    // q245: same md5-prefix uniforms, same integer floor-div
    // priorities, same (priority desc, key) top-50.
    "q245_priority_sample" ->
      """WITH h AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS BIGINT) AS w_cents,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |      ::BIGINT AS hk
        |  FROM orders),
        |p AS (
        |  SELECT o_orderkey, w_cents,
        |    CAST((CAST(w_cents AS HUGEINT) * 1000000000) // (hk + 1)
        |      AS BIGINT) AS priority
        |  FROM h),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY priority DESC, o_orderkey) AS rn
        |  FROM p)
        |SELECT o_orderkey, w_cents, priority FROM r
        |WHERE rn <= 50 ORDER BY priority DESC, o_orderkey""".stripMargin,

    // q246: the union-of-micro-batches ≡ static-join invariant — the
    // oracle is the PLAIN join + rollup; any batching artifact
    // (dropped/duplicated rows at trigger boundaries) hash-fails.
    "q246_stream_enrich" ->
      """SELECT c_mktsegment, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q247: weighted rank definition — repeat each balance w times
    // conceptually; in SQL, cumulative weight over the ordered
    // histogram, value at integer weighted position.
    "q247_weighted_quantiles" ->
      """WITH w AS (
        |  SELECT o_custkey, count(*) AS w FROM orders GROUP BY 1),
        |h AS (
        |  SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS b,
        |    sum(w.w) AS c
        |  FROM customer JOIN w ON c_custkey = o_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT c_mktsegment, b,
        |    sum(c) OVER (PARTITION BY c_mktsegment ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM h)
        |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS total_weight,
        |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN b END) AS DOUBLE)
        |    AS median_bal,
        |  CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN b END)
        |    AS DOUBLE) AS p90_bal
        |FROM r GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // q248: conditional-count pivot — the wide matrix by definition.
    "q248_pivot" ->
      """WITH p AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS n_purchase,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS n_signup,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view
        |  FROM events GROUP BY 1)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(n_click AS BIGINT) AS n_click,
        |  CAST(n_error AS BIGINT) AS n_error,
        |  CAST(n_purchase AS BIGINT) AS n_purchase,
        |  CAST(n_signup AS BIGINT) AS n_signup,
        |  CAST(n_view AS BIGINT) AS n_view,
        |  CAST(n_click + n_error + n_purchase + n_signup + n_view
        |    AS BIGINT) AS n_total
        |FROM p ORDER BY user_id""".stripMargin,

    // q249: UNION ALL is the unpivot's semantic definition.
    "q249_unpivot" ->
      """WITH v AS (
        |  SELECT CAST(l_quantity AS DECIMAL(18,0)) AS q,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS p,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS d
        |  FROM lineitem),
        |u AS (
        |  SELECT 'quantity' AS measure, CAST(q AS BIGINT) AS value FROM v
        |  UNION ALL
        |  SELECT 'price_cents', CAST(p AS BIGINT) FROM v
        |  UNION ALL
        |  SELECT 'discount_cents', CAST(d AS BIGINT) FROM v)
        |SELECT measure, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value) AS BIGINT) AS total,
        |  CAST(min(value) AS BIGINT) AS min_value,
        |  CAST(max(value) AS BIGINT) AS max_value
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // q250: the same unrolled 8-bit interleave in DuckDB bit ops.
    "q250_zorder_key" ->
      """WITH b AS (
        |  SELECT p_partkey,
        |    least(255, CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2))
        |      * 100 AS DECIMAL(18,0)) AS BIGINT) * 256 // 200000)
        |      AS bx,
        |    least(255, (CAST(p_size AS BIGINT) - 1) * 256 // 50) AS by
        |  FROM part WHERE p_partkey % 7 = 0)
        |SELECT p_partkey, CAST(bx AS BIGINT) AS bucket_price,
        |  CAST(by AS BIGINT) AS bucket_size,
        |  CAST(
        |    ((bx >> 0) & 1) * 1 + ((by >> 0) & 1) * 2 +
        |    ((bx >> 1) & 1) * 4 + ((by >> 1) & 1) * 8 +
        |    ((bx >> 2) & 1) * 16 + ((by >> 2) & 1) * 32 +
        |    ((bx >> 3) & 1) * 64 + ((by >> 3) & 1) * 128 +
        |    ((bx >> 4) & 1) * 256 + ((by >> 4) & 1) * 512 +
        |    ((bx >> 5) & 1) * 1024 + ((by >> 5) & 1) * 2048 +
        |    ((bx >> 6) & 1) * 4096 + ((by >> 6) & 1) * 8192 +
        |    ((bx >> 7) & 1) * 16384 + ((by >> 7) & 1) * 32768
        |    AS BIGINT) AS zcode
        |FROM b ORDER BY zcode, p_partkey""".stripMargin,

    // q251: the brute-force all-pairs PROOF of the lossless ≤2-deletion
    // neighborhood blocking — every ed≤2 pair, no blocking at all (the
    // length prefilter is a pure speedup: ||a|−|b|| > 2 ⇒ ed > 2).
    "q251_edit_distance_join" ->
      """WITH s AS (
        |  SELECT p_partkey AS id, p_name AS name FROM part
        |  WHERE p_partkey % 4 = 0)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM s a JOIN s b ON a.id < b.id
        |  AND abs(length(a.name) - length(b.name)) <= 2
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY 1, 2""".stripMargin,

    // q252: identical distinct grid, min-fold cohorts, count matrix,
    // integer retention.
    "q252_retention_matrix" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1),
        |sz AS (SELECT cw, count(*) AS n FROM c GROUP BY 1),
        |m AS (
        |  SELECT c.cw, uw.wk - c.cw AS o, count(*) AS act
        |  FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT CAST(m.cw AS BIGINT) AS cohort_week,
        |  CAST(m.o AS BIGINT) AS "offset",
        |  CAST(sz.n AS BIGINT) AS cohort_size,
        |  CAST(m.act AS BIGINT) AS n_active,
        |  CAST((m.act * 1000000) // sz.n AS BIGINT) AS retention_micros
        |FROM m JOIN sz USING (cw)
        |ORDER BY 1, 2""".stripMargin,

    // q253: the bitmap pipeline IS count(distinct) — the oracle states
    // the definition directly; n_words = distinct 64-id buckets.
    "q253_bitmap_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT user_id // 64) AS BIGINT) AS n_words
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // q264: bitmap set algebra vs first principles — every type pair's
    // overlap recomputed from the raw distinct-user sets (q253's oracle
    // extended pairwise): intersect via an id-level self-join, union by
    // inclusion-exclusion, jaccard integer-scaled. Pair spine is the
    // cross of the per-type totals so disjoint pairs report zeros.
    "q264_bitmap_setops" ->
      """WITH u AS MATERIALIZED (
        |  SELECT DISTINCT event_type, user_id FROM events),
        |tot AS (SELECT event_type, count(*) AS n FROM u GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS i
        |  FROM u a JOIN u b USING (user_id)
        |  WHERE a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta.event_type AS type_a, tb.event_type AS type_b,
        |  CAST(ta.n AS BIGINT) AS n_a,
        |  CAST(tb.n AS BIGINT) AS n_b,
        |  CAST(COALESCE(i.i, 0) AS BIGINT) AS n_intersect,
        |  CAST(ta.n + tb.n - COALESCE(i.i, 0) AS BIGINT) AS n_union,
        |  CAST(COALESCE(i.i, 0) * 1000000
        |    // (ta.n + tb.n - COALESCE(i.i, 0)) AS BIGINT)
        |    AS jaccard_micros
        |FROM tot ta JOIN tot tb ON ta.event_type < tb.event_type
        |LEFT JOIN i
        |  ON i.type_a = ta.event_type AND i.type_b = tb.event_type
        |ORDER BY 1, 2""".stripMargin,

    // q267: the DIRECT single-pass registers from first principles
    // (q100's integer-bit-length rho, q192's estimator), with
    // merge_consistent pinned TRUE — a shard-merge that drifts from
    // the direct build anywhere hash-fails.
    "q267_hll_shard_merge" ->
      """WITH h AS (
        |  SELECT event_type, user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv % 64 AS bucket,
        |    CASE WHEN hv // 64 = 0 THEN 27
        |         ELSE 27 - length(bin(hv // 64))
        |    END AS rho
        |  FROM h),
        |regs AS (SELECT event_type, bucket, max(rho) AS register
        |         FROM r GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, unnest(range(0, 64)) AS bucket
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |f AS (
        |  SELECT s.event_type, s.bucket,
        |    coalesce(regs.register, 0) AS register
        |  FROM spine s LEFT JOIN regs
        |    ON s.event_type = regs.event_type AND s.bucket = regs.bucket),
        |summ AS (
        |  SELECT event_type,
        |    sum(1::BIGINT << CAST(27 - register AS INTEGER)) AS sum_pow,
        |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS n_zero
        |  FROM f GROUP BY 1),
        |ex AS (
        |  SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT f.event_type,
        |  CAST(f.bucket AS INTEGER) AS bucket,
        |  CAST(f.register AS BIGINT) AS register,
        |  CAST(ex.n_exact AS BIGINT) AS n_exact,
        |  CAST(CASE WHEN ((0.709::DOUBLE * 4096.0::DOUBLE)
        |      * 134217728.0::DOUBLE) / CAST(summ.sum_pow AS DOUBLE)
        |        <= 160.0
        |      AND summ.n_zero > 0
        |    THEN floor(64.0::DOUBLE
        |      * ln(64.0::DOUBLE / CAST(summ.n_zero AS DOUBLE))
        |      * 1000000.0::DOUBLE)
        |    ELSE floor((((0.709::DOUBLE * 4096.0::DOUBLE)
        |      * 134217728.0::DOUBLE) / CAST(summ.sum_pow AS DOUBLE))
        |      * 1000000.0::DOUBLE)
        |  END AS BIGINT) AS est_micros,
        |  TRUE AS merge_consistent
        |FROM f JOIN summ USING (event_type) JOIN ex USING (event_type)
        |ORDER BY event_type, bucket""".stripMargin,

    // q268: the plain level-3 definition — frequent-item baskets,
    // 3-way self-join, HAVING the support floor — so the engine's
    // pair-based candidate pruning is proven lossless at the gate.
    "q268_apriori_triples" ->
      """WITH b AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |nb AS (
        |  SELECT greatest(25, count(DISTINCT o) // 600) AS mi,
        |    greatest(2, count(DISTINCT o) // 7500) AS mt
        |  FROM b),
        |sup AS (SELECT p, count(*) AS s FROM b GROUP BY 1),
        |fb AS MATERIALIZED (
        |  SELECT b.o, b.p FROM b JOIN sup USING (p)
        |  WHERE sup.s >= (SELECT mi FROM nb)),
        |t AS (
        |  SELECT a.p AS part_a, b2.p AS part_b, c.p AS part_c,
        |    count(*) AS support
        |  FROM fb a
        |  JOIN fb b2 ON a.o = b2.o AND a.p < b2.p
        |  JOIN fb c ON a.o = c.o AND b2.p < c.p
        |  GROUP BY 1, 2, 3
        |  HAVING count(*) >= (SELECT mt FROM nb))
        |SELECT CAST(part_a AS BIGINT) AS part_a,
        |  CAST(part_b AS BIGINT) AS part_b,
        |  CAST(part_c AS BIGINT) AS part_c,
        |  CAST(support AS BIGINT) AS support
        |FROM t
        |ORDER BY support DESC, part_a, part_b, part_c""".stripMargin,

    // q270: the KMV sketches, union-merge, estimators AND the exact
    // audit all replayed from first principles — same md5 hashes,
    // same k=64 row_number sketch cut, same integer estimators.
    "q270_kmv_jaccard" ->
      """WITH np AS MATERIALIZED (
        |  SELECT DISTINCT CAST(s.s_nationkey AS INTEGER) AS nk,
        |    ('0x' || substr(md5(CAST(l.l_partkey AS VARCHAR)), 1, 8))
        |      ::BIGINT AS h
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |cnt AS (SELECT nk, count(*) AS c FROM np GROUP BY 1),
        |inter AS (
        |  SELECT a.nk AS na, b.nk AS nb, count(*) AS i
        |  FROM np a JOIN np b ON a.h = b.h AND a.nk < b.nk
        |  GROUP BY 1, 2),
        |sk AS MATERIALIZED (
        |  SELECT nk, h FROM (
        |    SELECT nk, h,
        |      row_number() OVER (PARTITION BY nk ORDER BY h) AS rn
        |    FROM np) WHERE rn <= 64),
        |spine AS (SELECT a.nk AS na, b.nk AS nb
        |          FROM cnt a JOIN cnt b ON a.nk < b.nk),
        |uv AS (
        |  SELECT na, nb, h, max(ia) AS ia, max(ib) AS ib FROM (
        |    SELECT s.na, s.nb, k.h, 1 AS ia, 0 AS ib
        |    FROM spine s JOIN sk k ON k.nk = s.na
        |    UNION ALL
        |    SELECT s.na, s.nb, k.h, 0, 1
        |    FROM spine s JOIN sk k ON k.nk = s.nb)
        |  GROUP BY 1, 2, 3),
        |pair AS (
        |  SELECT na, nb, count(*) AS ku, max(h) AS hk,
        |    sum(ia * ib) AS ov
        |  FROM (SELECT na, nb, h, ia, ib,
        |          row_number() OVER (PARTITION BY na, nb ORDER BY h)
        |            AS rn
        |        FROM uv)
        |  WHERE rn <= 64 GROUP BY 1, 2)
        |SELECT p.na AS nation_a, p.nb AS nation_b,
        |  CAST(p.ku AS BIGINT) AS k_union,
        |  CAST(p.hk AS BIGINT) AS union_kth_hash,
        |  CAST(p.ov AS BIGINT) AS sketch_overlap,
        |  CAST(CASE WHEN p.ku < 64 THEN p.ku
        |       ELSE (63 * 4294967296) // p.hk END AS BIGINT)
        |    AS union_est,
        |  CAST((1000000 * p.ov) // p.ku AS BIGINT) AS jacc_est_micros,
        |  CAST(ca.c + cb.c - i.i AS BIGINT) AS exact_union,
        |  CAST(i.i AS BIGINT) AS exact_inter,
        |  CAST((1000000 * i.i) // (ca.c + cb.c - i.i) AS BIGINT)
        |    AS jacc_exact_micros
        |FROM pair p JOIN inter i ON i.na = p.na AND i.nb = p.nb
        |JOIN cnt ca ON ca.nk = p.na JOIN cnt cb ON cb.nk = p.nb
        |ORDER BY nation_a, nation_b""".stripMargin,

    // q271: the whole bootstrap replayed — same md5-mod-10⁶ uniforms,
    // same integer Poisson-CDF ladder, same floor-division replicate
    // means and order-statistic CI ranks.
    "q271_poisson_bootstrap" ->
      """WITH o AS MATERIALIZED (
        |  SELECT CAST(c.c_nationkey AS INTEGER) AS nk, o.o_orderkey,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |grp AS (SELECT unnest(range(0, 16)) AS g),
        |wrd AS (SELECT unnest(range(0, 4)) AS j),
        |hx AS (
        |  SELECT nk, g, cents,
        |    md5(o_orderkey::VARCHAR || ':' || g::VARCHAR) AS hex
        |  FROM o CROSS JOIN grp),
        |u AS (
        |  SELECT nk, g * 4 + j AS b, cents,
        |    ('0x' || substr(hex, CAST(j * 8 + 1 AS INTEGER), 8))
        |      ::BIGINT % 1000000 AS u
        |  FROM hx CROSS JOIN wrd),
        |wt AS (
        |  SELECT nk, b, cents,
        |      (CASE WHEN u >= 367879 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 735758 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 919698 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 981011 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 996340 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 999405 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 999916 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 999989 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 999998 THEN 1 ELSE 0 END)
        |    + (CASE WHEN u >= 999999 THEN 1 ELSE 0 END) AS w
        |  FROM u),
        |m AS (
        |  SELECT nk, b, sum(w * cents) // sum(w) AS mean
        |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
        |r AS (SELECT nk, count(*) AS rr FROM m GROUP BY 1),
        |rk AS (
        |  SELECT nk, mean,
        |    row_number() OVER (PARTITION BY nk ORDER BY mean, b) AS rn
        |  FROM m),
        |sel AS (
        |  SELECT rk.nk, rk.mean FROM rk JOIN r USING (nk)
        |  WHERE rk.rn = (r.rr * 25 + 999) // 1000
        |     OR rk.rn = r.rr - ((r.rr * 25 + 999) // 1000) + 1),
        |ci AS (SELECT nk, min(mean) AS lo, max(mean) AS hi
        |       FROM sel GROUP BY 1),
        |pt AS (SELECT nk, count(*) AS n_orders,
        |         sum(cents) // count(*) AS pm
        |       FROM o GROUP BY 1)
        |SELECT pt.nk AS nationkey,
        |  CAST(pt.n_orders AS BIGINT) AS n_orders,
        |  CAST(pt.pm AS BIGINT) AS point_mean_cents,
        |  CAST(r.rr AS BIGINT) AS n_replicates,
        |  CAST(ci.lo AS BIGINT) AS ci_lo_cents,
        |  CAST(ci.hi AS BIGINT) AS ci_hi_cents
        |FROM pt JOIN r ON r.nk = pt.nk JOIN ci ON ci.nk = pt.nk
        |ORDER BY nationkey""".stripMargin,

    // q272: the plain global row_number statement of the same type-1
    // boundaries — rank targets, NDV, min/max all exact integers.
    "q272_equidepth_stats" ->
      """WITH v AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS cents
        |  FROM lineitem),
        |s AS (
        |  SELECT count(*) AS n, count(DISTINCT cents) AS ndv,
        |    min(cents) AS mn, max(cents) AS mx
        |  FROM v),
        |r AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents) AS rn
        |  FROM v),
        |b AS (SELECT unnest(range(1, 17)) AS bin),
        |t AS (
        |  SELECT bin, (bin * n + 15) // 16 AS target, n, ndv, mn, mx
        |  FROM b CROSS JOIN s)
        |SELECT CAST(t.bin AS INTEGER) AS bin,
        |  CAST(t.target AS BIGINT) AS target_rank,
        |  CAST(r.cents AS BIGINT) AS boundary_cents,
        |  CAST(t.n AS BIGINT) AS n_rows,
        |  CAST(t.ndv AS BIGINT) AS ndv_cents,
        |  CAST(t.mn AS BIGINT) AS min_cents,
        |  CAST(t.mx AS BIGINT) AS max_cents
        |FROM t JOIN r ON r.rn = t.target
        |ORDER BY bin""".stripMargin,

    // q273: stream-final registers must equal the batch direct build —
    // q267's register scheme per event type, q192's estimator.
    "q273_stream_hll" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv % 64 AS bucket,
        |    CASE WHEN hv // 64 = 0 THEN 27
        |         ELSE 27 - length(bin(hv // 64))
        |    END AS rho
        |  FROM h),
        |regs AS (SELECT event_type, bucket, max(rho) AS register
        |         FROM r GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, unnest(range(0, 64)) AS bucket
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |f AS (
        |  SELECT s.event_type, s.bucket,
        |    coalesce(regs.register, 0) AS register
        |  FROM spine s LEFT JOIN regs
        |    ON s.event_type = regs.event_type AND s.bucket = regs.bucket),
        |summ AS (
        |  SELECT event_type,
        |    sum(1::BIGINT << CAST(27 - register AS INTEGER)) AS sum_pow,
        |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS n_zero
        |  FROM f GROUP BY 1),
        |ex AS (
        |  SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT f.event_type,
        |  CAST(f.bucket AS INTEGER) AS bucket,
        |  CAST(f.register AS BIGINT) AS register,
        |  CAST(ex.n_exact AS BIGINT) AS n_exact,
        |  CAST(CASE WHEN ((0.709::DOUBLE * 4096.0::DOUBLE)
        |      * 134217728.0::DOUBLE) / CAST(summ.sum_pow AS DOUBLE)
        |        <= 160.0
        |      AND summ.n_zero > 0
        |    THEN floor(64.0::DOUBLE
        |      * ln(64.0::DOUBLE / CAST(summ.n_zero AS DOUBLE))
        |      * 1000000.0::DOUBLE)
        |    ELSE floor((((0.709::DOUBLE * 4096.0::DOUBLE)
        |      * 134217728.0::DOUBLE) / CAST(summ.sum_pow AS DOUBLE))
        |      * 1000000.0::DOUBLE)
        |  END AS BIGINT) AS est_micros
        |FROM f JOIN summ USING (event_type) JOIN ex USING (event_type)
        |ORDER BY event_type, bucket""".stripMargin,

    // q274: the definition, unbucketed — O(n²) theta join for
    // eps-neighbors (losslessness of the grid bucketing, like q256),
    // recursive min-label walk for core clusters (q52's pattern),
    // min-core-neighbor border election, noise elsewhere.
    "q274_dbscan" ->
      """WITH RECURSIVE
        |n AS (SELECT CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)))
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
        |deg AS (
        |  SELECT id, count(*) AS d FROM (
        |    SELECT id_a AS id FROM pr
        |    UNION ALL SELECT id_b AS id FROM pr)
        |  GROUP BY 1),
        |core AS MATERIALIZED (SELECT id FROM deg WHERE d >= 3),
        |ce AS (
        |  SELECT pr.id_a, pr.id_b FROM pr
        |  JOIN core a ON a.id = pr.id_a
        |  JOIN core b ON b.id = pr.id_b),
        |edges AS MATERIALIZED (
        |  SELECT id_a AS src, id_b AS dst FROM ce
        |  UNION SELECT id_b AS src, id_a AS dst FROM ce),
        |walk AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.src AS id, w.label FROM walk w
        |  JOIN edges e ON e.dst = w.id),
        |lab AS (SELECT id, min(label) AS comp FROM walk GROUP BY id),
        |corelab AS MATERIALIZED (
        |  SELECT c.id, coalesce(l.comp, c.id) AS cluster
        |  FROM core c LEFT JOIN lab l ON l.id = c.id),
        |nb AS (
        |  SELECT id_a AS id, id_b AS nb FROM pr
        |  UNION ALL SELECT id_b AS id, id_a AS nb FROM pr),
        |border AS (
        |  SELECT nb.id, min(cl.cluster) AS cluster
        |  FROM nb JOIN corelab cl ON cl.id = nb.nb
        |  WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.id = nb.id)
        |  GROUP BY nb.id),
        |asg AS (
        |  SELECT id, 'core' AS role, cluster FROM corelab
        |  UNION ALL
        |  SELECT id, 'border' AS role, cluster FROM border)
        |SELECT CAST(c.c_custkey AS BIGINT) AS id,
        |  coalesce(a.role, 'noise') AS role,
        |  CAST(coalesce(a.cluster, -1) AS BIGINT) AS cluster
        |FROM customer c LEFT JOIN asg a ON a.id = c.c_custkey
        |ORDER BY id""".stripMargin,

    // q275: the ≤6-edge min-cost definition as a depth-limited
    // recursive walk over the same md5 point grid (q274's geometry),
    // unbucketed theta join for edges.
    "q275_weighted_paths" ->
      """WITH RECURSIVE
        |n AS (SELECT CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)))
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
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS w
        |  FROM p a JOIN p b ON a.id < b.id
        |    AND (a.x - b.x) * (a.x - b.x)
        |      + (a.y - b.y) * (a.y - b.y) <= 1000000),
        |edges AS MATERIALIZED (
        |  SELECT id_a AS src, id_b AS dst, w FROM pr
        |  UNION ALL SELECT id_b AS src, id_a AS dst, w FROM pr),
        |seeds AS (SELECT id FROM p WHERE id % 50 = 0),
        |walk AS (
        |  SELECT id, CAST(0 AS BIGINT) AS cost, 0 AS depth FROM seeds
        |  UNION
        |  SELECT e.dst AS id, w.cost + e.w AS cost, w.depth + 1 AS depth
        |  FROM walk w JOIN edges e ON e.src = w.id
        |  WHERE w.depth < 6)
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(min(cost) AS BIGINT) AS min_cost
        |FROM walk GROUP BY id
        |ORDER BY id""".stripMargin,

    // q254: incremental merge of self-maintainable partials must equal
    // the full aggregate by definition — oracle pins the definition
    // with `consistent` hard-coded TRUE, so any drift in the
    // incremental path hash-fails.
    "q254_incremental_rollup" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM orders)
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(c) AS BIGINT) AS sum_cents,
        |  TRUE AS consistent
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    // q255: closed-form CUSUM — prefix of exact-rational deviations
    // minus its running min; alarm cross-multiplied, no division.
    "q255_cusum" -> cusumOracle,

    // q261: the streaming composition must land exactly on the batch
    // definition — the oracle IS q255's.
    "q261_stream_cusum" -> cusumOracle,

    // q263: same integer sufficient statistics, same decimal θ and
    // cross-multiplied adjusted means (HUGEINT on this side).
    "q263_cuped" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey,
        |    sum(CASE WHEN year(o_orderdate) <= 1997 THEN c ELSE 0 END)
        |      AS x,
        |    sum(CASE WHEN year(o_orderdate) > 1997 THEN c ELSE 0 END)
        |      AS y
        |  FROM (SELECT o_custkey, o_orderdate,
        |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |        AS BIGINT) AS c
        |    FROM orders)
        |  GROUP BY 1),
        |pt AS MATERIALIZED (
        |  SELECT o_custkey, x, y,
        |    ('0x' || substr(md5('t:' || CAST(o_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 2 AS t
        |  FROM per),
        |st AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM pt),
        |th AS (
        |  SELECT n, sx,
        |    (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
        |      * 1000000
        |      // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
        |      AS t6
        |  FROM st)
        |SELECT CAST(pt.t AS BIGINT) AS t,
        |  CAST(count(*) AS BIGINT) AS n_units,
        |  CAST(sum(pt.y) AS BIGINT) AS sum_y_cents,
        |  CAST(CAST(sum(pt.y) AS HUGEINT) * 1000000 // count(*)
        |    AS BIGINT) AS mean_y_micros,
        |  CAST(sum(CAST(pt.y AS HUGEINT) * 1000000 * th.n
        |      - th.t6 * (CAST(pt.x AS HUGEINT) * th.n - th.sx))
        |    // (CAST(count(*) AS HUGEINT) * th.n) AS BIGINT)
        |    AS mean_yadj_micros,
        |  CAST(th.t6 AS BIGINT) AS theta_micros
        |FROM pt CROSS JOIN th
        |GROUP BY pt.t, th.n, th.sx, th.t6
        |ORDER BY 1""".stripMargin,

    // q262: same md5 rendezvous hashes, argmax via row_number with
    // the identical (hash DESC, shard ASC) tie order.
    "q262_rendezvous_shards" ->
      """WITH h AS MATERIALIZED (
        |  SELECT o_orderkey, sh.s AS s,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |      || CAST(sh.s AS VARCHAR)), 1, 8))::BIGINT AS hv
        |  FROM orders
        |  CROSS JOIN (SELECT unnest(range(10)) AS s) sh),
        |a10 AS MATERIALIZED (
        |  SELECT o_orderkey, s AS shard10 FROM (
        |    SELECT o_orderkey, s, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY hv DESC, s ASC) AS rk
        |    FROM h) WHERE rk = 1),
        |a9 AS MATERIALIZED (
        |  SELECT o_orderkey, s AS shard9 FROM (
        |    SELECT o_orderkey, s, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY hv DESC, s ASC) AS rk
        |    FROM h WHERE s < 9) WHERE rk = 1),
        |j AS MATERIALIZED (
        |  SELECT a10.o_orderkey, shard10, shard9
        |  FROM a10 JOIN a9 USING (o_orderkey)),
        |dep AS (
        |  SELECT shard10 AS shard, count(*) AS n_keys,
        |    sum(CASE WHEN shard9 <> shard10 THEN 1 ELSE 0 END)
        |      AS n_departures
        |  FROM j GROUP BY 1),
        |arr AS (
        |  SELECT shard9 AS shard, count(*) AS n_arrivals
        |  FROM j WHERE shard9 <> shard10 GROUP BY 1)
        |SELECT CAST(dep.shard AS BIGINT) AS shard,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(n_departures AS BIGINT) AS n_departures,
        |  CAST(coalesce(arr.n_arrivals, 0) AS BIGINT) AS n_arrivals
        |FROM dep LEFT JOIN arr ON arr.shard = dep.shard
        |ORDER BY 1""".stripMargin,

    // q260: common-neighbor counts from the brute edge set, NOT
    // EXISTS for the anti join, integer-micros Jaccard.
    "q260_link_predict" ->
      s"""WITH $GridPointsCte,
        |e AS MATERIALIZED (
        |  SELECT a.id AS ia, b.id AS ib
        |  FROM p a JOIN p b ON a.id < b.id
        |  WHERE (a.x - b.x) * (a.x - b.x)
        |    + (a.y - b.y) * (a.y - b.y) <= 4000000),
        |adj AS MATERIALIZED (SELECT ia AS id, ib AS nb FROM e
        |  UNION ALL SELECT ib, ia FROM e),
        |dg AS MATERIALIZED (
        |  SELECT id, count(*) AS d FROM adj GROUP BY 1),
        |cn AS MATERIALIZED (
        |  SELECT l.nb AS id_a, r.nb AS id_b, count(*) AS c
        |  FROM adj l JOIN adj r ON l.id = r.id AND l.nb < r.nb
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT cn.id_a, cn.id_b, CAST(cn.c AS BIGINT)
        |    AS common_neighbors,
        |  CAST(cn.c * 1000000 // (da.d + db.d - cn.c) AS BIGINT)
        |    AS jaccard_micros
        |FROM cn
        |JOIN dg da ON da.id = cn.id_a
        |JOIN dg db ON db.id = cn.id_b
        |WHERE NOT EXISTS (SELECT 1 FROM e
        |  WHERE e.ia = cn.id_a AND e.ib = cn.id_b)
        |ORDER BY 1, 2""".stripMargin,

    // q256: the O(n²) theta join IS the proof that cell bucketing
    // loses no pair — same md5-grid projection, exact integer dist².
    "q256_grid_radius_join" ->
      s"""WITH $GridPointsCte
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST((a.x - b.x) * (a.x - b.x)
        |    + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.x - b.x) * (a.x - b.x)
        |  + (a.y - b.y) * (a.y - b.y) <= 4000000
        |ORDER BY 1, 2""".stripMargin,

    // q257: the peel unrolled kCoreMaxRounds times over the brute-
    // force edge set — one degree CTE + one survivor CTE per round.
    "q257_kcore" -> kCoreOracle,

    // q259: the coupled level/trend recurrence replayed as a
    // recursive CTE — // truncates toward zero exactly like Spark's
    // DIV (both measured), so negative trend steps stay identical.
    "q259_holt_trend" ->
      """WITH RECURSIVE d AS (
        |  SELECT n_name, CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS y
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT n_name, y,
        |    row_number() OVER (PARTITION BY n_name ORDER BY day) AS rn,
        |    count(*) OVER (PARTITION BY n_name) AS n
        |  FROM d),
        |r AS (
        |  SELECT n_name, rn, n, y AS l, CAST(0 AS BIGINT) AS t
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.n_name, o.rn, o.n,
        |    (200000 * o.y + 800000 * (r.l + r.t)) // 1000000,
        |    (100000 * (((200000 * o.y + 800000 * (r.l + r.t))
        |      // 1000000) - r.l) + 900000 * r.t) // 1000000
        |  FROM r JOIN o ON o.n_name = r.n_name AND o.rn = r.rn + 1)
        |SELECT n_name, CAST(n AS BIGINT) AS n_days,
        |  CAST(l AS BIGINT) AS level_cents,
        |  CAST(t AS BIGINT) AS trend_cents,
        |  CAST(l + t AS BIGINT) AS forecast_next_cents
        |FROM r WHERE rn = n ORDER BY n_name""".stripMargin,

    // q258: running peak per nation's daily series, fold to the max
    // decline — exact integer cents.
    "q258_max_drawdown" ->
      """WITH daily AS (
        |  SELECT n_name, CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS r
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |pk AS (
        |  SELECT n_name, r,
        |    max(r) OVER (PARTITION BY n_name ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pe
        |  FROM daily)
        |SELECT n_name,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(max(r) AS BIGINT) AS peak_day_cents,
        |  CAST(max(pe - r) AS BIGINT) AS max_drawdown_cents
        |FROM pk GROUP BY 1 ORDER BY 1""".stripMargin,

    // q142: compaction is a pure layout move — identity aggregates come
    // straight off the source table; layout_ok is pinned TRUE (the
    // Spark side recomputes it from the actual output listing).
    "q142_compaction_identity" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS total_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
        |  TRUE AS layout_ok
        |FROM lineitem""".stripMargin,

    // q139: the TPC-H Q5 shape verbatim; decimal(18,4) product-sum.
    "q139_star_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    // q140: the correlated-avg threshold cross-multiplied in exact
    // decimals (qty*5*n < sum), so no division and no boundary drift.
    "q140_small_qty_revenue" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS n_small,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem JOIN pp USING (l_partkey)
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq""".stripMargin,

    // q132: the bucketed co-located join must equal the plain join's
    // aggregate — layout is invisible to semantics.
    "q132_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // q135: open/close by the same total (ts, event_id) order as the
    // Spark window; raw doubles are selections (no arithmetic), the
    // total goes through decimal.
    "q135_ohlc_bars" ->
      """WITH b AS (
        |  SELECT event_type,
        |    date_trunc('hour', ts) AS bar_ts, ts, event_id, value,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT event_type, bar_ts,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM b GROUP BY event_type, bar_ts
        |ORDER BY event_type, bar_ts""".stripMargin,

    // q136: identical bit-interleave arithmetic (see zInterleave);
    // DuckDB's // on non-negative z = Spark's div.
    "q136_zorder_layout" ->
      s"""WITH d AS (
         |  SELECT user_id % 1024 AS x,
         |    CAST(floor(value) AS BIGINT) % 1024 AS y
         |  FROM events),
         |z AS (SELECT x, y, ${zInterleave("x", "y", 10)} AS z FROM d)
         |SELECT z // 16384 AS z_range, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY z_range ORDER BY z_range""".stripMargin,

    // q137: backward and forward candidates within tolerance, nearest
    // by interval distance, tie -> backward (earlier) — mirroring
    // asOfJoinNearest's useB rule exactly.
    "q137_asof_nearest" ->
      """WITH e AS (
        |  SELECT user_id, event_id AS error_id, ts FROM events
        |  WHERE event_type = 'error'),
        |p AS (
        |  SELECT user_id, ts AS pts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts),
        |b AS (
        |  SELECT e.user_id, e.error_id, e.ts, max(p.pts) AS bts
        |  FROM e LEFT JOIN p ON e.user_id = p.user_id
        |    AND p.pts <= e.ts AND p.pts >= e.ts - INTERVAL 2 HOUR
        |  GROUP BY e.user_id, e.error_id, e.ts),
        |f AS (
        |  SELECT e.user_id, e.error_id, min(p.pts) AS fts
        |  FROM e LEFT JOIN p ON e.user_id = p.user_id
        |    AND p.pts >= e.ts AND p.pts <= e.ts + INTERVAL 2 HOUR
        |  GROUP BY e.user_id, e.error_id),
        |pick AS (
        |  SELECT b.user_id, b.error_id,
        |    CASE WHEN b.bts IS NOT NULL
        |           AND (f.fts IS NULL OR (b.ts - b.bts) <= (f.fts - b.ts))
        |         THEN b.bts ELSE f.fts END AS mts
        |  FROM b JOIN f ON b.user_id = f.user_id AND b.error_id = f.error_id)
        |SELECT pick.user_id, pick.error_id, p.purchase_id
        |FROM pick LEFT JOIN p
        |  ON pick.user_id = p.user_id AND p.pts = pick.mts
        |ORDER BY pick.user_id, pick.error_id""".stripMargin,

    // q138: same position-mask blocking, same levenshtein post-check.
    "q138_hamming_neighbors" ->
      """WITH v AS (SELECT c_custkey AS id, c_name AS s FROM customer),
        |m AS (SELECT id, s,
        |        unnest(generate_series(1, length(s))) AS pos FROM v),
        |k AS (SELECT id, s, pos,
        |        substr(s, 1, pos - 1) || substr(s, pos + 1, length(s)) AS k
        |      FROM m),
        |pr AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM k a JOIN k b ON a.pos = b.pos AND a.k = b.k AND a.id < b.id
        |  WHERE levenshtein(a.s, b.s) = 1),
        |ng AS (
        |  SELECT id, count(*) AS n_neighbors
        |  FROM (SELECT id_a AS id FROM pr
        |        UNION ALL SELECT id_b AS id FROM pr)
        |  GROUP BY id)
        |SELECT n_neighbors, count(*) AS n_customers
        |FROM ng GROUP BY n_neighbors ORDER BY n_neighbors""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date
        |FROM lineitem
        |WHERE l_quantity >= 45 AND l_discount > 0.05 AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_inlist" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_orderpriority NOT IN ('1-URGENT')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q04_broadcast_dim_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q05_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q08_except_distinct" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q09_except_all" ->
      """SELECT okey, count(*) AS n FROM (
        |  SELECT l_orderkey AS okey FROM lineitem
        |  EXCEPT ALL
        |  SELECT o_orderkey AS okey FROM orders)
        |GROUP BY okey ORDER BY okey""".stripMargin,

    "q10_union_tagged" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
        |    'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier)
        |ORDER BY src, id""".stripMargin,

    "q11_lead_lag" ->
      """SELECT o_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
        |  CAST(CAST(lead(o_orderdate, 1) OVER w AS DATE) AS TIMESTAMP) AS next_order_date,
        |  lag(o_totalprice, 1) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q12_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(min(ts) AS TIMESTAMP) AS ts_start,
        |  CAST(max(ts) AS TIMESTAMP) AS ts_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q13_elect_primary" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus AS status
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY
        |    CASE WHEN o_orderstatus = 'O' THEN 1
        |         WHEN o_orderstatus = 'P' THEN 2 ELSE 3 END,
        |    o_orderdate, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q14_keep_one_preferred" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q15_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q16_symmetric_diff" ->
      """WITH p AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |           WHERE o_orderstatus = 'P'),
        |o AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |      WHERE o_orderstatus = 'O')
        |SELECT custkey, 'left_only' AS side FROM p
        |WHERE custkey NOT IN (SELECT custkey FROM o)
        |UNION ALL
        |SELECT custkey, 'right_only' AS side FROM o
        |WHERE custkey NOT IN (SELECT custkey FROM p)
        |ORDER BY side, custkey""".stripMargin,

    "q17_latest_not_null" ->
      """SELECT user_id, event_id, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE value IS NOT NULL AND props IS NOT NULL)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q18_error_rollup" ->
      """SELECT md5(event_type) AS error_id, event_type, count(*) AS n,
        |  CAST(max(ts) AS TIMESTAMP) AS last_seen
        |FROM events WHERE event_type = 'error'
        |GROUP BY event_type ORDER BY error_id""".stripMargin,

    "q19_multiformat_dates" ->
      """WITH raw AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |         WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
        |         ELSE strftime(o_orderdate, '%Y') END AS raw_date
        |  FROM orders)
        |SELECT o_orderkey, raw_date,
        |  CASE WHEN o_orderkey % 3 = 0 THEN strptime(raw_date, '%Y-%m-%d')
        |       WHEN o_orderkey % 3 = 1 THEN strptime(raw_date, '%Y-%m')
        |       ELSE strptime(raw_date, '%Y') END AS parsed_ts,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 1
        |       WHEN o_orderkey % 3 = 1 THEN 31 ELSE 366 END AS precision
        |FROM raw ORDER BY o_orderkey""".stripMargin,

    "q20_tree_closure" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT 'r' || r_regionkey AS id, CAST(NULL AS VARCHAR) AS parent_id
        |  FROM region
        |  UNION ALL
        |  SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation),
        |t AS (
        |  SELECT id, id AS root_id, 0 AS depth, id AS path
        |  FROM nodes WHERE parent_id IS NULL
        |  UNION ALL
        |  SELECT n.id, t.root_id, t.depth + 1, t.path || '/' || n.id
        |  FROM nodes n JOIN t ON n.parent_id = t.id)
        |SELECT id, root_id, depth, path FROM t ORDER BY id""".stripMargin,

    "q21_scalar_suite" ->
      """SELECT c_custkey,
        |  lower(regexp_replace(c_name, '[^a-zA-Z0-9]+', '.', 'g')) || '@example.com' AS email,
        |  lower(regexp_replace(c_name, '[^a-zA-Z]+', '', 'g')) AS norm_name,
        |  CASE WHEN c_acctbal IS NULL THEN NULL
        |       WHEN c_acctbal > 0 THEN 'Y' ELSE 'N' END AS pos_bal,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  CASE WHEN c_mktsegment IS NOT NULL AND trim(c_mktsegment) <> ''
        |       THEN c_name || ' ' || trim(c_mktsegment) ELSE c_name END AS tagged_name
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q22_rollup" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name)
        |ORDER BY n_name NULLS FIRST""".stripMargin,

    "q23_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_stints" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    (event_type <> 'error') AS active,
        |    (event_type = 'purchase' AND value > 450) AS trunc
        |  FROM events),
        |w1 AS (
        |  SELECT *, row_number() OVER w AS pos, lag(active) OVER w AS prev_active
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |w2 AS (
        |  SELECT *, CASE WHEN pos = 1 THEN 1
        |    WHEN active AND NOT coalesce(prev_active, TRUE) THEN 1
        |    ELSE 0 END AS ns FROM w1),
        |w3 AS (
        |  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS stint_id,
        |    min(CASE WHEN trunc THEN pos END) OVER (PARTITION BY user_id) AS cut
        |  FROM w2)
        |SELECT user_id, event_id, stint_id FROM w3
        |WHERE cut IS NULL OR pos <= cut
        |ORDER BY user_id, event_id""".stripMargin,

    "q25_json_shred" ->
      """SELECT event_id,
        |  CASE WHEN json_valid(props)
        |       THEN TRY_CAST(props->>'$.k' AS INTEGER) END AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q26_freshness_guard" ->
      """WITH m AS (SELECT user_id, max(value) AS max_value
        |           FROM events GROUP BY user_id)
        |SELECT e.user_id, e.event_id, e.value
        |FROM events e JOIN m ON e.user_id = m.user_id AND e.value = m.max_value
        |ORDER BY e.user_id, e.event_id""".stripMargin,

    "q29_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             max(event_id) AS signup_event_id
        |      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
        |SELECT p.user_id, p.event_id, s.signup_event_id AS asof_signup_event_id
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q2a_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q28_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS running_total,
        |  count(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q27_snapshot_diff" ->
      """WITH o AS (SELECT o_custkey, o_orderstatus, o_orderpriority,
        |                  o_orderdate, o_orderkey FROM orders),
        |cur AS (
        |  SELECT o_custkey, o_orderstatus, o_orderpriority
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM o WHERE o_orderdate >= TIMESTAMP '1996-01-01')
        |  WHERE rn = 1),
        |hist AS (
        |  SELECT o_custkey, o_orderstatus, o_orderpriority
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM o WHERE o_orderdate < TIMESTAMP '1996-01-01')
        |  WHERE rn = 1)
        |SELECT * FROM (SELECT * FROM cur EXCEPT SELECT * FROM hist)
        |ORDER BY o_custkey, o_orderstatus, o_orderpriority""".stripMargin,

    "q43_error_accumulate" ->
      """WITH err AS (SELECT user_id, ts FROM events
        |             WHERE event_type = 'error'),
        |r1 AS (SELECT user_id, count(*) AS c FROM err
        |       WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id),
        |r2 AS (SELECT user_id, count(*) AS c FROM err
        |       WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY user_id)
        |SELECT COALESCE(r1.user_id, r2.user_id) AS user_id,
        |  COALESCE(r1.c, 0) + COALESCE(r2.c, 0) AS n,
        |  CASE WHEN r1.user_id IS NOT NULL
        |       THEN TIMESTAMP '2024-01-15' ELSE TIMESTAMP '2024-02-01'
        |  END AS first_seen,
        |  CASE WHEN r2.user_id IS NOT NULL
        |       THEN TIMESTAMP '2024-02-01' ELSE TIMESTAMP '2024-01-15'
        |  END AS last_seen,
        |  (r1.user_id IS NOT NULL) AS reported
        |FROM r1 FULL OUTER JOIN r2 ON r1.user_id = r2.user_id
        |ORDER BY user_id""".stripMargin,

    "q44_mptt_labels" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT 'r' || r_regionkey AS id, CAST(NULL AS VARCHAR) AS parent_id
        |  FROM region
        |  UNION ALL
        |  SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
        |  UNION ALL
        |  SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier),
        |edges AS (
        |  SELECT id, parent_id, lpad(CAST(row_number() OVER
        |    (PARTITION BY parent_id ORDER BY id) AS VARCHAR), 8, '0') AS seg
        |  FROM nodes WHERE parent_id IS NOT NULL),
        |t AS (
        |  SELECT id, id AS root_id, 0 AS depth, '' AS sortpath
        |  FROM nodes WHERE parent_id IS NULL
        |  UNION ALL
        |  SELECT e.id, t.root_id, t.depth + 1, t.sortpath || e.seg
        |  FROM edges e JOIN t ON e.parent_id = t.id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY root_id
        |    ORDER BY sortpath) AS preorder FROM t),
        |sizes AS (
        |  SELECT a.id, count(b.id) AS n_desc
        |  FROM ranked a LEFT JOIN ranked b
        |    ON b.root_id = a.root_id
        |   AND b.sortpath LIKE a.sortpath || '%'
        |   AND length(b.sortpath) > length(a.sortpath)
        |  GROUP BY a.id)
        |SELECT r.id, r.root_id, r.depth, r.preorder, z.n_desc,
        |  2 * (r.preorder - 1) - r.depth + 1 AS lft,
        |  2 * (r.preorder - 1) - r.depth + 1 + 2 * z.n_desc + 1 AS rgt
        |FROM ranked r JOIN sizes z ON r.id = z.id
        |ORDER BY r.id""".stripMargin,

    "q51_hash_split" ->
      """SELECT o_orderkey,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT o_orderkey,
        |        ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |          ::BIGINT % 100 AS b
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    // q76: identical md5 ranking + ceil quotas per stratum
    "q76_stratified_sample" ->
      """WITH base AS (SELECT o_orderkey, o_orderpriority FROM orders),
        |q AS (SELECT o_orderpriority,
        |        CAST(ceil(count(*) * 10 / 100.0) AS BIGINT) AS quota
        |      FROM base GROUP BY 1),
        |ranked AS (SELECT o_orderkey, o_orderpriority,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        |  FROM base)
        |SELECT r.o_orderkey, r.o_orderpriority
        |FROM ranked r JOIN q USING (o_orderpriority)
        |WHERE r.rn <= q.quota
        |ORDER BY r.o_orderkey""".stripMargin,

    "q45_salted_join" -> saltedJoinOracle,
    // same oracle by design: the hotKeys-overload query must equal the
    // identical plain inner join for ANY hot-key list
    "q45b_salted_join_hotkeys" -> saltedJoinOracle,
    // and the unsalted AQE control IS that plain inner join
    "q71_plain_join_aqe" -> saltedJoinOracle,
    // skew splitting must not change the answer: same plain-join oracle
    "q73_skew_split_join" -> saltedJoinOracle,

    // q93: the batch twin of the streamed dedup+window aggregate — the
    // stream saw slice 1 twice, so equality here proves the
    // in-watermark dedup absorbed the replay; time_bucket's sub-day
    // origin (2000-01-01) is epoch-aligned like Spark's window()
    "q93_stream_window_counts" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
        |    AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |       AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q130: string_agg with the same (ts, event_id) order, replace
    // arithmetic counts non-overlapping 'vcp' runs identically.
    "q130_sequence_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST((length(seq) - length(replace(seq, 'vcp', ''))) // 3
        |    AS BIGINT) AS n_funnels
        |FROM s ORDER BY user_id""".stripMargin,

    "q129_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |SELECT 'c_nationkey,c_mktsegment' AS quasi_identifiers,
        |  CAST(min(sz) AS BIGINT) AS k_min,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN sz < 10 THEN sz END), 0) AS BIGINT)
        |    AS at_risk_rows,
        |  round(CAST(coalesce(sum(CASE WHEN sz < 10 THEN sz END), 0)
        |    AS DOUBLE) / sum(sz), 6) AS risk_frac
        |FROM g""".stripMargin,

    // q128: the stream-static join's final table is the plain batch
    // join aggregate.
    "q128_stream_static_join" ->
      """SELECT user_id % 3 AS tier, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |    AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id % 3, event_type
        |ORDER BY tier, event_type""".stripMargin,

    // q127: the partition-pruned week rebuilt as a plain filtered
    // aggregate over the source table.
    "q127_partition_pruned_scan" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |    AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
        |  AND CAST(ts AS DATE) < DATE '2024-01-15'
        |GROUP BY CAST(ts AS DATE), event_type
        |ORDER BY event_date, event_type""".stripMargin,

    // q116: lag/cumsum sessionization at MICROsecond precision with the
    // session_window close rule (break on diff >= gap, vs q105's
    // millisecond strict->).
    "q116_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(v) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // q117: the same statistical aggregates; rounding absorbs the
    // engines' differing floating accumulation orders.
    "q117_group_stats" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // q114: melt of the pivot matrix — every (user, type) cell incl.
    // zeros, rebuilt relationally as a spine LEFT JOIN counts.
    "q114_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT unnest(['click','error','purchase','signup','view'])
        |        AS event_type),
        |c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY user_id, event_type)
        |SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n
        |FROM u CROSS JOIN t
        |LEFT JOIN c ON u.user_id = c.user_id
        |  AND t.event_type = c.event_type
        |ORDER BY u.user_id, t.event_type""".stripMargin,

    // q124: each constraint's metric recomputed independently; NOT
    // EXISTS (not NOT IN) for the referential check to stay
    // null-semantics-safe.
    "q124_data_quality" ->
      """SELECT * FROM (
        |  SELECT 'not_null:l_shipdate' AS "constraint",
        |    round(avg(CASE WHEN l_shipdate IS NULL THEN 1.0 ELSE 0.0 END),
        |      6) AS metric,
        |    avg(CASE WHEN l_shipdate IS NULL THEN 1.0 ELSE 0.0 END) <= 0.0
        |      AS pass
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_quantity[1.0,50.0]',
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |             THEN 1 ELSE 0 END) AS DOUBLE),
        |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |        THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_discount[0.0,0.1]',
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |             THEN 1 ELSE 0 END) AS DOUBLE),
        |    sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |        THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
        |      AS DOUBLE),
        |    count(o_orderkey) = count(DISTINCT o_orderkey)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'in_range:o_totalprice[0.0,100000.0]',
        |    CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 100000
        |             THEN 1 ELSE 0 END) AS DOUBLE),
        |    sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 100000
        |        THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ref:l_orderkey->o_orderkey',
        |    CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |      AS DOUBLE),
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |      = 0)
        |ORDER BY "constraint"""".stripMargin,

    // q123: "earliest at-or-after within tolerance" — the min following
    // purchase per error; because the minimum IS the closest following
    // match, min-within-tolerance equals match-then-tolerance-null.
    "q123_asof_forward" ->
      """WITH e AS (
        |  SELECT user_id, event_id AS error_id, ts FROM events
        |  WHERE event_type = 'error'),
        |p AS (
        |  SELECT user_id, ts AS pts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts),
        |m AS (
        |  SELECT e.user_id, e.error_id, min(p.pts) AS mts
        |  FROM e LEFT JOIN p ON e.user_id = p.user_id
        |    AND p.pts >= e.ts AND p.pts <= e.ts + INTERVAL 2 HOUR
        |  GROUP BY e.user_id, e.error_id)
        |SELECT m.user_id, m.error_id, p.purchase_id
        |FROM m LEFT JOIN p ON m.user_id = p.user_id AND p.pts = m.mts
        |ORDER BY m.user_id, m.error_id""".stripMargin,

    "q120_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority"""
        .stripMargin,

    "q121_rank_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q122_intersect" ->
      """WITH early AS (
        |  SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1998-01-01'),
        |late AS (
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
        |u AS (
        |  SELECT o_custkey, 'distinct' AS kind FROM
        |    (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
        |  UNION ALL
        |  SELECT o_custkey, 'all' AS kind FROM
        |    (SELECT o_custkey FROM early INTERSECT ALL
        |     SELECT o_custkey FROM late))
        |SELECT kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys
        |FROM u GROUP BY kind ORDER BY kind""".stripMargin,

    // q119: identical result contract to q108 — the stream-stream join
    // must reproduce the batch inequality join exactly.
    "q119_stream_stream_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS pts,
        |    ts + INTERVAL 2 HOUR AS pend
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, event_id AS error_id, ts FROM events
        |  WHERE event_type = 'error')
        |SELECT e.user_id, e.error_id, p.purchase_id
        |FROM e JOIN p ON e.user_id = p.user_id
        |  AND e.ts >= p.pts AND e.ts < p.pend
        |ORDER BY e.user_id, e.error_id, p.purchase_id""".stripMargin,

    // q113: batch count/min/max twin of the streaming keyed-state
    // accumulator, at full microsecond precision.
    "q113_stream_error_accumulate" ->
      """WITH e AS (
        |  SELECT md5(CAST(user_id AS VARCHAR) || ':' ||
        |             CAST(event_id % 7 AS VARCHAR)) AS error_id, ts
        |  FROM events WHERE event_type = 'error')
        |SELECT error_id, CAST(count(*) AS BIGINT) AS n,
        |  min(ts) AS first_seen, max(ts) AS last_seen
        |FROM e GROUP BY error_id ORDER BY error_id""".stripMargin,

    // q111: integer RANGE frame (6 PRECEDING..CURRENT) over the day
    // index in both engines; decimal-exact daily and windowed sums,
    // one shared decimal->double cast at the end (q01 parity pattern).
    "q111_moving_average" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      AS total
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |d AS (
        |  SELECT *, date_diff('day', DATE '2024-01-01', day) AS day_idx
        |  FROM daily)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day, n,
        |  CAST(total AS DOUBLE) AS total,
        |  CAST(sum(n) OVER w AS BIGINT) AS n_7d,
        |  CAST(CAST(sum(total) OVER w AS DECIMAL(18,2)) AS DOUBLE)
        |    AS total_7d
        |FROM d
        |WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    // q108: the oracle is the LITERAL inequality join the bucketed
    // equi-join decomposition must reproduce exactly.
    "q108_interval_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS pts,
        |    ts + INTERVAL 2 HOUR AS pend
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, event_id AS error_id, ts FROM events
        |  WHERE event_type = 'error')
        |SELECT e.user_id, e.error_id, p.purchase_id
        |FROM e JOIN p ON e.user_id = p.user_id
        |  AND e.ts >= p.pts AND e.ts < p.pend
        |ORDER BY e.user_id, e.error_id, p.purchase_id""".stripMargin,

    // q109: lead over the same (ts, event_id) ordering, then counts and
    // a row-normalized probability over the from_type marginal.
    "q109_event_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM t WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type),
        |    6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    // q103: the Spark side chains window minimums; the oracle builds the
    // same staged funnel with explicit stage CTEs — each stage's first
    // event strictly after the previous stage's timestamp.
    "q103_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS vt
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS ct FROM events e
        |  JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'click' AND e.ts > u.vt
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS pt FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.ct
        |  GROUP BY e.user_id),
        |j AS (
        |  SELECT u.user_id, u.vt, c.ct, p.pt FROM u
        |  LEFT JOIN c ON u.user_id = c.user_id
        |  LEFT JOIN p ON u.user_id = p.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(count(vt) AS BIGINT) AS n_view,
        |  CAST(count(ct) AS BIGINT) AS n_click,
        |  CAST(count(pt) AS BIGINT) AS n_purchase,
        |  round(CAST(sum(epoch_us(ct) - epoch_us(vt)) AS DOUBLE)
        |    / count(ct) / 1000000, 4) AS avg_view_to_click_s,
        |  round(CAST(sum(epoch_us(pt) - epoch_us(ct)) AS DOUBLE)
        |    / count(pt) / 1000000, 4) AS avg_click_to_purchase_s
        |FROM j""".stripMargin,

    // q104: Monday-truncated weeks on both sides; the day difference of
    // two week-truncated dates is always a multiple of 7, so the //7 is
    // exact integer arithmetic in both engines.
    "q104_retention_cohorts" ->
      """WITH f AS (
        |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
        |a AS (
        |  SELECT e.user_id,
        |    date_trunc('week', f.first_ts) AS cohort_week,
        |    CAST(date_diff('day',
        |        CAST(date_trunc('week', f.first_ts) AS DATE),
        |        CAST(date_trunc('week', e.ts) AS DATE)) // 7
        |      AS BIGINT) AS week_offset
        |  FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM a GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // q105: batch lag/cumsum sessionization twin of the streaming state
    // machine. Parity choices mirror the Spark side exactly: gap
    // comparison and session_start at MILLISECOND precision (epoch_ms —
    // the state machine keys on java.sql.Timestamp.getTime), value
    // pre-scaled to integer cents so sums are order-free.
    "q105_stream_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id,
        |  make_timestamp(epoch_ms(min(ts)) * 1000) AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100 AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // q57: rebuilds renderPerson's document (templates/person.xml.j2
    // shape) with pure string concatenation — every || piece mirrors
    // one sb ++= line in XmlSync.renderPerson, so a drift in either
    // escaping, a conditional block, date formatting, or job ordering
    // breaks the hash compare.
    "q57_person_xml" ->
      s"""WITH p AS (
        |  SELECT c_custkey AS k,
        |    ${xesc("'P' || CAST(c_custkey AS VARCHAR)")} AS pid,
        |    ${xesc("CAST(c_custkey AS VARCHAR)")} AS emplid,
        |    ${xesc("c_mktsegment")} AS first_name,
        |    ${xesc("c_name || ' \"q\"' || chr(39)")} AS last_name,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'Dr<&>' END AS postnominal_raw,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL
        |         ELSE 'u' || CAST(c_custkey AS VARCHAR) END AS internet_raw,
        |    ${xesc("CASE WHEN c_custkey % 2 = 0 THEN 'Public' ELSE 'Restricted' END")} AS visibility,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'true' ELSE 'false' END AS profiled
        |  FROM customer),
        |j AS (
        |  SELECT o_custkey AS k, o_orderkey,
        |    CAST(o_orderkey AS VARCHAR) AS soa_id,
        |    o_orderpriority AS aff_id,
        |    CASE WHEN o_orderkey % 2 = 0
        |         THEN 'e' || CAST(o_orderkey AS VARCHAR) || '@umn.edu' END AS email_raw,
        |    o_orderstatus AS emp_type,
        |    CASE WHEN o_orderkey = min(o_orderkey) OVER (PARTITION BY o_custkey)
        |         THEN 'true' ELSE 'false' END AS primary_assoc,
        |    'ORG' || CAST(o_custkey % 50 AS VARCHAR) AS org_id,
        |    strftime(o_orderdate, '%d-%m-%Y') AS start_str,
        |    CASE WHEN o_orderstatus = 'F'
        |         THEN strftime(o_orderdate + INTERVAL 30 DAY, '%d-%m-%Y') END AS end_str,
        |    lower(substr(o_orderpriority, 3)) AS staff_type,
        |    'Desc <' || o_orderpriority || '> & more' AS job_desc
        |  FROM orders),
        |jx AS (
        |  SELECT k, o_orderkey,
        |       '    <staffOrganisationAssociation id="' || ${xesc("soa_id")} || '" managedInPure="false">' || chr(10)
        |    || '      <affiliationId>' || ${xesc("aff_id")} || '</affiliationId>' || chr(10)
        |    || CASE WHEN email_raw IS NOT NULL AND email_raw <> '' THEN
        |            '      <emails>' || chr(10)
        |         || '        <v3:classifiedEmail id="personStaffAssocEmail1">' || chr(10)
        |         || '          <v3:classification>email</v3:classification>' || chr(10)
        |         || '          <v3:value>' || ${xesc("email_raw")} || '</v3:value>' || chr(10)
        |         || '        </v3:classifiedEmail>' || chr(10)
        |         || '      </emails>' || chr(10)
        |       ELSE '' END
        |    || '      <employmentType>' || ${xesc("emp_type")} || '</employmentType>' || chr(10)
        |    || '      <primaryAssociation>' || primary_assoc || '</primaryAssociation>' || chr(10)
        |    || '      <organisation>' || chr(10)
        |    || '        <v3:source_id>' || ${xesc("org_id")} || '</v3:source_id>' || chr(10)
        |    || '      </organisation>' || chr(10)
        |    || '      <period>' || chr(10)
        |    || CASE WHEN start_str IS NOT NULL THEN
        |         '        <v3:startDate>' || start_str || '</v3:startDate>' || chr(10) ELSE '' END
        |    || CASE WHEN end_str IS NOT NULL THEN
        |         '        <v3:endDate>' || end_str || '</v3:endDate>' || chr(10) ELSE '' END
        |    || '      </period>' || chr(10)
        |    || '      <staffType>' || ${xesc("staff_type")} || '</staffType>' || chr(10)
        |    || '      <jobDescription><v3:text lang="en">' || ${xesc("job_desc")} || '</v3:text></jobDescription>' || chr(10)
        |    || '    </staffOrganisationAssociation>' || chr(10) AS job_xml
        |  FROM j),
        |ja AS (
        |  SELECT k, string_agg(job_xml, '' ORDER BY o_orderkey) AS jobs_xml
        |  FROM jx GROUP BY k)
        |SELECT pid AS person_id,
        |     '<person id="' || pid || '">' || chr(10)
        |  || '  <name>' || chr(10)
        |  || '    <v3:firstname>' || first_name || '</v3:firstname>' || chr(10)
        |  || '    <v3:lastname>' || last_name || '</v3:lastname>' || chr(10)
        |  || '  </name>' || chr(10)
        |  || CASE WHEN postnominal_raw IS NOT NULL AND postnominal_raw <> '' THEN
        |        '  <titles>' || chr(10)
        |     || '    <title id="' || emplid || '">' || chr(10)
        |     || '      <typeClassification>postnominal</typeClassification>' || chr(10)
        |     || '      <value>' || chr(10)
        |     || '        <v3:text lang="en" country="US">' || ${xesc("postnominal_raw")} || '</v3:text>' || chr(10)
        |     || '      </value>' || chr(10)
        |     || '    </title>' || chr(10)
        |     || '  </titles>' || chr(10)
        |     ELSE '' END
        |  || '  <gender>unknown</gender>' || chr(10)
        |  || '  <organisationAssociations>' || chr(10)
        |  || COALESCE(jobs_xml, '')
        |  || '  </organisationAssociations>' || chr(10)
        |  || CASE WHEN internet_raw IS NOT NULL AND internet_raw <> '' THEN
        |        '  <user id="' || pid || '">' || chr(10)
        |     || '    <userName>' || ${xesc("internet_raw")} || '@umn.edu</userName>' || chr(10)
        |     || '    <email>' || ${xesc("internet_raw")} || '@umn.edu</email>' || chr(10)
        |     || '  </user>' || chr(10)
        |     ELSE '' END
        |  || '  <personIds>' || chr(10)
        |  || '    <v3:id type="employee" id="autoid:' || pid || '-employee-' || emplid || '">' || emplid || '</v3:id>' || chr(10)
        |  || CASE WHEN internet_raw IS NOT NULL AND internet_raw <> '' THEN
        |        '    <v3:id type="umn" id="autoid:' || pid || '-umn-' || ${xesc("internet_raw")} || '">' || ${xesc("internet_raw")} || '</v3:id>' || chr(10)
        |     ELSE '' END
        |  || '  </personIds>' || chr(10)
        |  || '  <visibility>' || visibility || '</visibility>' || chr(10)
        |  || '  <profiled>' || profiled || '</profiled>' || chr(10)
        |  || '</person>' || chr(10) AS xml
        |FROM p LEFT JOIN ja ON p.k = ja.k
        |ORDER BY person_id""".stripMargin,

    // q64: rebuilds renderOrganisation (templates/organisation.xml.j2
    // shape — the largest reference template) and renderUser
    // (templates/user.xml.j2) with pure string concatenation. Every
    // collection section appears or not by the same modulo that
    // plants it on the Spark side; the CDATA payload replicates the
    // "]]>" split-escape; org dates are ISO (%Y-%m-%d), unlike the
    // person template's dd-MM-yyyy.
    "q64_org_user_xml" ->
      s"""WITH o AS (
        |  SELECT p_partkey AS k,
        |    'G' || CAST(p_partkey AS VARCHAR) AS oid,
        |    p_type AS typ, p_brand AS brand, p_name AS pname,
        |    p_name || ' <&> "x' || chr(39) AS nm,
        |    DATE '1994-01-01' + CAST(p_partkey % 1000 AS INTEGER) AS sd
        |  FROM part),
        |ox AS (
        |  SELECT oid AS doc_id,
        |       '<organisation managedInPure="false">' || chr(10)
        |    || '  <organisationId>' || oid || '</organisationId>' || chr(10)
        |    || '  <type>' || ${xesc("typ")} || '</type>' || chr(10)
        |    || '  <name>' || chr(10)
        |    || '    <v3:text lang="en" country="US">' || ${xesc("nm")} || '</v3:text>' || chr(10)
        |    || '  </name>' || chr(10)
        |    || '  <startDate>' || strftime(sd, '%Y-%m-%d') || '</startDate>' || chr(10)
        |    || CASE WHEN k % 6 = 0 THEN
        |         '  <endDate>' || strftime(sd + 180, '%Y-%m-%d') || '</endDate>' || chr(10) ELSE '' END
        |    || '  <visibility>' || CASE WHEN k % 2 = 0 THEN 'Public' ELSE 'Restricted' END || '</visibility>' || chr(10)
        |    || CASE WHEN k % 10 <> 0 THEN
        |         '  <parentOrganisationId>G' || CAST(k // 10 AS VARCHAR) || '</parentOrganisationId>' || chr(10) ELSE '' END
        |    || CASE WHEN k % 2 = 0 THEN
        |          '  <nameVariants>' || chr(10)
        |       || '    <nameVariant>' || chr(10)
        |       || '      <type>acronym</type>' || chr(10)
        |       || '      <name>' || chr(10)
        |       || '        <v3:text lang="en" country="US">' || ${xesc("'NV<' || brand || '>'")} || '</v3:text>' || chr(10)
        |       || '      </name>' || chr(10)
        |       || '    </nameVariant>' || chr(10)
        |       || CASE WHEN k % 4 = 0 THEN
        |             '    <nameVariant>' || chr(10)
        |          || '      <type>former</type>' || chr(10)
        |          || '      <name>' || chr(10)
        |          || '        <v3:text lang="en" country="US">' || ${xesc("brand || ' & older'")} || '</v3:text>' || chr(10)
        |          || '      </name>' || chr(10)
        |          || '    </nameVariant>' || chr(10)
        |          ELSE '' END
        |       || '  </nameVariants>' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN k % 3 = 0 THEN
        |          '  <profileInfos>' || chr(10)
        |       || '    <profileInfo>' || chr(10)
        |       || '      <type>overview</type>' || chr(10)
        |       || '      <profileInfo>' || chr(10)
        |       || '        <v3:text lang="en" country="US"><![CDATA['
        |            || replace(pname || ' ]]> <raw> & stuff', ']]>', ']]]]><![CDATA[>')
        |            || ']]></v3:text>' || chr(10)
        |       || '      </profileInfo>' || chr(10)
        |       || '    </profileInfo>' || chr(10)
        |       || '  </profileInfos>' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN k % 5 = 0 THEN
        |          '  <photos>' || chr(10)
        |       || '    <photo>' || chr(10)
        |       || '      <type>logo</type>' || chr(10)
        |       || '      <photoValue>http://img/' || CAST(k AS VARCHAR) || '</photoValue>' || chr(10)
        |       || '      <photoProtocol>http</photoProtocol>' || chr(10)
        |       || '    </photo>' || chr(10)
        |       || '  </photos>' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN k % 7 = 0 THEN
        |          '  <phoneNumbers>' || chr(10)
        |       || '    <phoneNumber>' || chr(10)
        |       || '      <type>office</type>' || chr(10)
        |       || '      <phoneNumber>+1-612-' || CAST(k AS VARCHAR) || '</phoneNumber>' || chr(10)
        |       || '    </phoneNumber>' || chr(10)
        |       || '  </phoneNumbers>' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN k % 2 = 1 THEN
        |          '  <emails>' || chr(10)
        |       || '    <email>' || chr(10)
        |       || '      <type>work</type>' || chr(10)
        |       || '      <email>org' || CAST(k AS VARCHAR) || '@umn.edu</email>' || chr(10)
        |       || '    </email>' || chr(10)
        |       || '  </emails>' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN k % 11 = 0 THEN
        |          '  <webAddresses>' || chr(10)
        |       || '    <webAddress>' || chr(10)
        |       || '      <type>home</type>' || chr(10)
        |       || '      <webAddress>' || chr(10)
        |       || '        <v3:text lang="en" country="US">' || ${xesc("'http://w/' || CAST(k AS VARCHAR) || '?a=1&b=<2>'")} || '</v3:text>' || chr(10)
        |       || '      </webAddress>' || chr(10)
        |       || '    </webAddress>' || chr(10)
        |       || '  </webAddresses>' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN k % 13 = 0 THEN
        |          '  <addresses>' || chr(10)
        |       || '    <address>' || chr(10)
        |       || '      <type>postal</type>' || chr(10)
        |       || '      <city>Minneapolis &#34;MN&#34;</city>' || chr(10)
        |       || '      <postalCode>554' || CAST(k % 100 AS VARCHAR) || '</postalCode>' || chr(10)
        |       || CASE WHEN k % 26 <> 0 THEN
        |            '      <street>123 &lt;Oak&gt; St</street>' || chr(10) ELSE '' END
        |       || '      <country>US &amp; A</country>' || chr(10)
        |       || CASE WHEN k % 39 = 0 THEN
        |            '      <subdivision>Hennepin</subdivision>' || chr(10) ELSE '' END
        |       || '    </address>' || chr(10)
        |       || '  </addresses>' || chr(10)
        |       ELSE '' END
        |    || '  <ids>' || chr(10)
        |    || '    <id>' || chr(10)
        |    || '      <idSource>peoplesoft_deptid</idSource>' || chr(10)
        |    || '      <id>' || CAST(k AS VARCHAR) || '</id>' || chr(10)
        |    || '    </id>' || chr(10)
        |    || CASE WHEN k % 2 = 0 THEN
        |          '    <id>' || chr(10)
        |       || '      <idSource>dept_id</idSource>' || chr(10)
        |       || '      <id>D' || CAST(k AS VARCHAR) || '</id>' || chr(10)
        |       || '    </id>' || chr(10)
        |       ELSE '' END
        |    || '  </ids>' || chr(10)
        |    || '</organisation>' || chr(10) AS xml
        |  FROM o),
        |u AS (
        |  SELECT 'U' || CAST(c_custkey AS VARCHAR) AS doc_id,
        |    'P' || CAST(c_custkey AS VARCHAR) AS pid,
        |    'u' || CAST(c_custkey AS VARCHAR) || '<&' AS uname,
        |    'c' || CAST(c_custkey AS VARCHAR) || '@x."org"' AS email,
        |    c_mktsegment AS fn,
        |    c_name || ' ' || chr(39) || 'q' AS ln
        |  FROM customer),
        |ux AS (
        |  SELECT doc_id,
        |       '<user id="' || ${xesc("pid")} || '">' || chr(10)
        |    || '  <userName>' || ${xesc("uname")} || '@umn.edu</userName>' || chr(10)
        |    || '  <email>' || ${xesc("email")} || '</email>' || chr(10)
        |    || '  <name>' || chr(10)
        |    || '    <v3:firstname>' || ${xesc("fn")} || '</v3:firstname>' || chr(10)
        |    || '    <v3:lastname>' || ${xesc("ln")} || '</v3:lastname>' || chr(10)
        |    || '  </name>' || chr(10)
        |    || '</user>' || chr(10) AS xml
        |  FROM u)
        |SELECT doc_id, xml FROM ox
        |UNION ALL SELECT doc_id, xml FROM ux
        |ORDER BY doc_id""".stripMargin,
  )
}
