package graft

/** DuckDB twin of q342 (the whole-cycle composition gate). The Spark
  * side builds JSON documents from the standard tables and runs the
  * REAL pipeline (parse → shred → validate → HR derivation → folds →
  * error expansion); this twin derives the SAME canonical (tbl, k, v)
  * rows from the SAME base tables directly — an independent statement
  * of the intended semantics, never a re-execution of the engine path.
  * Every modulo class in `QueriesCycle.inputs` is restated here; a
  * drift between the two is a hash mismatch.
  */
object OraclesCycle {

  /** md5-derived surrogate uuid, bit-identical to
    * [[graft.etl.PureDocs.derivedUuid]].
    */
  private def duuid(arg: String): String =
    s"substr(md5($arg),1,8)||'-'||substr(md5($arg),9,4)||'-'||" +
      s"substr(md5($arg),13,4)||'-'||substr(md5($arg),17,4)||'-'||" +
      s"substr(md5($arg),21,12)"

  /** The seed-derived branch salts — token-for-token the fold in
    * [[QueriesCycle.salts]]; every skip/db/freshness residue below
    * tests c+cs / o+os / nk+cs / sk+cs (round-18: seed-planted branch
    * assignment).
    */
  private val saltCtes =
    """csalt AS (SELECT CAST(coalesce(sum((c_nationkey + 1)
      |    * (c_custkey % 97)), 0) % 1009 AS BIGINT) AS cs
      |  FROM customer),
      |osalt AS (SELECT CAST(coalesce(sum((o_custkey % 97 + 1)
      |    * (o_orderkey % 89)), 0) % 1009 AS BIGINT) AS os
      |  FROM orders)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q342_runner_cycle" ->
      s"""WITH $saltCtes,
         |cust AS (
         |  SELECT c_custkey AS c, c_nationkey AS nk, c_mktsegment AS seg,
         |    cs
         |  FROM customer, csalt),
         |jdim AS (SELECT * FROM (VALUES
         |  ('AUTOMOBILE', false), ('BUILDING', false),
         |  ('FURNITURE', true), ('HOUSEHOLD', true),
         |  ('MACHINERY', false)) AS t(seg, dprof)),
         |pc AS (
         |  SELECT c, nk, seg, cs,
         |    ((c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2 AND (c+cs) % 5 <> 3
         |      AND (c+cs) % 19 <> 4 AND (c+cs) % 17 <> 3) AS valid,
         |    CASE WHEN (c+cs) % 5 = 0 THEN 'dbu'||c
         |         ELSE ${duuid("'person:'||c")} END AS puid
         |  FROM cust),
         |po AS (
         |  SELECT o_orderkey AS o, o_custkey AS oc, os
         |  FROM orders, osalt
         |  WHERE o_orderkey % 100 < 2),
         |pj AS (
         |  SELECT o, os, pc.c, pc.nk,
         |    -- the PUB-side person uuid comes from the EDW person dim,
         |    -- which still carries the stale-skipped (c+cs)%5=3 rows
         |    -- under their existing 'dbu' uuids
         |    CASE WHEN (pc.c + pc.cs) % 5 IN (0, 3) THEN 'dbu'||pc.c
         |         ELSE pc.puid END AS puid,
         |    (pc.valid OR (pc.c + pc.cs) % 5 IN (0, 3)) AS member
         |  FROM po JOIN pc ON pc.c = po.oc),
         |pcl AS (
         |  SELECT *, CASE
         |    WHEN (o+os) % 1000 = 500 THEN 'stale'
         |    WHEN (o+os) % 100 = 1 THEN 'owner_org_not_in_edw'
         |    WHEN NOT member THEN 'person_not_in_edw'
         |    WHEN (o+os) % 1000 = 300 THEN 'person_missing_pure_uuid'
         |    WHEN (o+os) % 300 = 200 THEN 'org_not_in_edw' END AS skip
         |  FROM pj),
         |vpub AS (
         |  SELECT *, CASE WHEN (o+os) % 500 = 0 THEN 'dbp'||o
         |    ELSE ${duuid("'pub:pub'||o")} END AS pub_uuid
         |  FROM pcl WHERE skip IS NULL),
         |hr AS ( -- one employee job per customer outside dept 23
         |  SELECT cust.*, dprof,
         |    CASE WHEN c % 10 = 0 THEN 'SV'||c ELSE c::VARCHAR END AS pid,
         |    -- the stale-skipped nations' deptid claims never shred,
         |    -- so HR falls back to the 'DIM' dim rows for them
         |    CASE WHEN (nk+cs) % 7 = 3 THEN 'DIM'||nk
         |         ELSE 'ORG'||nk END AS orgid,
         |    (c % 4 <> 2) AS active,
         |    CASE WHEN c % 4 <> 2 THEN NULL
         |         WHEN c % 8 = 6 THEN '2019-05-06 00:00:00'
         |         ELSE '2020-01-01 00:00:00' END AS end_s,
         |    CASE WHEN c % 4 = 2 THEN 'nonacademic'
         |         WHEN seg IN ('FURNITURE', 'MACHINERY') THEN 'academic'
         |         ELSE 'nonacademic' END AS staff,
         |    CASE WHEN c % 4 <> 2 AND c % 2 = 0 AND seg <> 'BUILDING'
         |         THEN 'Public' ELSE 'Restricted' END AS vis,
         |    CASE WHEN c % 4 = 2 THEN false
         |         WHEN seg = 'MACHINERY' THEN nk % 8 = 0
         |         ELSE dprof END AS prof,
         |    'F'||c||CASE WHEN c % 2 = 0 THEN ' M' ELSE '' END AS fname,
         |    CASE WHEN c % 3 <> 1 THEN 'u'||c END AS inet,
         |    CASE WHEN c % 2 = 0 THEN 'TXXX' ELSE 'XOTH' END AS campus,
         |    CASE WHEN c % 2 = 0 THEN 'TC' ELSE 'OT' END AS campus_d
         |  FROM cust JOIN jdim USING (seg) WHERE nk <> 23),
         |pid23 AS (SELECT count(*) AS n FROM cust WHERE nk = 23)
         |
         |SELECT 'org' AS tbl, 'o'||n_nationkey AS k, concat_ws('|',
         |    'Y', n_name, 'ORG'||n_nationkey, 'r'||n_regionkey,
         |    'RORG'||n_regionkey, 'department', '2020-06-01 00:00:00') AS v
         |  FROM nation, csalt WHERE (n_nationkey+cs) % 7 <> 3
         |UNION ALL
         |SELECT 'org', 'r'||r_regionkey, concat_ws('|',
         |    'Y', r_name, 'RORG'||r_regionkey,
         |    CASE WHEN r_regionkey = 4 THEN 'oz' ELSE '∅' END,
         |    CASE WHEN r_regionkey = 4 THEN 'ORGZ' ELSE '∅' END,
         |    'college', '2020-06-01 00:00:00')
         |  FROM region
         |UNION ALL
         |SELECT 'org', 'x'||r_regionkey, concat_ws('|',
         |    'N', 'X '||r_name, '∅', '∅', '∅', 'external collaborator',
         |    '2020-06-01 00:00:00')
         |  FROM region
         |UNION ALL
         |SELECT 'deptorg', nk::VARCHAR, 'ORG'||nk||'|o'||nk
         |  FROM (SELECT n_nationkey AS nk FROM nation, csalt
         |        WHERE (n_nationkey+cs) % 7 <> 3 AND n_nationkey <> 23)
         |UNION ALL
         |SELECT 'person', 'p'||c, concat_ws('|', puid, 'PP'||c, 'Y',
         |    c::VARCHAR,
         |    coalesce(CASE WHEN c % 3 <> 1 THEN 'u'||c END, '∅'),
         |    'PF'||c, 'PL'||c,
         |    coalesce(CASE WHEN c % 21 = 5 THEN '0000-'||c END, '∅'),
         |    coalesce(CASE WHEN c % 6 = 0 THEN (c % 40)::VARCHAR END, '∅'),
         |    '2020-06-01 00:00:00')
         |  FROM pc WHERE valid
         |UNION ALL
         |SELECT 'person', 'xp'||s_suppkey, concat_ws('|',
         |    ${duuid("'ext-person:xp'||s_suppkey")}, '∅', 'N', '∅', '∅',
         |    'XF'||s_suppkey, 'XL'||s_suppkey, '∅', '∅',
         |    '2020-06-01 00:00:00')
         |  FROM supplier
         |UNION ALL
         |SELECT 'upo', puid||'/o'||nk, concat_ws('|', 'PP'||c,
         |    c::VARCHAR, '∅', 'Professor', 'Academic', 'academic',
         |    '2015-09-01 00:00:00',
         |    coalesce(CASE WHEN c % 23 = 7
         |      THEN '2019-12-31 00:00:00' END, '∅'), 'Y')
         |  FROM pc WHERE valid
         |UNION ALL
         |SELECT 'pub', 'pub'||o, concat_ws('|', pub_uuid,
         |    coalesce(CASE WHEN o % 2 = 0 THEN 'EX'||o END, '∅'),
         |    coalesce(CASE WHEN o % 5 = 0 THEN 'pm'||o END, '∅'),
         |    CASE WHEN o % 6 = 0 THEN '10.1/b'||o ELSE '10.1/a'||o END,
         |    'contributiontojournal', 'article', 'T'||o, 'J'||(o % 20),
         |    '1234-'||(o % 10), (o % 9)::VARCHAR, (o % 11)::VARCHAR,
         |    'p'||(o % 30), (o % 50)::VARCHAR, 'o'||(o % 25),
         |    '2020-06-01 00:00:00',
         |    '∅', coalesce(CASE WHEN o % 4 = 0 THEN 'false' END, '∅'), '∅',
         |    '∅', '∅', '∅',
         |    '∅', '∅', '∅',
         |    strftime(make_timestamp(1995 + o % 6,
         |      CASE WHEN o % 2 = 0 THEN o % 12 + 1 ELSE 1 END,
         |      1, 0, 0, 0), '%Y-%m-%d %H:%M:%S'),
         |    'true', CASE WHEN o % 2 = 0 THEN '31' ELSE '366' END,
         |    '∅', '∅', '∅',
         |    '∅', '∅', '∅')
         |  FROM vpub
         |UNION ALL
         |SELECT 'pubperson', pub_uuid||'/'||puid, concat_ws('|',
         |    '1', 'author', 'Y', 'AF1'||o, 'AL1'||o, c::VARCHAR)
         |  FROM vpub
         |UNION ALL
         |SELECT 'pubperson',
         |    pub_uuid||'/'||${duuid("'ext-person:xp'||(o % 10)")},
         |    concat_ws('|', '2', 'author', 'N', 'AF2'||o, 'AL2'||o, '∅')
         |  FROM vpub WHERE o % 3 = 0
         |UNION ALL
         |SELECT 'pubpersonorg', pub_uuid||'/'||puid||'/o'||nk, ''
         |  FROM vpub
         |UNION ALL
         |SELECT 'pubpersonorg',
         |    pub_uuid||'/'||${duuid("'ext-person:xp'||(o % 10)")}
         |      ||'/x'||(o % 5), ''
         |  FROM vpub WHERE o % 3 = 0
         |UNION ALL
         |SELECT 'pubcollab', pub_uuid||'/col'||(o % 4), concat_ws('|',
         |    (2 + CASE WHEN o % 3 = 0 THEN 1 ELSE 0 END)::VARCHAR,
         |    'author')
         |  FROM vpub WHERE o % 7 = 0
         |UNION ALL
         |SELECT DISTINCT 'collab', 'col'||(o % 4), 'Collab '||(o % 4)
         |  FROM vpub WHERE o % 7 = 0
         |UNION ALL
         |SELECT 'skip', 'o'||n_nationkey, 'stale' FROM nation, csalt
         |  WHERE (n_nationkey+cs) % 7 = 3
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'missing_emplid' FROM cust
         |  WHERE (c+cs) % 11 = 1
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'missing_pure_id' FROM cust
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 = 2
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'stale' FROM cust
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2 AND (c+cs) % 5 = 3
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'org_not_in_edw' FROM cust
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2 AND (c+cs) % 5 <> 3
         |    AND (c+cs) % 19 = 4
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'missing_job_description' FROM cust
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2 AND (c+cs) % 5 <> 3
         |    AND (c+cs) % 17 = 3
         |UNION ALL
         |SELECT 'skip', 'pub'||o, skip FROM pcl WHERE skip IS NOT NULL
         |UNION ALL
         |SELECT 'persondata', pid, concat_ws('|', fname, 'L'||c, vis,
         |    prof::VARCHAR, c::VARCHAR, coalesce(inet, '∅'),
         |    coalesce(CASE WHEN c % 9 = 0 THEN 'Jr' END, '∅'))
         |  FROM hr
         |UNION ALL
         |SELECT 'soa',
         |    'autoid:'||pid||'-'||orgid||'-Desc '||seg||'-EA_'||seg
         |      ||'-2016-03-04',
         |    concat_ws('|', 'JC_'||seg, pid, '2016-03-04 00:00:00',
         |      coalesce(end_s, '∅'), orgid, 'EA_'||seg, staff, vis,
         |      'true', 'PJD '||seg, 'e'||c||'@x.org')
         |  FROM hr
         |UNION ALL
         |SELECT 'userdata', pid, concat_ws('|', fname, 'L'||c, 'u'||c,
         |    'u'||c||'@umn.edu')
         |  FROM hr WHERE c % 3 <> 1
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlUnknownDept', concat_ws('|',
         |    'unknown department', '∅', '∅', '∅', '∅', '23', 'D23',
         |    (SELECT n FROM pid23)::VARCHAR, 'CL2', 'CLD2',
         |    CASE WHEN c % 2 = 0 THEN 'TXXX' ELSE 'XOTH' END,
         |    CASE WHEN c % 2 = 0 THEN 'TC' ELSE 'OT' END)
         |  FROM cust WHERE nk = 23
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlJobWithUnknownDept', concat_ws('|',
         |    'job with unknown department', c::VARCHAR, '∅',
         |    'JC_'||seg, 'Desc '||seg, '23', 'D23', '∅', 'CL2', 'CLD2',
         |    CASE WHEN c % 2 = 0 THEN 'TXXX' ELSE 'XOTH' END,
         |    CASE WHEN c % 2 = 0 THEN 'TC' ELSE 'OT' END)
         |  FROM cust WHERE nk = 23
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlUnknownJobcodeDeptid', concat_ws('|',
         |    'unknown overrideable jobcode/deptid pair', c::VARCHAR, '∅',
         |    'JC_MACHINERY', 'Desc MACHINERY', nk::VARCHAR, 'D'||nk, '∅',
         |    'CL'||(nk % 3), 'CLD'||(nk % 3), campus, campus_d)
         |  FROM hr WHERE seg = 'MACHINERY' AND active AND nk % 2 = 1
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlJobWithUnknownJobcodeDeptid',
         |    concat_ws('|',
         |    'job with unknown overrideable jobcode/deptid pair',
         |    c::VARCHAR, '∅', 'JC_MACHINERY', 'Desc MACHINERY',
         |    nk::VARCHAR, 'D'||nk, '∅',
         |    'CL'||(nk % 3), 'CLD'||(nk % 3), campus, campus_d)
         |  FROM hr WHERE seg = 'MACHINERY' AND active AND nk % 2 = 1
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlPersonNoJobData', concat_ws('|',
         |    'unable to find or generate any job data for person',
         |    c::VARCHAR, '∅', '∅', '∅', '∅', '∅', '∅', '∅', '∅', '∅', '∅')
         |  FROM cust WHERE nk = 23
         |ORDER BY 1, 2, 3""".stripMargin,

    // q345: the incremental second cycle in closed form. Cycle 1 is
    // restated on the 1/3 slice only where cycle 2's behavior depends
    // on it (person/pub dim membership, db modifieds); everything
    // serialized is CYCLE-2 output. See QueriesCycle.inputs2 for the
    // modulo classes.
    "q345_second_cycle" -> secondCycleSql,

    // q346: the STREAMING form of the same two-cycle composition must
    // produce byte-identical cycle-2 outputs — the batch≡stream
    // identity as one hash gate, so the twin is q345's verbatim.
    "q346_stream_cycle" -> secondCycleSql,

    // q347: crash-restart over the same feed — a planted mid-stream
    // failure plus checkpoint recovery must STILL produce the
    // identical cycle-2 outputs, so the twin is again q345's verbatim.
    "q347_restart_cycle" -> secondCycleSql)

  private lazy val secondCycleSql: String =
      s"""WITH $saltCtes,
         |cust AS (
         |  SELECT c_custkey AS c, c_nationkey AS nk, c_mktsegment AS seg,
         |    cs
         |  FROM customer, csalt WHERE c_custkey % 3 = 0),
         |jdim AS (SELECT * FROM (VALUES
         |  ('AUTOMOBILE', false), ('BUILDING', false),
         |  ('FURNITURE', true), ('HOUSEHOLD', true),
         |  ('MACHINERY', false)) AS t(seg, dprof)),
         |pc AS (
         |  SELECT c, nk, seg, cs,
         |    ((c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2 AND (c+cs) % 19 <> 4
         |      AND (c+cs) % 17 <> 3) AS cv,
         |    CASE WHEN (c+cs) % 5 IN (0, 3) THEN 'dbu'||c
         |         ELSE substr(md5('person:'||c),1,8)||'-'||substr(md5('person:'||c),9,4)||'-'||substr(md5('person:'||c),13,4)||'-'||substr(md5('person:'||c),17,4)||'-'||substr(md5('person:'||c),21,12) END AS puid
         |  FROM cust),
         |-- cycle-2 person classification: even c+cs = fresh update,
         |-- odd = exact re-delivery. A re-delivery is STALE only when
         |-- the db row's modified >= t1: cycle-1-shredded rows (t1) and
         |-- the kept t2 originals qualify; a (c+cs)%5=0 original whose
         |-- doc was SKIPPED in cycle 1 still sits at t0, so its
         |-- re-delivery is fresh and falls through to the content skips
         |p2 AS (
         |  SELECT *,
         |    ((c+cs) % 5 IN (0, 3) OR (cv AND (c+cs) % 5 <> 3)) AS has_db,
         |    ((cv AND (c+cs) % 5 <> 3) OR (c+cs) % 5 = 3) AS db_ge_t1,
         |    ((c+cs) % 2 = 0 AND cv) AS valid2
         |  FROM pc),
         |po AS (
         |  SELECT o_orderkey AS o, o_custkey AS oc, os
         |  FROM orders, osalt
         |  WHERE o_orderkey % 300 < 2),
         |pj AS (
         |  SELECT o, os, p2.c, p2.nk, p2.puid,
         |    p2.has_db OR p2.valid2 AS member
         |  FROM po JOIN p2 ON p2.c = po.oc),
         |pcl AS (
         |  SELECT *, CASE
         |    WHEN (o+os) % 100 = 1 THEN 'owner_org_not_in_edw'
         |    WHEN NOT member THEN 'person_not_in_edw'
         |    WHEN (o+os) % 1000 = 300 THEN 'person_missing_pure_uuid'
         |      END AS skip
         |  FROM pj),
         |vpub AS (
         |  SELECT *, CASE WHEN (o+os) % 500 = 0 THEN 'dbp'||o
         |    ELSE substr(md5('pub:pub'||o),1,8)||'-'||substr(md5('pub:pub'||o),9,4)||'-'||substr(md5('pub:pub'||o),13,4)||'-'||substr(md5('pub:pub'||o),17,4)||'-'||substr(md5('pub:pub'||o),21,12) END AS pub_uuid
         |  FROM pcl WHERE skip IS NULL),
         |hr AS (
         |  SELECT cust.*, dprof,
         |    CASE WHEN c % 10 = 0 THEN 'SV'||c ELSE c::VARCHAR END AS pid,
         |    -- cycle-2 deptid claims come from the EVEN-(nk+cs)
         |    -- re-sends (incl. previously-stale nations), so the HR
         |    -- org ids flip parity-wise vs cycle 1
         |    CASE WHEN (nk+cs) % 2 = 0 THEN 'ORG'||nk
         |         ELSE 'DIM'||nk END AS orgid,
         |    (c % 4 <> 2) AS active,
         |    CASE WHEN c % 4 <> 2 THEN NULL
         |         WHEN c % 8 = 6 THEN '2019-05-06 00:00:00'
         |         ELSE '2020-01-01 00:00:00' END AS end_s,
         |    CASE WHEN c % 4 = 2 THEN 'nonacademic'
         |         WHEN seg IN ('FURNITURE', 'MACHINERY') THEN 'academic'
         |         ELSE 'nonacademic' END AS staff,
         |    CASE WHEN c % 4 <> 2 AND c % 2 = 0 AND seg <> 'BUILDING'
         |         THEN 'Public' ELSE 'Restricted' END AS vis,
         |    CASE WHEN c % 4 = 2 THEN false
         |         WHEN seg = 'MACHINERY' THEN nk % 8 = 0
         |         ELSE dprof END AS prof,
         |    'F'||c||CASE WHEN c % 2 = 0 THEN ' M' ELSE '' END AS fname,
         |    CASE WHEN c % 3 <> 1 THEN 'u'||c END AS inet,
         |    CASE WHEN c % 2 = 0 THEN 'TXXX' ELSE 'XOTH' END AS campus,
         |    CASE WHEN c % 2 = 0 THEN 'TC' ELSE 'OT' END AS campus_d
         |  FROM cust JOIN jdim USING (seg) WHERE nk <> 23),
         |pid23 AS (SELECT count(*) AS n FROM cust WHERE nk = 23)
         |
         |SELECT 'org' AS tbl, 'o'||n_nationkey AS k, concat_ws('|',
         |    'Y', n_name||' v2', 'ORG'||n_nationkey, 'r'||n_regionkey,
         |    'RORG'||n_regionkey, 'department', '2021-06-01 00:00:00') AS v
         |  FROM nation, csalt WHERE (n_nationkey+cs) % 2 = 0
         |UNION ALL
         |SELECT 'deptorg', n_nationkey::VARCHAR,
         |    'ORG'||n_nationkey||'|o'||n_nationkey
         |  -- dept 23 never claims a deptid (its org doc ships no
         |  -- peoplesoft id), so no fresh deptorg row even when its
         |  -- org re-send shreds — caught by the seed-37 salted gate
         |  FROM nation, csalt
         |  WHERE (n_nationkey+cs) % 2 = 0 AND n_nationkey <> 23
         |UNION ALL
         |SELECT 'person', 'p'||c, concat_ws('|', puid, 'PP'||c, 'Y',
         |    c::VARCHAR,
         |    coalesce(CASE WHEN c % 3 <> 1 THEN 'u'||c END, '∅'),
         |    'PF'||c, 'PL'||c||'v2',
         |    coalesce(CASE WHEN c % 21 = 5 THEN '0000-'||c END, '∅'),
         |    coalesce(CASE WHEN c % 6 = 0 THEN (c % 40)::VARCHAR END, '∅'),
         |    '2021-06-01 00:00:00')
         |  FROM p2 WHERE valid2
         |UNION ALL
         |SELECT 'person', 'xp'||s_suppkey, concat_ws('|',
         |    substr(md5('ext-person:xp'||s_suppkey),1,8)||'-'||substr(md5('ext-person:xp'||s_suppkey),9,4)||'-'||substr(md5('ext-person:xp'||s_suppkey),13,4)||'-'||substr(md5('ext-person:xp'||s_suppkey),17,4)||'-'||substr(md5('ext-person:xp'||s_suppkey),21,12), '∅', 'N', '∅', '∅',
         |    'XF'||s_suppkey, 'XL'||s_suppkey||'v2', '∅', '∅',
         |    '2021-06-01 00:00:00')
         |  FROM supplier, csalt
         |  WHERE s_suppkey % 3 = 0 AND (s_suppkey+cs) % 2 = 0
         |UNION ALL
         |-- late-delivered cycle-1 externals (QueriesCycle.Feeds2
         |-- .lateExternalPersons): v1 content arriving in cycle 2, so
         |-- their person rows join the serialized cycle-2 output
         |SELECT 'person', 'xp'||s_suppkey, concat_ws('|',
         |    substr(md5('ext-person:xp'||s_suppkey),1,8)||'-'||substr(md5('ext-person:xp'||s_suppkey),9,4)||'-'||substr(md5('ext-person:xp'||s_suppkey),13,4)||'-'||substr(md5('ext-person:xp'||s_suppkey),17,4)||'-'||substr(md5('ext-person:xp'||s_suppkey),21,12), '∅', 'N', '∅', '∅',
         |    'XF'||s_suppkey, 'XL'||s_suppkey, '∅', '∅',
         |    '2020-06-01 00:00:00')
         |  FROM supplier, csalt
         |  WHERE s_suppkey % 3 = 0 AND (s_suppkey+cs) % 2 = 1
         |    AND (s_suppkey+cs) % 5 = 2 AND s_suppkey >= 10
         |UNION ALL
         |SELECT 'upo', puid||'/o'||nk, concat_ws('|', 'PP'||c,
         |    c::VARCHAR, '∅', 'Professor', 'Academic', 'academic',
         |    '2015-09-01 00:00:00',
         |    coalesce(CASE WHEN c % 23 = 7
         |      THEN '2019-12-31 00:00:00' END, '∅'), 'Y')
         |  FROM p2 WHERE valid2
         |UNION ALL
         |SELECT 'pub', 'pub'||o, concat_ws('|', pub_uuid,
         |    coalesce(CASE WHEN o % 2 = 0 THEN 'EX'||o END, '∅'),
         |    coalesce(CASE WHEN o % 5 = 0 THEN 'pm'||o END, '∅'),
         |    CASE WHEN o % 6 = 0 THEN '10.1/b'||o ELSE '10.1/a'||o END,
         |    'contributiontojournal', 'article', 'T'||o||'v2',
         |    'J'||(o % 20),
         |    '1234-'||(o % 10), (o % 9)::VARCHAR, (o % 11)::VARCHAR,
         |    'p'||(o % 30), (o % 50)::VARCHAR, 'o'||(o % 25),
         |    '2021-06-01 00:00:00',
         |    '∅', coalesce(CASE WHEN o % 4 = 0 THEN 'false' END, '∅'), '∅',
         |    '∅', '∅', '∅',
         |    '∅', '∅', '∅',
         |    strftime(make_timestamp(1995 + o % 6, o % 12 + 1,
         |      1, 0, 0, 0), '%Y-%m-%d %H:%M:%S'),
         |    'true', '31',
         |    '∅', '∅', '∅',
         |    '∅', '∅', '∅')
         |  FROM vpub
         |UNION ALL
         |SELECT 'pubperson', pub_uuid||'/'||puid, concat_ws('|',
         |    '1', 'author', 'Y', 'AF1'||o, 'AL1'||o, c::VARCHAR)
         |  FROM vpub
         |UNION ALL
         |SELECT 'pubpersonorg', pub_uuid||'/'||puid||'/o'||nk, ''
         |  FROM vpub
         |UNION ALL
         |SELECT 'pubcollab', pub_uuid||'/col'||(o % 4),
         |    concat_ws('|', '2', 'author')
         |  FROM vpub WHERE o % 7 = 0
         |UNION ALL
         |SELECT DISTINCT 'collab', 'col'||(o % 4), 'Collab '||(o % 4)
         |  FROM vpub WHERE o % 7 = 0
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'missing_emplid' FROM p2
         |  WHERE (c+cs) % 11 = 1
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'missing_pure_id' FROM p2
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 = 2
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'stale' FROM p2
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2
         |    AND (c+cs) % 2 = 1 AND db_ge_t1
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'org_not_in_edw' FROM p2
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2
         |    AND NOT ((c+cs) % 2 = 1 AND db_ge_t1) AND (c+cs) % 19 = 4
         |UNION ALL
         |SELECT 'skip', 'p'||c, 'missing_job_description' FROM p2
         |  WHERE (c+cs) % 11 <> 1 AND (c+cs) % 13 <> 2
         |    AND NOT ((c+cs) % 2 = 1 AND db_ge_t1) AND (c+cs) % 17 = 3
         |UNION ALL
         |SELECT 'skip', 'pub'||o, skip FROM pcl WHERE skip IS NOT NULL
         |UNION ALL
         |SELECT 'persondata', pid, concat_ws('|', fname, 'L'||c, vis,
         |    prof::VARCHAR, c::VARCHAR, coalesce(inet, '∅'),
         |    coalesce(CASE WHEN c % 9 = 0 THEN 'Jr' END, '∅'))
         |  FROM hr
         |UNION ALL
         |SELECT 'soa',
         |    'autoid:'||pid||'-'||orgid||'-Desc '||seg||'-EA_'||seg
         |      ||'-2016-03-04',
         |    concat_ws('|', 'JC_'||seg, pid, '2016-03-04 00:00:00',
         |      coalesce(end_s, '∅'), orgid, 'EA_'||seg, staff, vis,
         |      'true', 'PJD '||seg, 'e'||c||'@x.org')
         |  FROM hr
         |UNION ALL
         |SELECT 'userdata', pid, concat_ws('|', fname, 'L'||c, 'u'||c,
         |    'u'||c||'@umn.edu')
         |  FROM hr WHERE c % 3 <> 1
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlUnknownDept', concat_ws('|',
         |    'unknown department', '∅', '∅', '∅', '∅', '23', 'D23',
         |    (SELECT n FROM pid23)::VARCHAR, 'CL2', 'CLD2',
         |    CASE WHEN c % 2 = 0 THEN 'TXXX' ELSE 'XOTH' END,
         |    CASE WHEN c % 2 = 0 THEN 'TC' ELSE 'OT' END)
         |  FROM cust WHERE nk = 23
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlJobWithUnknownDept', concat_ws('|',
         |    'job with unknown department', c::VARCHAR, '∅',
         |    'JC_'||seg, 'Desc '||seg, '23', 'D23', '∅', 'CL2', 'CLD2',
         |    CASE WHEN c % 2 = 0 THEN 'TXXX' ELSE 'XOTH' END,
         |    CASE WHEN c % 2 = 0 THEN 'TC' ELSE 'OT' END)
         |  FROM cust WHERE nk = 23
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlUnknownJobcodeDeptid', concat_ws('|',
         |    'unknown overrideable jobcode/deptid pair', c::VARCHAR, '∅',
         |    'JC_MACHINERY', 'Desc MACHINERY', nk::VARCHAR, 'D'||nk, '∅',
         |    'CL'||(nk % 3), 'CLD'||(nk % 3), campus, campus_d)
         |  FROM hr WHERE seg = 'MACHINERY' AND active AND nk % 2 = 1
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlJobWithUnknownJobcodeDeptid',
         |    concat_ws('|',
         |    'job with unknown overrideable jobcode/deptid pair',
         |    c::VARCHAR, '∅', 'JC_MACHINERY', 'Desc MACHINERY',
         |    nk::VARCHAR, 'D'||nk, '∅',
         |    'CL'||(nk % 3), 'CLD'||(nk % 3), campus, campus_d)
         |  FROM hr WHERE seg = 'MACHINERY' AND active AND nk % 2 = 1
         |UNION ALL
         |SELECT 'err', 'ExpertsEtlPersonNoJobData', concat_ws('|',
         |    'unable to find or generate any job data for person',
         |    c::VARCHAR, '∅', '∅', '∅', '∅', '∅', '∅', '∅', '∅', '∅', '∅')
         |  FROM cust WHERE nk = 23
         |ORDER BY 1, 2, 3""".stripMargin

}
