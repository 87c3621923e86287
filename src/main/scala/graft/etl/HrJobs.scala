package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The HR job-history derivation pipelines (reference
  * `oit_to_edw/{employee_job,poi_job,affiliate_job}.py`), re-expressed
  * as whole-relation dataflows: the reference's per-emplid driver loop
  * disappears — every window below partitions by emplid, so ALL persons
  * are derived in one pass (this is the key 100 TB design move: the
  * shuffles are keyed by emplid, dimension lookups are broadcast joins
  * instead of N+1 point queries, and nothing touches the driver).
  *
  * Each pipeline returns (jobs, errors): the reference records error
  * rows mid-loop (`umn_data_error.py`); here errors are a second output
  * DataFrame (side-channel outputs per SURVEY.md §7.4.7).
  */
object HrJobs {

  /** empl_status values that mean "employment is active" for the
    * employee/poi pipelines (employee_job.py:42).
    */
  val activeStates: Seq[String] = Seq("A", "L", "P", "W")

  /** The affiliate pipeline's stricter notion (affiliate_job.py:30). */
  val affiliateActiveStates: Seq[String] = Seq("A")

  private def isActiveStatus(c: Column): Column = c.isin(activeStates: _*)
  private def isAffiliateActive(c: Column): Column =
    c.isin(affiliateActiveStates: _*)

  /** Sessionization of effective-dated entries (group_entries,
    * employee_job.py:205-231): pandas iterates position_nbr groups in
    * sorted order with rows in (effdt, effseq) extract order, starting a
    * new group when any of (position_nbr, job_entry_dt, jobcode, deptid)
    * changes. One window pass; `__ord` is the global traversal ordinal.
    */
  private def sessionizeEntries(entries: DataFrame): DataFrame = {
    // (job_entry_dt, jobcode, deptid, empl_status, status_flg) extend
    // the reference's (effdt, effseq) DB order into a total order —
    // ties would otherwise make __ord (and thus reference-entry
    // election) flip between plan re-executions
    val order = Seq(col("position_nbr"), col("effdt"), col("effseq"),
      col("job_entry_dt"), col("jobcode"), col("deptid"),
      col("empl_status"), col("status_flg"))
    val w = Window.partitionBy("emplid").orderBy(order: _*)
    Relational.sessionize(
      entries.withColumn("__ord", row_number().over(w)),
      Seq("emplid"), order,
      Seq("position_nbr", "job_entry_dt", "jobcode", "deptid"),
      sessionCol = "__grp")
  }

  // scalac needs agg(first, rest:_*); helper to keep the call readable
  private def aggAll(df: org.apache.spark.sql.RelationalGroupedDataset,
      aggs: Seq[Column]): DataFrame = df.agg(aggs.head, aggs.tail: _*)

  /** Error-channel projection shared by every pipeline (the reference's
    * record_unknown_*_errors argument list, umn_data_error.py).
    */
  private def errorRows(df: DataFrame, errorType: String, jobcode: Column,
      jobcodeDescr: Column, deptid: Column, deptidDescr: Column,
      college: Column, collegeDescr: Column, campus: Column,
      campusDescr: Column): DataFrame =
    df.select(col("emplid"), lit(errorType).as("error_type"),
      jobcode.as("jobcode"), jobcodeDescr.as("jobcode_descr"),
      deptid.as("deptid"), deptidDescr.as("deptid_descr"),
      college.as("um_college"), collegeDescr.as("um_college_descr"),
      campus.as("um_campus"), campusDescr.as("um_campus_descr"))

  private def refErrors(df: DataFrame, errorType: String): DataFrame =
    errorRows(df, errorType, col("ref.jobcode"), col("ref.jobcode_descr"),
      col("ref.deptid"), col("ref.deptid_descr"), col("ref.um_college"),
      col("ref.um_college_descr"), col("ref.um_campus"),
      col("ref.um_campus_descr"))

  private case class EmpPoiStage(
      matched: DataFrame, // one row per job group, dims joined
      unknownDept: DataFrame,
      unknownJobcode: DataFrame)

  /** The shared employee/poi derivation: sessionize → collapse groups
    * (reference-entry election via one max_by: a C row beats non-C, the
    * earliest C wins, else the latest row — employee_job.py:97-106) →
    * next-group end-date inference (W4) → dept-org and jobcode
    * broadcast lookups with error routing. `withLdw` selects the
    * employee variant (last_date_worked guards); `jcExtraCols` pulls
    * additional jobcode-dim columns (the employee override flag).
    */
  private def empPoiStage(
      entries: DataFrame,
      deptOrg: DataFrame,
      jobcodes: DataFrame,
      jcExtraCols: Seq[String],
      withLdw: Boolean,
      mat: DataFrame => DataFrame): EmpPoiStage = {

    val grouped = sessionizeEntries(entries)
    val isC = when(col("status_flg") === "C", 1).otherwise(0)
    val refKey = struct(isC.as("c"),
      when(isC === 1, -col("__ord")).otherwise(col("__ord")).as("o"))
    val refStruct = struct(
      col("emplid"), col("empl_rcdno"), col("jobcode"), col("jobcode_descr"),
      col("deptid"), col("deptid_descr"), col("um_campus"),
      col("um_campus_descr"), col("um_college"), col("um_college_descr"),
      col("effdt"), col("empl_status"), col("status_flg"))
    val ldwAgg =
      if (withLdw)
        max(when(col("last_date_worked").isNotNull &&
          !isActiveStatus(col("empl_status")), col("last_date_worked")))
      else lit(null).cast("timestamp")
    val collapsed = aggAll(grouped.groupBy(col("emplid"), col("__grp")), Seq(
      min(col("__ord")).as("group_ord"),
      min(col("position_nbr")).as("position_nbr"),
      min(col("job_entry_dt")).as("job_entry_dt"),
      min(col("jobcode")).as("g_jobcode"),
      min(col("deptid")).as("g_deptid"),
      max(isC).as("has_c"),
      max_by(refStruct, refKey).as("ref"),
      ldwAgg.as("ldw_max")))

    // W4: end-date inference from the next group in the same position
    // (employee_job.py:111-116). The traversal is position-major, so
    // lead() within (emplid, position_nbr) is exactly "next group has
    // the same position_nbr". The employee variant only applies it when
    // no last-date-worked exists (the poi feed has no such column).
    val wPos = Window.partitionBy("emplid", "position_nbr").orderBy("group_ord")
    val withNext = collapsed
      .withColumn("next_jed", lead(col("job_entry_dt"), 1).over(wPos))
    val jobIsActive = col("has_c") === 1 &&
      isActiveStatus(col("ref.empl_status"))
    val endPre =
      if (withLdw)
        when(col("has_c") === 0 && col("next_jed").isNotNull &&
          col("ldw_max").isNull, col("next_jed"))
      else
        when(col("has_c") === 0 && col("next_jed").isNotNull, col("next_jed"))
    val endFallback =
      if (withLdw) coalesce(col("ldw_max"), col("ref.effdt"))
      else col("ref.effdt")
    val withEnd = withNext
      .withColumn("end_date", coalesce(endPre, when(!jobIsActive, endFallback)))
      .withColumn("start_date", col("job_entry_dt"))

    // J1: dept → org broadcast lookup; misses go to the error channel
    // (employee_job.py:118-137 records and skips).
    // mat boundary (round 19): orgJoined fans out to the jobs path AND
    // two error branches — without it the sessionize→collapse window
    // cascade above re-executes once per consumer
    val orgJoined = mat(withEnd.join(
      broadcast(deptOrg.select(col("deptid").as("__dok"),
        col("pure_org_id").as("org_id"))),
      col("ref.deptid") === col("__dok"), "left"))
    val unknownDept = refErrors(orgJoined.filter(col("org_id").isNull),
      "unknown_dept")

    // J2: jobcode defaults. The reference's .one() raises on a missing
    // jobcode; here the row routes to the error channel instead of
    // silently vanishing in an inner join.
    val jcCols = Seq("pure_job_description", "default_employed_as",
      "default_staff_type", "default_visibility", "default_profiled") ++
      jcExtraCols
    val jcJoined = orgJoined.filter(col("org_id").isNotNull)
      .join(broadcast(jobcodes.select((col("jobcode").as("__jck") +:
        jcCols.map(col)): _*)), col("ref.jobcode") === col("__jck"), "left")
    val unknownJobcode = refErrors(jcJoined.filter(col("__jck").isNull),
      "unknown_jobcode")

    EmpPoiStage(jcJoined.filter(col("__jck").isNotNull),
      unknownDept, unknownJobcode)
  }

  /** C1/C2/C4/C5 output projection shared by employee and poi (only the
    * profiled derivation differs).
    */
  private def jobOutput(df: DataFrame, profiled: Column): DataFrame = {
    val activeJob = col("end_date").isNull
    df.select(
      col("emplid"),
      col("g_jobcode").as("affiliation_id"),
      col("start_date"),
      col("end_date"),
      col("g_deptid").as("deptid"),
      col("org_id"),
      col("ref.um_campus").as("um_campus"),
      col("ref.jobcode_descr").as("job_title"),
      col("ref.empl_rcdno").as("empl_rcdno"),
      col("pure_job_description").as("job_description"),
      col("default_employed_as").as("employment_type"),
      when(col("end_date").isNotNull, lit("nonacademic"))
        .otherwise(col("default_staff_type")).as("staff_type"),
      when(activeJob && col("ref.um_campus").isin("TXXX", "DXXX"),
        col("default_visibility")).otherwise(lit("Restricted"))
        .as("visibility"),
      profiled.as("profiled"),
      col("group_ord"))
  }

  /** Employee-job derivation (employee_job.py:9-203).
    * Inputs: `entries` (FIXTURES.md §1), dims `deptOrg(deptid,
    * pure_org_id)`, `jobcodes` (defaults incl. overrideable flag),
    * `knownOverrideable(jobcode, deptid)`, `overrides(jobcode, deptid,
    * profiled)`. Dims are broadcast — they are small by nature.
    * Returns (jobs, errors) where errors carries `error_type` ∈
    * {unknown_dept, unknown_jobcode, unknown_jobcode_deptid}.
    */
  def employeeJobs(
      entries: DataFrame,
      deptOrg: DataFrame,
      jobcodes: DataFrame,
      knownOverrideable: DataFrame,
      overrides: DataFrame,
      mat: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {

    val stage = empPoiStage(entries, deptOrg, jobcodes,
      jcExtraCols = Seq("default_profiled_overrideable"), withLdw = true,
      mat)

    // J3: two-level profiled override (employee_job.py:166-199)
    val withDefaults = stage.matched
      .join(broadcast(knownOverrideable
          .select(col("jobcode").as("__kj"), col("deptid").as("__kd"),
            lit(true).as("__known"))),
        col("ref.jobcode") === col("__kj") &&
          col("ref.deptid") === col("__kd"), "left")
      .join(broadcast(overrides
          .select(col("jobcode").as("__oj"), col("deptid").as("__od"),
            col("profiled").as("__override_profiled"))),
        col("ref.jobcode") === col("__oj") &&
          col("ref.deptid") === col("__od"), "left")

    val activeJob = col("end_date").isNull
    val profiled =
      when(!activeJob, lit(false))
        .when(col("default_profiled_overrideable") &&
          col("__known").isNotNull && col("__override_profiled").isNotNull,
          col("__override_profiled"))
        .otherwise(col("default_profiled"))
    val unknownJobcodeDept = refErrors(
      withDefaults.filter(activeJob &&
        col("default_profiled_overrideable") && col("__known").isNull),
      "unknown_jobcode_deptid")

    (jobOutput(withDefaults, profiled),
      stage.unknownDept.unionByName(stage.unknownJobcode)
        .unionByName(unknownJobcodeDept))
  }

  /** POI-job derivation (poi_job.py): employee variant minus
    * last_date_worked; end-date falls back to reference effdt; the
    * next-same-position rule has no ldw guard; no profiled override.
    */
  def poiJobs(
      entries: DataFrame,
      deptOrg: DataFrame,
      jobcodes: DataFrame,
      mat: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    val stage = empPoiStage(entries, deptOrg, jobcodes,
      jcExtraCols = Nil, withLdw = false, mat)
    val profiled = when(col("end_date").isNull, col("default_profiled"))
      .otherwise(lit(false))
    (jobOutput(stage.matched, profiled),
      stage.unknownDept.unionByName(stage.unknownJobcode))
  }

  /** Affiliate-job derivation (affiliate_job.py): stints within
    * (deptid, um_affiliate_id, um_affil_relation) split at
    * inactive→active transitions and truncated after the first 'C' row
    * ([[Relational.splitStints]]); the job is described by the stint's
    * LAST entry; all defaults come straight from the jobcode dim.
    */
  def affiliateJobs(
      entries: DataFrame,
      deptOrg: DataFrame,
      jobcodes: DataFrame,
      mat: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {

    val w = Window.partitionBy("emplid").orderBy(
      col("deptid"), col("um_affiliate_id"), col("um_affil_relation"),
      col("effdt"), col("status"), col("status_flg"), col("title"))
    val ordered = entries.withColumn("__ord", row_number().over(w))
    val stinted = Relational.splitStints(ordered,
      Seq("emplid", "deptid", "um_affiliate_id", "um_affil_relation"),
      Seq(col("effdt"), col("__ord")),
      isAffiliateActive(col("status")),
      col("status_flg") === "C")

    val lastStruct = struct(
      col("emplid"), col("um_campus"), col("um_campus_descr"),
      col("title"), col("deptid_descr"), col("um_college"),
      col("um_college_descr"), col("effdt"), col("status"),
      col("status_flg"))
    val collapsed = aggAll(stinted.groupBy(
      col("emplid"), col("deptid"), col("um_affiliate_id"),
      col("um_affil_relation"), col("stint_id")), Seq(
      min(col("__ord")).as("group_ord"),
      min(col("effdt")).as("start_date"),
      max_by(lastStruct, col("__ord")).as("last")))

    // mat boundary (round 19): consumed by the jobs path and both
    // error branches — same re-execution cut as empPoiStage's
    val orgJoined = mat(collapsed.join(
      broadcast(deptOrg.select(col("deptid").as("__dok"),
        col("pure_org_id").as("org_id"))),
      col("deptid") === col("__dok"), "left"))

    val unknownDept = errorRows(orgJoined.filter(col("org_id").isNull),
      "unknown_dept", col("um_affil_relation"), col("last.title"),
      col("deptid"), col("last.deptid_descr"), col("last.um_college"),
      col("last.um_college_descr"), col("last.um_campus"),
      col("last.um_campus_descr"))

    val jcJoined = orgJoined.filter(col("org_id").isNotNull)
      .join(broadcast(jobcodes.select(col("jobcode").as("__jck"),
        col("pure_job_description"), col("default_employed_as"),
        col("default_staff_type"), col("default_visibility"),
        col("default_profiled"))),
        col("um_affil_relation") === col("__jck"), "left")
    val unknownJobcode = errorRows(jcJoined.filter(col("__jck").isNull),
      "unknown_jobcode", col("um_affil_relation"), col("last.title"),
      col("deptid"), col("last.deptid_descr"), col("last.um_college"),
      col("last.um_college_descr"), col("last.um_campus"),
      col("last.um_campus_descr"))
    val jobs = jcJoined.filter(col("__jck").isNotNull)
      .select(
        col("emplid"),
        col("um_affil_relation").as("affiliation_id"),
        col("start_date"),
        when(!isAffiliateActive(col("last.status")) ||
          col("last.status_flg") === "H", col("last.effdt")).as("end_date"),
        col("deptid"),
        col("org_id"),
        col("last.um_campus").as("um_campus"),
        col("last.title").as("job_title"),
        lit(null).cast("string").as("empl_rcdno"),
        col("pure_job_description").as("job_description"),
        col("default_employed_as").as("employment_type"),
        col("default_staff_type").as("staff_type"),
        col("default_visibility").as("visibility"),
        col("default_profiled").as("profiled"),
        col("group_ord"))

    (jobs, unknownDept.unionByName(unknownJobcode))
  }
}
