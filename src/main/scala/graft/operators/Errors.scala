package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** A7: the error-accumulation table (reference
  * `umn_data_error.py:209-233` find_or_create_umn_data_error +
  * `exceptions.py:14-43` content-addressed error ids). The reference
  * processes one error occurrence at a time against a live DB session:
  * look up by sha1 id, bump `count`/`last_seen` if present, insert with
  * `count=1` otherwise; `first_seen`/`reported` are never touched after
  * insert. Re-expressed set-at-a-time: expand the per-job error channel
  * into per-occurrence records ([[errorRecords]]), then merge a whole
  * run's occurrences into the accumulated table with ONE keyed
  * aggregation + ONE full-outer join ([[accumulate]]) — no driver loop,
  * scales to any error volume.
  */
object Errors {

  private val contextCols = Seq("emplid", "internet_id", "jobcode",
    "jobcode_descr", "deptid", "deptid_descr", "persons_in_dept",
    "um_college", "um_college_descr", "um_campus", "um_campus_descr")

  /** Identifying fields per exception class (exceptions.py `ids`);
    * stableId input is the id fields AND the exception name sorted
    * together alphabetically — the reference sha1s
    * `json.dumps(sorted({**ids, 'exception': name}.items()))`, where
    * 'exception' sorts among the id keys, not after them.
    */
  private def errId(exception: String, idFields: (String, Column)*): Column =
    Fns.stableId((idFields :+ ("exception" -> lit(exception)))
      .sortBy(_._1).map { case (n, c) => c.as(n) }: _*)

  /** Expand the HR pipelines' error channel (`error_type`, emplid,
    * jobcode…, per HrJobs.errorRows / OitToEdw noJobErrors) into the
    * reference's exception records. A dept-class occurrence records TWO
    * errors — the dept-level one (deduped by deptid) and the job-level
    * one (deduped by jobcode+deptid+emplid) — exactly the paired
    * session.adds in record_unknown_dept_errors
    * (umn_data_error.py:109-159); no_job_data records one.
    *
    * `eligiblePersons`: (emplid, deptid) rows of pure-eligible persons
    * used for the dept-level record's `persons_in_dept` enrichment
    * (count_pure_eligible_persons_in_dept, umn_data_error.py:125-126) —
    * an aggregate + broadcast join instead of a per-row SQL count.
    */
  def errorRecords(
      errors: DataFrame,
      eligiblePersons: DataFrame): DataFrame = {
    val in =
      if (errors.columns.contains("internet_id")) errors
      else errors.withColumn("internet_id", lit(null).cast("string"))

    val personsInDept = eligiblePersons
      .groupBy("deptid").agg(count(lit(1)).as("__pid_count"))

    def shaped(df: DataFrame, exception: String, message: String,
        id: Column, pidCount: Boolean): DataFrame = {
      val base = df
        .withColumn("error_id", id)
        .withColumn("__exception", lit(exception))
        .withColumn("message", lit(message))
      val enriched =
        if (pidCount)
          base.join(broadcast(personsInDept), Seq("deptid"), "left")
            .withColumn("persons_in_dept",
              coalesce(col("__pid_count"), lit(0L)).cast("long"))
            .drop("__pid_count")
        else base.withColumn("persons_in_dept", lit(null).cast("long"))
      // dept-level records carry no per-person identity (the reference
      // exception classes simply have those attrs None)
      val cleared =
        if (pidCount)
          enriched.withColumn("emplid", lit(null).cast("string"))
            .withColumn("internet_id", lit(null).cast("string"))
            .withColumn("jobcode", lit(null).cast("string"))
            .withColumn("jobcode_descr", lit(null).cast("string"))
        else enriched
      cleared.select(Seq(col("error_id"),
        col("__exception").as("exception"), col("message")) ++
        contextCols.map(col): _*)
    }

    val dept = in.filter(col("error_type") === "unknown_dept")
    // unknown_jobcode (jobcode absent from the dim — the reference's
    // .one() raises; exceptions.py ships the class commented out, keyed
    // [jobcode]) is a DIFFERENT condition from unknown_jobcode_deptid
    // (the overrideable-pair miss, employee_job.py:187) and must not
    // share ids or labels with it
    val jc = in.filter(col("error_type") === "unknown_jobcode")
    val jcd = in.filter(col("error_type") === "unknown_jobcode_deptid")
    val noJob = in.filter(col("error_type") === "no_job_data")

    val unknownDept = shaped(dept, "ExpertsEtlUnknownDept",
      "unknown department",
      errId("ExpertsEtlUnknownDept", "deptid" -> col("deptid")),
      pidCount = true)
    val jobUnknownDept = shaped(dept, "ExpertsEtlJobWithUnknownDept",
      "job with unknown department",
      errId("ExpertsEtlJobWithUnknownDept", "deptid" -> col("deptid"),
        "emplid" -> col("emplid"), "jobcode" -> col("jobcode")),
      pidCount = false)
    val unknownJc = shaped(jc, "ExpertsEtlUnknownJobcode",
      "unknown jobcode",
      errId("ExpertsEtlUnknownJobcode", "jobcode" -> col("jobcode")),
      pidCount = false)
    val unknownJcd = shaped(jcd, "ExpertsEtlUnknownJobcodeDeptid",
      "unknown overrideable jobcode/deptid pair",
      errId("ExpertsEtlUnknownJobcodeDeptid", "deptid" -> col("deptid"),
        "jobcode" -> col("jobcode")),
      pidCount = false)
    val jobUnknownJcd = shaped(jcd, "ExpertsEtlJobWithUnknownJobcodeDeptid",
      "job with unknown overrideable jobcode/deptid pair",
      errId("ExpertsEtlJobWithUnknownJobcodeDeptid",
        "deptid" -> col("deptid"), "emplid" -> col("emplid"),
        "jobcode" -> col("jobcode")),
      pidCount = false)
    val noJobData = shaped(noJob, "ExpertsEtlPersonNoJobData",
      "unable to find or generate any job data for person",
      errId("ExpertsEtlPersonNoJobData", "emplid" -> col("emplid")),
      pidCount = false)

    unknownDept.unionByName(jobUnknownDept).unionByName(unknownJc)
      .unionByName(unknownJcd).unionByName(jobUnknownJcd)
      .unionByName(noJobData)
  }

  /** Merge one run's error occurrences into the accumulated table.
    * `existing` columns: error_id, exception, message, context…, count,
    * first_seen, last_seen, reported. `incoming`: per-occurrence rows
    * from [[errorRecords]] (duplicate error_ids = repeated occurrences,
    * each of which the reference would count). `now`: the run
    * timestamp, supplied by the caller for determinism.
    *
    * Contract (find_or_create_umn_data_error): count accumulates,
    * first_seen is the insert time and never changes, last_seen moves
    * to `now` only for ids seen this run, reported survives (the email
    * reporter's flag, umn_data_error.py:48-73), and context fields of
    * an existing row are NOT overwritten by a new occurrence.
    */
  def accumulate(
      existing: DataFrame,
      incoming: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    // per-id rollup of this run: occurrence count + ONE whole
    // occurrence's context (lexicographic min of the full struct — a
    // real row, deterministic; per-field max could stitch together a
    // context that never occurred)
    val ctx = struct(col("exception") +: col("message") +:
      contextCols.map(col): _*)
    val rolled = incoming.groupBy("error_id")
      .agg(count(lit(1)).as("__inc"), min(ctx).as("__ctx"))
      .select(Seq(col("error_id"), col("__inc"),
        col("__ctx.exception").as("__exception"),
        col("__ctx.message").as("__message")) ++
        contextCols.map(c => col(s"__ctx.$c").as(s"__$c")): _*)

    val ex = existing.columns.foldLeft(existing)((df, c) =>
      if (c == "error_id") df else df.withColumnRenamed(c, s"__ex_$c"))

    // __ex_count is non-null iff the row existed: the discriminator for
    // "keep the existing row's fields wholesale". Per-field coalesce
    // would backfill an existing row's NULL context from a new
    // occurrence — the reference's find_or_create never touches any
    // field but count/last_seen after insert.
    val rowExisted = col("__ex_count").isNotNull
    ex.join(rolled, Seq("error_id"), "full_outer")
      .select(Seq(
        col("error_id"),
        when(rowExisted, col("__ex_exception"))
          .otherwise(col("__exception")).as("exception"),
        when(rowExisted, col("__ex_message"))
          .otherwise(col("__message")).as("message")) ++
        contextCols.map(c =>
          when(rowExisted, col(s"__ex_$c"))
            .otherwise(col(s"__$c")).as(c)) ++ Seq(
          (coalesce(col("__ex_count"), lit(0L)) +
            coalesce(col("__inc"), lit(0L))).as("count"),
          coalesce(col("__ex_first_seen"), lit(now)).as("first_seen"),
          when(col("__inc").isNotNull, lit(now))
            .otherwise(col("__ex_last_seen")).as("last_seen"),
          coalesce(col("__ex_reported"), lit(false)).as("reported")): _*)
  }

  /** Bootstrap an empty accumulated table from a first run. */
  def firstRun(incoming: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val schema = incoming.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      incoming.schema
        .add("count", "long").add("first_seen", "timestamp")
        .add("last_seen", "timestamp").add("reported", "boolean"))
    accumulate(schema, incoming, now)
  }

  /** The email reporter's selection (unreported_umn_data_errors). */
  def unreported(table: DataFrame): DataFrame =
    table.filter(!col("reported"))

  /** record_reporting_of_umn_data_errors: flag everything reported. */
  def markReported(table: DataFrame): DataFrame =
    table.withColumn("reported", lit(true))

  /** The CSV report projection (create_csv_report,
    * umn_data_error.py:76-101): bookkeeping fields dropped.
    */
  def csvReport(unreportedErrors: DataFrame): DataFrame =
    unreportedErrors.select(col("message") +: contextCols.map(col): _*)
}
