package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Error-accumulation semantics vs reference
  * umn_data_error.py:209-233 (find_or_create) and 48-101 (reporting).
  */
class ErrorsSpec extends AnyFunSuite {
  import spark.implicits._

  private val ts1 = java.sql.Timestamp.valueOf("2026-01-01 08:00:00")
  private val ts2 = java.sql.Timestamp.valueOf("2026-01-02 08:00:00")
  private val ts3 = java.sql.Timestamp.valueOf("2026-01-03 08:00:00")

  private def errChannel(rows: Seq[(String, String, String, String)]) =
    rows.toDF("emplid", "error_type", "jobcode", "deptid")
      .withColumn("jobcode_descr", lit(null).cast("string"))
      .withColumn("deptid_descr", lit(null).cast("string"))
      .withColumn("um_college", lit(null).cast("string"))
      .withColumn("um_college_descr", lit(null).cast("string"))
      .withColumn("um_campus", lit(null).cast("string"))
      .withColumn("um_campus_descr", lit(null).cast("string"))

  private val eligible = Seq(("e1", "D1"), ("e2", "D1"), ("e3", "D2"))
    .toDF("emplid", "deptid")

  test("errorRecords expands dept errors into the paired exception family") {
    val errors = errChannel(Seq(
      ("e1", "unknown_dept", "J1", "D1"),
      ("e2", "unknown_dept", "J2", "D1"),
      ("e7", "unknown_jobcode", "J7", "D2"),
      ("e9", "unknown_jobcode_deptid", "J9", "D2"),
      ("e5", "no_job_data", null, null)))
    val recs = Errors.errorRecords(errors, eligible)
    val byEx = recs.groupBy("exception").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2 dept occurrences -> 2 dept-level + 2 job-level; 1 plain-jobcode
    // miss -> 1 (its own class, NOT the overrideable pair); 1 jcd pair
    // -> 1+1; 1 no-job -> 1
    assert(byEx == Map(
      "ExpertsEtlUnknownDept" -> 2L,
      "ExpertsEtlJobWithUnknownDept" -> 2L,
      "ExpertsEtlUnknownJobcode" -> 1L,
      "ExpertsEtlUnknownJobcodeDeptid" -> 1L,
      "ExpertsEtlJobWithUnknownJobcodeDeptid" -> 1L,
      "ExpertsEtlPersonNoJobData" -> 1L))
    // the two J-families on (J7/D2) vs (J9/D2) stay distinct ids
    assert(recs.filter($"jobcode".isin("J7", "J9"))
      .select("error_id").distinct().count() == 3)
    // both D1 occurrences share ONE dept-level error_id but have
    // distinct job-level ids
    val deptIds = recs.filter($"exception" === "ExpertsEtlUnknownDept")
      .select("error_id").distinct().count()
    assert(deptIds == 1)
    val jobIds = recs.filter($"exception" === "ExpertsEtlJobWithUnknownDept")
      .select("error_id").distinct().count()
    assert(jobIds == 2)
    // dept-level record is person-scrubbed + persons_in_dept enriched
    val dept = recs.filter($"exception" === "ExpertsEtlUnknownDept").head()
    assert(dept.getAs[String]("emplid") == null)
    assert(dept.getAs[Long]("persons_in_dept") == 2L)
    // job-level record keeps identity and has no persons_in_dept
    val job = recs.filter($"exception" === "ExpertsEtlJobWithUnknownDept" &&
      $"emplid" === "e1").head()
    assert(job.getAs[String]("jobcode") == "J1")
    assert(job.isNullAt(job.fieldIndex("persons_in_dept")))
  }

  test("two-cycle accumulation: count sums, first_seen sticks, last_seen moves") {
    val run1 = Errors.errorRecords(errChannel(Seq(
      ("e1", "unknown_dept", "J1", "D1"),
      ("e2", "unknown_dept", "J2", "D1"))), eligible)
    val t1 = Errors.firstRun(run1, ts1)
    // D1 dept-level error has count 2 (two occurrences in one run —
    // the reference's find_or_create increments per occurrence)
    val d1 = t1.filter($"exception" === "ExpertsEtlUnknownDept").head()
    assert(d1.getAs[Long]("count") == 2L)
    assert(d1.getAs[java.sql.Timestamp]("first_seen") == ts1)
    assert(d1.getAs[java.sql.Timestamp]("last_seen") == ts1)
    assert(!d1.getAs[Boolean]("reported"))

    // report everything, then run 2: e1/D1 recurs, e9/D2 is new
    val reported = Errors.markReported(t1)
    val run2 = Errors.errorRecords(errChannel(Seq(
      ("e1", "unknown_dept", "J1", "D1"),
      ("e9", "unknown_jobcode_deptid", "J9", "D2"))), eligible)
    val t2 = Errors.accumulate(reported, run2, ts2).cache()

    val d1b = t2.filter($"exception" === "ExpertsEtlUnknownDept").head()
    assert(d1b.getAs[Long]("count") == 3L) // 2 + 1
    assert(d1b.getAs[java.sql.Timestamp]("first_seen") == ts1)
    assert(d1b.getAs[java.sql.Timestamp]("last_seen") == ts2)
    assert(d1b.getAs[Boolean]("reported")) // flag survives recurrence

    // the job-level error for e2 did NOT recur: last_seen stays at ts1
    val e2job = t2.filter($"exception" === "ExpertsEtlJobWithUnknownDept" &&
      $"emplid" === "e2").head()
    assert(e2job.getAs[Long]("count") == 1L)
    assert(e2job.getAs[java.sql.Timestamp]("last_seen") == ts1)

    // new error starts at count 1, unreported, first_seen = ts2
    val d2 = t2.filter($"exception" === "ExpertsEtlUnknownJobcodeDeptid").head()
    assert(d2.getAs[Long]("count") == 1L)
    assert(d2.getAs[java.sql.Timestamp]("first_seen") == ts2)
    assert(!d2.getAs[Boolean]("reported"))

    // third cycle with zero errors: table unchanged except nothing moves
    val t3 = Errors.accumulate(t2, run2.limit(0), ts3)
    val d1c = t3.filter($"exception" === "ExpertsEtlUnknownDept").head()
    assert(d1c.getAs[Long]("count") == 3L)
    assert(d1c.getAs[java.sql.Timestamp]("last_seen") == ts2)
    assert(t3.count() == t2.count())
  }

  test("existing rows keep their context wholesale — no null backfill") {
    // run 1 records the error with a null jobcode_descr; run 2's
    // occurrence carries 'Analyst'. find_or_create only bumps
    // count/last_seen after insert, so the stored context must stay
    // null — per-field coalesce would silently backfill it.
    val run1 = Errors.errorRecords(errChannel(Seq(
      ("e1", "unknown_jobcode_deptid", "J1", "D1"))), eligible)
    val t1 = Errors.firstRun(run1, ts1)
    val run2raw = errChannel(Seq(("e1", "unknown_jobcode_deptid", "J1", "D1")))
      .withColumn("jobcode_descr", lit("Analyst"))
    val run2 = Errors.errorRecords(run2raw, eligible)
    val t2 = Errors.accumulate(t1, run2, ts2)
    val row = t2.filter($"exception" === "ExpertsEtlJobWithUnknownJobcodeDeptid")
      .head()
    assert(row.getAs[Long]("count") == 2L)
    assert(row.isNullAt(row.fieldIndex("jobcode_descr")),
      "existing row's null context was backfilled by a new occurrence")
    // the pair-level record (also pre-existing) keeps its null too
    val pair = t2.filter($"exception" === "ExpertsEtlUnknownJobcodeDeptid")
      .head()
    assert(pair.isNullAt(pair.fieldIndex("jobcode_descr")))
  }

  test("unreported selection and csv projection match the reporter") {
    val run1 = Errors.errorRecords(errChannel(Seq(
      ("e1", "unknown_dept", "J1", "D1"))), eligible)
    val t1 = Errors.markReported(Errors.firstRun(run1, ts1))
    val run2 = Errors.errorRecords(errChannel(Seq(
      ("e5", "no_job_data", null, null))), eligible)
    val t2 = Errors.accumulate(t1, run2, ts2)
    val unrep = Errors.unreported(t2)
    assert(unrep.count() == 1)
    assert(unrep.head().getAs[String]("exception") ==
      "ExpertsEtlPersonNoJobData")
    val csv = Errors.csvReport(unrep)
    assert(csv.columns.toSeq == Seq("message", "emplid", "internet_id",
      "jobcode", "jobcode_descr", "deptid", "deptid_descr",
      "persons_in_dept", "um_college", "um_college_descr", "um_campus",
      "um_campus_descr"))
  }

  test("error ids are content-addressed and stable across runs") {
    val a = Errors.errorRecords(errChannel(Seq(
      ("e1", "unknown_dept", "J1", "D1"))), eligible)
    val b = Errors.errorRecords(errChannel(Seq(
      ("e1", "unknown_dept", "J1", "D1"))), eligible.limit(0))
    // enrichment inputs differ but identity fields don't -> same ids
    val idsA = a.select("error_id").collect().map(_.getString(0)).toSet
    val idsB = b.select("error_id").collect().map(_.getString(0)).toSet
    assert(idsA == idsB)
  }
}
