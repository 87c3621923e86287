package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader._

/** Golden tests: every reference fixture's `entries` stage must derive
  * exactly its `jobs` stage (reference tests/test_employee_job.py,
  * test_poi_job.py, test_affiliate_job.py — here run over ALL fixtures
  * at once through the whole-relation pipeline, not per person).
  */
class HrJobsSpec extends AnyFunSuite {

  private val jobCols = Seq("emplid", "affiliation_id", "deptid",
    "um_campus", "org_id", "job_title", "job_description",
    "employment_type", "staff_type", "start_date", "end_date",
    "visibility", "profiled")
  private val empJobCols = jobCols :+ "empl_rcdno"

  private val empFixtures = Seq(
    "emp_job_entries_1082441", "emp_job_entries_3262322",
    "emp_job_entries_4604830", "emp_job_entries_5150075",
    "employee_jobs_0903070", "employee_jobs_1217312",
    "employee_jobs_1717940", "employee_jobs_1732812",
    "employee_jobs_2110507", "employee_jobs_8000397")
  private val poiFixtures = Seq("poi_jobs_2898289", "poi_jobs_2927554",
    "poi_jobs_5231388", "poi_jobs_5491169", "poi_jobs_5575725")
  private val affFixtures = Seq("fake357_aff_job_entries",
    "fake531_aff_job_entries", "fake531_aff_job_entries_2",
    "fake531_aff_job_entries_3")

  test("employee job derivation matches every golden fixture") {
    for (f <- empFixtures if hasStage(f, "jobs")) {
      val in = entries(f).withColumn("emplid", coalesce(col("emplid"), lit(f)))
      val (jobs, _) = HrJobs.employeeJobs(in, deptOrg, jobcodes("emp"),
        emptyOverrideable, emptyOverrides)
      val expected = jobsStage(f, "jobs")
        .withColumn("emplid", lit(in.select("emplid").first().getString(0)))
      val gotC = canon(jobs, empJobCols)
      val expC = canon(expected, empJobCols)
      assert(gotC == expC, s"fixture $f:\n got=${gotC.mkString("\n     ")}\n exp=${expC.mkString("\n     ")}")
    }
  }

  test("poi job derivation matches every golden fixture") {
    for (f <- poiFixtures if hasStage(f, "jobs")) {
      val in = entries(f)
      val (jobs, _) = HrJobs.poiJobs(in, deptOrg, jobcodes("poi"))
      val expected = jobsStage(f, "jobs")
        .withColumn("emplid", lit(in.select("emplid").first().getString(0)))
      val gotC = canon(jobs, empJobCols)
      val expC = canon(expected, empJobCols)
      assert(gotC == expC, s"fixture $f:\n got=${gotC.mkString("\n     ")}\n exp=${expC.mkString("\n     ")}")
    }
  }

  test("affiliate job derivation (stints) matches every golden fixture") {
    for (f <- affFixtures if hasStage(f, "jobs")) {
      val in = entries(f)
      val (jobs, _) = HrJobs.affiliateJobs(in, deptOrg, jobcodes("aff"))
      val expected = jobsStage(f, "jobs")
        .withColumn("emplid", lit(in.select("emplid").first().getString(0)))
      val gotC = canon(jobs, jobCols)
      val expC = canon(expected, jobCols)
      assert(gotC == expC, s"fixture $f:\n got=${gotC.mkString("\n     ")}\n exp=${expC.mkString("\n     ")}")
    }
  }

  test("unknown dept routes to the error channel, not the jobs output") {
    val in = entries("emp_job_entries_4604830")
    val (jobs, errors) = HrJobs.employeeJobs(in,
      deptOrg.filter(col("deptid") =!= "11179"), jobcodes("emp"),
      emptyOverrideable, emptyOverrides)
    assert(jobs.filter(col("deptid") === "11179").count() == 0)
    assert(errors.filter(col("error_type") === "unknown_dept")
      .filter(col("deptid") === "11179").count() == 1)
  }
}
