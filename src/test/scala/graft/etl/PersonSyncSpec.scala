package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import FixtureLoader._

/** Golden tests for the person-level folds (reference
  * tests/test_person.py): primary election, staff-type propagation,
  * profiled, staff-org-association dedup.
  */
class PersonSyncSpec extends AnyFunSuite {

  private val electCols = Seq("emplid", "affiliation_id", "deptid",
    "um_campus", "org_id", "job_title", "job_description",
    "employment_type", "staff_type", "start_date", "end_date",
    "visibility", "profiled", "empl_rcdno", "primary")

  /** Fixture `jobs` stage shaped like an emp-jobs frame for election:
    * group_ord = fixture list position (the reference's list order).
    */
  private def asEmpJobs(f: String, stageName: String = "jobs"): DataFrame = {
    var df = jobsStage(f, stageName)
      .withColumn("emplid", lit(f))
      .withColumn("group_ord", col("__pos")).drop("__pos")
    if (!df.columns.contains("org_id"))
      df = df.withColumn("org_id", lit(null).cast("string"))
    df
  }

  private def persons(f: String, rcdno: String): DataFrame = {
    import FixtureLoader.spark.implicits._
    Seq((f, rcdno)).toDF("emplid", "primary_empl_rcdno")
  }

  private def emptyJobs(like: DataFrame): DataFrame = like.limit(0)

  test("primary election matches golden fixtures (emp jobs only, rcdno 0)") {
    for (f <- Seq("emp_job_entries_4604830", "employee_jobs_2110507",
        "employee_jobs_1217312", "employee_jobs_8000397", "emp_job_entries_1082441")
        if hasStage(f, "jobs_with_primary")) {
      val jobs = asEmpJobs(f)
      val elected = PersonSync.electPrimaryJobs(
        jobs, emptyJobs(jobs), emptyJobs(jobs), persons(f, "0"))
      val expected = jobsStage(f, "jobs_with_primary").withColumn("emplid", lit(f))
      val gotC = canon(elected, electCols)
      val expC = canon(expected, electCols)
      assert(gotC == expC, s"fixture $f:\n got=${gotC.mkString("\n     ")}\n exp=${expC.mkString("\n     ")}")
    }
  }

  test("staff-type propagation matches golden fixtures") {
    for (f <- Seq("employee_jobs_1217312", "employee_jobs_2110507")) {
      val in = asEmpJobs(f, "jobs_with_primary")
        .withColumn("out_ord", col("group_ord"))
      val got = PersonSync.transformStaffType(in)
      val expected = jobsStage(f, "jobs_with_transformed_staff_type")
        .withColumn("emplid", lit(f))
      assert(canon(got, electCols) == canon(expected, electCols), s"fixture $f")
    }
  }

  test("person profiled matches golden fixtures") {
    for ((f, exp) <- Seq("employee_jobs_1217312" -> null,
        "employee_jobs_2110507" -> null, "emp_job_entries_1082441" -> null)) {
      val raw = FixtureLoader.spark.read.option("multiLine", true)
        .json(s"$dir/$f.json")
      if (raw.columns.contains("transformed_profiled")) {
        val expProfiled = raw.select("transformed_profiled").first().getBoolean(0)
        val in = asEmpJobs(f, "jobs_with_primary")
        val got = PersonSync.transformProfiled(in)
          .filter(col("emplid") === f).select("profiled").first().getBoolean(0)
        assert(got == expProfiled, s"fixture $f")
      }
      val _ = exp
    }
  }

  test("staff-org-assoc-id dedup matches golden fixture") {
    // only fixtures the reference's own tests assert for this stage
    // (test_person.py:53-62 uses 1217312; 8000397's stage data is stale —
    // its expected autoid embeds an org_id absent from the input rows)
    for (f <- Seq("employee_jobs_1217312", "employee_jobs_2110507")
        if hasStage(f, "jobs_with_staff_org_assoc_id")) {
      // reference test passes person_id '6030' for 1217312; the
      // fixtures' expected ids embed the person id — read it back out
      val expected = jobsStage(f, "jobs_with_staff_org_assoc_id")
        .withColumn("emplid", lit(f))
      val pid = expected.filter(col("staff_org_assoc_id").isNotNull)
        .select(regexp_extract(col("staff_org_assoc_id"),
          "^autoid:([^-]+)-", 1)).first().getString(0)
      val in = asEmpJobs(f, "jobs_with_transformed_staff_type")
        .withColumn("out_ord", col("group_ord"))
      val got = PersonSync.staffOrgAssocId(in, lit(pid))
      val cols = electCols :+ "staff_org_assoc_id"
      val gotC = canon(got, cols)
      val expC = canon(expected, cols)
      assert(gotC == expC, s"fixture $f:\n got=${gotC.mkString("\n     ")}\n exp=${expC.mkString("\n     ")}")
    }
  }
}
