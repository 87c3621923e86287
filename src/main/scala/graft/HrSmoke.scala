package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

/** Library-surface smoke: fixtures → employeeJobs → election → folds. */
object HrSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "src/test/resources/fixtures"
    def st(f: String, s: String) = {
      val raw = spark.read.option("multiLine", true).json(s"$dir/$f.json")
      raw.select(explode(col(s)).as("r")).select("r.*")
        .withColumn("effdt", to_timestamp(col("effdt")))
        .withColumn("job_entry_dt", to_timestamp(col("job_entry_dt")))
        .withColumn("last_date_worked", to_timestamp(col("last_date_worked")))
        .withColumn("effseq", col("effseq").cast("int"))
        .withColumn("deptid_descr", lit(null).cast("string"))
        .withColumn("um_college", lit(null).cast("string"))
        .withColumn("um_college_descr", lit(null).cast("string"))
        .withColumn("um_campus_descr", lit(null).cast("string"))
    }
    val dims = spark.read.option("multiLine", true).json(s"$dir/dims.json")
    val deptOrg = dims.select(explode(col("dept_org")).as("r")).select("r.*")
    val jcs = dims.select(explode(col("emp_jobcodes")).as("r")).select("r.*")
    import spark.implicits._
    val (jobs, errs) = HrJobs.employeeJobs(
      st("emp_job_entries_4604830", "entries")
        .unionByName(st("employee_jobs_2110507", "entries")),
      deptOrg, jcs,
      Seq.empty[(String,String)].toDF("jobcode","deptid"),
      Seq.empty[(String,String,Boolean)].toDF("jobcode","deptid","profiled"))
    val persons = Seq(("4604830","0"),("2110507","0")).toDF("emplid","primary_empl_rcdno")
    val elected = PersonSync.electPrimaryJobs(jobs, jobs.limit(0), jobs.limit(0), persons)
    val folded = PersonSync.transformStaffType(elected)
    println("JOBS+PRIMARY:")
    folded.select("emplid","affiliation_id","start_date","end_date","staff_type","primary","out_ord")
      .orderBy("emplid","out_ord").show(20, false)
    println("PROFILED:"); PersonSync.transformProfiled(elected).orderBy("emplid").show(false)
    println("ERRORS: " + errs.count())
    spark.stop()
  }
}
