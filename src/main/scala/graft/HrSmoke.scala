package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

/** Library-surface smoke: the full oit→edw→XML person-sync flow over
  * the ported reference fixtures, through the public API.
  */
object HrSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "src/test/resources/fixtures"
    def st(f: String) = {
      val raw = spark.read.option("multiLine", true).json(s"$dir/$f.json")
      var df = raw.select(explode(col("entries")).as("r")).select("r.*")
      for (c <- Seq("effdt", "job_entry_dt", "position_entry_dt",
          "last_date_worked") if df.columns.contains(c))
        df = df.withColumn(c, to_timestamp(col(c)))
      if (df.columns.contains("effseq"))
        df = df.withColumn("effseq", col("effseq").cast("int"))
      for (c <- Seq("deptid_descr", "um_college", "um_college_descr",
          "um_campus_descr") if !df.columns.contains(c))
        df = df.withColumn(c, lit(null).cast("string"))
      df
    }
    val dims = spark.read.option("multiLine", true).json(s"$dir/dims.json")
    def dim(n: String) = dims.select(explode(col(n)).as("r")).select("r.*")
    val t1 = java.sql.Timestamp.valueOf("2020-08-13 10:10:03")
    val demog = Seq(
      ("4604830", "u4604830"), ("fake531", "ufake531"), ("5575725", "u5575725"))
      .map { case (e, u) => (e, u, "First" + e, "J", "Last" + e,
        null.asInstanceOf[String], s"$u@umn.edu", "0", t1) }
      .toDF("emplid", "internet_id", "first_name", "middle_initial",
        "last_name", "name_suffix", "instl_email_addr",
        "primary_empl_rcdno", "timestamp")
    val sync = OitToEdw.personSync(
      demog, Seq(("4604830", "8185")).toDF("emplid", "scival_id"),
      st("emp_job_entries_4604830"), st("poi_jobs_5575725"),
      st("fake531_aff_job_entries"),
      dim("dept_org"),
      dim("emp_jobcodes").withColumn("default_profiled_overrideable", lit(false)),
      dim("poi_jobcodes"), dim("aff_jobcodes"),
      Seq.empty[(String, String)].toDF("jobcode", "deptid"),
      Seq.empty[(String, String, Boolean)].toDF("jobcode", "deptid", "profiled"))
    println("PERSONS:"); sync.personData.show(false)
    println("ASSOCIATIONS:")
    sync.staffOrgAssociations.orderBy("person_id").show(10, false)
    val out = java.nio.file.Files.createTempDirectory("sync").toString + "/persons_1.xml"
    OitToEdw.writePersonsXml(sync, out)
    println("XML bytes: " + java.nio.file.Files.size(java.nio.file.Paths.get(out)))
    println(java.nio.file.Files.readString(java.nio.file.Paths.get(out)).take(600))
    spark.stop()
  }
}
