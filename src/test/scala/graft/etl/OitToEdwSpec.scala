package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader._

/** End-to-end person-sync flow over real fixtures: demographics + all
  * three job feeds → election → folds → sync tables → merge → XML.
  */
class OitToEdwSpec extends AnyFunSuite {
  import FixtureLoader.spark.implicits._

  private val t1 = java.sql.Timestamp.valueOf("2020-08-13 10:10:03")

  private def demog(rows: (String, String)*) =
    rows.toSeq.map { case (emplid, inet) =>
      (emplid, inet, "First" + emplid, "J", "Last" + emplid,
        null.asInstanceOf[String], s"$inet@umn.edu", "0", t1)
    }.toDF("emplid", "internet_id", "first_name", "middle_initial",
      "last_name", "name_suffix", "instl_email_addr",
      "primary_empl_rcdno", "timestamp")

  private def run(): OitToEdw.SyncTables = {
    val emp = entries("emp_job_entries_4604830")
    val aff = entries("fake531_aff_job_entries")
    val poi = entries("poi_jobs_5575725")
    OitToEdw.personSync(
      demogHistory = demog("4604830" -> "u4604830", "fake531" -> "ufake531",
        "5575725" -> "u5575725", "9999999" -> "unojobs"),
      scival = Seq(("4604830", "8185")).toDF("emplid", "scival_id"),
      empEntries = emp, poiEntries = poi, affEntries = aff,
      deptOrg = deptOrg,
      empJobcodes = jobcodes("emp"), poiJobcodes = jobcodes("poi"),
      affJobcodes = jobcodes("aff"),
      knownOverrideable = emptyOverrideable, overrides = emptyOverrides)
  }

  test("sync tables carry every person with jobs, exactly one primary each") {
    val sync = run()
    val people = sync.personData.select("emplid").as[String].collect().toSet
    assert(people == Set("4604830", "fake531", "5575725"))
    // scival id wins as person_id (F14)
    assert(sync.personData.filter($"emplid" === "4604830")
      .select("person_id").first().getString(0) == "8185")
    // middle initial folded into first name (F5)
    assert(sync.personData.filter($"emplid" === "4604830")
      .select("first_name").first().getString(0) == "First4604830 J")
    val primaries = sync.staffOrgAssociations
      .groupBy("person_id")
      .agg(sum(when($"primary_association", 1).otherwise(0)).as("n"))
      .select("n").as[Long].collect()
    assert(primaries.forall(_ == 1L))
    // user rows only for persons with internet ids (all here)
    assert(sync.userData.count() == 3)
    assert(sync.userData.select("email").as[String].collect()
      .forall(_.endsWith("@umn.edu")))
    // the person with no job data lands in the error channel
    assert(sync.errors.filter($"error_type" === "no_job_data")
      .select("emplid").as[String].collect().toSeq == Seq("9999999"))
  }

  test("merge replaces a person's associations wholesale and upserts rows") {
    val sync = run()
    val updated = sync.staffOrgAssociations
      .withColumn("staff_type", lit("CHANGED"))
    val merged = OitToEdw.mergeIntoTargets(
      sync.copy(staffOrgAssociations = sync.staffOrgAssociations),
      sync.copy(staffOrgAssociations = updated))
    assert(merged.staffOrgAssociations.count() ==
      sync.staffOrgAssociations.count())
    assert(merged.staffOrgAssociations.filter($"staff_type" =!= "CHANGED")
      .count() == 0)
  }

  test("XML sync file renders every person element with jobs") {
    val sync = run()
    val dir = java.nio.file.Files.createTempDirectory("e2e").toString
    val target = s"$dir/persons_1.xml"
    OitToEdw.writePersonsXml(sync, target)
    val xml = java.nio.file.Files.readString(java.nio.file.Paths.get(target))
    assert(xml.startsWith("<?xml version"))
    assert(xml.endsWith("</persons>"))
    assert("<person id=".r.findAllIn(xml).length == 3)
    assert(xml.contains("""<person id="8185">"""))
    assert(xml.contains("<staffOrganisationAssociation id="))
    assert(xml.contains("<primaryAssociation>true</primaryAssociation>"))
    assert(xml.contains("u4604830@umn.edu"))
  }
}
