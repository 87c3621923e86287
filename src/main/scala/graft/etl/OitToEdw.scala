package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.operators.Relational

/** The end-to-end HR → sync-staging pipeline (reference
  * `oit_to_edw/person.py` run(), SURVEY.md §3.2) as ONE dataflow over
  * all persons: demographics → per-source job derivation → primary
  * election → person folds → the three pure_sync tables → merge into
  * targets. The reference's per-emplid driver loop, 100-row commit
  * batches, and scratch tables vanish: each output is a single
  * DataFrame, and the scratch→target merge is [[Relational.upsert]].
  */
object OitToEdw {

  case class SyncTables(
      personData: DataFrame, // pure_sync_person_data
      staffOrgAssociations: DataFrame, // pure_sync_staff_org_association
      userData: DataFrame, // pure_sync_user_data
      errors: DataFrame)

  /** Inputs: latest-history demographics (+ scival), the three job
    * entry feeds, and the dims. All dims broadcast inside the job
    * pipelines. Demographics columns per SURVEY §1.4 (emplid,
    * internet_id, first_name, last_name, middle_initial, name_suffix,
    * instl_email_addr, primary_empl_rcdno, timestamp).
    *
    * `mat` marks materializable stage boundaries (the
    * [[PurePersons.shredInternalPersons]] convention): `persons`
    * (six consumers), `typed` (two), `withAssoc` (three). Identity by
    * default — existing callers' plans are unchanged.
    */
  def personSync(
      demogHistory: DataFrame,
      scival: DataFrame,
      empEntries: DataFrame,
      poiEntries: DataFrame,
      affEntries: DataFrame,
      deptOrg: DataFrame,
      empJobcodes: DataFrame,
      poiJobcodes: DataFrame,
      affJobcodes: DataFrame,
      knownOverrideable: DataFrame,
      overrides: DataFrame,
      mat: DataFrame => DataFrame = identity): SyncTables = {

    val persons = mat(Demographics.extractPersons(demogHistory, scival))

    val (empJobs, empErrors) = HrJobs.employeeJobs(empEntries, deptOrg,
      empJobcodes, knownOverrideable, overrides, mat)
    val (poiJobs, poiErrors) = HrJobs.poiJobs(poiEntries, deptOrg,
      poiJobcodes, mat)
    val (affJobs, affErrors) = HrJobs.affiliateJobs(affEntries, deptOrg,
      affJobcodes, mat)

    val elected = PersonSync.electPrimaryJobs(empJobs, poiJobs, affJobs,
      persons.select("emplid", "primary_empl_rcdno"))
    val typed = mat(PersonSync.transformStaffType(elected))
    val withAssoc = mat(PersonSync.staffOrgAssocId(
      typed.join(persons.select(col("emplid"), col("person_id")),
        Seq("emplid")),
      col("person_id")))

    val profiled = PersonSync.transformProfiled(typed)
    // visibility folds over the POST-dedup job list (person.py:255-261
    // iterates person_dict['jobs'], which is the assoc-id-deduped set)
    val visibility = PersonSync.personVisibility(withAssoc)

    // persons with zero jobs are excluded (reference records a
    // no-job-data error and loads nothing, person.py:48-54)
    val personsWithJobs = withAssoc.select("emplid").distinct()
    val noJobErrors = persons.join(personsWithJobs, Seq("emplid"), "left_anti")
      .select(col("emplid"), lit("no_job_data").as("error_type"),
        lit(null).cast("string").as("jobcode"),
        lit(null).cast("string").as("jobcode_descr"),
        lit(null).cast("string").as("deptid"),
        lit(null).cast("string").as("deptid_descr"),
        lit(null).cast("string").as("um_college"),
        lit(null).cast("string").as("um_college_descr"),
        lit(null).cast("string").as("um_campus"),
        lit(null).cast("string").as("um_campus_descr"))

    val personData = persons.join(personsWithJobs, Seq("emplid"))
      .join(profiled, Seq("emplid"), "left")
      .join(visibility, Seq("emplid"), "left")
      .select(
        col("person_id"), col("first_name"), col("last_name"),
        coalesce(col("visibility"), lit("Restricted")).as("visibility"),
        coalesce(col("profiled"), lit(false)).as("profiled"),
        col("emplid"), col("internet_id"),
        col("name_suffix").as("postnominal"))

    // C7: person email pushed onto each job row
    val staffOrgAssociations = withAssoc
      .join(persons.select(col("emplid"), col("instl_email_addr")),
        Seq("emplid"))
      .select(
        col("affiliation_id"),
        col("staff_org_assoc_id").as("staff_org_association_id"),
        col("person_id"),
        col("start_date").as("period_start_date"),
        col("end_date").as("period_end_date"),
        col("org_id"),
        col("employment_type"),
        col("staff_type"),
        col("visibility"),
        col("primary").as("primary_association"),
        col("job_description"),
        col("instl_email_addr").as("email_address"))

    val userData = persons.join(personsWithJobs, Seq("emplid"))
      .filter(col("internet_id").isNotNull)
      .select(col("person_id"), col("first_name"), col("last_name"),
        col("internet_id").as("user_name"),
        Fns.umnEmail(col("internet_id")).as("email"))

    val errors = empErrors.unionByName(poiErrors).unionByName(affErrors)
      .withColumn("emplid", col("emplid")) // keep schema aligned
      .unionByName(noJobErrors)

    SyncTables(personData, staffOrgAssociations, userData, errors)
  }

  /** Scratch→target merge (person.py:67-78): sync rows replace same-key
    * target rows; obsolete primary jobs are deleted by the merge shape
    * itself (targets are replaced per person).
    */
  def mergeIntoTargets(
      targets: SyncTables,
      updates: SyncTables): SyncTables =
    SyncTables(
      Relational.upsert(targets.personData, updates.personData,
        Seq("person_id")),
      // associations replace wholesale per person (delete-obsolete)
      targets.staffOrgAssociations
        .join(updates.staffOrgAssociations.select("person_id").distinct(),
          Seq("person_id"), "left_anti")
        .unionByName(updates.staffOrgAssociations),
      Relational.upsert(targets.userData, updates.userData,
        Seq("person_id")),
      updates.errors)

  /** Serialize the sync tables to the Pure person XML file (reference
    * edw_to_pure/person.py → templates/person.xml.j2).
    */
  def writePersonsXml(sync: SyncTables, target: String): Unit = {
    val persons = sync.personData
      .withColumn("profiled",
        when(col("profiled"), "true").otherwise("false"))
    val jobs = sync.staffOrgAssociations
      .withColumn("primary_association",
        when(col("primary_association"), "true").otherwise("false"))
    graft.sources.XmlSync.writeSyncFile(
      graft.sources.XmlSync.renderPersonsXml(persons, jobs),
      graft.sources.XmlSync.personsHeader,
      graft.sources.XmlSync.personsFooter,
      target)
  }
}
