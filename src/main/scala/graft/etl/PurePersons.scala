package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import graft.functions.Fns
import graft.operators.Relational

/** Internal-person CDC pipeline (reference
  * `transformer_loaders/pure_api_internal_person.py`): person document
  * shredding with id routing, org-association ("jobs") extraction with
  * business-key dedup, and the person↔org / scopus-id association
  * reconciliation as symmetric set differences (SO4) — all computed at
  * set level over every changed person at once.
  */
object PurePersons {

  val personSchema: StructType = DataType.fromDDL(
    """
    uuid STRING,
    externalId STRING,
    orcid STRING,
    scopusHIndex INT,
    name STRUCT<firstName: STRING, lastName: STRING>,
    ids ARRAY<STRUCT<type: STRUCT<uri: STRING>,
                     value: STRUCT<value: STRING>>>,
    staffOrganisationAssociations ARRAY<STRUCT<
      organisationalUnit: STRUCT<uuid: STRING>,
      jobDescription: STRUCT<text: ARRAY<STRUCT<locale: STRING,
                                                value: STRING>>>,
      employmentType: STRUCT<term: STRUCT<text: ARRAY<STRUCT<locale: STRING,
                                                             value: STRING>>>>,
      staffType: STRUCT<term: STRUCT<text: ARRAY<STRUCT<locale: STRING,
                                                        value: STRING>>>>,
      period: STRUCT<startDate: STRING, endDate: STRING>,
      isPrimaryAssociation: BOOLEAN>>
    """).asInstanceOf[StructType]

  private def localeEn(textArr: Column): Column =
    Fns.localeValueStrict(textArr)

  private def idOfSource(doc: Column, uri: String): Column =
    try_element_at(filter(doc.getField("ids"),
      i => i.getField("type").getField("uri") === uri),
      lit(1)).getField("value").getField("value")

  case class PersonShred(
      persons: DataFrame,
      umnPersonPureOrgs: DataFrame,
      personOrgAdds: DataFrame,
      personOrgDeletes: DataFrame,
      scopusAdds: DataFrame,
      scopusDeletes: DataFrame,
      skips: DataFrame)

  /** Shred latest internal-person documents.
    * Inputs: `raw` (uuid, modified, json) latest per uuid;
    * `existingPersons` (uuid, emplid, pure_modified); `personOrgs`
    * (person_uuid, pure_org_uuid) current associations; `scopusIds`
    * (person_uuid, scopus_id); `orgs` (pure_uuid) org dim.
    * Skip rules (:117-186, :272-281): missing emplid, missing pure id,
    * stale, an api-only org absent from EDW, or any association missing
    * its en_US job description — all-or-nothing per person.
    */
  /** `mat` marks the stage boundaries a caller may MATERIALIZE
    * (localCheckpoint / persist / write-to-EDW): `fresh` (one JSON
    * parse instead of one per downstream consumer) and `skipKeys`
    * (five anti-join consumers). Identity by default — plans of
    * existing callers are unchanged; the whole-cycle composition
    * passes a checkpoint, mirroring the reference's stage-table
    * serialization.
    */
  def shredInternalPersons(
      raw: DataFrame,
      existingPersons: DataFrame,
      personOrgs: DataFrame,
      scopusIds: DataFrame,
      orgs: DataFrame,
      mat: DataFrame => DataFrame = identity): PersonShred = {

    // mat boundary (round 19): three branches (two skip filters + the
    // valid path) read parsed — without it the JSON parse runs 3×
    val parsed = mat(raw
      .withColumn("doc", from_json(col("json"), personSchema))
      .select(col("uuid"), col("modified"), col("doc"))
      .withColumn("emplid",
        idOfSource(col("doc"), "/dk/atira/pure/person/personsources/employee"))
      .withColumn("internet_id",
        idOfSource(col("doc"), "/dk/atira/pure/person/personsources/umn"))
      .withColumn("scopus_ids", array_distinct(transform(
        filter(col("doc.ids"), i => i.getField("type").getField("uri") ===
          "/dk/atira/pure/person/personsources/scopusauthor"),
        i => i.getField("value").getField("value")))))

    val skipNoEmplid = parsed.filter(col("emplid").isNull)
      .select(col("uuid"), lit("missing_emplid").as("skip_reason"))
    val skipNoPureId = parsed.filter(col("emplid").isNotNull &&
        col("doc.externalId").isNull)
      .select(col("uuid"), lit("missing_pure_id").as("skip_reason"))
    val withIds = parsed.filter(col("emplid").isNotNull &&
      col("doc.externalId").isNotNull)

    // existing person by emplid (get_db_person): reuse uuid, freshness
    val withDb = withIds.join(
      existingPersons.select(col("emplid"),
        col("uuid").as("__db_uuid"), col("pure_modified").as("__db_modified")),
      Seq("emplid"), "left")
    val skipStale = withDb.filter(
        Fns.isNotFresh(col("__db_modified"), col("modified")))
      .select(col("uuid"), Fns.staleReason(col("__db_modified"), col("modified")).as("skip_reason"))
    // deterministic surrogate (see PureDocs.derivedUuid): outputs are
    // written separately and must agree on new persons' keys
    val fresh = mat(withDb.filter(
        Fns.isFresh(col("__db_modified"), col("modified")))
      .withColumn("person_uuid", coalesce(col("__db_uuid"),
        PureDocs.derivedUuid(lit("person"), col("emplid"))))
      .withColumn("__existed", col("__db_uuid").isNotNull))

    // org-set reconciliation (SO4, :163-186): api vs db association sets
    val apiOrgs = fresh.select(col("uuid"), col("person_uuid"),
        explode_outer(col("doc.staffOrganisationAssociations")
          .getField("organisationalUnit").getField("uuid")).as("pure_org_uuid"))
      .filter(col("pure_org_uuid").isNotNull).distinct()
    val dbOrgs = fresh.select(col("uuid"), col("person_uuid"))
      .join(personOrgs, Seq("person_uuid"))
      .select(col("uuid"), col("person_uuid"), col("pure_org_uuid"))
    val apiOnly = apiOrgs.join(dbOrgs,
      Seq("uuid", "person_uuid", "pure_org_uuid"), "left_anti")
    val dbOnly = dbOrgs.join(apiOrgs,
      Seq("uuid", "person_uuid", "pure_org_uuid"), "left_anti")

    // skip when an api-only org is absent from the EDW org dim (:177-186)
    val skipMissingOrg = apiOnly.join(
        broadcast(orgs.select(col("pure_uuid").as("pure_org_uuid"),
          lit(true).as("__ok"))), Seq("pure_org_uuid"), "left")
      .filter(col("__ok").isNull)
      .select(col("uuid"), lit("org_not_in_edw").as("skip_reason")).distinct()

    // jobs: one row per association, en_US fields, normalized staff type
    val assocs = fresh.select(col("uuid"), col("person_uuid"),
        col("emplid"), col("doc.externalId").as("pure_person_id"),
        posexplode_outer(col("doc.staffOrganisationAssociations"))
          .as(Seq("__pos", "a")))
      .filter(col("a").isNotNull)
      .withColumn("job_description", localeEn(col("a.jobDescription.text")))
    val skipNoJobDescr = assocs.filter(col("job_description").isNull)
      .select(col("uuid"), lit("missing_job_description").as("skip_reason"))
      .distinct()

    val skips = skipNoEmplid.unionByName(skipNoPureId)
      .unionByName(skipStale).unionByName(skipMissingOrg)
      .unionByName(skipNoJobDescr)
    val skipKeys = mat(skips.select("uuid").distinct())

    val validAssocs = assocs.join(skipKeys, Seq("uuid"), "left_anti")
    // D4: business-key dedup (person, org, job_description, start_date)
    val umnPersonPureOrgs = Relational.latestPerKey(
        validAssocs.withColumn("__start_raw", col("a.period.startDate")),
        Seq("person_uuid", "a.organisationalUnit.uuid", "job_description",
          "__start_raw"),
        Seq(col("__pos").asc))
      .select(
        col("a.organisationalUnit.uuid").as("pure_org_uuid"),
        col("person_uuid"),
        col("pure_person_id"),
        col("emplid"),
        lit(null).cast("string").as("pure_org_id"),
        col("job_description"),
        localeEn(col("a.employmentType.term.text")).as("employed_as"),
        Fns.normalizeToken(lower(localeEn(col("a.staffType.term.text"))))
          .as("staff_type"),
        Fns.multiFormatTs(col("a.period.startDate")).as("start_date"),
        Fns.multiFormatTs(col("a.period.endDate")).as("end_date"),
        Fns.ynFlag(coalesce(col("a.isPrimaryAssociation"), lit(false)))
          .as("primary"))

    val validFresh = fresh.join(skipKeys, Seq("uuid"), "left_anti")
    val persons = validFresh.select(
      col("person_uuid").as("uuid"),
      col("uuid").as("pure_uuid"),
      col("doc.externalId").as("pure_id"),
      lit("Y").as("pure_internal"),
      col("emplid"),
      col("internet_id"),
      col("doc.name.firstName").as("first_name"),
      col("doc.name.lastName").as("last_name"),
      col("doc.orcid").as("orcid"),
      col("doc.scopusHIndex").as("hindex"),
      col("modified").as("pure_modified"))

    val personOrgAdds = apiOnly.join(skipKeys, Seq("uuid"), "left_anti")
      .select("person_uuid", "pure_org_uuid")
    val personOrgDeletes = dbOnly.join(skipKeys, Seq("uuid"), "left_anti")
      .select("person_uuid", "pure_org_uuid")

    // scopus-id reconciliation (SO4, :292-323)
    val apiScopus = validFresh.select(col("person_uuid"),
      explode_outer(col("scopus_ids")).as("scopus_id"))
      .filter(col("scopus_id").isNotNull).distinct()
    val dbScopus = validFresh.select(col("person_uuid"))
      .join(scopusIds, Seq("person_uuid"))
    val scopusAdds = apiScopus.join(dbScopus,
      Seq("person_uuid", "scopus_id"), "left_anti")
    val scopusDeletes = dbScopus.join(apiScopus,
      Seq("person_uuid", "scopus_id"), "left_anti")

    PersonShred(persons, umnPersonPureOrgs, personOrgAdds,
      personOrgDeletes, scopusAdds, scopusDeletes, skips)
  }
}
