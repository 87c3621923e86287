package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader._

/** Whole-system cycle test: HR fixtures + all five synthetic document
  * families through one Runner.syncCycle, checking the cross-family
  * handoffs (orgs validate persons, persons+orgs validate pubs, shredded
  * dept→org rows feed the HR derivation).
  */
class RunnerSpec extends AnyFunSuite {
  import FixtureLoader.spark.implicits._

  private val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")

  private lazy val fullCycle: Runner.CycleOutputs = {
    val orgDoc =
      """{"uuid":"org1","externalId":"ORG1",
         "name":{"text":[{"locale":"en_US","value":"Org One"}]},
         "type":{"term":{"text":[{"locale":"en_US","value":"department"}]}},
         "parents":[],"ids":[]}"""
    val personDoc =
      """{"uuid":"per1","externalId":"pid1","orcid":null,"scopusHIndex":3,
         "name":{"firstName":"F","lastName":"L"},
         "ids":[{"type":{"uri":"/dk/atira/pure/person/personsources/employee"},"value":{"value":"4604830"}}],
         "staffOrganisationAssociations":[{
           "organisationalUnit":{"uuid":"org1"},
           "jobDescription":{"text":[{"locale":"en_US","value":"Professor"}]},
           "employmentType":{"term":{"text":[{"locale":"en_US","value":"Academic"}]}},
           "staffType":{"term":{"text":[{"locale":"en_US","value":"academic"}]}},
           "period":{"startDate":"2015-09-01","endDate":null},
           "isPrimaryAssociation":true}]}"""
    val pubDoc =
      """{"uuid":"pub1","externalIdSource":"Scopus","externalId":"s1",
         "type":{"uri":"/a/b/contributiontojournal/article"},
         "title":{"value":"T"},
         "journalAssociation":{"title":{"value":"J"},"issn":{"value":"1"}},
         "publicationStatuses":[],"electronicVersions":[],
         "volume":"1","journalNumber":"1","pages":"1",
         "totalScopusCitations":1,
         "managingOrganisationalUnit":{"uuid":"org1"},
         "info":{"additionalExternalIds":[],"previousUuids":[]},
         "personAssociations":[{
           "person":{"uuid":"per1"},
           "personRole":{"term":{"text":[{"locale":"en_US","value":"Author"}]}},
           "name":{"firstName":"F","lastName":"L"},
           "organisationalUnits":[{"uuid":"org1"}],
           "externalOrganisations":[]}]}"""

    def raw(rows: (String, String)*) =
      rows.toSeq.map { case (u, j) => (u, t1, j) }
        .toDF("uuid", "modified", "json")
    def emptyRaw = Seq.empty[(String, java.sql.Timestamp, String)]
      .toDF("uuid", "modified", "json")
    val demog = Seq(("4604830", "u460", "First", "J", "Last",
        null.asInstanceOf[String], "u460@umn.edu", "0", t1))
      .toDF("emplid", "internet_id", "first_name", "middle_initial",
        "last_name", "name_suffix", "instl_email_addr",
        "primary_empl_rcdno", "timestamp")

    Runner.syncCycle(Runner.CycleInputs(
      demogHistory = demog,
      scival = Seq.empty[(String, String)].toDF("emplid", "scival_id"),
      empEntries = entries("emp_job_entries_4604830"),
      poiEntries = entries("poi_jobs_5575725").limit(0),
      affEntries = entries("fake531_aff_job_entries").limit(0),
      deptOrg = deptOrg,
      empJobcodes = jobcodes("emp"), poiJobcodes = jobcodes("poi"),
      affJobcodes = jobcodes("aff"),
      knownOverrideable = emptyOverrideable, overrides = emptyOverrides,
      rawInternalOrgs = raw("org1" -> orgDoc),
      rawExternalOrgs = emptyRaw,
      rawInternalPersons = raw("per1" -> personDoc),
      rawExternalPersons = emptyRaw,
      rawPubs = raw("pub1" -> pubDoc),
      existingOrgs = Seq.empty[(String, String, java.sql.Timestamp)]
        .toDF("pure_uuid", "pure_id", "pure_modified"),
      existingPersons = Seq.empty[(String, String, String, java.sql.Timestamp)]
        .toDF("uuid", "emplid", "pure_uuid", "pure_modified"),
      existingPubs = Seq.empty[(String, String, java.sql.Timestamp)]
        .toDF("uuid", "pure_uuid", "pure_modified"),
      personOrgs = Seq.empty[(String, String)]
        .toDF("person_uuid", "pure_org_uuid"),
      scopusIds = Seq.empty[(String, String)]
        .toDF("person_uuid", "scopus_id")))
  }

  test("a full sync cycle wires every family through its dependencies") {
    val out = fullCycle
    // org family shredded and visible downstream
    assert(out.orgs.filter($"pure_uuid" === "org1").count() == 1)
    // person family validated against the shredded org
    assert(out.persons.filter($"pure_uuid" === "per1").count() == 1)
    assert(out.umnPersonPureOrgs.count() == 1)
    // pub validated against BOTH the shredded person and org
    assert(out.pubShred.pubs.count() == 1)
    assert(out.pubShred.pubPersons.count() == 1)
    // the pub's person_uuid is the surrogate minted by the person shred
    val personUuid = out.persons.filter($"pure_uuid" === "per1")
      .select("uuid").first().getString(0)
    assert(out.pubShred.pubPersons.select("person_uuid").first()
      .getString(0) == personUuid)
    // HR side produced sync rows for the fixture person
    assert(out.sync.personData.filter($"emplid" === "4604830").count() == 1)
    assert(out.skips.count() == 0)
  }

  test("cycle outputs render to XSD-valid Pure sync files") {
    import graft.sources.XmlSync
    import graft.XsdSupport.{parseDom, validate, xsdsPresent}
    import java.nio.file.{Files, Paths}
    assume(xsdsPresent, "reference docs not present")
    val out = fullCycle
    val dir = Files.createTempDirectory("cyclexml").toString

    val persons = s"$dir/persons.xml"
    XmlSync.writeSyncFile(
      XmlSync.renderPersonsXml(out.sync.personData,
        out.sync.staffOrgAssociations),
      XmlSync.personsHeader, XmlSync.personsFooter, persons)
    validate(persons, "person.xsd")

    val users = s"$dir/users.xml"
    XmlSync.writeSyncFile(out.sync.userData.map(XmlSync.renderUser),
      XmlSync.usersHeader, XmlSync.usersFooter, users)
    validate(users, "user.xsd")

    // no organisation XSD ships in the reference docs — well-formedness
    // + root namespace over the cycle's shredded orgs
    val orgs = s"$dir/organisations.xml"
    XmlSync.writeSyncFile(
      XmlSync.renderOrganisationsXml(XmlSync.organisationSyncInput(
        out.orgs, java.sql.Date.valueOf("2020-01-01"), "Public")),
      XmlSync.organisationsHeader, XmlSync.organisationsFooter, orgs)
    val doc = parseDom(orgs)
    assert(doc.getDocumentElement.getNamespaceURI ==
      "v1.organisation-sync.pure.atira.dk")
    assert(doc.getElementsByTagName("organisationId").getLength == 1)
    assert(Files.readString(Paths.get(persons)).contains("<person id="))
  }

  test("conflicting deptid: freshly shredded dept→org row wins, deterministically") {
    // org doc claims deptid 11179 (also present in the existing dim as
    // PIXEZPPAPIRGQ) — the fresh shred row must win on every execution
    val orgDoc =
      """{"uuid":"orgX","externalId":"FRESHORG",
         "name":{"text":[{"locale":"en_US","value":"Fresh Org"}]},
         "type":{"term":{"text":[{"locale":"en_US","value":"department"}]}},
         "parents":[],
         "ids":[{"type":{"uri":"/dk/atira/pure/organisation/organisationsources/peoplesoft_deptid"},
                 "value":{"value":"11179"}}]}"""
    def emptyRaw = Seq.empty[(String, java.sql.Timestamp, String)]
      .toDF("uuid", "modified", "json")
    val demog = Seq(("4604830", "u460", "First", "J", "Last",
        null.asInstanceOf[String], "u460@umn.edu", "0", t1))
      .toDF("emplid", "internet_id", "first_name", "middle_initial",
        "last_name", "name_suffix", "instl_email_addr",
        "primary_empl_rcdno", "timestamp")
    val inputs = Runner.CycleInputs(
      demogHistory = demog,
      scival = Seq.empty[(String, String)].toDF("emplid", "scival_id"),
      empEntries = entries("emp_job_entries_4604830"),
      poiEntries = entries("poi_jobs_5575725").limit(0),
      affEntries = entries("fake531_aff_job_entries").limit(0),
      deptOrg = deptOrg,
      empJobcodes = jobcodes("emp"), poiJobcodes = jobcodes("poi"),
      affJobcodes = jobcodes("aff"),
      knownOverrideable = emptyOverrideable, overrides = emptyOverrides,
      rawInternalOrgs = Seq(("orgX", t1, orgDoc))
        .toDF("uuid", "modified", "json"),
      rawExternalOrgs = emptyRaw,
      rawInternalPersons = emptyRaw,
      rawExternalPersons = emptyRaw,
      rawPubs = emptyRaw,
      existingOrgs = Seq.empty[(String, String, java.sql.Timestamp)]
        .toDF("pure_uuid", "pure_id", "pure_modified"),
      existingPersons = Seq.empty[(String, String, String, java.sql.Timestamp)]
        .toDF("uuid", "emplid", "pure_uuid", "pure_modified"),
      existingPubs = Seq.empty[(String, String, java.sql.Timestamp)]
        .toDF("uuid", "pure_uuid", "pure_modified"),
      personOrgs = Seq.empty[(String, String)]
        .toDF("person_uuid", "pure_org_uuid"),
      scopusIds = Seq.empty[(String, String)]
        .toDF("person_uuid", "scopus_id"))
    // two independent plan executions must agree on the winner — with
    // DIFFERENT physical partitionings of the dim side, so an
    // arbitrary-winner merge (dropDuplicates) would actually get the
    // chance to pick differently rather than repeating the same shuffle
    val orgIds = Seq(1, 7).map { n =>
      Runner.syncCycle(inputs.copy(deptOrg = deptOrg.repartition(n)))
        .sync.staffOrgAssociations
        .filter($"org_id".isNotNull)
        .select("org_id").distinct().as[String].collect().toSet
    }
    assert(orgIds(0) == orgIds(1))
    assert(orgIds(0).contains("FRESHORG"),
      s"fresh shredded dept→org row must beat the dim row: ${orgIds(0)}")
    assert(!orgIds(0).contains("PIXEZPPAPIRGQ"))
  }
}
