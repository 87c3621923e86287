package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader.spark

/** Synthetic-document tests for the org and internal-person CDC
  * pipelines (reference pure_api_internal_org.py /
  * pure_api_internal_person.py behaviors).
  */
class PureOrgsPersonsSpec extends AnyFunSuite {
  import spark.implicits._

  private val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")

  private def orgDoc(uuid: String, parent: String, pureId: String,
      deptid: String = null, typ: String = "department"): String = {
    val ids = (if (deptid != null)
      s"""{"type":{"uri":"/x/peoplesoft_deptid"},"value":{"value":"$deptid"}},"""
    else "") +
      s"""{"type":{"uri":"/dk/atira/pure/organisation/organisationsources/organisationid"},"value":{"value":"$pureId-src"}}"""
    val parents = if (parent == null) "[]" else s"""[{"uuid":"$parent"}]"""
    s"""{"uuid":"$uuid","externalId":"$pureId",
        "name":{"text":[{"locale":"en_US","value":"Org $uuid"}]},
        "type":{"term":{"text":[{"locale":"en_US","value":"$typ"}]}},
        "parents":$parents,"ids":[$ids]}"""
  }

  test("org shredding: names, parent resolution, dept-org dimension") {
    val raw = Seq(
      ("root", t1, orgDoc("root", null, "ROOT")),
      ("a", t1, orgDoc("a", "root", "A", deptid = "11111")),
      ("b", t1, orgDoc("b", "a", "B")))
      .toDF("uuid", "modified", "json")
    val existing = Seq.empty[(String, String, java.sql.Timestamp)]
      .toDF("pure_uuid", "pure_id", "pure_modified")
    val (orgs, deptOrgs, _) = PureOrgs.shredOrgs(raw, existing)
    val byId = orgs.collect().map(r => r.getAs[String]("pure_uuid") -> r).toMap
    assert(byId("a").getAs[String]("name_en") == "Org a")
    assert(byId("a").getAs[String]("parent_pure_uuid") == "root")
    assert(byId("a").getAs[String]("parent_pure_id") == "ROOT")
    assert(byId("b").getAs[String]("parent_pure_id") == "A")
    assert(byId("root").getAs[String]("pure_id") == "ROOT")
    val d = deptOrgs.collect()
    assert(d.length == 1 && d.head.getAs[String]("deptid") == "11111")
  }

  test("MPTT rebuild: labels valid, existing ids preserved, orphans dropped") {
    val raw = Seq(
      ("root", t1, orgDoc("root", null, "ROOT")),
      ("a", t1, orgDoc("a", "root", "A")),
      ("b", t1, orgDoc("b", "root", "B")),
      ("a1", t1, orgDoc("a1", "a", "A1")),
      ("ps", t1, orgDoc("ps", "root", "PS", typ = "peoplesoft deptid")))
      .toDF("uuid", "modified", "json")
    val existing0 = Seq.empty[(String, String, java.sql.Timestamp)]
      .toDF("pure_uuid", "pure_id", "pure_modified")
    val (orgs, _, _) = PureOrgs.shredOrgs(raw, existing0)
    val existingMptt = Seq((7L, "a")).toDF("id", "pure_uuid")
    val mptt = PureOrgs.rebuildInternalOrgs(orgs, existingMptt, "root")
    val rows = mptt.collect().map(r => r.getAs[String]("pure_uuid") -> r).toMap
    // peoplesoft-deptid orgs are excluded from the internal tree
    assert(!rows.contains("ps"))
    assert(rows.keySet == Set("root", "a", "b", "a1"))
    assert(rows("a").getAs[Long]("id") == 7L) // preserved surrogate id
    val root = rows("root")
    assert(root.getAs[Long]("lft") == 1L)
    assert(root.getAs[Long]("rgt") == 8L) // 4 nodes → root spans 1..8
    assert(rows("a1").getAs[Long]("lft") > rows("a").getAs[Long]("lft"))
    assert(rows("a1").getAs[Long]("rgt") < rows("a").getAs[Long]("rgt"))
  }

  private def personDoc(uuid: String, emplid: String = "100",
      pureId: String = "pid", orgs: Seq[String] = Seq("org1"),
      jobDescr: String = "Professor", scopus: Seq[String] = Seq("s1")): String = {
    val ids =
      (if (emplid != null)
        s"""{"type":{"uri":"/dk/atira/pure/person/personsources/employee"},"value":{"value":"$emplid"}},"""
      else "") +
      s"""{"type":{"uri":"/dk/atira/pure/person/personsources/umn"},"value":{"value":"net$uuid"}},""" +
      scopus.map(s =>
        s"""{"type":{"uri":"/dk/atira/pure/person/personsources/scopusauthor"},"value":{"value":"$s"}}""")
        .mkString(",")
    val jd = if (jobDescr == null) "[]"
      else s"""[{"locale":"en_US","value":"$jobDescr"}]"""
    val assocs = orgs.map(o =>
      s"""{"organisationalUnit":{"uuid":"$o"},
          "jobDescription":{"text":$jd},
          "employmentType":{"term":{"text":[{"locale":"en_US","value":"Academic"}]}},
          "staffType":{"term":{"text":[{"locale":"en_US","value":"non-academic"}]}},
          "period":{"startDate":"2015-09-01","endDate":null},
          "isPrimaryAssociation":true}""").mkString(",")
    val extIdJson = if (pureId == null) "null" else s""""$pureId""""
    s"""{"uuid":"$uuid","externalId":$extIdJson,"orcid":"0-1","scopusHIndex":5,
        "name":{"firstName":"F","lastName":"L"},
        "ids":[$ids],
        "staffOrganisationAssociations":[$assocs]}"""
  }

  private def shredP(raw: Seq[(String, java.sql.Timestamp, String)],
      existing: Seq[(String, String, java.sql.Timestamp)] = Nil,
      personOrgs: Seq[(String, String)] = Nil,
      scopus: Seq[(String, String)] = Nil,
      orgs: Seq[String] = Seq("org1", "org2")) =
    PurePersons.shredInternalPersons(
      raw.toDF("uuid", "modified", "json"),
      existing.toDF("uuid", "emplid", "pure_modified"),
      personOrgs.toDF("person_uuid", "pure_org_uuid"),
      scopus.toDF("person_uuid", "scopus_id"),
      orgs.toDF("pure_uuid"))

  test("person shredding: ids routed, jobs extracted, staff type normalized") {
    val r = shredP(Seq(("p1", t1, personDoc("p1"))))
    assert(r.skips.count() == 0)
    val p = r.persons.first()
    assert(p.getAs[String]("emplid") == "100")
    assert(p.getAs[String]("internet_id") == "netp1")
    assert(p.getAs[Int]("hindex") == 5)
    val j = r.umnPersonPureOrgs.first()
    assert(j.getAs[String]("staff_type") == "nonacademic")
    assert(j.getAs[String]("primary") == "Y")
    assert(j.getAs[java.sql.Timestamp]("start_date").toString
      .startsWith("2015-09-01"))
    assert(r.scopusAdds.count() == 1)
  }

  test("person skip rules: missing emplid / pure id / org / job description") {
    val r = shredP(Seq(
      ("p1", t1, personDoc("p1", emplid = null)),
      ("p2", t1, personDoc("p2", pureId = null)),
      ("p3", t1, personDoc("p3", orgs = Seq("orgX"))),
      ("p4", t1, personDoc("p4", jobDescr = null))))
    val reasons = r.skips.as[(String, String)].collect().toMap
    assert(reasons("p1") == "missing_emplid")
    assert(reasons("p2") == "missing_pure_id")
    assert(reasons("p3") == "org_not_in_edw")
    assert(reasons("p4") == "missing_job_description")
    assert(r.persons.count() == 0)
    assert(r.umnPersonPureOrgs.count() == 0)
  }

  test("person org/scopus symmetric diffs produce adds and deletes") {
    val r = shredP(Seq(("p1", t1, personDoc("p1", orgs = Seq("org1")))),
      existing = Seq(("u-p1", "100", null)),
      personOrgs = Seq(("u-p1", "org2")),
      scopus = Seq(("u-p1", "s-old")))
    assert(r.personOrgAdds.as[(String, String)].collect().toSet ==
      Set(("u-p1", "org1")))
    assert(r.personOrgDeletes.as[(String, String)].collect().toSet ==
      Set(("u-p1", "org2")))
    assert(r.scopusAdds.as[(String, String)].collect().toSet ==
      Set(("u-p1", "s1")))
    assert(r.scopusDeletes.as[(String, String)].collect().toSet ==
      Set(("u-p1", "s-old")))
  }

  test("duplicate jobs dedup by business key") {
    val r = shredP(Seq(("p1", t1, personDoc("p1", orgs = Seq("org1", "org1")))))
    assert(r.umnPersonPureOrgs.count() == 1)
  }
}
