package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader.spark

class PureExternalsSpec extends AnyFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")

  private def personDoc(uuid: String, orgs: Seq[String],
      scopus: Seq[String] = Seq("s1")): String = {
    val ids = scopus.map(s =>
      s"""{"type":{"uri":"/dk/atira/pure/person/personsources/scopusauthor"},
          "value":{"value":"$s"}}""").mkString(",")
    val orgJson = orgs.map(o => s"""{"uuid":"$o"}""").mkString(",")
    s"""{"uuid":"$uuid","name":{"firstName":"F","lastName":"L"},
        "ids":[$ids],"externalOrganisations":[$orgJson]}"""
  }

  test("external person shreds with N flag and null internal ids") {
    val r = PureExternals.shredExternalPersons(
      Seq(("x1", t1, personDoc("x1", Seq("org1")))).toDF("uuid", "modified", "json"),
      Seq.empty[(String, String, java.sql.Timestamp)]
        .toDF("uuid", "pure_uuid", "pure_modified"),
      Seq.empty[(String, String)].toDF("person_uuid", "pure_org_uuid"),
      Seq.empty[(String, String)].toDF("person_uuid", "scopus_id"),
      Seq("org1").toDF("pure_uuid"))
    val p = r.persons.first()
    assert(p.getAs[String]("pure_internal") == "N")
    assert(p.getAs[String]("emplid") == null)
    assert(r.personOrgAdds.count() == 1)
    assert(r.scopusAdds.count() == 1)
    assert(r.skips.count() == 0)
  }

  test("external person skips on missing org; diffs add and delete") {
    val r = PureExternals.shredExternalPersons(
      Seq(("x1", t1, personDoc("x1", Seq("orgX"))),
        ("x2", t1, personDoc("x2", Seq("org1"), scopus = Seq("s-new"))))
        .toDF("uuid", "modified", "json"),
      Seq(("u-x2", "x2", t0)).toDF("uuid", "pure_uuid", "pure_modified"),
      Seq(("u-x2", "org-old")).toDF("person_uuid", "pure_org_uuid"),
      Seq(("u-x2", "s-old")).toDF("person_uuid", "scopus_id"),
      Seq("org1").toDF("pure_uuid"))
    assert(r.skips.as[(String, String)].collect().toMap ==
      Map("x1" -> "org_not_in_edw"))
    assert(r.personOrgAdds.as[(String, String)].collect().toSet ==
      Set(("u-x2", "org1")))
    assert(r.personOrgDeletes.as[(String, String)].collect().toSet ==
      Set(("u-x2", "org-old")))
    assert(r.scopusAdds.as[(String, String)].collect().toSet ==
      Set(("u-x2", "s-new")))
    assert(r.scopusDeletes.as[(String, String)].collect().toSet ==
      Set(("u-x2", "s-old")))
  }

  test("external org shreds names/types and skips stale") {
    val doc = """{"uuid":"o1","name":{"text":[{"locale":"en_US","value":"Ext Org"}]},
      "type":{"term":{"text":[{"locale":"en_US","value":"Company"}]}}}"""
    val (orgs, stale) = PureExternals.shredExternalOrgs(
      Seq(("o1", t1, doc), ("o2", t0, doc.replace("o1", "o2")))
        .toDF("uuid", "modified", "json"),
      Seq(("o2", t1)).toDF("pure_uuid", "pure_modified"))
    val o = orgs.collect()
    assert(o.length == 1)
    assert(o.head.getAs[String]("name_en") == "Ext Org")
    assert(o.head.getAs[String]("type") == "company")
    assert(o.head.getAs[String]("pure_internal") == "N")
    assert(stale.as[(String, String)].collect().toSeq == Seq(("o2", "stale")))
  }
}
