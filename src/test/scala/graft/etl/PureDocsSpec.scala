package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader.spark

/** Synthetic-document tests for the Pure CDC shredding pipeline:
  * freshness guard, owner/person/org validation with all-or-nothing
  * skips, state pivot, id routing, and the dedup rules
  * (reference pure_api_pub.py behaviors).
  */
class PureDocsSpec extends AnyFunSuite {
  import spark.implicits._

  private def doc(
      uuid: String,
      owner: String = "org1",
      persons: Seq[(String, Boolean, Seq[String])] = Seq(("p1", true, Seq("org1"))),
      collabs: Seq[String] = Nil,
      statuses: String = """[{"publicationStatus":{"uri":"/dk/atira/pure/researchoutput/status/published"},
         "current":true,"publicationDate":{"year":2019,"month":3}}]""",
      extra: String = ""): String = {
    val personJson = persons.map { case (pu, internal, orgs) =>
      val key = if (internal) "person" else "externalPerson"
      val orgJson = orgs.map(o => s"""{"uuid":"$o"}""").mkString(",")
      s"""{"$key":{"uuid":"$pu"},
          "personRole":{"term":{"text":[{"locale":"en_US","value":"Author"}]}},
          "name":{"firstName":"F","lastName":"L"},
          "organisationalUnits":[$orgJson],"externalOrganisations":[]}"""
    }
    val collabJson = collabs.map { cu =>
      s"""{"authorCollaboration":{"uuid":"$cu",
           "name":{"text":[{"locale":"en_US","value":"Collab $cu"}]}},
          "personRole":{"term":{"text":[{"locale":"en_US","value":"Author"}]}}}"""
    }
    val assocs = (personJson ++ collabJson).mkString(",")
    s"""{"uuid":"$uuid",
        "externalIdSource":"Scopus","externalId":"scp-$uuid",
        "type":{"uri":"/dk/atira/pure/researchoutput/researchoutputtypes/contributiontojournal/article"},
        "title":{"value":"Title $uuid"},
        "journalAssociation":{"title":{"value":"Journal"},"issn":{"value":"1234-5678"}},
        "publicationStatuses":$statuses,
        "electronicVersions":[{"doi":"10.1/a"},{"doi":"10.1/b"}],
        "volume":"12","journalNumber":"3","pages":"1-10",
        "totalScopusCitations":7,
        "managingOrganisationalUnit":{"uuid":"$owner"},
        "info":{"additionalExternalIds":[{"idSource":"PubMed","value":"pm-$uuid"}],
                "previousUuids":[]},
        "personAssociations":[$assocs]$extra}"""
  }

  private val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")

  private def shred(raw: Seq[(String, java.sql.Timestamp, String)],
      existing: Seq[(String, String, java.sql.Timestamp)] = Nil,
      persons: Seq[(String, String, String)] = Seq(("u-p1", "p1", "100")),
      orgs: Seq[String] = Seq("org1")) =
    PureDocs.shredPubs(
      raw.toDF("uuid", "modified", "json"),
      existing.toDF("uuid", "pure_uuid", "pure_modified"),
      persons.toDF("uuid", "pure_uuid", "emplid"),
      orgs.toDF("pure_uuid"))

  test("valid document shreds into pub + associations") {
    val r = shred(Seq(("d1", t1, doc("d1", collabs = Seq("c1")))))
    val pub = r.pubs.collect()
    assert(pub.length == 1)
    val row = r.pubs.select("pure_uuid", "scopus_id", "pmid", "doi",
      "pure_type", "pure_subtype", "title", "issued_current",
      "issued_precision", "volume", "citation_total").first()
    assert(row.getString(0) == "d1")
    assert(row.getString(1) == "scp-d1")
    assert(row.getString(2) == "pm-d1")
    assert(row.getString(3) == "10.1/b") // last doi wins
    assert(row.getString(4) == "contributiontojournal")
    assert(row.getString(5) == "article")
    assert(row.getBoolean(7) == true)
    assert(row.getInt(8) == 31) // year+month → precision 31
    assert(r.pubPersons.count() == 1)
    assert(r.pubPersons.select("person_role").first().getString(0) == "author")
    assert(r.pubPersonOrgs.count() == 1)
    assert(r.pubAuthorCollabs.count() == 1)
    assert(r.authorCollabs.first().getString(1) == "Collab c1")
    assert(r.skips.count() == 0)
  }

  test("freshness guard skips stale documents and reuses db uuid") {
    val r = shred(Seq(("d1", t0, doc("d1")), ("d2", t1, doc("d2"))),
      existing = Seq(("db-uuid-1", "d1", t1), ("db-uuid-2", "d2", t0)))
    assert(r.skips.filter($"skip_reason" === "stale").select("uuid")
      .as[String].collect().toSeq == Seq("d1"))
    assert(r.pubs.select("uuid").as[String].collect().toSeq == Seq("db-uuid-2"))
  }

  test("missing owner org / person / org → all-or-nothing skip") {
    val r = shred(Seq(
      ("d1", t1, doc("d1", owner = "orgX")),
      ("d2", t1, doc("d2", persons = Seq(("pX", true, Seq("org1"))))),
      ("d3", t1, doc("d3", persons = Seq(("p1", true, Seq("orgX")))))))
    val reasons = r.skips.as[(String, String)].collect().toMap
    assert(reasons("d1") == "owner_org_not_in_edw")
    assert(reasons("d2") == "person_not_in_edw")
    assert(reasons("d3") == "org_not_in_edw")
    assert(r.pubs.count() == 0)
    assert(r.pubPersons.count() == 0)
    assert(r.pubPersonOrgs.count() == 0)
  }

  test("duplicate person keeps first ordinal; orgs only from first occurrence") {
    // p1 twice: first with org1, second with org2 — reference takes the
    // row and orgs from the FIRST occurrence only (pure_api_pub.py:337)
    val r = shred(Seq(("d1", t1, doc("d1", persons = Seq(
        ("p1", true, Seq("org1")), ("p1", true, Seq("org2")))))),
      orgs = Seq("org1", "org2"))
    assert(r.pubPersons.count() == 1)
    assert(r.pubPersons.select("person_ordinal").first().getInt(0) == 1)
    assert(r.pubPersonOrgs.select("pure_org_uuid").as[String].collect()
      .toSeq == Seq("org1"))
  }

  test("duplicate author collaborations dedup to first ordinal") {
    val r = shred(Seq(("d1", t1, doc("d1", collabs = Seq("c1", "c1")))))
    assert(r.pubAuthorCollabs.count() == 1)
    assert(r.pubAuthorCollabs.select("author_ordinal").first().getInt(0) == 2)
  }

  test("consumeChanges keeps max version per uuid and archives all") {
    val changes = Seq(
      ("u1", "research-outputs", "UPDATE", 3L),
      ("u1", "research-outputs", "DELETE", 5L),
      ("u2", "research-outputs", "UPDATE", 1L),
      ("u3", "persons", "UPDATE", 1L))
      .toDF("uuid", "family_system_name", "change_type", "version")
    val (actions, history) = PureDocs.consumeChanges(changes, Seq("research-outputs"))
    val acts = actions.select("uuid", "change_type").as[(String, String)]
      .collect().toMap
    assert(acts == Map("u1" -> "DELETE", "u2" -> "UPDATE"))
    assert(history.count() == 3)
  }

  test("delete cascade and previousUuids cleanup") {
    val child = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("person_uuid", "v")
    val deleted = Seq("b").toDF("uuid")
    assert(PureDocs.deleteCascade(child, "person_uuid", deleted)
      .select("person_uuid").as[String].collect().sorted.toSeq == Seq("a", "c"))
    val docs = Seq(("d1", """{"uuid":"d1","info":{"previousUuids":["a"]}}"""))
      .toDF("uuid", "json")
    assert(PureDocs.previousUuidCleanup(child, "person_uuid", docs)
      .select("person_uuid").as[String].collect().sorted.toSeq == Seq("b", "c"))
  }

  test("shredding is idempotent: re-applying the output makes input stale") {
    val r1 = shred(Seq(("d1", t1, doc("d1"))))
    val newDim = r1.pubs.select("uuid", "pure_uuid", "pure_modified")
    val r2 = shred(Seq(("d1", t1, doc("d1"))),
      existing = newDim.collect().map(row => (row.getString(0),
        row.getString(1), row.getTimestamp(2))).toSeq)
    assert(r2.pubs.count() == 0)
    assert(r2.skips.as[(String, String)].collect().toSeq ==
      Seq(("d1", "stale")))
  }

  test("latestDocs keeps newest per uuid") {
    val raw = Seq(("u1", t0, "old"), ("u1", t1, "new"), ("u2", t0, "only"))
      .toDF("uuid", "modified", "json")
    val got = PureDocs.latestDocs(raw).select("uuid", "json")
      .as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "new", "u2" -> "only"))
  }
}
