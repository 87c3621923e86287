package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark
import graft.XsdSupport.{parseDom, validate, xsdDir, xsdsPresent}
import java.nio.file.Files

/** XSD validation of the rendered sync files against the Pure interface
  * contract (reference docs/person.xsd, docs/user.xsd, docs/commons.xsd;
  * SURVEY §5). The organisation sync file has no XSD in the reference
  * docs — it is checked for well-formedness and against the element
  * vocabulary of docs/organisation-simple-examples.xml instead.
  */
class XmlSchemaSpec extends AnyFunSuite {
  import spark.implicits._

  private def assumeXsds(): Unit =
    assume(xsdsPresent, "reference docs not present")

  test("rendered person sync file validates against person.xsd") {
    assumeXsds()
    val persons = Seq(
      ("6030", "Ann & Bo", "O'Neil", "<PhD>", "100", "ann", "Public", "true"),
      ("6031", "Ada", "Lovelace", null, "101", null, "Restricted", "false"))
      .toDF("person_id", "first_name", "last_name", "postnominal", "emplid",
        "internet_id", "visibility", "profiled")
    val jobs = Seq(
      ("6030", "autoid:6030-ORG-x", "9403", "a@umn.edu", "faculty", "true",
        "ORG", java.sql.Timestamp.valueOf("2015-09-01 00:00:00"),
        null.asInstanceOf[java.sql.Timestamp], "academic", "Professor"),
      ("6031", "autoid:6031-ORG-y", "9404", null, "staff", "false", "ORG2",
        java.sql.Timestamp.valueOf("2019-01-15 00:00:00"),
        java.sql.Timestamp.valueOf("2020-06-30 00:00:00"), "nonacademic",
        "Analyst"))
      .toDF("person_id", "staff_org_association_id", "affiliation_id",
        "email_address", "employment_type", "primary_association", "org_id",
        "period_start_date", "period_end_date", "staff_type",
        "job_description")
    val dir = Files.createTempDirectory("xsdval").toString
    val target = s"$dir/persons.xml"
    XmlSync.writeSyncFile(XmlSync.renderPersonsXml(persons, jobs),
      XmlSync.personsHeader, XmlSync.personsFooter, target)
    validate(target, "person.xsd")
  }

  test("rendered user sync file validates against user.xsd") {
    assumeXsds()
    val users = Seq(
      ("6030", "ann", "ann@umn.edu", "Ann", "O'Neil"),
      ("6031", "ada", "ada@umn.edu", "Ada", "Lovelace"))
      .toDF("person_id", "user_name", "email", "first_name", "last_name")
    val elems = users.map(XmlSync.renderUser)
    val dir = Files.createTempDirectory("xsdval").toString
    val target = s"$dir/users.xml"
    XmlSync.writeSyncFile(elems, XmlSync.usersHeader, XmlSync.usersFooter,
      target)
    validate(target, "user.xsd")
  }

  test("organisation render covers every template section and is well-formed") {
    val tv = (t: String, v: String) => (t, v)
    val orgs = Seq((
      "ORG001", "department", "Chem & Eng <Lab>",
      java.sql.Date.valueOf("2007-10-26"), java.sql.Date.valueOf("2027-06-30"),
      "Public", "ROOT",
      Seq(tv("acronym", "C&E")),
      Seq(tv("research", "body with <markup> & raw text")),
      Seq(tv("portrait", "https://example.org/p.jpg")),
      Seq(tv("office", "612-555-0100")),
      Seq(tv("office", "chem@umn.edu")),
      Seq(tv("homepage", "https://cse.example.edu")),
      Seq(("postal", "Minneapolis", "55455", "207 Pleasant St",
        "Smith Hall", "US", "MN", "44.98,-93.23")),
      Seq(tv("peoplesoft_deptid", "11130"))))
      .toDF("organisation_id", "type", "name", "start_date", "end_date",
        "visibility", "parent_organisation_id", "name_variants",
        "profile_infos", "photos", "phone_numbers", "emails",
        "web_addresses", "addresses", "ids")
      .withColumn("name_variants", transform(col("name_variants"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
      .withColumn("profile_infos", transform(col("profile_infos"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
      .withColumn("photos", transform(col("photos"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
      .withColumn("phone_numbers", transform(col("phone_numbers"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
      .withColumn("emails", transform(col("emails"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
      .withColumn("web_addresses", transform(col("web_addresses"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
      .withColumn("addresses", transform(col("addresses"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("city"),
          x.getField("_3").as("postalcode"), x.getField("_4").as("street"),
          x.getField("_5").as("building"), x.getField("_6").as("country"),
          x.getField("_7").as("subdivision"),
          x.getField("_8").as("geospatial_point"))))
      .withColumn("ids", transform(col("ids"),
        x => struct(x.getField("_1").as("type"), x.getField("_2").as("value"))))
    val xml = XmlSync.renderOrganisationsXml(orgs).collect().head
    assert(xml.contains("<organisationId>ORG001</organisationId>"))
    assert(xml.contains("Chem &amp; Eng &lt;Lab&gt;"))
    assert(xml.contains("<startDate>2007-10-26</startDate>"))
    assert(xml.contains("<endDate>2027-06-30</endDate>"))
    assert(xml.contains("<parentOrganisationId>ROOT</parentOrganisationId>"))
    assert(xml.contains("<![CDATA[body with <markup> & raw text]]>"))
    assert(xml.contains("<photoProtocol>http</photoProtocol>"))
    assert(xml.contains("<geospatialPoint>44.98,-93.23</geospatialPoint>"))
    assert(xml.contains("<idSource>peoplesoft_deptid</idSource>"))

    // a profile value containing "]]>" must not close the CDATA early
    assert(XmlSync.cdata("uses X]]> syntax") == "uses X]]]]><![CDATA[> syntax")
    assert(XmlSync.cdata(null) == "")

    // minimal org: optional sections must be absent, not empty wrappers
    val minimal = Seq(("ORG002", "college", "Science",
        java.sql.Date.valueOf("2000-01-01"), "Public"))
      .toDF("organisation_id", "type", "name", "start_date", "visibility")
    val minXml = XmlSync.renderOrganisation(minimal.first())
    assert(!minXml.contains("endDate") && !minXml.contains("nameVariants") &&
      !minXml.contains("parentOrganisationId") && !minXml.contains("<ids>"))

    val dir = Files.createTempDirectory("orgxml").toString
    val target = s"$dir/organisations.xml"
    XmlSync.writeSyncFile(XmlSync.renderOrganisationsXml(orgs),
      XmlSync.organisationsHeader, XmlSync.organisationsFooter, target)
    val doc = parseDom(target) // throws if not well-formed
    assert(doc.getDocumentElement.getNodeName == "organisations")
    assert(doc.getDocumentElement.getNamespaceURI ==
      "v1.organisation-sync.pure.atira.dk")
  }

  test("organisation elements use the reference example vocabulary") {
    assumeXsds()
    // every element name we emit must appear in the reference's advanced
    // example file — catches renamed/misspelled tags against the contract
    def names(doc: org.w3c.dom.Document): Set[String] = {
      val all = doc.getElementsByTagName("*")
      (0 until all.getLength).map(all.item(_).getNodeName).toSet
    }
    val ref = names(parseDom(s"$xsdDir/organisation-advanced-examples.xml"))

    val orgs = Seq(("ORG1", "department", "X",
        java.sql.Date.valueOf("2000-01-01"), "Public", "P1"))
      .toDF("organisation_id", "type", "name", "start_date", "visibility",
        "parent_organisation_id")
    val dir = Files.createTempDirectory("orgvocab").toString
    val target = s"$dir/organisations.xml"
    XmlSync.writeSyncFile(XmlSync.renderOrganisationsXml(orgs),
      XmlSync.organisationsHeader, XmlSync.organisationsFooter, target)
    val ours = names(parseDom(target))
    val unknown = ours -- ref
    assert(unknown.isEmpty, s"elements not in reference examples: $unknown")
  }

  test("escaping round-trips hostile field content through a real parser") {
    // adversarial strings: markup, quotes, CDATA terminators, unicode —
    // rendered, wrapped, parsed back with a namespace-aware DOM; the
    // recovered text must equal the input exactly
    val hostile = Seq(
      """<script>alert("x")</script>""",
      "a & b < c > d 'e' \"f\"",
      "ünïcödé ✓ 中文 😀",
      "]]> tricky ]]]]> end",
      "  leading and trailing  ")
    val orgs = hostile.zipWithIndex.map { case (s, i) =>
      (s"ORG$i", "department", s, java.sql.Date.valueOf("2020-01-01"),
        "Public")
    }.toDF("organisation_id", "type", "name", "start_date", "visibility")
    val dir = Files.createTempDirectory("fuzzxml").toString
    val target = s"$dir/organisations.xml"
    XmlSync.writeSyncFile(XmlSync.renderOrganisationsXml(orgs),
      XmlSync.organisationsHeader, XmlSync.organisationsFooter, target)
    val doc = parseDom(target) // throws on any malformed output
    val names = doc.getElementsByTagNameNS("v3.commons.pure.atira.dk", "text")
    val got = (0 until names.getLength)
      .map(names.item(_).getTextContent).toSet
    assert(got == hostile.toSet)
  }

  test("organisationSyncInput adapts the shredded org dim to renderer schema") {
    val orgs = Seq(
      ("u1", "Y", "Chemistry", "CHEM", "uroot", "department", "UROOT"),
      ("u2", "Y", "NoId", null, null, "college", null))
      .toDF("pure_uuid", "pure_internal", "name_en", "pure_id",
        "parent_pure_uuid", "type", "parent_pure_id")
    val in = XmlSync.organisationSyncInput(orgs,
      java.sql.Date.valueOf("2010-01-01"), "Public")
    val rows = in.collect()
    assert(rows.length == 1) // null pure_id rows cannot be synced
    val xml = XmlSync.renderOrganisation(rows.head)
    assert(xml.contains("<organisationId>CHEM</organisationId>"))
    assert(xml.contains("<parentOrganisationId>UROOT</parentOrganisationId>"))
    assert(xml.contains("<startDate>2010-01-01</startDate>"))
    assert(xml.contains("<visibility>Public</visibility>"))
  }
}
