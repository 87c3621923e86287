package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path, StandardOpenOption, StandardCopyOption}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** EDW → Pure XML sync serialization (reference
  * `edw_to_pure/person.py:33-47`, templates
  * `templates/{person,user}.xml.j2`): the J10 person×jobs re-assembly is
  * a join + `collect_list(struct)` per person (set-level, one shuffle),
  * rendering is a deterministic pure Scala function mapped over the
  * Dataset (distributed — the reference renders row-at-a-time on one
  * core), and the single-file contract is honored by streaming the
  * rendered partitions into one file driver-side (header + parts +
  * footer) without materializing anything in memory. At true 100 TB
  * scale the sink would stay partitioned; single-file is the Pure sync
  * interface contract.
  */
object XmlSync {

  private val dateFmt = DateTimeFormatter.ofPattern("dd-MM-yyyy")

  /** XML text escaping equivalent to jinja2 autoescape. */
  def esc(s: String): String =
    if (s == null) ""
    else s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&#34;"
      case '\'' => "&#39;"
      case c => c.toString
    }

  private def fmtDate(ts: java.sql.Timestamp): String =
    ts.toLocalDateTime.toLocalDate.format(dateFmt)

  // ---- shared null-safe Row field access for all renderers ----
  // presence checks go through StructType.getFieldIndex (a cached
  // name→index map): the earlier `schema.fieldNames.contains` form
  // allocated the full name array on EVERY access — ~130 accesses per
  // rendered person made that the dominant cost of the render map

  /** Per-thread identity-keyed name→index maps: rows deserialized in
    * one task share their schema instance, so the map is built once
    * per (thread, schema). Bounded — a long-lived executor thread sees
    * a fresh schema instance per task, and unbounded identity entries
    * would be a slow leak.
    */
  private val idxCache: ThreadLocal[java.util.IdentityHashMap[
      org.apache.spark.sql.types.StructType,
      java.util.HashMap[String, Integer]]] =
    ThreadLocal.withInitial(() => new java.util.IdentityHashMap)

  /** Index of a present-and-non-null field, -1 otherwise. */
  private def fieldIdx(r: Row, name: String): Int = {
    val schema = r.schema
    val cache = idxCache.get()
    var m = cache.get(schema)
    if (m == null) {
      if (cache.size >= 64) cache.clear()
      m = new java.util.HashMap[String, Integer](schema.length * 2)
      val fs = schema.fields
      var i = 0
      while (i < fs.length) { m.put(fs(i).name, Integer.valueOf(i)); i += 1 }
      cache.put(schema, m)
    }
    val i = m.get(name)
    if (i == null || r.isNullAt(i.intValue)) -1 else i.intValue
  }

  /** Field as string, null when absent/null. */
  private def fieldStr(r: Row, name: String): String = {
    val i = fieldIdx(r, name)
    if (i >= 0) r.get(i).toString else null
  }

  private def fieldTs(r: Row, name: String): java.sql.Timestamp = {
    val i = fieldIdx(r, name)
    if (i >= 0) r.getAs[java.sql.Timestamp](i) else null
  }

  /** Date-ish field as ISO yyyy-MM-dd, null when absent/null. */
  private def fieldIsoDate(r: Row, name: String): String = {
    val i = fieldIdx(r, name)
    if (i >= 0)
      r.get(i) match {
        case ts: java.sql.Timestamp => ts.toLocalDateTime.toLocalDate.toString
        case d: java.sql.Date => d.toLocalDate.toString
        case other => other.toString
      }
    else null
  }

  private def fieldArr(r: Row, name: String): Seq[Row] = {
    val i = fieldIdx(r, name)
    if (i >= 0) r.getAs[scala.collection.Seq[Row]](i).toSeq else Seq.empty
  }

  /** CDATA-safe raw payload: a value containing "]]>" would close the
    * CDATA section early and corrupt the document — split it across
    * two sections (the one escape CDATA needs). The reference's
    * autoescape-false Jinja block has this hole; a null renders empty.
    */
  def cdata(s: String): String =
    if (s == null) "" else s.replace("]]>", "]]]]><![CDATA[>")

  /** Render one person element (templates/person.xml.j2:1-61). `jobs`
    * is the person's ordered association list.
    */
  def renderPerson(p: Row, jobs: Seq[Row]): String = {
    val sb = new StringBuilder
    def f(r: Row, name: String): String = fieldStr(r, name)
    def fts(r: Row, name: String): java.sql.Timestamp = fieldTs(r, name)
    val personId = esc(f(p, "person_id"))
    sb ++= s"""<person id="$personId">\n"""
    sb ++= s"""  <name>\n    <v3:firstname>${esc(f(p, "first_name"))}</v3:firstname>\n"""
    sb ++= s"""    <v3:lastname>${esc(f(p, "last_name"))}</v3:lastname>\n  </name>\n"""
    val postnominal = f(p, "postnominal")
    if (postnominal != null && postnominal.nonEmpty) {
      sb ++= s"""  <titles>\n    <title id="${esc(f(p, "emplid"))}">\n"""
      sb ++= s"""      <typeClassification>postnominal</typeClassification>\n"""
      sb ++= s"""      <value>\n        <v3:text lang="en" country="US">${esc(postnominal)}</v3:text>\n      </value>\n"""
      sb ++= s"""    </title>\n  </titles>\n"""
    }
    sb ++= "  <gender>unknown</gender>\n"
    sb ++= "  <organisationAssociations>\n"
    for (j <- jobs) {
      sb ++= s"""    <staffOrganisationAssociation id="${esc(f(j, "staff_org_association_id"))}" managedInPure="false">\n"""
      sb ++= s"""      <affiliationId>${esc(f(j, "affiliation_id"))}</affiliationId>\n"""
      val email = f(j, "email_address")
      if (email != null && email.nonEmpty) {
        sb ++= s"""      <emails>\n        <v3:classifiedEmail id="personStaffAssocEmail1">\n"""
        sb ++= s"""          <v3:classification>email</v3:classification>\n"""
        sb ++= s"""          <v3:value>${esc(email)}</v3:value>\n        </v3:classifiedEmail>\n      </emails>\n"""
      }
      sb ++= s"""      <employmentType>${esc(f(j, "employment_type"))}</employmentType>\n"""
      val primary = f(j, "primary_association")
      sb ++= s"""      <primaryAssociation>${if (primary == "true") "true" else "false"}</primaryAssociation>\n"""
      sb ++= s"""      <organisation>\n        <v3:source_id>${esc(f(j, "org_id"))}</v3:source_id>\n      </organisation>\n"""
      sb ++= "      <period>\n"
      val start = fts(j, "period_start_date")
      if (start != null) sb ++= s"""        <v3:startDate>${fmtDate(start)}</v3:startDate>\n"""
      val end = fts(j, "period_end_date")
      if (end != null) sb ++= s"""        <v3:endDate>${fmtDate(end)}</v3:endDate>\n"""
      sb ++= "      </period>\n"
      sb ++= s"""      <staffType>${esc(f(j, "staff_type"))}</staffType>\n"""
      sb ++= s"""      <jobDescription><v3:text lang="en">${esc(f(j, "job_description"))}</v3:text></jobDescription>\n"""
      sb ++= "    </staffOrganisationAssociation>\n"
    }
    sb ++= "  </organisationAssociations>\n"
    val internetId = f(p, "internet_id")
    if (internetId != null && internetId.nonEmpty) {
      sb ++= s"""  <user id="$personId">\n    <userName>${esc(internetId)}@umn.edu</userName>\n"""
      sb ++= s"""    <email>${esc(internetId)}@umn.edu</email>\n  </user>\n"""
    }
    sb ++= "  <personIds>\n"
    val emplid = esc(f(p, "emplid"))
    sb ++= s"""    <v3:id type="employee" id="autoid:$personId-employee-$emplid">$emplid</v3:id>\n"""
    if (internetId != null && internetId.nonEmpty)
      sb ++= s"""    <v3:id type="umn" id="autoid:$personId-umn-${esc(internetId)}">${esc(internetId)}</v3:id>\n"""
    sb ++= "  </personIds>\n"
    sb ++= s"""  <visibility>${esc(f(p, "visibility"))}</visibility>\n"""
    sb ++= s"""  <profiled>${if (f(p, "profiled") == "true") "true" else "false"}</profiled>\n"""
    sb ++= "</person>\n"
    sb.toString
  }

  /** Render one organisation element (templates/organisation.xml.j2:1-128,
    * serializer organisation.py:7-9). Scalar fields: organisation_id,
    * type, name, start_date, end_date?, visibility,
    * parent_organisation_id?. Collection fields are optional
    * array<struct<type,value>> columns (name_variants, profile_infos,
    * photos, phone_numbers, emails, web_addresses, ids) plus addresses
    * with its wider struct; absent columns render as absent sections.
    * Dates are ISO yyyy-MM-dd (the org template's strftime('%Y-%m-%d'),
    * unlike the person template's dd-MM-yyyy). profile_info values are
    * emitted raw inside CDATA (the template's autoescape-false block).
    */
  def renderOrganisation(o: Row): String = {
    def f(name: String): String = fieldStr(o, name)
    def fd(name: String): String = fieldIsoDate(o, name)
    def arr(name: String): Seq[Row] = fieldArr(o, name)
    def sub(r: Row, name: String): String = fieldStr(r, name)
    val sb = new StringBuilder
    sb ++= "<organisation managedInPure=\"false\">\n"
    sb ++= s"  <organisationId>${esc(f("organisation_id"))}</organisationId>\n"
    sb ++= s"  <type>${esc(f("type"))}</type>\n"
    sb ++= s"""  <name>\n    <v3:text lang="en" country="US">${esc(f("name"))}</v3:text>\n  </name>\n"""
    // a null start date renders empty content, never the literal "null"
    sb ++= s"  <startDate>${Option(fd("start_date")).getOrElse("")}</startDate>\n"
    val endDate = fd("end_date")
    if (endDate != null) sb ++= s"  <endDate>$endDate</endDate>\n"
    sb ++= s"  <visibility>${esc(f("visibility"))}</visibility>\n"
    val parent = f("parent_organisation_id")
    if (parent != null)
      sb ++= s"  <parentOrganisationId>${esc(parent)}</parentOrganisationId>\n"
    val nameVariants = arr("name_variants")
    if (nameVariants.nonEmpty) {
      sb ++= "  <nameVariants>\n"
      for (nv <- nameVariants) {
        sb ++= s"    <nameVariant>\n      <type>${esc(sub(nv, "type"))}</type>\n"
        sb ++= s"""      <name>\n        <v3:text lang="en" country="US">${esc(sub(nv, "value"))}</v3:text>\n      </name>\n"""
        sb ++= "    </nameVariant>\n"
      }
      sb ++= "  </nameVariants>\n"
    }
    val profileInfos = arr("profile_infos")
    if (profileInfos.nonEmpty) {
      sb ++= "  <profileInfos>\n"
      for (pi <- profileInfos) {
        sb ++= s"    <profileInfo>\n      <type>${esc(sub(pi, "type"))}</type>\n"
        // raw value inside CDATA — template's autoescape-false island;
        // cdata() split-escapes embedded "]]>"
        sb ++= s"""      <profileInfo>\n        <v3:text lang="en" country="US"><![CDATA[${cdata(sub(pi, "value"))}]]></v3:text>\n      </profileInfo>\n"""
        sb ++= "    </profileInfo>\n"
      }
      sb ++= "  </profileInfos>\n"
    }
    val photos = arr("photos")
    if (photos.nonEmpty) {
      sb ++= "  <photos>\n"
      for (ph <- photos) {
        sb ++= s"    <photo>\n      <type>${esc(sub(ph, "type"))}</type>\n"
        sb ++= s"      <photoValue>${esc(sub(ph, "value"))}</photoValue>\n"
        sb ++= "      <photoProtocol>http</photoProtocol>\n    </photo>\n"
      }
      sb ++= "  </photos>\n"
    }
    val phones = arr("phone_numbers")
    if (phones.nonEmpty) {
      sb ++= "  <phoneNumbers>\n"
      for (pn <- phones) {
        sb ++= s"    <phoneNumber>\n      <type>${esc(sub(pn, "type"))}</type>\n"
        sb ++= s"      <phoneNumber>${esc(sub(pn, "value"))}</phoneNumber>\n    </phoneNumber>\n"
      }
      sb ++= "  </phoneNumbers>\n"
    }
    val emails = arr("emails")
    if (emails.nonEmpty) {
      sb ++= "  <emails>\n"
      for (em <- emails) {
        sb ++= s"    <email>\n      <type>${esc(sub(em, "type"))}</type>\n"
        sb ++= s"      <email>${esc(sub(em, "value"))}</email>\n    </email>\n"
      }
      sb ++= "  </emails>\n"
    }
    val webs = arr("web_addresses")
    if (webs.nonEmpty) {
      sb ++= "  <webAddresses>\n"
      for (w <- webs) {
        sb ++= s"    <webAddress>\n      <type>${esc(sub(w, "type"))}</type>\n"
        sb ++= s"""      <webAddress>\n        <v3:text lang="en" country="US">${esc(sub(w, "value"))}</v3:text>\n      </webAddress>\n"""
        sb ++= "    </webAddress>\n"
      }
      sb ++= "  </webAddresses>\n"
    }
    val addresses = arr("addresses")
    if (addresses.nonEmpty) {
      sb ++= "  <addresses>\n"
      for (a <- addresses) {
        sb ++= s"    <address>\n      <type>${esc(sub(a, "type"))}</type>\n"
        def opt(field: String, tag: String): Unit = {
          val v = sub(a, field)
          if (v != null) sb ++= s"      <$tag>${esc(v)}</$tag>\n"
        }
        opt("city", "city")
        opt("postalcode", "postalCode")
        opt("street", "street")
        opt("building", "building")
        opt("country", "country")
        opt("subdivision", "subdivision")
        opt("geospatial_point", "geospatialPoint")
        sb ++= "    </address>\n"
      }
      sb ++= "  </addresses>\n"
    }
    val ids = arr("ids")
    if (ids.nonEmpty) {
      sb ++= "  <ids>\n"
      for (id <- ids) {
        sb ++= s"    <id>\n      <idSource>${esc(sub(id, "type"))}</idSource>\n"
        sb ++= s"      <id>${esc(sub(id, "value"))}</id>\n    </id>\n"
      }
      sb ++= "  </ids>\n"
    }
    sb ++= "</organisation>\n"
    sb.toString
  }

  /** Render an organisations DataFrame (one row per org, schema per
    * [[renderOrganisation]]) to XML elements, distributed, ordered by
    * organisation_id for a deterministic sync file.
    */
  def renderOrganisationsXml(orgs: DataFrame): Dataset[String] = {
    import orgs.sparkSession.implicits._
    orgs.repartitionByRange(col("organisation_id"))
      .sortWithinPartitions("organisation_id")
      .map(renderOrganisation)
  }

  /** Adapt the [[graft.etl.PureOrgs.shredOrgs]] org dim to the
    * organisation-sync renderer input: pure_id → organisationId,
    * parent_pure_id → parentOrganisationId, name_en → name, with a
    * caller-supplied start date and visibility (the reference builds
    * its org_dict outside the repo; these two fields have no EDW
    * source column).
    */
  def organisationSyncInput(
      orgs: DataFrame,
      startDate: java.sql.Date,
      visibility: String): DataFrame =
    orgs.filter(col("pure_id").isNotNull)
      .select(
        col("pure_id").as("organisation_id"),
        coalesce(col("type"), lit("organisation")).as("type"),
        col("name_en").as("name"),
        lit(startDate).as("start_date"),
        col("parent_pure_id").as("parent_organisation_id"),
        lit(visibility).as("visibility"))

  /** Render one user element (templates/user.xml.j2). */
  def renderUser(u: Row): String = {
    def f(name: String): String = fieldStr(u, name) // esc(null) = ""
    s"""<user id="${esc(f("person_id"))}">
       |  <userName>${esc(f("user_name"))}@umn.edu</userName>
       |  <email>${esc(f("email"))}</email>
       |  <name>
       |    <v3:firstname>${esc(f("first_name"))}</v3:firstname>
       |    <v3:lastname>${esc(f("last_name"))}</v3:lastname>
       |  </name>
       |</user>
       |""".stripMargin
  }

  /** J10: assemble persons with their ordered jobs and render each to an
    * XML string, distributed. `persons` keyed by person_id; `jobs` rows
    * carry person_id + the association columns; job order within a
    * person is pinned by staff_org_association_id (the reference relied
    * on arbitrary DB order).
    */
  def renderPersonsXml(persons: DataFrame, jobs: DataFrame): Dataset[String] = {
    import persons.sparkSession.implicits._
    val jobStruct = struct(jobs.columns.toSeq.filter(_ != "person_id").map(col): _*)
    val jobsAgg = jobs.groupBy("person_id")
      .agg(sort_array(collect_list(struct(
        col("staff_org_association_id").as("__k"), jobStruct.as("j"))))
        .as("__jobs"))
    persons.join(jobsAgg, Seq("person_id"), "left")
      .map { row =>
        val jobsArr = if (row.isNullAt(row.fieldIndex("__jobs"))) Seq.empty[Row]
          else row.getAs[scala.collection.Seq[Row]]("__jobs")
            .map(_.getAs[Row]("j")).toSeq
        renderPerson(row, jobsArr)
      }
  }

  /** Single-file XML sink (S8): write the rendered elements as text
    * partitions, then stream header + parts + footer into `target`.
    */
  def writeSyncFile(
      elements: Dataset[String],
      header: String,
      footer: String,
      target: String): Unit = {
    val tmp = target + ".parts"
    // assemble into a sibling temp FILE and atomically move it into
    // place last: a failure mid-assembly (or a crashed Spark job — the
    // write sits inside the try) can never leave a truncated file at
    // `target` where the sync rotator would treat it as the newest
    // good sync file
    val assembling = Paths.get(target + ".assembling")
    try {
      elements.write.mode("overwrite").text(tmp)
      Files.writeString(assembling, header, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING)
      val listing = Files.list(Paths.get(tmp))
      val parts =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .toSeq.sortBy(_.toString)
        finally listing.close()
      for (p <- parts) {
        val in = Files.newInputStream(p)
        try {
          val os = Files.newOutputStream(assembling,
            StandardOpenOption.APPEND)
          try in.transferTo(os) finally os.close()
        } finally in.close()
      }
      Files.writeString(assembling, footer, StandardOpenOption.APPEND)
      try Files.move(assembling, Paths.get(target),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(assembling, Paths.get(target),
          StandardCopyOption.REPLACE_EXISTING)
      }
    } finally {
      deleteRecursively(Paths.get(tmp))
      Files.deleteIfExists(assembling)
    }
  }

  /** Remove the assembly staging dir so repeated sync cycles don't
    * accumulate stale `.parts` directories on disk.
    */
  private def deleteRecursively(root: java.nio.file.Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }

  val personsHeader: String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<persons xmlns=\"v1.unified-person-sync.pure.atira.dk\" xmlns:v3=\"v3.commons.pure.atira.dk\">\n"
  val personsFooter: String = "</persons>"

  val usersHeader: String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<users xmlns=\"v1.user-sync.pure.atira.dk\" xmlns:v3=\"v3.commons.pure.atira.dk\">\n"
  val usersFooter: String = "</users>"

  val organisationsHeader: String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<organisations xmlns=\"v1.organisation-sync.pure.atira.dk\" xmlns:v3=\"v3.commons.pure.atira.dk\">\n"
  val organisationsFooter: String = "</organisations>"

  /** S11 (sync_file_rotator.py:32-54): keep the `keep` newest files
    * matching `prefix` in `dir`, delete the rest, and point
    * `latest_<prefix>` at the newest.
    */
  def rotateSyncFiles(dir: String, prefix: String, keep: Int): Unit = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return
    val listing = Files.list(d)
    val files =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix) &&
          !p.getFileName.toString.startsWith("latest_"))
        .toSeq.sortBy(p => Files.getLastModifiedTime(p).toMillis).reverse
      finally listing.close()
    files.drop(keep).foreach(Files.deleteIfExists(_))
    files.headOption.foreach { newest =>
      val link = d.resolve(s"latest_$prefix")
      Files.deleteIfExists(link)
      try Files.createSymbolicLink(link, newest.getFileName)
      catch { case _: UnsupportedOperationException =>
        Files.copy(newest, link, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** S9: error-report CSV sink (umn_data_error.py:75-99) — a plain
    * partitioned CSV write; the reference's email attachment is an
    * operational concern outside the engine.
    */
  def writeErrorReport(errors: DataFrame, path: String): Unit =
    errors.write.mode("overwrite").option("header", "true").csv(path)
}
