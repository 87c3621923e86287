package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Person-level job folds (reference `oit_to_edw/person.py:231-491`):
  * primary-job election, staff-type propagation, person profiled /
  * visibility, staff-org-association dedup, and the person-id /
  * first-name scalar transforms. Everything partitions by emplid — all
  * persons in one pass, no driver loop.
  */
object PersonSync {

  /** F-ELECT (person.py:319-459): exactly one primary job per person.
    *
    * The reference's branchy, order-dependent election is re-expressed
    * as ONE deterministic total order per person — priority tier + tier
    * tie-breaks — with `row_number() == 1` as the winner. Tier map
    * (lower wins), with the reference's iteration orders made explicit:
    *
    *  0. the only emp/poi job (when n_emppoi == 1)
    *  1. the only affiliate job (when n_emppoi == 0 && n_aff == 1)
    *  2. active emp/poi whose single-digit empl_rcdno == the person's
    *     primary_empl_rcdno — reference iterates emp+poi REVERSED, so
    *     tie-break is highest input ordinal
    *  3. active emp/poi — earliest start_date, then lowest empl_rcdno
    *     (STRING compare, as the reference), then highest ordinal
    *     (reversed iteration again; replaces "just pick one",
    *     person.py:412-417)
    *  4. active affiliate — lowest affiliate ordinal
    *  5. inactive emp/poi matching primary_empl_rcdno — highest ordinal
    *  6. inactive emp/poi — highest ordinal (reversed list head)
    *  7. inactive affiliate — lowest ordinal
    *
    * Inputs: emp/poi/aff job frames from [[HrJobs]] (each carries
    * `group_ord`), and `persons(emplid, primary_empl_rcdno)`.
    * Output: union of all jobs + `src` tag + boolean `primary` +
    * `out_ord` (the reference's post-election list order: active
    * emp/poi reversed, inactive emp/poi reversed, affiliates — or
    * original order in the two easy cases; downstream "first job"
    * semantics in [[staffOrgAssocId]] depend on it).
    */
  def electPrimaryJobs(
      empJobs: DataFrame,
      poiJobs: DataFrame,
      affJobs: DataFrame,
      persons: DataFrame): DataFrame = {

    val emppoi = empJobs.withColumn("src", lit("emp"))
      .unionByName(poiJobs.withColumn("src", lit("poi")))
      .withColumn("is_emppoi", lit(true))
    val aff = affJobs.withColumn("src", lit("aff"))
      .withColumn("is_emppoi", lit(false))
    val all = emppoi.unionByName(aff)

    val wPerson = Window.partitionBy("emplid")
    // input ordinal: emp jobs before poi jobs (concatenation order),
    // each in group_ord order; affiliates separately in group_ord order
    val jord = row_number().over(Window.partitionBy("emplid", "is_emppoi")
      .orderBy(when(col("src") === "emp", 0).otherwise(1), col("group_ord")))

    val tagged = all
      .withColumn("jord", jord)
      .withColumn("n_emppoi",
        sum(when(col("is_emppoi"), 1).otherwise(0)).over(wPerson))
      .withColumn("n_aff",
        sum(when(col("is_emppoi"), 0).otherwise(1)).over(wPerson))
      .join(persons.select(col("emplid"),
        col("primary_empl_rcdno")), Seq("emplid"), "left")

    val active = col("end_date").isNull
    val rcdnoMatch = col("is_emppoi") &&
      Fns.isSingleDigit(col("empl_rcdno")) &&
      col("empl_rcdno") === col("primary_empl_rcdno").cast("string")

    val priority =
      when(col("is_emppoi") && col("n_emppoi") === 1, 0)
        .when(!col("is_emppoi") && col("n_emppoi") === 0 && col("n_aff") === 1, 1)
        .when(col("is_emppoi") && active && rcdnoMatch, 2)
        .when(col("is_emppoi") && active, 3)
        .when(!col("is_emppoi") && active, 4)
        .when(col("is_emppoi") && rcdnoMatch, 5)
        .when(col("is_emppoi"), 6)
        .otherwise(7)

    // per-tier tie-breaks folded into three typed columns (compared only
    // within a tier, so cross-tier constants are harmless)
    val tkStart = when(priority === 3, col("start_date"))
      .otherwise(lit("1970-01-01").cast("timestamp"))
    val tkRcdno = when(priority === 3, col("empl_rcdno")).otherwise(lit(""))
    val tkOrd = when(priority.isin(2, 3, 5, 6), -col("jord"))
      .otherwise(col("jord"))

    // nulls LAST on the start-date tie-break: a job with a missing
    // start_date must not beat every dated job in tier 3
    val wElect = Window.partitionBy("emplid")
      .orderBy(priority, tkStart.asc_nulls_last, tkRcdno, tkOrd)
    val elected = tagged.withColumn("primary", row_number().over(wElect) === 1)

    // reference's post-election list order (person.py:449-452)
    val easy = col("n_emppoi") === 1 ||
      (col("n_emppoi") === 0 && col("n_aff") === 1)
    val section = when(easy, when(col("is_emppoi"), 0).otherwise(2))
      .otherwise(when(col("is_emppoi") && active, 0)
        .when(col("is_emppoi"), 1).otherwise(2))
    val sectionKey = when(easy || !col("is_emppoi"), col("jord"))
      .otherwise(-col("jord"))
    elected.withColumn("out_ord", row_number().over(
      Window.partitionBy("emplid").orderBy(section, sectionKey)))
  }

  /** C3 (person.py:461-469): if the primary job's staff_type isn't
    * 'academic', every job of that person becomes 'nonacademic'.
    */
  def transformStaffType(jobs: DataFrame): DataFrame = {
    val primaryStaff = max(when(col("primary"), col("staff_type")))
      .over(Window.partitionBy("emplid"))
    jobs.withColumn("staff_type",
      when(primaryStaff === "academic", col("staff_type"))
        .otherwise(lit("nonacademic")))
  }

  /** C6 (person.py:471-476): person.profiled = primary job profiled AND
    * primary job active. Returns (emplid, profiled).
    */
  def transformProfiled(jobs: DataFrame): DataFrame =
    jobs.groupBy("emplid").agg(
      coalesce(max(when(col("primary"),
        col("profiled") && col("end_date").isNull)), lit(false))
        .as("profiled"))

  /** F6 + D5 (person.py:272-317): synthetic staff-org-association id
    * and keep-one-per-id dedup. Jobs missing any of (org_id, job_title,
    * employment_type) keep a NULL id and pass through; within an id
    * group the keeper is the first job with no end_date, else the first
    * job (reference list order = `out_ord`), and `primary` is OR'd
    * across the group.
    */
  def staffOrgAssocId(jobs: DataFrame, personId: Column): DataFrame = {
    val assocId = when(
      col("org_id").isNotNull && col("job_title").isNotNull &&
        col("employment_type").isNotNull,
      Fns.autoId(personId, col("org_id"), col("job_title"),
        col("employment_type"), date_format(col("start_date"), "yyyy-MM-dd")))
    val withId = jobs.withColumn("staff_org_assoc_id", assocId)
    val keyed = withId.filter(col("staff_org_assoc_id").isNotNull)
    val passthrough = withId.filter(col("staff_org_assoc_id").isNull)

    val wGrp = Window.partitionBy("emplid", "staff_org_assoc_id")
    val keepKey = struct(
      when(col("end_date").isNull, 0).otherwise(1).as("ended"),
      col("out_ord").as("o"))
    val deduped = keyed
      .withColumn("__grp_primary", max(col("primary")).over(wGrp))
      .withColumn("__rk", row_number().over(wGrp.orderBy(keepKey)))
      .filter(col("__rk") === 1)
      .withColumn("primary", col("__grp_primary"))
      .drop("__grp_primary", "__rk")
    deduped.unionByName(passthrough)
  }

  /** C7 (person.py:257-261): person visibility = 'Public' if any job is
    * Public else 'Restricted'. Returns (emplid, visibility).
    */
  def personVisibility(jobs: DataFrame): DataFrame =
    jobs.groupBy("emplid").agg(
      when(max(when(col("visibility") === "Public", 1).otherwise(0)) === 1,
        "Public").otherwise("Restricted").as("visibility"))

  /** F14 + F5 (person.py:478-491): person id and first-name transforms
    * applied to a demographics frame.
    */
  def transformPerson(demog: DataFrame): DataFrame =
    demog
      .withColumn("person_id", coalesce(col("scival_id"), col("emplid")))
      .withColumn("first_name",
        Fns.firstNameWithMi(col("first_name"), col("middle_initial")))
}
