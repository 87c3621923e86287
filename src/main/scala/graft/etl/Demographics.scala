package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Snapshot-diff CDC over the HR eligibility/demographics feeds
  * (reference `oit_to_edw/person.py:125-206` + `demographics.py`):
  * change detection by set difference against the latest history row
  * per person, history append, and latest-demographics lookups. The
  * reference runs these as in-database Oracle `MINUS` statements; here
  * they are the same algebra as anti-join/except dataflows.
  */
object Demographics {

  /** SO1 (person.py:129-140): persons in the current snapshot never
    * seen in the change history. Returns (new, updatedHistory):
    * `new` keyed by emplid; history gains the new rows (SO3).
    */
  def newEligiblePersons(
      current: DataFrame,
      history: DataFrame): (DataFrame, DataFrame) = {
    val fresh = current.select("emplid")
      .except(history.select("emplid"))
    (fresh, history.select("emplid").unionByName(fresh))
  }

  /** SO2 (person.py:142-186): demographic rows whose full attribute
    * set differs from the LATEST history row per emplid (new persons
    * included). `ts` stamps the appended history rows (SO3).
    */
  def changedDemographics(
      current: DataFrame,
      history: DataFrame,
      ts: Column): (DataFrame, DataFrame) = {
    val attrs = current.columns.toSeq // history = attrs + timestamp
    val changed = Relational.snapshotDiff(
      current, history,
      Seq("emplid"), Seq(col("timestamp").desc), compareCols = attrs)
    val appended = history.unionByName(
      changed.withColumn("timestamp", ts), allowMissingColumns = true)
    (changed, appended)
  }

  /** J4/A1 (demographics.py:4-14): latest demographics row per emplid
    * by history timestamp.
    */
  def latestDemographics(history: DataFrame): DataFrame =
    Relational.latestPerKey(history, Seq("emplid"),
      Seq(col("timestamp").desc))

  /** W9 (demographics.py:16-27): latest NOT-NULL internet id per
    * emplid. Returns (emplid, internet_id).
    */
  def latestNotNullInternetId(history: DataFrame): DataFrame =
    Relational.latestPerKey(
        history.filter(col("internet_id").isNotNull),
        Seq("emplid"), Seq(col("timestamp").desc))
      .select("emplid", "internet_id")

  /** Person extraction (person.py:208-240): latest demographics
    * enriched with scival ids (J5) and the scalar person transforms
    * (F14 person_id, F5 first name) via [[PersonSync.transformPerson]].
    * `scival`: (emplid, scival_id).
    */
  def extractPersons(history: DataFrame, scival: DataFrame): DataFrame = {
    // W9 backfill (person.py:216-218): a null internet_id on the latest
    // row falls back to the latest NOT-NULL one in history
    val latest = latestDemographics(history)
    val backfill = latestNotNullInternetId(history)
      .withColumnRenamed("internet_id", "__fallback_inet")
    PersonSync.transformPerson(
      latest.join(backfill, Seq("emplid"), "left")
        .withColumn("internet_id",
          coalesce(col("internet_id"), col("__fallback_inet")))
        .drop("__fallback_inet")
        .join(broadcast(scival), Seq("emplid"), "left"))
  }
}
