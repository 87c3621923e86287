package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import FixtureLoader.spark

class DemographicsSpec extends AnyFunSuite {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")

  test("new eligible persons = current MINUS history; history grows") {
    val current = Seq("1", "2", "3").toDF("emplid")
    val history = Seq("1").toDF("emplid")
    val (fresh, updated) = Demographics.newEligiblePersons(current, history)
    assert(fresh.as[String].collect().sorted.toSeq == Seq("2", "3"))
    assert(updated.as[String].collect().sorted.toSeq == Seq("1", "2", "3"))
  }

  test("changed demographics diff against LATEST history row only") {
    val current = Seq(("1", "Ann", "a@x"), ("2", "Bob", "b@x"))
      .toDF("emplid", "name", "email")
    // person 1: old row differs, latest row matches → NOT changed
    // person 2: latest row differs → changed
    val history = Seq(
      ("1", "Ann-old", "a@x", t0), ("1", "Ann", "a@x", t1),
      ("2", "Bob", "old@x", t1))
      .toDF("emplid", "name", "email", "timestamp")
    val (changed, appended) = Demographics.changedDemographics(
      current, history, lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")))
    assert(changed.select("emplid").as[String].collect().toSeq == Seq("2"))
    assert(appended.count() == 4)
    // re-running with the appended history is idempotent (no changes)
    val (changed2, _) = Demographics.changedDemographics(
      current, appended, lit(t1))
    assert(changed2.count() == 0)
  }

  test("latest demographics + not-null internet id election") {
    val history = Seq(
      ("1", "Ann", null, t1), ("1", "Ann0", "ann", t0))
      .toDF("emplid", "name", "internet_id", "timestamp")
    val latest = Demographics.latestDemographics(history)
    assert(latest.select("name").as[String].first() == "Ann")
    // latest row has null internet_id → falls back to older not-null row
    val inet = Demographics.latestNotNullInternetId(history)
    assert(inet.as[(String, String)].first() == ("1", "ann"))
  }

  test("person extraction enriches scival and transforms id/name") {
    val history = Seq(
      ("1", "Max", "J", "m@x", null, t1),
      ("1", "Max0", "J", "m@x", "max", t0), // internet-id backfill source
      ("2", "Ann", " ", "a@x", "ann", t1))
      .toDF("emplid", "first_name", "middle_initial", "instl_email_addr",
        "internet_id", "timestamp")
    val scival = Seq(("1", "8185")).toDF("emplid", "scival_id")
    val rows = Demographics.extractPersons(history, scival)
      .select("emplid", "person_id", "first_name", "internet_id")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    assert(rows("1") == ("8185", "Max J", "max")) // backfilled internet id
    assert(rows("2") == ("2", "Ann", "ann")) // blank middle initial dropped

  }
}
