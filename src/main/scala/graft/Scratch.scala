package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local smoke runner (not part of the driver contract):
  * runs the flagship entry and prints a few rows + the formatted plan.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t1 = java.sql.Timestamp.valueOf("2020-06-01 00:00:00")
    val raw = Seq(
      ("root", t1, """{"uuid":"root","externalId":"ROOT","name":{"text":[{"locale":"en_US","value":"U"}]},"type":{"term":{"text":[{"locale":"en_US","value":"university"}]}},"parents":[],"ids":[]}"""),
      ("a", t1, """{"uuid":"a","externalId":"A","name":{"text":[{"locale":"en_US","value":"College A"}]},"type":{"term":{"text":[{"locale":"en_US","value":"college"}]}},"parents":[{"uuid":"root"}],"ids":[{"type":{"uri":"/x/peoplesoft_deptid"},"value":{"value":"11111"}}]}"""))
      .toDF("uuid", "modified", "json")
    val existing = Seq.empty[(String, String, java.sql.Timestamp)].toDF("pure_uuid", "pure_id", "pure_modified")
    val (orgs, deptOrgs) = graft.etl.PureOrgs.shredOrgs(raw, existing)
    orgs.show(false); deptOrgs.show(false)
    graft.etl.PureOrgs.rebuildInternalOrgs(orgs,
      Seq.empty[(Long, String)].toDF("id", "pure_uuid"), "root").show(false)
    spark.stop()
  }
}
