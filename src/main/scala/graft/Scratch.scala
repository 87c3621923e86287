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
    val df = QueriesCore.q02FilterProject(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
