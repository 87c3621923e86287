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
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val top2 = graft.plans.TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false), k = 2)
    top2.orderBy("o_custkey", "o_orderkey").show(6, false)
    top2.explain()
    spark.stop()
  }
}
