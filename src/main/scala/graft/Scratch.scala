package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local smoke runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = QueriesText.q125SparseCosine(spark, "/root/testdata/sf0.01")
    val t0 = System.nanoTime()
    val n = q.count()
    val t1 = System.nanoTime()
    println(s"rows=$n time=${(t1 - t0) / 1e9}")
    val plan = q.queryExecution.executedPlan.toString
    println("ReusedExchange occurrences: " +
      "ReusedExchange".r.findAllIn(plan).size)
    println("Exchange occurrences: " + "Exchange".r.findAllIn(plan).size)
    println("Scan parquet occurrences: " +
      "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
