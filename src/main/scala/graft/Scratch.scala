package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local smoke runner (not part of the driver contract):
  * times the named queries and reports physical-plan scan/exchange
  * counts — the quick double-evaluation detector.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val t0 = System.nanoTime()
        val q = SparkEntry.queries(name)(spark, dir)
        q.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        val plan = q.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).size
        println(f"$name%-28s ${(t1 - t0) / 1e9}%6.2f s  scans=${c("Scan parquet")} " +
          f"reused=${c("ReusedExchange")} exch=${c("Exchange")}")
      } catch { case e: Throwable =>
        println(f"$name%-28s FAILED ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
