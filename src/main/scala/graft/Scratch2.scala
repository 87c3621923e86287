package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s rows=$n%-9d ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("warmup count")(docs.count())
    val sh = docs.select(col("doc_id"),
      TextAnalysis.wordShingles(col("text"), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
    time("shingles (strings)")(sh.select(sum(size(col("__sh")))).first().getLong(0))
    val posting = sh.select(col("doc_id"), explode(col("__sh")).as("__s"))
    time("posting explode")(posting.count())
    val minCols = (0 until 64).map(i => min(xxhash64(col("__s"), lit(i))).as(s"__m$i"))
    time("64 min-hash aggs")(posting.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*).count())
    time("posting self-join count")(
      posting.select(col("__s"), col("doc_id").as("a"))
        .join(posting.select(col("__s"), col("doc_id").as("b")), Seq("__s"))
        .filter(col("a") < col("b")).groupBy("a","b").count().count())
    spark.stop()
  }
}
