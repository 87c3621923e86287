package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off round-15 measurement (dev tool): decomposes q86's cost into
  * setup (corpus index seed) / stream drain / result read, and runs the
  * drain at 3 micro-batches vs 1 to expose the per-micro-batch fixed
  * cost of Structured Streaming's machinery — the "floor" the
  * streaming bench entries sit on. Results recorded in COVERAGE.md.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[floor] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (trigger <- Seq(1, 3); pass <- 1 to 2) {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val root = java.nio.file.Files
        .createTempDirectory(s"floor-t$trigger-p$pass").toString
      val (src, ckp, idx, dcs, prs) =
        (s"$root/src", s"$root/ckp", s"$root/idx", s"$root/docs", s"$root/pairs")
      t(s"trigger=$trigger pass=$pass setup") {
        graft.operators.Dedup.minhashBandIndexPortable(corpus,
            "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4)
          .write.parquet(s"$idx/batch_id=base")
        corpus.write.parquet(s"$dcs/batch_id=base")
        Seq(0, 3, 6).foreach { r =>
          docs.filter(pmod(col("doc_id"), lit(9)) === r)
            .coalesce(1).write.mode("append").parquet(src)
        }
      }
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        t(s"trigger=$trigger pass=$pass drain") {
          graft.streaming.DedupStream.run(spark, src, ckp, idx, dcs, prs,
            "doc_id", "text", maxFilesPerTrigger = trigger)
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      t(s"trigger=$trigger pass=$pass read") {
        spark.read.parquet(prs).count()
      }
    }
    spark.stop()
  }
}
