package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Shuffle-volume audit over the whole query surface: runs every
  * SparkEntry query and reports bytes WRITTEN to shuffle per query
  * (the metric the 100 TB scale design optimizes — candidate
  * generation, map-side partial aggregation, and broadcast joins all
  * exist to keep this number sub-linear in input size). Complements
  * [[PlanAudit]] (static plan shape) with measured runtime volume.
  * Run: `sbt "runMain graft.ShuffleAudit [sfDir]"`.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleWrite = new AtomicLong(0)
    val rowsRead = new AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics
          .shuffleWriteMetrics.bytesWritten)
        rowsRead.addAndGet(sc.stageInfo.taskMetrics
          .inputMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      shuffleWrite.set(0); rowsRead.set(0)
      val ok = try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[shuffle-audit] $name FAILED: ${e.getMessage}")
        false
      } finally {
        // listener events are posted asynchronously; drain even on
        // failure so a failed query's stage events can't bleed into
        // the NEXT query's counters after the reset
        org.apache.spark.sql.graftshim.ColumnBridge
          .drainListenerBus(spark.sparkContext)
      }
      (name, if (ok) shuffleWrite.get() else -1L,
        if (ok) rowsRead.get() else -1L)
    }
    println(f"${"query"}%-32s ${"shuffle_bytes"}%14s ${"input_rows"}%12s")
    rows.foreach { case (n, b, r) => println(f"$n%-32s $b%14d $r%12d") }
    val total = rows.filter(_._2 >= 0).map(_._2).sum
    println(f"${"TOTAL"}%-32s $total%14d")
    spark.stop()
  }
}
