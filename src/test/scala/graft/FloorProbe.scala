package graft

import org.apache.spark.sql.SparkSession

/** Throwaway measurement harness (round 20, not a test): decomposes
  * the ~1 s per-query floor that ~300 small queries pay in the bench
  * (≈300 s of the headline) into driver planning, job-scheduling gaps,
  * and task compute. Run with
  *   sbt "Test/runMain graft.FloorProbe [query ...]"
  * Defaults to a representative cheap-query sample.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")

    val sample = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q05_latest_order_per_customer",
      "q11_lead_lag", "q20_tree_closure", "q30_text_stats",
      "q49_redaction", "q63_mixture_sample", "q71_plain_join_aqe",
      "q94_unimax", "q99_data_card", "q118_image_dhash",
      "q140_small_qty_revenue", "q166_cumulative_distinct", "q190_dedup_eval",
      "q206_rake_keywords", "q232_decile_lift", "q262_rendezvous_shards",
      "q270_kmv_jaccard", "q283_winsorize", "q306_bradley_terry",
      "q321_bleu_corpus", "q331_ridge_regression", "q338_rec_diversity")

    // per-job accounting
    import org.apache.spark.scheduler._
    import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val jobMillis = new AtomicLong(0L)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(e.stageInfos.size)
        jobStart.put(e.jobId, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobStart.remove(e.jobId))
          .foreach(t0 => jobMillis.addAndGet(e.time - t0))
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(e.taskMetrics).foreach(m =>
          taskNanos.addAndGet(m.executorRunTime * 1000000L))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    Tables.names.foreach { t =>
      try Tables(spark, dir, t).count() catch { case _: Throwable => () }
    }

    println("[floor] query, pass, wall_s, plan_s, jobs, stages, tasks, " +
      "sumJobWall_s, sumTaskTime_s")
    for (pass <- 1 to 3; name <- sample) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val planned = df.queryExecution.executedPlan // analysis+opt+planning
      val t1 = System.nanoTime()
      val j0 = jobs.get; val s0 = stages.get; val k0 = tasks.get
      val tn0 = taskNanos.get; val jm0 = jobMillis.get
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      Thread.sleep(50) // let listener drain
      println(f"[floor] $name%-32s p$pass wall=${(t2 - t0) / 1e9}%6.3f " +
        f"plan=${(t1 - t0) / 1e9}%6.3f jobs=${jobs.get - j0}%-3d " +
        f"stages=${stages.get - s0}%-3d tasks=${tasks.get - k0}%-5d " +
        f"jobWall=${(jobMillis.get - jm0) / 1e3}%6.3f " +
        f"taskSum=${(taskNanos.get - tn0) / 1e9}%7.3f " +
        s"planned=${planned.getClass.getSimpleName}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
