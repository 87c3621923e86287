package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway measurement harness for the cycle gates (round 19, not a
  * test): breaks q342's wall time into per-boundary materializations
  * and A/Bs session knobs. Run with
  *   sbt "Test/runMain graft.CycleProbe"
  */
object CycleProbe {
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

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def jobsNow(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

    // warm: builds the FeedCache + JIT so later readings are clean
    timed("warm q342 (feed build + jit)") {
      QueriesCycle.q342RunnerCycle(spark, dir).write
        .format("noop").mode("overwrite").save()
    }

    // pass 2/3-style reading (what the bench medians see)
    for (i <- 1 to 2) timed(s"q342 lazy (bench shape) #$i") {
      QueriesCycle.q342RunnerCycle(spark, dir).write
        .format("noop").mode("overwrite").save()
    }

    // per-boundary eager breakdown: each mat pays its own materialization
    {
      var idx = 0
      val t0 = System.nanoTime()
      val j0 = jobsNow()
      val mat: DataFrame => DataFrame = { df =>
        idx += 1
        val i = idx
        val s0 = System.nanoTime()
        val r = df.localCheckpoint(true)
        println(f"[probe]   mat#$i%-3d ${(System.nanoTime() - s0) / 1e9}%6.2f s  cols=${df.columns.take(4).mkString(",")}")
        r
      }
      val out = QueriesCycle.cycleRows(spark, dir, mat)
      val s1 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      println(f"[probe]   final serialize+sort ${(System.nanoTime() - s1) / 1e9}%6.2f s")
      println(f"[probe] q342 eager total ${(System.nanoTime() - t0) / 1e9}%7.2f s  boundaries=$idx jobs=${jobsNow() - j0}")
    }

    // final-serialization anatomy: planning vs execution vs jobs
    {
      val mat: DataFrame => DataFrame = _.localCheckpoint(true)
      val out = QueriesCycle.cycleRows(spark, dir, mat)
      val p0 = System.nanoTime()
      out.queryExecution.executedPlan // force analysis+optimization+planning
      println(f"[probe] final plan compile ${(System.nanoTime() - p0) / 1e9}%6.2f s")
      val j0 = jobsNow()
      val e0 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      println(f"[probe] final execute ${(System.nanoTime() - e0) / 1e9}%6.2f s jobs=${jobsNow() - j0}")
      // repeat to see warm-plan cost
      val out2 = QueriesCycle.cycleRows(spark, dir, mat)
      val p1 = System.nanoTime()
      out2.queryExecution.executedPlan
      println(f"[probe] final plan compile#2 ${(System.nanoTime() - p1) / 1e9}%6.2f s")
      val j1 = jobsNow()
      val e1 = System.nanoTime()
      out2.write.format("noop").mode("overwrite").save()
      println(f"[probe] final execute#2 ${(System.nanoTime() - e1) / 1e9}%6.2f s jobs=${jobsNow() - j1}")
    }

    // lazy-shape job anatomy: per-job wall durations + stage counts
    {
      import org.apache.spark.scheduler._
      case class J(var start: Long = 0L, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0, var desc: String = "")
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val j = new J(e.time, 0L, e.stageInfos.size,
            e.stageInfos.map(_.numTasks).sum,
            Option(e.properties.getProperty("spark.job.description"))
              .orElse(Option(e.properties.getProperty("callSite.short")))
              .getOrElse(""))
          jobs.put(e.jobId, j)
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          Option(jobs.get(e.jobId)).foreach(_.end = e.time)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      timed("q342 lazy (job anatomy run)") {
        QueriesCycle.q342RunnerCycle(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val all = jobs.asScala.toSeq.sortBy(_._1)
      var prevEnd = 0L
      for ((id, j) <- all) {
        val gap = if (prevEnd == 0) 0 else j.start - prevEnd
        prevEnd = math.max(prevEnd, j.end)
        println(f"[probe]   job#$id%-4d ${(j.end - j.start) / 1e3}%6.2f s gap=${gap / 1e3}%5.2f s stages=${j.stages}%-3d tasks=${j.tasks}%-4d ${j.desc.take(80)}")
      }
      println(f"[probe] q342 lazy jobs=${all.size} sumJob=${all.map(j => j._2.end - j._2.start).sum / 1e3}%6.2f s")
    }

    // A/B: AQE off on the restructured (flat-boundary) cycle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (i <- 1 to 3) timed(s"q342 lazy AQE-off #$i") {
      QueriesCycle.q342RunnerCycle(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // A/B: wider broadcast threshold (joins on tiny frames -> BHJ)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    for (i <- 1 to 2) timed(s"q342 lazy bcast64m #$i") {
      QueriesCycle.q342RunnerCycle(spark, dir).write
        .format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")

    // q345 bench shape (cycle-2 only after the st1 memo)
    {
      val j0 = jobsNow()
      for (i <- 1 to 2) timed(s"q345 lazy (bench shape) #$i") {
        QueriesCycle.q345SecondCycle(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      println(s"[probe] q345 two runs jobs=${jobsNow() - j0}")
    }

    spark.stop()
  }
}
