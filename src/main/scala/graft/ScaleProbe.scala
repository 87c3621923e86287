package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness (dev tool, not part of the driver contract):
  * measures how the top-cost document-operator family actually scales
  * by replicating the sf0.1 documents table N× and timing each probe
  * query at 1× and N×. Turns the scaladoc claim "quadratic only within
  * capped buckets" into a measured slope: exponent =
  * log(tN/t1) / log(N) — ~1 is linear, ~2 quadratic.
  *
  * Replication detail that matters: a plain N× copy would make every
  * document a 10-way near-duplicate of itself, so the DEDUP probes
  * would measure planted-pair explosion (legitimately superlinear
  * OUTPUT), not pipeline scaling. Copy k > 0 therefore salts every
  * 5th word with a copy-specific token — word-shingle overlap across
  * copies drops to ~40 % (Jaccard ≈ 0.25, below every operator
  * threshold) while each copy keeps its own planted near-dup pairs —
  * so the N× corpus has N× the work at the SAME collision structure.
  * Copy 0 is byte-identical to the source, so 1× runs the real table.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [workDir] [factor]
  */
object ScaleProbe {
  private def saltText(k: Int) =
    concat_ws(" ", transform(split(col("text"), " "),
      (w, i) => when(pmod(i, lit(5)) === pmod(lit(k), lit(5)),
        concat(lit(s"zz${k}q"), w)).otherwise(w)))

  def replicate(s: SparkSession, sfDir: String, out: String,
      factor: Int): Unit = {
    val base = Tables.documents(s, sfDir)
    val copies = (0 until factor).map { k =>
      if (k == 0) base
      else base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        saltText(k).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // relational fact tables replicate with ORDERKEY offsets (orders
    // and lineitem shifted consistently, dim keys untouched) so every
    // copy keeps the original join structure against the SAME dims —
    // the fact side grows N×, the dims don't, exactly the 100 TB
    // shape. Dims copy verbatim.
    val off = 1000000000L
    (0 until factor).map { k =>
      Tables.orders(s, sfDir).withColumn("o_orderkey",
        col("o_orderkey") + lit(k * off))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    (0 until factor).map { k =>
      Tables.lineitem(s, sfDir).withColumn("l_orderkey",
        col("l_orderkey") + lit(k * off))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        s.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    // events: user_id AND event_id offset per copy — copies are fully
    // independent key populations, so streaming state (dedup sets,
    // session maps, join buffers) grows N× and per-key semantics are
    // untouched; the SAME event-time distribution keeps watermark
    // progression identical, so an N× run processes N× rows per
    // micro-batch — exactly the 100 TB stream shape.
    (0 until factor).map { k =>
      Tables.events(s, sfDir)
        .withColumn("event_id", col("event_id") + lit(k * 1000000000000L))
        .withColumn("user_id", col("user_id") + lit(k * 1000000000L))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // embeddings: vec_id offset by a MULTIPLE OF 50 so the standard
    // pmod(vec_id,50)==0 query-batch predicate still matches every
    // copy (probes that want a CONSTANT batch additionally cap to
    // copy-0 ids)
    (0 until factor).map { k =>
      Tables.embeddings(s, sfDir)
        .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Append one measurement to PROBES_LOG.jsonl (the machine-readable
    * twin of the stdout table). `tools/probes_merge.py` folds the log
    * into PROBES.json — the registry ProbeRegistrySpec guards, so a
    * query declared after its family's last probe can't ship unprobed
    * silently. Probe labels ("q81_pq_trained*", "q256_grid_join*")
    * resolve to the declared query that owns the number.
    */
  private def logRecord(label: String, factor: Int, exponent: Double,
      t1: Double, tn: Double): Unit =
    try {
      // a broken measurement (t1 = 0, timing failure) yields a
      // NaN/Infinite exponent; math.round would silently serialize it
      // as 0.0 / ~9.2e16, and a bogus record then reads as a perfect
      // flat slope in PROBES.json — refuse to record it instead
      if (!exponent.isFinite || !t1.isFinite || !tn.isFinite || t1 <= 0) {
        System.err.println(s"[probe] NOT recording $label: non-finite " +
          s"measurement (exponent=$exponent t1=$t1 tN=$tn)")
        return
      }
      val num = label.takeWhile(_ != '_')
      val declared = SparkEntry.queries.keys
        .filter(_.startsWith(num + "_")).toSeq match {
          case Seq(one) => one
          case other =>
            // zero or multiple declared matches: the stripSuffix
            // fallback is only valid when the label itself (sans the
            // probe-variant '*') IS a declared query; anything else
            // would plant an undeclared name in PROBES_LOG.jsonl that
            // probes_merge.py folds into PROBES.json and
            // ProbeRegistrySpec rejects much later with a confusing
            // delayed error — skip the record loudly instead
            val fallback = label.stripSuffix("*")
            if (!SparkEntry.queries.contains(fallback)) {
              System.err.println(s"[probe] NOT recording $label: " +
                s"resolves to ${other.size} declared queries and " +
                s"'$fallback' is not declared")
              return
            }
            fallback
        }
      val date = java.time.LocalDate.now().toString
      val line = f"""{"query":"$declared","label":"$label","factor":$factor,""" +
        f""""exponent":${math.round(exponent * 100) / 100.0}%s,""" +
        f""""t1":${math.round(t1 * 100) / 100.0}%s,""" +
        f""""tN":${math.round(tn * 100) / 100.0}%s,"date":"$date"}%n"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/root/repo/PROBES_LOG.jsonl"), line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[probe] record append failed: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/root/repo/tmp/scaleprobe"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Heap sizing gate (round-15 lesson: a 100× probe on the default
    // 8 GB heap died mid-run after 48 GB of working set — local-mode
    // executors share the driver JVM, so the probe needs the whole
    // cluster's executor memory in ONE heap). Fail fast with a sizing
    // message instead of an hours-later OOM; SPARK_GRAFT_PROBE_FORCE=1
    // overrides for deliberately small replicas.
    // 10× probes ran green all round 15 on the default 8 GB heap;
    // only the ≥50× replicas (measured ~48 GB live at 100×) need the
    // bigger JVM, so only they gate.
    val heapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    val wantGb = if (factor >= 50) 40L else 0L
    if (heapGb < wantGb &&
        !sys.env.get("SPARK_GRAFT_PROBE_FORCE").exists(v =>
          v == "1" || v.equalsIgnoreCase("true"))) {
      System.err.println(s"[probe] FATAL: ${factor}x probe wants a " +
        s"~${wantGb} GB JVM heap, this one has ${heapGb} GB. Re-run " +
        "with SPARK_DRIVER_MEM=48g (build.sbt forks with it as -Xmx) " +
        "or SPARK_GRAFT_PROBE_FORCE=1 to proceed anyway.")
      sys.exit(2)
    }
    // the id-population probes (q274/q276/q277) never read the
    // replicated tables — at factor 100 the replica write alone costs
    // minutes, so a grid-only probe run can skip it. Only '1'/'true'
    // skip: the round-15 isEmpty test made SKIP_REPLICATE=0 skip too.
    val skipReplicate = sys.env.get("SPARK_GRAFT_PROBE_SKIP_REPLICATE")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    if (!skipReplicate) {
      replicate(spark, sfDir, work, factor)
      println(s"[probe] replicated ${factor}x -> $work")
    } else println(s"[probe] replicate SKIPPED (grid-only probes)")

    // SPARK_GRAFT_PROBE_ONLY=q01_pricing_summary,q86_stream_dedup
    // filters every probe section (large factors make the full list
    // expensive; a 100x run wants a focused flagship subset)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val probes = Seq("q125_sparse_cosine", "q72_containment",
      "q55_minhash_portable", "q78_span_dedup", "q153_setsim_join",
      "q01_pricing_summary", "q139_star_join", "q143_only_returner",
      // round-12 wave 6: per-group rank windows, cumulative-interval
      // FIFO join, distinct+degree moments, RAKE text pipeline
      "q214_percentile_cont", "q219_fifo_match",
      "q215_degree_assortativity", "q206_rake_keywords",
      // round-16 eval wave: fact-scale agreement/eval metrics (the
      // value-bounded grids should probe near-flat; q310's windows
      // grow with the per-customer order count under replication —
      // the honest "more orders per key" posture; q315/q316 ride the
      // salted documents replica)
      "q309_fleiss_kappa", "q310_map", "q311_confusion_sweep",
      "q312_brier_decomposition", "q313_spearman_rho",
      "q314_krippendorff_alpha", "q315_js_divergence",
      "q316_rouge_exemplar", "q317_theil_sen",
      // round-16 eval wave 3: n-gram corpus health + permutation test
      "q318_distinct_n", "q319_zipf_slope", "q320_heaps_law",
      "q321_bleu_corpus", "q322_sign_flip_test",
      // round-16 eval wave 4: the bin lattice is value-bounded; the
      // journey windows ride the replicated (offset-user) events
      "q323_isotonic_calibration", "q325_markov_attribution",
      // round-16 wave 5 (crawl curation): q326's map + keyed agg and
      // q331/q332's sufficient-statistic folds should probe near-flat;
      // q327/q330 ride the salted documents replica (tokenize/explode
      // volume is the honest linear part); q328/q329's grids are
      // value-bounded, so only the first fact agg grows
      "q326_url_canonicalize", "q327_wasserstein_drift",
      "q328_kruskal_wallis", "q329_cliffs_delta", "q330_cdc_chunks",
      "q331_ridge_regression", "q332_anova_f",
      // wave 6: q334's replicate fan-out is the honest 33× linear
      // part; q335 folds three layouts in one fact pass; q337 rides
      // the replicated orders (the weekly grid itself is bounded)
      "q334_bh_fdr", "q335_zonemap_advisor", "q337_pinball_eval",
      // wave 7: q338's basket pair join rides the replicated facts
      // (bounded per-order baskets); q339 the salted documents
      "q338_rec_diversity", "q339_ess_diagnostics",
      // q341 writes + reads back the replicated facts through ORC —
      // the slope is sink+scan volume
      "q341_orc_roundtrip",
      // q342 whole-cycle: customers/nations are DIMS (replicated
      // verbatim), so the HR/person side is constant and the slope
      // reads the pub-document side (2 % of the 10× orders) — the
      // honest CDC-batch-growth posture
      "q342_runner_cycle",
      // q345 chains TWO cycles; like q342 the dims are constant under
      // replication, so the slope reads the pub-document side
      "q345_second_cycle",
      // q346 is q345 driven as streaming micro-batches — same constant
      // dims, same pub-side slope, plus the (flat) per-batch streaming
      // machinery
      "q346_stream_cycle",
      // q347 is q346 with a planted crash + checkpoint restart — the
      // restart adds a fixed per-run cost (one extra stream boot and
      // one replayed delivery), not a data-dependent one, so the
      // slope should read like q346's
      "q347_restart_cycle",
      // q343/q344 ride the replicated lineitem through the CSV/JSON
      // sinks+scans — like q341, the slope is format volume
      "q343_csv_roundtrip", "q344_json_roundtrip")
      .filter(wanted)
    def time(fn: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val df = fn
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      ((t1 - t0) / 1e9, df.count())
    }
    println(f"${"query"}%-24s ${"t1x"}%8s ${"tNx"}%8s ${"rows1x"}%8s " +
      f"${"rowsNx"}%8s ${"exp"}%6s")
    def measure(name: String,
        q: (SparkSession, String) => DataFrame,
        qN: (SparkSession, String) => DataFrame): Unit = {
      // warm both paths once (JIT + parquet footer cache), then take
      // the best of 2 timed passes per scale
      time(q(spark, sfDir))
      val (t1, r1) = {
        val a = time(q(spark, sfDir)); val b = time(q(spark, sfDir))
        (math.min(a._1, b._1), a._2)
      }
      time(qN(spark, work))
      val (tn, rn) = {
        val a = time(qN(spark, work)); val b = time(qN(spark, work))
        (math.min(a._1, b._1), a._2)
      }
      val exp = math.log(tn / t1) / math.log(factor.toDouble)
      println(f"$name%-24s $t1%8.2f $tn%8.2f $r1%8d $rn%8d $exp%6.2f")
      logRecord(name, factor, exp, t1, tn)
    }
    probes.foreach { name =>
      measure(name, SparkEntry.queries(name), SparkEntry.queries(name))
    }

    // ——— trained-ANN probes (round-13: the two top-cost unprobed
    // families). The 100 TB posture holds TWO things constant while
    // the corpus grows N×: the training sample (trainSamplePct =
    // 100/N at N×, so Lloyd sees the same absolute vector count) and
    // the serving query batch (copy-0 ids only). What's measured is
    // therefore index build + serving scan growth — the components
    // that actually scale with corpus size in production.
    val copy0 = 10000000L
    def unitVecs(dir: String, cap: Boolean): DataFrame = {
      val v = Tables.embeddings(spark, dir)
        .filter(if (cap) col("vec_id") < copy0 else lit(true))
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .withColumn("__n", operators.Similarity.l2norm(col("embedding")))
      v.select(col("vec_id"),
          transform(col("embedding"), x => x / col("__n")).as("embedding"))
        .localCheckpoint()
    }
    def annQ(trained81: Boolean, pct: Int)(
        s: SparkSession, dir: String): DataFrame = {
      val all = unitVecs(dir, cap = false)
      val qs = unitVecs(dir, cap = true)
        .filter(pmod(col("vec_id"), lit(50)) === 0)
      if (trained81)
        operators.Similarity.pqTrainedTopK(all, qs, "vec_id", "embedding",
          k = 5, m = 8, ks = 16, dim = 64, iters = 3, trainSamplePct = pct)
      else
        operators.Similarity.ivfPqTrainedTopK(all, qs, "vec_id", "embedding",
          k = 5, nCentroids = 8, dim = 64, nProbe = 3, m = 8, ks = 16,
          iters = 3, trainSamplePct = pct)
    }
    val pctN = math.max(1, 100 / factor)
    if (wanted("q81_pq_trained*"))
      measure("q81_pq_trained*", annQ(trained81 = true, 100),
        annQ(trained81 = true, pctN))
    if (wanted("q85_ivfpq_trained*"))
      measure("q85_ivfpq_trained*", annQ(trained81 = false, 100),
        annQ(trained81 = false, pctN))

    // ——— graph-family probes (round-15): q256 grid radius join,
    // q257 k-core peel, q260 link prediction. The N× world TILES the
    // grid along x (copy k shifts x by k·100 000; 100 000 % r == 0 so
    // no cell spans tiles) — N× vertices at the SAME point density,
    // the "more world, not denser world" 100 TB shape. Per-vertex
    // degree is therefore scale-invariant and the link-predict 2-path
    // fan-out Σdeg² — the quantity hub-capping would control — should
    // grow ~N; it is printed alongside the timings as evidence.
    def tiledPoints(n: Int): DataFrame =
      (0 until n).map { k =>
        Tables.customer(spark, sfDir).select(
          (col("c_custkey") + lit(k * 10000000L)).as("id"),
          (pmod(graft.operators.Scale.md5Prefix32(
            concat(lit("x:"), col("c_custkey").cast("string"))),
            lit(100000L)) + lit(k * 100000L)).as("x"),
          pmod(graft.operators.Scale.md5Prefix32(
            concat(lit("y:"), col("c_custkey").cast("string"))),
            lit(100000L)).as("y"))
      }.reduce(_.unionByName(_))
    def gridEdges(n: Int): DataFrame =
      QueriesCore.gridRadiusPairs(tiledPoints(n), r = 2000L)
        .select(col("id_a"), col("id_b"))
    if (wanted("q256_grid_join*"))
      measure("q256_grid_join*",
        (_, _) => QueriesCore.gridRadiusPairs(tiledPoints(1), 2000L),
        (_, _) => QueriesCore.gridRadiusPairs(tiledPoints(factor), 2000L))
    if (wanted("q257_kcore*"))
      measure("q257_kcore*",
        (_, _) => QueriesCore.kCorePeel(tiledPoints(1), gridEdges(1), 3),
        (_, _) => QueriesCore.kCorePeel(tiledPoints(factor),
          gridEdges(factor), 3))
    if (wanted("q340_ktruss*"))
      measure("q340_ktruss*",
        (_, _) => QueriesData.kTrussPeel(gridEdges(1)),
        (_, _) => QueriesData.kTrussPeel(gridEdges(factor)))
    if (wanted("q260_link_predict*")) {
      measure("q260_link_predict*",
        (_, _) => QueriesCore.linkPredictPairs(gridEdges(1)),
        (_, _) => QueriesCore.linkPredictPairs(gridEdges(factor)))
      def fanout(n: Int): Long = {
        val e = gridEdges(n)
        val adj = e.select(col("id_a").as("id"))
          .unionByName(e.select(col("id_b").as("id")))
        adj.groupBy("id").agg(count(lit(1)).as("d"))
          .agg(sum(col("d") * col("d"))).head.getLong(0)
      }
      println(s"[probe] q260 2-path fan-out sum(deg^2): " +
        s"1x=${fanout(1)} ${factor}x=${fanout(factor)}")
    }

    // ——— round-15b probes: the new query wave. q271 rides the N×
    // orders replica (linear expected: explode ×16 into a partial
    // aggregate). q268's floors are ABSOLUTE (minItem 25, support 2),
    // so at N× the frequent-pair set itself inflates — the probed
    // exponent tells whether production use needs RELATIVE floors.
    // q269 holds the query batch constant (copy-0 ids) while the
    // corpus grows — per-query serving cost vs corpus size, the
    // retrieval posture. q274 feeds an N× id population; the adaptive
    // ⌈√n⌉ extent keeps density constant, so this measures the
    // neighbor join + two-level CC machinery, not collision growth.
    Seq("q271_poisson_bootstrap", "q268_apriori_triples")
      .filter(wanted).foreach { name =>
        measure(name, SparkEntry.queries(name), SparkEntry.queries(name))
      }
    if (wanted("q269_rrf_fusion*"))
      measure("q269_rrf_fusion*",
        (sp, _) => QueriesText.q269RrfFusionCapped(sp, sfDir, copy0),
        (sp, _) => QueriesText.q269RrfFusionCapped(sp, work, copy0))
    // q242 (round 20, VERDICT r19 item 8): same serving posture as
    // q269 — constant copy-0 query batch, N× corpus
    if (wanted("q242_retrieval_recall*"))
      measure("q242_retrieval_recall*",
        (sp, _) => QueriesText.q242RetrievalRecallCapped(sp, sfDir, copy0),
        (sp, _) => QueriesText.q242RetrievalRecallCapped(sp, work, copy0))
    def gridIds(n: Int): DataFrame =
      (0 until n).map { k =>
        Tables.customer(spark, sfDir)
          .select((col("c_custkey") + lit(k * 10000000L)).as("id"))
      }.reduce(_.unionByName(_))
    if (wanted("q274_dbscan*"))
      measure("q274_dbscan*",
        (_, _) => QueriesCore.dbscanFrom(gridIds(1), 1000L),
        (_, _) => QueriesCore.dbscanFrom(gridIds(factor), 1000L))
    // q276/q277 ride the same constant-density N× world: LPA rounds
    // are |edges|-linear joins, the clustering coefficient's two-path
    // join fans out deg² ≈ π² per node — both should probe ≈ 1.0
    if (wanted("q276_label_propagation*"))
      measure("q276_label_propagation*",
        (_, _) => QueriesStats.lpaFrom(gridIds(1)),
        (_, _) => QueriesStats.lpaFrom(gridIds(factor)))
    if (wanted("q277_local_clustering*"))
      measure("q277_local_clustering*",
        (_, _) => QueriesStats.localClusteringFrom(gridIds(1)),
        (_, _) => QueriesStats.localClusteringFrom(gridIds(factor)))
    // q324 rides the same constant-density N× world: 3 register-merge
    // rounds are |edges|-linear joins with ≤ 64 rows of state per node
    if (wanted("q324_hyperanf*"))
      measure("q324_hyperanf*",
        (_, _) => QueriesEval.hyperanfFrom(gridIds(1)),
        (_, _) => QueriesEval.hyperanfFrom(gridIds(factor)))
    // q278-q280/q282 run as declared against the replicated fact
    // tables: the MW/changepoint/backtest rollups are value-bounded
    // (qty ladder / calendar days / weeks), so the probe measures the
    // linear fact-scan + keyed-aggregate path; q279's co-occurrence
    // pairs grow with replicated orders (baskets stay ≤ 7 wide)
    // q283's quantile ladders, q284's contingency grid, q285's
    // per-user session windows and q287's 10-bin rollup are all
    // value- or key-bounded — the probe confirms the linear
    // fact-scan path is all that grows
    Seq("q278_mann_whitney", "q279_item_cosine", "q280_changepoint",
        "q282_forecast_backtest", "q283_winsorize", "q284_kendall_tau",
        "q285_event_trigrams", "q287_calibration_bins",
        // q288: per-round keyed joins over the replicated bipartite
        // graph; q289: 6 hash candidates per order + keyed anti-join;
        // q294: trigram explode + keyed semi-join vs the benchmark set
        "q288_hits", "q289_negative_sampling",
        // q290-q293: keyed aggregates over value-bounded rollups
        // (2-cell split, 16-subset spine, count-of-counts ladder,
        // per-variant cents ladder); q294: trigram explode + keyed
        // semi-join vs the benchmark set
        "q290_srm_check", "q291_shapley_attribution",
        "q292_skew_audit", "q293_quantile_effects",
        "q294_ngram_contamination")
      .filter(wanted).foreach { name =>
        measure(name, SparkEntry.queries(name), SparkEntry.queries(name))
      }

    // ——— round-16 probes: the gate promotions + eval wave run as
    // declared against the replicated fact tables. q299/q300/q302/
    // q305 are one-fact-shuffle aggregates (expected ≈ linear scan);
    // q306's duel extraction is fact-keyed while its MM rounds live
    // on the brand-pair grid (dim²-bounded — the rounds should NOT
    // grow). q298 is intentionally absent: its working set is the
    // part table, which replicate() copies verbatim as a dimension,
    // so an N× "probe" would measure the identical input.
    Seq("q299_change_consumption", "q300_delete_recreate",
        "q302_cohen_kappa", "q305_pass_at_k", "q306_bradley_terry")
      .filter(wanted).foreach { name =>
        measure(name, SparkEntry.queries(name), SparkEntry.queries(name))
      }
    // q307/q308 hold the query batch at copy-0 ids while the corpus
    // grows (the q269 retrieval posture): the measured growth is the
    // corpus-side scored pass, the only corpus-proportional stage
    if (wanted("q307_mmr_rerank*"))
      measure("q307_mmr_rerank*",
        (sp, _) => QueriesSim.mmrRerankCapped(sp, sfDir, copy0),
        (sp, _) => QueriesSim.mmrRerankCapped(sp, work, copy0))
    if (wanted("q308_ndcg*"))
      measure("q308_ndcg*",
        (sp, _) => QueriesSim.ndcgCapped(sp, sfDir, copy0),
        (sp, _) => QueriesSim.ndcgCapped(sp, work, copy0))
    // q336 is quadratic by design (exact baseline); the capped probe
    // holds the query batch at copy-0 so the slope reads corpus growth
    if (wanted("q336_matryoshka_eval*"))
      measure("q336_matryoshka_eval*",
        (sp, _) => QueriesData.matryoshkaEvalCapped(sp, sfDir, copy0),
        (sp, _) => QueriesData.matryoshkaEvalCapped(sp, work, copy0))

    // ——— streaming probes: N× independent key populations at the
    // same event-time distribution (see replicate) — state and
    // per-batch volume both grow N×; slope ≈ 1 means the state-store
    // machinery absorbs volume linearly, which is the property that
    // matters when micro-batches carry 1000 executors' worth of rows.
    Seq("q86_stream_dedup", "q105_stream_sessions",
        "q119_stream_stream_join",
        // the sketch twins: per-batch volume grows N× while standing
        // state stays 256 / 32 integers — the exponent should read the
        // scan, not the state
        "q281_stream_cms", "q286_stream_bloom").filter(wanted)
      .foreach { name =>
        measure(name, SparkEntry.queries(name), SparkEntry.queries(name))
      }
    spark.stop()
  }
}
