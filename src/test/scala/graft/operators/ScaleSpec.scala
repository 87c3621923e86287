package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark
import graft.Tables

class ScaleSpec extends AnyFunSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("zOrderKey: exact Morton interleave and locality envelopes") {
    // hand-checked interleaves (x bits at even positions, y at odd)
    val got = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .withColumn("z", Scale.zOrderKey(col("x"), col("y"), 10))
      .orderBy("x", "y")
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L), (0L, 3L, 10L), (3L, 0L, 5L),
      (3L, 3L, 15L), (5L, 2L, 25L)))
    // locality: within any aligned 2^(2k) z-range, both dims span at
    // most 2^k values — the bounded min/max envelope data skipping
    // relies on (checked exhaustively for the full 8-bit plane, k=2)
    val plane = spark.range(0, 256).select(
        (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
      .withColumn("z", Scale.zOrderKey(col("x"), col("y"), 4))
    val envelopes = plane.withColumn("zr", expr("z div 16"))
      .groupBy("zr").agg(
        (max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(envelopes.length == 16)
    assert(envelopes.forall { case (_, dx, dy, n) =>
      dx <= 3 && dy <= 3 && n == 16 })
    // and the z mapping is a bijection on the plane
    assert(plane.select("z").distinct().count() == 256)
  }

  test("salted join equals the plain join on skewed data") {
    // skew: 80% of rows share one key
    val left = (1 to 1000).map(i => (if (i % 5 == 0) i % 7 else 0, i))
      .toDF("k", "v")
    val right = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "d")
    val plain = left.join(right, Seq("k"))
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    val salted = Scale.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("skew-aware salted join equals the plain join, salting only hot keys") {
    // key 0 carries 80% of the left side; keys 1-6 are the long tail
    val left = (1 to 1000).map(i => (if (i % 5 == 0) i % 7 else 0, i))
      .toDF("k", "v")
    val right = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "d")
    val plain = left.join(right, Seq("k"))
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    val skew = Scale.saltedJoinSkewAware(left, right, Seq("k"),
        saltFactor = 8, hotKeyThreshold = 100)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(skew == plain)
    // degenerate thresholds still equal the plain join: everything hot
    // (pure saltedJoin) and nothing hot (pure plain join)
    val allHot = Scale.saltedJoinSkewAware(left, right, Seq("k"),
        saltFactor = 4, hotKeyThreshold = 1)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(allHot == plain)
    val noneHot = Scale.saltedJoinSkewAware(left, right, Seq("k"),
        saltFactor = 4, hotKeyThreshold = Long.MaxValue)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(noneHot == plain)
    // left rows on a hot key missing from the right still drop (inner)
    val rightNo0 = (1 to 6).map(k => (k, s"dim$k")).toDF("k", "d")
    val dropHot = Scale.saltedJoinSkewAware(left, rightNo0, Seq("k"),
        saltFactor = 4, hotKeyThreshold = 100)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(dropHot == left.join(rightNo0, Seq("k"))
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet)
  }

  test("skew-aware join with a precomputed hot-key frame equals the plain join") {
    val left = (1 to 1000).map(i => (if (i % 5 == 0) i % 7 else 0, i))
      .toDF("k", "v")
    val right = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "d")
    val plain = left.join(right, Seq("k"))
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    // the caller-supplied list: the actual hot key
    val hot = Seq(0).toDF("k")
    val skew = Scale.saltedJoinSkewAware(left, right, Seq("k"),
        saltFactor = 8, hotKeys = hot)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(skew == plain)
    // correctness must not depend on the list being RIGHT: a cold key
    // listed as hot and a hot key missed both still join exactly
    val wrong = Seq(3, 99).toDF("k")
    val skewWrong = Scale.saltedJoinSkewAware(left, right, Seq("k"),
        saltFactor = 8, hotKeys = wrong)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(skewWrong == plain)
    // both overloads agree
    val counted = Scale.saltedJoinSkewAware(left, right, Seq("k"),
        saltFactor = 8, hotKeyThreshold = 100)
      .select("k", "v", "d").as[(Int, Int, String)].collect().toSet
    assert(counted == skew)
  }

  test("date-partitioned layout prunes partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Scale.writeDatePartitioned(graft.Tables.events(spark, sf), dir, "ts")
    val read = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), "expected partition pruning: " + plan)
    // pruned read matches the unpartitioned filter exactly
    val expected = graft.Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-02").count()
    assert(read.count() == expected && expected > 0)
  }

  test("compaction rewrites many small files into few, content-identical") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val src = s"$root/src"; val out = s"$root/out"
    val ev = graft.Tables.events(spark, sf)
    ev.repartition(50).write.mode("overwrite").parquet(src)
    def parts(d: String) = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }
    assert(parts(src) == 50)
    val total = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(src))
      try s.filter(p => p.toString.endsWith(".parquet"))
        .mapToLong(java.nio.file.Files.size).sum() finally s.close()
    }
    val n = Scale.compact(spark, src, out, targetBytes = total / 3)
    assert(n >= 3 && n <= 5, s"expected ~3-4 output files, got $n")
    assert(parts(out) == n)
    // content survives the rewrite exactly
    assert(spark.read.parquet(out).exceptAll(ev).isEmpty &&
      ev.exceptAll(spark.read.parquet(out)).isEmpty)
    graft.TmpTrees.delete(root)
  }

  test("hash split is exhaustive, disjoint, stable, and roughly weighted") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
    val split = Scale.hashSplit(df, "id", Seq("train" -> 80, "val" -> 10,
      "test" -> 10))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000L) // exhaustive + disjoint
    assert(counts("train") > 7500 && counts("train") < 8500)
    assert(counts("val") > 700 && counts("val") < 1300)
    // stability: identical assignment at a different partitioning and
    // on a subset (keys never migrate between splits)
    val again = Scale.hashSplit(df.repartition(13), "id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .as[(Long, String)].collect().toMap
    val first = split.as[(Long, String)].collect().toMap
    assert(first == again)
    val subset = Scale.hashSplit(df.filter($"id" < 100), "id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .as[(Long, String)].collect().toMap
    assert(subset.forall { case (k, v) => first(k) == v })
    // sample is the prefix-bucket subset of the same hash
    val sampled = Scale.hashSample(df, "id", 10).count()
    assert(sampled > 700 && sampled < 1300)
    // null keys: hashSplit routes to the explicit sentinel (never a
    // silent NULL split); hashSample excludes them by documented contract
    val withNull = df.select(when($"id" < 9999, $"id").as("id"))
    val nullSplit = Scale.hashSplit(withNull, "id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .filter($"id".isNull).select("split").as[String].collect()
    assert(nullSplit.toSeq == Seq("__null_key__"))
    assert(Scale.hashSample(withNull, "id", 100).count() == 9999)
    // a no-shuffle projection: no Exchange in the plan
    assert(!split.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bucketed tables join with zero exchanges") {
    // managed tables land in the default spark-warehouse dir and are
    // dropped (with files) in the finally block
    Scale.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_custkey", 4)
    Scale.writeBucketed(Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
      "o_custkey", 4)
    // disable broadcast so the join would otherwise need a shuffle
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("mixtureSample: per-stratum rates, determinism, subset of source") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val rates = Seq("src0" -> 100, "src1" -> 50, "src2" -> 0)
    val got = Scale.mixtureSample(docs, "source", "doc_id", rates, 25)
      .as[(Long, String)].collect().toSet
    // determinism: same rows on a different partitioning
    val again = Scale.mixtureSample(docs.repartition(13), "source",
        "doc_id", rates, 25)
      .as[(Long, String)].collect().toSet
    assert(got == again)
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("src0", 0) == 500) // 100% keeps everything
    assert(!bySrc.contains("src2")) // 0% keeps nothing
    val r1 = bySrc.getOrElse("src1", 0) / 500.0
    val r3 = bySrc.getOrElse("src3", 0) / 500.0 // default rate
    assert(math.abs(r1 - 0.5) < 0.1, s"src1 rate $r1")
    assert(math.abs(r3 - 0.25) < 0.1, s"src3 default rate $r3")
    // each stratum's sample is the per-stratum hashSample (same hash)
    val src1Direct = Scale.hashSample(
        docs.filter($"source" === "src1"), "doc_id", 50)
      .as[(Long, String)].collect().toSet
    assert(got.filter(_._2 == "src1") == src1Direct)
  }

  test("packSequences: two-level prefix sum matches sequential reference " +
      "at any bucketSpan and partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // sparse non-contiguous ids, zero-token docs, a doc spanning
    // several sequences
    val docs = (0 until 300).map(i =>
      (i * 7L + rnd.nextInt(3), rnd.nextInt(900).toLong)) :+
      (5000L, 0L) :+ (5001L, 7000L)
    val distinctDocs = docs.distinctBy(_._1).sortBy(_._1)
    val seqLen = 2048L
    var offset = 0L
    val expected = distinctDocs.map { case (id, n) =>
      val row = (id, n, offset, offset / seqLen,
        (offset + math.max(n, 1) - 1) / seqLen)
      offset += n
      row
    }.map(r => (r._1, r._2, r._3, r._4, r._5, r._5 - r._4 + 1)).toSet
    for (span <- Seq(1L, 7L, 4096L); parts <- Seq(1, 13)) {
      val df = distinctDocs.toDF("doc_id", "n").repartition(parts)
      val got = Scale.packSequences(df, "doc_id", col("n"), seqLen, span)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"span=$span parts=$parts")
    }
  }

  test("exactQuantileBuckets: exact boundaries, ties together, extremes capped") {
    // 100 rows, scores 0..99 → deciles are exact 10-row blocks
    val rows = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val out = Scale.exactQuantileBuckets(rows, "s", 10)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    for (i <- 0 until 100) assert(out(i.toLong) == i / 10, s"id $i")
    // massive tie: 95 zeros + 5 ones — all zeros share bucket 0 (ties
    // are never split across buckets, unlike ntile), ones land in the
    // top bucket
    val tied = ((0 until 95).map(i => (i.toLong, 0.0)) ++
      (95 until 100).map(i => (i.toLong, 1.0))).toDF("id", "s")
    val t = Scale.exactQuantileBuckets(tied, "s", 10)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert((0 until 95).forall(i => t(i.toLong) == 0))
    assert((95 until 100).forall(i => t(i.toLong) == 9))
    // row count preserved (the broadcast join loses nothing)
    assert(Scale.exactQuantileBuckets(rows, "s", 4).count() == 100)
  }

  test("temperatureWeights: alpha=1 proportional, alpha<1 flattens, sums to 1") {
    val rows = (Seq.fill(80)("big") ++ Seq.fill(16)("mid") ++ Seq.fill(4)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val w1 = Scale.temperatureWeights(rows, "src", 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(w1("big") - 0.8) < 1e-6 && math.abs(w1("small") - 0.04) < 1e-6)
    val w5 = Scale.temperatureWeights(rows, "src", 0.5)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // alpha<1 flattens: small source upsampled, big downsampled
    assert(w5("small") > 0.04 && w5("big") < 0.8)
    assert(math.abs(w5.values.sum - 1.0) < 1e-5)
    // hand-check: (0.8^.5, 0.16^.5, 0.04^.5) normalized
    val z = math.sqrt(0.8) + math.sqrt(0.16) + math.sqrt(0.04)
    assert(math.abs(w5("big") - math.sqrt(0.8) / z) < 1e-5)
  }

  test("stratifiedSampleExact: exact ceil quotas, deterministic, plan-stable") {
    // uneven strata: a=100 rows, b=37, c=3
    val rows = ((1 to 100).map(i => ("a", i)) ++
      (101 to 137).map(i => ("b", i)) ++
      (138 to 140).map(i => ("c", i))).toDF("stratum", "id")
    val out = Scale.stratifiedSampleExact(rows, "stratum", "id", pct = 10)
      .as[(String, Int)].collect()
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    // ceil: a 100→10, b 37→4, c 3→1
    assert(counts == Map("a" -> 10, "b" -> 4, "c" -> 1), s"got $counts")
    // deterministic: an independent run (different partitioning)
    // selects the IDENTICAL rows
    val again = Scale.stratifiedSampleExact(rows.repartition(7),
      "stratum", "id", pct = 10).as[(String, Int)].collect()
    assert(again.toSet == out.toSet)
    // the sort-based highCardinality path selects the same rows
    val hc = Scale.stratifiedSampleExact(rows, "stratum", "id", pct = 10,
      highCardinality = true).as[(String, Int)].collect()
    assert(hc.toSet == out.toSet)
    // pct=100 keeps everything
    val all = Scale.stratifiedSampleExact(rows, "stratum", "id", pct = 100)
    assert(all.count() == 140)
  }

  test("unimaxAllocation: hand-computed water-filling, caps, budget exhaustion") {
    // one row per (lang, token) unit: en 100 tokens, de 40, fr 10.
    // maxEpochs=2 → caps 200/80/20; budget = 0.5·150 = 75.
    // Water-filling ascending (fr 20, de 80, en 200):
    //   k=1: t=(75−0)/3=25   → fr cap 20 < 25 → fr fully capped
    //   k=2: t=(75−20)/2=27.5 → de cap 80 ≥ 27.5 → waterline 27.5
    // alloc: fr 20 (cap), de 27.5, en 27.5; Σ = 75 = budget exactly
    val rows = Seq.fill(100)("en") ++ Seq.fill(40)("de") ++ Seq.fill(10)("fr")
    val df = rows.zipWithIndex.map { case (l, i) => (l, i.toLong) }
      .toDF("lang", "id")
    val out = Scale.unimaxAllocation(df, "lang", lit(1L),
        maxEpochs = 2, budgetFraction = 0.5)
      .select("lang", "n_tokens", "cap", "alloc", "epochs")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("fr") == (("fr", 10L, 20L, 20.0, 2.0)))
    assert(out("de") == (("de", 40L, 80L, 27.5, 0.6875)))
    assert(out("en") == (("en", 100L, 200L, 27.5, 0.275)))
    assert(out.values.map(_._4).sum == 75.0, "allocation exhausts the budget")
    // budget above the total cap: everyone fully capped, no language
    // ever exceeds maxEpochs — the UniMax guarantee
    val capped = Scale.unimaxAllocation(df, "lang", lit(1L),
        maxEpochs = 1, budgetFraction = 10.0)
      .select("lang", "cap", "alloc", "epochs")
      .as[(String, Long, Double, Double)].collect()
    capped.foreach { case (l, cap, alloc, ep) =>
      assert(alloc == cap.toDouble && ep == 1.0, s"$l over-allocated: $alloc")
    }
  }
}
