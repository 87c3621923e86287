package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the exactness baseline;
  * two scale paths: random-hyperplane LSH bucketing (oblivious hash, no
  * training) and IVF inverted lists (k-means quantizer trained in
  * DataFrame ops — better recall per probed fraction on clustered
  * data). Candidates ≪ n per query on both; buckets/lists
  * shuffle-joinable.
  */
object Similarity {

  /** L2 norm of a vector column, computed once per row as its own
    * column: the quadratic pair stage then needs a single dot product
    * per pair plus one multiply — not three interpreted O(d) folds.
    * (Embedding the norm inside a per-element lambda would re-evaluate
    * it per element: O(d²) per row.)
    */
  def l2norm(vec: Column): Column = sqrt(dot(vec, vec))

  /** Dot product of two double-array columns — one fused codegen loop
    * ([[graft.functions.VecOps.vecDot]]), bit-compatible with the
    * `aggregate(zip_with(...))` fold it replaces (same element order
    * and double arithmetic, so oracle cosines are unchanged) without
    * materializing the zipped products array per pair.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecOps.vecDot(a, b)

  /** Cosine from a precomputed-norm pair: dot(a,b)/(|a|·|b|) — the same
    * operation order as DuckDB's list_cosine_similarity, so the oracle
    * and Spark share one FP path up to summation order.
    */
  private def cosByNorm(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Pair-level cosine for consumers that bring their OWN candidate
    * pairs (a hybrid reranker joining a 50-candidate list — q242)
    * instead of a full query×corpus cross: identical FP path to
    * [[topK]] (vecDot, norms multiplied before the one division), so
    * a value computed here is bit-identical to the same pair's value
    * in any other operator of this family.
    */
  def cosine(a: Column, b: Column): Column =
    cosByNorm(a, b, l2norm(a), l2norm(b))

  /** Brute-force cosine top-k (k rows per query): every query row against
    * every corpus row, rank per query, keep k. The query side is expected
    * to be small and is broadcast (corpus streams by partition — no
    * corpus shuffle). Deterministic: ranking orders by (rounded cosine
    * desc, corpus id) so float noise in the last ulp can't flip ranks vs
    * an oracle.
    *
    * Output: (query_id, neighbor_id, cos_sim, rank).
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), l2norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), l2norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosByNorm(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")), 6))
    rankTopK(scored, k)
  }

  /** Shrink with the bounded-heap custom operator (no full sort of the
    * scored pairs — [[graft.plans.TopK]]), then rank the ≤k survivors
    * per query with a window over the tiny result. (cos_sim,
    * neighbor_id) is a total order, so the heap result and the ranks
    * are deterministic.
    *
    * Projects to the three output columns FIRST: topKPerKey forces a
    * ClusteredDistribution(query_id) exchange, and shipping the raw
    * `__qv`/`__cv` vectors (d doubles each) through that shuffle would
    * multiply its volume by ~2·d/3 for no semantic gain.
    */
  private def rankTopK(scored: DataFrame, k: Int,
      extra: Seq[String] = Nil): DataFrame = {
    val slim = scored.select(
      ("query_id" +: "neighbor_id" +: "cos_sim" +: extra).map(col): _*)
    val kept = graft.plans.TopK.topKPerKey(slim, Seq("query_id"),
      Seq("cos_sim" -> false, "neighbor_id" -> true), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    kept.withColumn("rank", row_number().over(w))
      .select((Seq("query_id", "neighbor_id", "cos_sim") ++ extra :+ "rank")
        .map(col): _*)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension d): a hash mapped to [-1, 1]. Shared by index and query
    * sides so buckets agree without any fitted model.
    */
  private def planeComponent(p: Int, d: Column): Column =
    // pmod, not %: Scala/SQL % keeps the dividend's sign, which would
    // fold the negative half of xxhash64 into [-3,-1) and bias every
    // component negative (collapsing all rows into one bucket)
    pmod(xxhash64(lit(p), d), lit(10001L)).cast("double") / 5000.0 - 1.0

  /** Engine-portable twin of [[planeComponent]]: the hash is the first
    * 8 hex chars of `md5("p:d")` read base-16 (the construction
    * [[Scale.hashBucket]] / q51 and [[graft.functions.Md5MinHash]] /
    * q55 prove cross-engine) instead of xxhash64, so a DuckDB oracle
    * recomputes the identical component —
    * `(('0x' || substr(md5(p || ':' || d), 1, 8))::BIGINT % 10001) /
    * 5000.0 - 1.0` — and with it the identical bucket bits. The
    * conv() result is < 2^32 so % has no sign pitfall; the division
    * and subtraction are the same IEEE ops on both engines.
    */
  private def planeComponentPortable(p: Int, d: Column): Column =
    portableComponent(lit(p), d)

  /** The md5 pseudo-random component generalized to a COLUMN index
    * pair: component(p, d) for row-valued p — the construction behind
    * both the portable hyperplanes (p = plane) and the fixed portable
    * IVF centroids (p = centroid id). Identical hash input string
    * "p:d" either way.
    */
  private def portableComponent(p: Column, d: Column): Column =
    pmod(conv(substring(md5(concat(p.cast("string"), lit(":"),
        d.cast("string"))), 1, 8), 16, 10).cast("long"), lit(10001L))
      .cast("double") / 5000.0 - 1.0

  /** Random-hyperplane LSH bucket id: `nPlanes` sign bits packed into a
    * long. Embeddings land in the same bucket iff they agree on every
    * hyperplane side — cosine-similar vectors collide with high
    * probability (SimHash for vectors, Charikar 2002). `portable`
    * swaps the xxhash64 plane components for md5-derived ones
    * ([[planeComponentPortable]]) so the bucketing — and any query
    * built on it — can be replicated bit-for-bit by a DuckDB oracle;
    * the default stays the cheaper xxhash64.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int,
      portable: Boolean = false): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * (if (portable) planeComponentPortable(p, i)
            else planeComponent(p, i))),
        lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: bucket corpus and queries with
    * `hyperplaneBucket`, equi-join on bucket, rank within query. With
    * multi-probe (`probes` > 1) the query also probes buckets at Hamming
    * distance 1 (flip one bit), trading compute for recall.
    *
    * Scale: the bucket join is a plain shuffle/broadcast equi-join; each
    * query scores only its bucket's corpus slice. At 1000 executors the
    * corpus bucketing is embarrassingly parallel and the per-bucket join
    * is skew-bounded by 2^nPlanes buckets.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      probes: Int = 1,
      portable: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), l2norm(col(vecCol)).as("__cn"),
      hyperplaneBucket(col(vecCol), nPlanes, portable).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), l2norm(col(vecCol)).as("__qn"),
      hyperplaneBucket(col(vecCol), nPlanes, portable).as("__b0"))
    // probe buckets: exact bucket + (probes-1) single-bit flips
    val probeBuckets = (0 until math.min(probes, nPlanes + 1)).map { i =>
      if (i == 0) col("__b0") else col("__b0").bitwiseXOR(shiftleft(lit(1L), i - 1))
    }
    val q = qBase.withColumn("bucket", explode(array(probeBuckets: _*)))
    val scored = c.join(q, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosByNorm(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")), 6))
      // project the vectors away BEFORE the dedup shuffle — cos_sim is
      // already computed, so only the 3 output columns need to travel
      .select("query_id", "neighbor_id", "cos_sim")
      // multi-probe can surface the same neighbor from several buckets
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(scored, k)
  }

  /** IVF coarse quantizer: `nCentroids` means trained with `iters`
    * Lloyd iterations, entirely in DataFrame ops — no MLlib, no
    * driver-side vectors. Seeds are the `nCentroids` rows with the
    * smallest `xxhash64(id)` (deterministic, uniform). Each iteration
    * is one broadcast assign (argmax cosine via `max_by`) + one
    * element-wise mean (posexplode → per-dimension avg → re-assemble);
    * centroids are localCheckpointed per iteration so the loop's plan
    * stays flat. A centroid that loses all members keeps its previous
    * position. At 100 TB set `trainSamplePct` < 100 to train on a
    * deterministic hash sample — the quantizer needs
    * representativeness, not the full corpus.
    *
    * Returns (centroid_id, cvec, cnorm).
    */
  /** Rows with a null/empty vector or any null element are excluded
    * from vector math: they would null every cosine and crash the
    * typed sum encoder (the oracle-side contract is clean embeddings;
    * this guard makes dirty rows a non-event instead of a job failure).
    */
  private def cleanVecs(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
      !exists(col(vecCol), x => x.isNull))

  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      iters: Int = 3,
      trainSamplePct: Int = 100): DataFrame = {
    require(trainSamplePct > 0 && trainSamplePct <= 100,
      s"trainSamplePct must be in (0,100]: $trainSamplePct")
    // the quantizer needs representativeness, not the full corpus: at
    // scale train on a deterministic hash sample — every Lloyd
    // iteration (assign + mean) then touches pct% of the rows, and the
    // assignment of the FULL corpus to lists happens once, after
    // training. Scale.hashSample is a pure key-hash filter, so the
    // sample (hence the centroids) is reproducible across runs and
    // partitionings.
    val corpusClean = {
      val clean = cleanVecs(corpus, vecCol)
      if (trainSamplePct >= 100) clean
      else Scale.hashSample(clean, idCol, trainSamplePct)
    }
    // the seed row's own id labels its centroid — unique and
    // deterministic with no global-window ordinal stage; the pre-limit
    // sort plans as a top-n (TakeOrderedAndProject)
    var cents = corpusClean
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id"))
      .limit(nCentroids)
      .select(col("centroid_id"), col("cvec"),
        l2norm(col("cvec")).as("cnorm"))
      .localCheckpoint(true)
    // LAZY per-round checkpoints (round 20, guide §5 — the q90 BPE
    // trainer pattern): rounds 1..iters-1 checkpoint lazily, so the
    // old eager count() job per round is gone — each round's frame
    // materializes as a side effect of its successor's execution (the
    // successor broadcasts it). Only the LAST round is eager: it is
    // the returned frame, and its materialization transitively
    // computes and persists every predecessor, which makes it safe to
    // drop ALL intermediates afterwards (dropping earlier would race
    // lineage truncation — a lazy frame whose parent's blocks are gone
    // is unrecoverable, and whether a predecessor has materialized yet
    // is an engine scheduling detail, not a contract).
    val spent = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      for (i <- 1 to iters) {
        val assigned = assignNearest(
          corpusClean.select(col(idCol).as("__id"), col(vecCol).as("__v"),
            l2norm(col(vecCol)).as("__n")), cents)
        // element-wise mean via the typed VectorSum aggregator: shuffle
        // one partial buffer per (partition × centroid), NOT dim rows
        // per vector as a posexplode would. cleanVecs guarantees every
        // __v is non-empty with no null elements, so count(1) ==
        // summed rows.
        val means = assigned
          .groupBy("centroid_id")
          .agg(graft.functions.VectorAgg.vectorSum(col("__v")).as("__sum"),
            count(lit(1)).as("__n"))
          .select(col("centroid_id"),
            transform(col("__sum"), x => x / col("__n")).as("__newvec"))
        // a memberless centroid keeps its position — guard on size too
        // so a degenerate empty sum can never overwrite a live centroid
        val next = graft.PlanSpy.spy(s"lloyd_round${i}_prechk",
          cents.join(means, Seq("centroid_id"), "left")
            .select(col("centroid_id"),
              coalesce(when(size(col("__newvec")) > 0, col("__newvec")),
                col("cvec")).as("cvec"))
            .withColumn("cnorm", l2norm(col("cvec"))))
          .localCheckpoint(i == iters)
        spent += cents
        cents = next
      }
      // the final round is eager → every intermediate has materialized
      // blocks and no live consumer; drop them all (they are one tiny
      // frame per round, but a long-lived session shouldn't leak them)
      spent.foreach(Checkpoints.drop(_))
    } catch { case t: Throwable =>
      // a failed loop abandons the in-flight checkpoints — drop
      // whatever materialized so a caught exception leaks nothing
      // (unpersist of a never-materialized frame is a no-op)
      spent.foreach(Checkpoints.drop(_))
      Checkpoints.drop(cents)
      throw t
    }
    cents
  }

  /** Assign each row to its highest-cosine centroid (broadcast argmax;
    * ties break to the lowest centroid_id). Input columns (__id, __v,
    * __n); output adds centroid_id.
    */
  private def assignNearest(rows: DataFrame, cents: DataFrame,
      roundCos: Boolean = false): DataFrame =
    rows.crossJoin(broadcast(cents))
      .withColumn("__cos", {
        // roundCos pins the argmax input to 6 decimals — the precision
        // at which the two engines' cosines are proven bit-identical
        // (q40) — so an oracle replicates the same winner; the
        // production path keeps full precision
        val c = cosByNorm(col("__v"), col("cvec"), col("__n"), col("cnorm"))
        if (roundCos) round(c, 6) else c
      })
      .groupBy("__id")
      // min over (-cos, id): highest cosine, ties to the lowest
      // centroid id — deterministic for any orderable id type
      .agg(min_by(col("centroid_id"),
          struct(-col("__cos"), col("centroid_id"))).as("centroid_id"),
        any_value(col("__v")).as("__v"), any_value(col("__n")).as("__n"))

  /** IVF ANN top-k: corpus partitioned into inverted lists by nearest
    * centroid; each query probes its `nProbe` closest centroids and
    * brute-forces only those lists — per-query work is
    * nProbe/nCentroids of the corpus, and the list join is a plain
    * equi-join on centroid_id (shuffle-partitionable, skew bounded by
    * the quantizer's balance). The other classic ANN scale path beside
    * [[lshTopK]]: a trained data-adaptive partitioner vs. an oblivious
    * hash — better recall per probed fraction on clustered data, at
    * the cost of the training pass.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 2,
      iters: Int = 3,
      trainSamplePct: Int = 100): DataFrame = {
    val (lists, cents) = ivfIndex(corpus, idCol, vecCol, nCentroids, iters,
      trainSamplePct)
    ivfTopKWithIndex(lists, cents, queries, idCol, vecCol, k, nProbe)
  }

  /** Build the IVF index ONCE per corpus version: train the quantizer,
    * then assign every corpus row to its inverted list. Returns
    * (lists, cents) where lists = (neighbor_id, __cv, __cn,
    * centroid_id) and cents = (centroid_id, cvec, cnorm). The full-
    * corpus assignment is the expensive half of [[ivfTopK]]; callers
    * serving query BATCHES should persist (or write out) both frames
    * and call [[ivfTopKWithIndex]] per batch, paying training +
    * assignment once instead of per batch — at 100 TB this is the
    * difference between an index build and a full corpus re-scan per
    * query set.
    */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int = 16,
      iters: Int = 3,
      trainSamplePct: Int = 100): (DataFrame, DataFrame) = {
    val cents = trainCentroids(corpus, idCol, vecCol, nCentroids, iters,
      trainSamplePct)
    val lists = assignNearest(
      cleanVecs(corpus, vecCol)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"),
          l2norm(col(vecCol)).as("__n")), cents)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        col("__n").as("__cn"), col("centroid_id"))
    (lists, cents)
  }

  /** Probe a prebuilt IVF index (see [[ivfIndex]]) with a query batch. */
  def ivfTopKWithIndex(
      lists: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2): DataFrame =
    ivfServe(lists, cents, queries, idCol, vecCol, k, nProbe,
      roundCos = false, keepCentroid = false)

  /** Shared IVF serving tail: probe selection + list scan + ranking.
    * `roundCos` rounds the PROBE-selection cosine to 6 decimals (the
    * engine-portable precision — see [[assignNearest]]); `keepCentroid`
    * carries each neighbor's inverted-list id into the output so an
    * oracle checks the assignment stage directly.
    */
  private def ivfServe(
      lists: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      roundCos: Boolean,
      keepCentroid: Boolean): DataFrame = {
    val qScored = cleanVecs(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        l2norm(col(vecCol)).as("__qn"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", {
        val c = cosByNorm(col("__qv"), col("cvec"), col("__qn"), col("cnorm"))
        if (roundCos) round(c, 6) else c
      })
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("centroid_id").asc)
    val probed = qScored.withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__qn"), col("centroid_id"))
    // every corpus row lives in exactly one list, so no per-pair dedup
    val scored = lists.join(probed, "centroid_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosByNorm(col("__qv"), col("__cv"),
        col("__qn"), col("__cn")), 6))
    rankTopK(scored, k, if (keepCentroid) Seq("centroid_id") else Nil)
  }

  /** Fixed engine-portable IVF centroids: centroid c's dimension-d
    * component is the md5-derived pseudo-random value
    * [[portableComponent]](c, d) — no training, reproducible in any
    * engine with md5. These are the oracle-checkable stand-in for a
    * trained quantizer: serving behaves identically (assignment,
    * probing, ranking), only centroid PLACEMENT differs, and Lloyd
    * placement keeps its recall coverage in ScalaTest.
    */
  def portableCentroids(
      spark: org.apache.spark.sql.SparkSession,
      nCentroids: Int,
      dim: Int): DataFrame =
    spark.range(nCentroids)
      .select(col("id").cast("int").as("centroid_id"))
      .withColumn("cvec", transform(sequence(lit(0), lit(dim - 1)),
        d => portableComponent(col("centroid_id"), d)))
      .withColumn("cnorm", l2norm(col("cvec")))

  /** Engine-portable IVF serving twin: [[portableCentroids]] (fixed,
    * md5-derived — 0 Lloyd iterations) + rounded-cosine assignment +
    * the [[ivfServe]] probe/rank tail, with each neighbor's
    * centroid_id in the output. Every stage is replicable in DuckDB,
    * so the whole IVF SERVING path (assignment, nProbe probing,
    * candidate scan, ranking) gets a hash-checked oracle; training
    * ([[trainCentroids]]) is the one stage excluded, covered by
    * recall specs against exact top-k.
    */
  def ivfPortableTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int,
      dim: Int,
      nProbe: Int = 2): DataFrame = {
    val (lists, cents) = ivfPortableIndex(corpus, idCol, vecCol,
      nCentroids, dim)
    ivfPortableTopKWithIndex(lists, cents, queries, idCol, vecCol, k, nProbe)
  }

  /** The [[ivfIndex]] split for the PORTABLE path: fixed md5 centroids
    * + rounded-cosine full-corpus assignment, returned as (lists,
    * cents) so callers serving several query batches pay assignment
    * once (materialize `lists`, then [[ivfPortableTopKWithIndex]] per
    * batch) — the same build-once/probe-many contract as the trained
    * index, but oracle-checkable end to end.
    */
  def ivfPortableIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      dim: Int): (DataFrame, DataFrame) = {
    val cents = portableCentroids(corpus.sparkSession, nCentroids, dim)
    val lists = assignNearest(
      cleanVecs(corpus, vecCol)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"),
          l2norm(col(vecCol)).as("__n")), cents, roundCos = true)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        col("__n").as("__cn"), col("centroid_id"))
    (lists, cents)
  }

  /** Probe a prebuilt PORTABLE index: [[ivfTopKWithIndex]] with the
    * rounded-cosine probe selection and the neighbor's centroid_id in
    * the output (the oracle-checkable serving contract).
    */
  def ivfPortableTopKWithIndex(
      lists: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2): DataFrame =
    ivfServe(lists, cents, queries, idCol, vecCol, k, nProbe,
      roundCos = true, keepCentroid = true)

  /** Product-quantization codebooks with FIXED md5-derived centroids
    * (the [[portableCentroids]] construction per codebook entry):
    * `m` subspaces × `ks` centroids over `subDim` dims each, entry id
    * p = j·ks + c fed to the same "p:d" hash. One row per (j, c) with
    * its centroid subvector — m·ks rows, always broadcast-sized.
    */
  def pqPortableCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      m: Int,
      ks: Int,
      subDim: Int): DataFrame =
    spark.range(m.toLong * ks)
      .select((col("id") / ks).cast("int").as("j"),
        pmod(col("id"), lit(ks)).cast("int").as("c"),
        transform(sequence(lit(0), lit(subDim - 1)),
          d => portableComponent(col("id").cast("int"), d)).as("cvec"))

  /** PQ-encode a corpus: each vector becomes `m` codebook codes —
    * argmin squared L2 distance to the subspace's centroids (rounded
    * to 6 before the argmin, ties to the lowest code — the
    * engine-deterministic election). Output: (idCol, j, code), the
    * compressed representation ADC serving scans instead of vectors
    * (m bytes per doc vs dim·8 — the memory story of PQ).
    *
    * Shape: one posexplode into m subvectors, broadcast join with the
    * codebooks, and a min-struct aggregate per (doc, subspace) —
    * subvectors are projected away before the shuffle; only (dist,
    * code) pairs ride it.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      books: DataFrame,
      m: Int,
      subDim: Int,
      passthrough: Seq[String] = Nil): DataFrame = {
    // passthrough: per-id-constant columns (e.g. an IVF list id) ride
    // the encode as extra group keys, so composers don't need a
    // second pass over the (often expensive) corpus plan to re-attach
    // them
    val subs = cleanVecs(corpus, vecCol).select(
      (col(idCol) +: passthrough.map(col)) :+
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col(vecCol), j * subDim + 1, lit(subDim))))
          .as(Seq("j", "__s")): _*)
    subs.join(broadcast(books), "j")
      .withColumn("__d2",
        round(dot(col("__s"), col("__s")) + dot(col("cvec"), col("cvec"))
          - lit(2.0) * dot(col("__s"), col("cvec")), 6))
      .groupBy((col(idCol) +: passthrough.map(col)) :+ col("j"): _*)
      .agg(min(struct(col("__d2"), col("c"))).as("__m"))
      .select((col(idCol) +: passthrough.map(col)) ++
        Seq(col("j"), col("__m")("c").as("code")): _*)
  }

  /** TRAINED PQ codebooks — per-subspace k-means (the canonical
    * Jégou et al. construction), all `m` subspaces trained in the
    * SAME distributed job: the exploded (subspace, subvector) frame is
    * checkpointed once and every Lloyd iteration runs one broadcast
    * join + two aggregates over it — never m sequential k-means
    * drivers. Assignment is squared-L2 argmin (rounded, ties to the
    * lowest code — same election as [[pqEncode]], so training and
    * encoding can never disagree on the metric). Seeds are ks
    * hash-ordered subvectors per subspace via the bounded-heap
    * operator (deterministic, no global sort); codes c are their
    * 0-based hash-order ranks. Memberless centroids keep their
    * position (same guard as [[trainCentroids]]).
    */
  def pqTrainCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int,
      subDim: Int,
      iters: Int = 3,
      trainSamplePct: Int = 100): DataFrame = {
    require(trainSamplePct > 0 && trainSamplePct <= 100,
      s"trainSamplePct must be in (0,100]: $trainSamplePct")
    val base = cleanVecs(corpus, vecCol)
    val sampled = if (trainSamplePct >= 100) base
      else Scale.hashSample(base, idCol, trainSamplePct)
    // every Lloyd iteration re-reads the exploded training set: pay
    // the explode once
    val subs = sampled.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col(vecCol), j * subDim + 1, lit(subDim))))
        .as(Seq("j", "__s")))
      .localCheckpoint(true)
    try {
      val seeded = graft.plans.TopK.topKPerKey(
        subs.withColumn("__h", xxhash64(col(idCol))),
        Seq("j"), Seq("__h" -> true, idCol -> true), ks)
      var cents = seeded.withColumn("c",
          (org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("j")
              .orderBy(col("__h"), col(idCol))) - 1).cast("int"))
        .select(col("j"), col("c"), col("__s").as("cvec"))
        .localCheckpoint(true)
      // lazy per-round checkpoints, intermediates dropped only after
      // the final eager round — same pattern and rationale as
      // [[trainCentroids]] (round 20, guide §5)
      val spent = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      try {
        for (i <- 1 to iters) {
          val assigned = subs.join(broadcast(cents), "j")
            .withColumn("__d2",
              round(dot(col("__s"), col("__s")) +
                dot(col("cvec"), col("cvec")) -
                lit(2.0) * dot(col("__s"), col("cvec")), 6))
            .groupBy(col("j"), col(idCol))
            .agg(min_by(struct(col("c"), col("__s")),
              struct(col("__d2"), col("c"))).as("__b"))
            .select(col("j"), col("__b")("c").as("c"),
              col("__b")("__s").as("__s"))
          val means = assigned.groupBy("j", "c")
            .agg(graft.functions.VectorAgg.vectorSum(col("__s")).as("__sum"),
              count(lit(1)).as("__n"))
            .select(col("j"), col("c"),
              transform(col("__sum"), x => x / col("__n")).as("__newvec"))
          val next = graft.PlanSpy.spy(s"pq_lloyd_round${i}_prechk",
            cents.join(means, Seq("j", "c"), "left")
              .select(col("j"), col("c"),
                coalesce(when(size(col("__newvec")) > 0, col("__newvec")),
                  col("cvec")).as("cvec")))
            .localCheckpoint(i == iters)
          spent += cents
          cents = next
        }
        spent.foreach(Checkpoints.drop(_))
      } catch { case t: Throwable =>
        spent.foreach(Checkpoints.drop(_))
        Checkpoints.drop(cents)
        throw t
      }
      cents
    } finally Checkpoints.drop(subs)
  }

  /** ADC serving against caller-supplied codebooks (trained or
    * portable): encode the corpus, build each query's m×ks partial
    * LUT, sum exact DECIMAL partials per (query, doc), rank on the
    * bounded heap.
    */
  def pqTopKWithBooks(
      books: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      subDim: Int): DataFrame = {
    val codes = pqEncode(corpus, idCol, vecCol, books, m, subDim)
      .withColumnRenamed(idCol, "neighbor_id")
    val qsubs = cleanVecs(queries, vecCol).select(
      col(idCol).as("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col(vecCol), j * subDim + 1, lit(subDim))))
        .as(Seq("j", "__qs")))
    val lut = qsubs.join(broadcast(books), "j")
      .select(col("query_id"), col("j"), col("c").as("code"),
        round(dot(col("__qs"), col("cvec")), 6)
          .cast("decimal(18,6)").as("__pdot"))
    val scored = codes.join(broadcast(lut), Seq("j", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("__pdot")).cast("double").as("adc_dot"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val kept = graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
      Seq("adc_dot" -> false, "neighbor_id" -> true), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("neighbor_id").asc)
    kept.withColumn("rank", row_number().over(w))
      .select("query_id", "neighbor_id", "adc_dot", "rank")
  }

  /** Trained-codebook PQ ADC top-k: [[pqTrainCodebooks]] (per-subspace
    * L2 k-means) + [[pqTopKWithBooks]]. Training has no cross-engine
    * twin (k-means); recall vs exact top-k is spec-checked (PqSpec),
    * mirroring the q46 IVF convention.
    */
  def pqTrainedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      ks: Int,
      dim: Int,
      iters: Int = 3,
      trainSamplePct: Int = 100): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val subDim = dim / m
    val books = pqTrainCodebooks(corpus, idCol, vecCol, m, ks, subDim,
      iters, trainSamplePct)
    pqTopKWithBooks(books, corpus, queries, idCol, vecCol, k, m, subDim)
  }

  /** Product-quantization ADC top-k (Jégou et al. 2011) with the
    * portable fixed codebooks — completes the vector-index family
    * (brute force q40, LSH q42/q56, IVF q46/q65, int8 q60): corpus
    * vectors compress to m codes ([[pqEncode]]), each query builds an
    * m×ks lookup table of partial inner products against the
    * codebooks, and a doc's approximate score is the sum of its m
    * table entries — the asymmetric distance computation that scans
    * CODES, never corpus vectors. Partials are rounded to
    * DECIMAL(18,6) so the m-way sum is exact and order-independent
    * (hash-stable); ranking is (adc_dot desc, neighbor_id) on the
    * bounded-heap operator. Output: (query_id, neighbor_id, adc_dot,
    * rank).
    *
    * Scale: the LUT (queries × m × ks) broadcasts; the scan is one
    * equi-join of the code table against it plus a map-side-combined
    * sum — per-pair work is O(m) lookups instead of O(dim) multiplies,
    * and the code table is ~dim·8/m× smaller than the vectors. A
    * production composition would nest this inside IVF lists
    * (IVF-PQ) to cut the scanned fraction too; flat ADC is the
    * honest, oracle-checkable core.
    */
  def pqPortableTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      ks: Int,
      dim: Int): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val subDim = dim / m
    val books = pqPortableCodebooks(corpus.sparkSession, m, ks, subDim)
    pqTopKWithBooks(books, corpus, queries, idCol, vecCol, k, m, subDim)
  }

  /** IVF-PQ ADC top-k — the production ANN composition (Jégou et al.
    * 2011): the IVF coarse quantizer prunes the SCANNED FRACTION
    * (only nProbe of nCentroids lists are read per query) while PQ
    * residual codes shrink the SCANNED BYTES (m bytes per doc, no
    * corpus vectors at serving time). Each doc stores its list id and
    * the PQ codes of its RESIDUAL v − c; a query's approximate score
    * against a doc in list l decomposes as
    *   q·v̂ = q·c_l + Σ_j q_j · book_j(code_j)
    * — the first term computed once per probed list, the second by
    * the same broadcast LUT as flat PQ, both exact DECIMAL so the sum
    * is order-independent. Both quantizers here are the portable
    * md5-derived ones, so the ENTIRE index build and serving path —
    * assignment, residuals, codes, probes, LUT, score, ranking — is
    * replicable in DuckDB (q82's oracle); trained variants keep their
    * recall coverage in PqSpec / IvfSpec conventions.
    *
    * Scale: assignment and encoding are one corpus pass (the list id
    * rides pqEncode's passthrough — no re-assignment join); serving
    * joins the code table to (query, probed-list) pairs on
    * centroid_id — the scan touches only probed lists, and per-pair
    * work is O(m) LUT lookups.
    */
  def ivfPqPortableTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int,
      dim: Int,
      nProbe: Int,
      m: Int,
      ks: Int): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val subDim = dim / m
    val spark = corpus.sparkSession
    val cents = portableCentroids(spark, nCentroids, dim)
    val books = pqPortableCodebooks(spark, m, ks, subDim)
    val resid = ivfPqResiduals(corpus, idCol, vecCol, cents)
    val codes = pqEncode(resid, "__id", "__r", books, m, subDim,
        passthrough = Seq("centroid_id"))
      .withColumnRenamed("__id", "neighbor_id")
    ivfPqScore(codes, cents, books, queries, idCol, vecCol, k, nProbe,
      m, subDim)
  }

  /** Coarse-assign the corpus and attach residuals v − c — the shared
    * build stage of both IVF-PQ variants (rounded-cosine election,
    * ties to the lowest centroid id).
    */
  private def ivfPqResiduals(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: DataFrame): DataFrame = {
    val assigned = assignNearest(cleanVecs(corpus, vecCol)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"),
          l2norm(col(vecCol)).as("__n")),
      cents, roundCos = true)
    assigned
      .join(broadcast(cents.select(col("centroid_id"), col("cvec"))),
        "centroid_id")
      .select(col("__id"), col("centroid_id"),
        zip_with(col("__v"), col("cvec"), (a, b) => a - b).as("__r"))
  }

  /** The IVF-PQ serving tail shared by the portable and trained
    * variants: probe selection, per-query LUT, the q·c + Σ LUT score,
    * bounded-heap ranking.
    */
  private def ivfPqScore(
      codes: DataFrame,
      cents: DataFrame,
      books: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      m: Int,
      subDim: Int): DataFrame = {
    // probes: nProbe best lists per query by the same rounded-cosine
    // election, each carrying the exact q·c_l term
    val q = cleanVecs(queries, vecCol).select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), l2norm(col(vecCol)).as("__qn"))
    val qc = q.crossJoin(broadcast(cents))
      .withColumn("__cos", round(cosByNorm(col("__qv"), col("cvec"),
        col("__qn"), col("cnorm")), 6))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("centroid_id").asc)
    val probes = qc.withColumn("__rk", row_number().over(wq))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("centroid_id"),
        round(dot(col("__qv"), col("cvec")), 6)
          .cast("decimal(18,6)").as("__qc"))
    val qsubs = q.select(col("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("__qv"), j * subDim + 1, lit(subDim))))
        .as(Seq("j", "__qs")))
    val lut = qsubs.join(broadcast(books), "j")
      .select(col("query_id"), col("j"), col("c").as("code"),
        round(dot(col("__qs"), col("cvec")), 6)
          .cast("decimal(18,6)").as("__pdot"))
    val scored = codes.join(probes, "centroid_id")
      .join(broadcast(lut), Seq("query_id", "j", "code"))
      .groupBy("query_id", "neighbor_id")
      // __qc is constant per (query, neighbor) group (one list per
      // doc); min() recovers it deterministically in any engine
      .agg((min(col("__qc")) + sum(col("__pdot"))).cast("double")
        .as("adc_dot"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val kept = graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
      Seq("adc_dot" -> false, "neighbor_id" -> true), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("neighbor_id").asc)
    kept.withColumn("rank", row_number().over(w))
      .select("query_id", "neighbor_id", "adc_dot", "rank")
  }

  /** TRAINED IVF-PQ — the production configuration: Lloyd-trained
    * coarse centroids ([[trainCentroids]]) partition the corpus, and
    * the PQ codebooks are k-means-trained ON THE RESIDUALS
    * ([[pqTrainCodebooks]] over v − c, the Jégou construction — a
    * codebook fit to residual statistics, not raw vectors). The
    * residual frame feeds BOTH codebook training and encoding, so it
    * is checkpointed once (the training iterations would otherwise
    * re-run the coarse assignment crossJoin per Lloyd step); the
    * serving tail is byte-identical to the portable variant's.
    * k-means has no cross-engine twin → rows-only at the driver gate;
    * PqSpec pins recall against the portable composition.
    */
  def ivfPqTrainedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int,
      dim: Int,
      nProbe: Int,
      m: Int,
      ks: Int,
      iters: Int = 3,
      trainSamplePct: Int = 100): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val subDim = dim / m
    val cents = trainCentroids(corpus, idCol, vecCol, nCentroids, iters,
      trainSamplePct)
    val resid = ivfPqResiduals(corpus, idCol, vecCol, cents)
      .localCheckpoint()
    val books = pqTrainCodebooks(resid, "__id", "__r", m, ks, subDim,
      iters, trainSamplePct)
    val codes = pqEncode(resid, "__id", "__r", books, m, subDim,
        passthrough = Seq("centroid_id"))
      .withColumnRenamed("__id", "neighbor_id")
    ivfPqScore(codes, cents, books, queries, idCol, vecCol, k, nProbe,
      m, subDim)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >=
    * threshold, found via LSH buckets (exact within-bucket verify).
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nPlanes: Int = 6): DataFrame = {
    val b = df.select(col(idCol), col(vecCol).as("__v"),
      l2norm(col(vecCol)).as("__n"),
      hyperplaneBucket(col(vecCol), nPlanes).as("bucket"))
    val l = b.select(col("bucket"), col(idCol).as("id_a"),
      col("__v").as("va"), col("__n").as("na"))
    val r = b.select(col("bucket"), col(idCol).as("id_b"),
      col("__v").as("vb"), col("__n").as("nb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosByNorm(col("va"), col("vb"),
        col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim").dropDuplicates("id_a", "id_b")
  }

  /** Build the LSH bucket index once per corpus version: (idCol, __v,
    * __n, bucket) — vectors ride along because the verify stage needs
    * them (a real vector index stores the vectors; the bucket column
    * is the probe key). `portable` uses the md5 hyperplanes so probes
    * are oracle-replicable.
    */
  def lshVectorIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      portable: Boolean = false): DataFrame = {
    // stamp the plane parameters on the bucket column: a probe with
    // different planes would bucket the batch differently and return
    // plausible-looking garbage with no error — the metadata lets
    // embeddingNearDupsIncremental catch the drift
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("nPlanes", nPlanes.toLong)
      .putBoolean("portable", portable)
      .build()
    corpus.select(col(idCol), col(vecCol).as("__v"),
      l2norm(col(vecCol)).as("__n"),
      hyperplaneBucket(col(vecCol), nPlanes, portable)
        .as("bucket", meta))
  }

  /** Incremental embedding near-dup — the vector twin of the
    * incremental MinHash contract: bucket ONLY the new batch and probe
    * a prebuilt [[lshVectorIndex]], so a batch of B vectors against a
    * corpus of N costs O(B) bucketings + one bucket equi-join — never
    * a corpus re-bucketing. Pairs returned are exactly the
    * full-corpus [[embeddingNearDups]] pairs (same planes) touching at
    * least one new vector: new×corpus from the index probe, new×new
    * from the batch's own buckets. Ids must be disjoint between index
    * and batch.
    */
  def embeddingNearDupsIncremental(
      index: DataFrame,
      newVecs: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nPlanes: Int = 6,
      portable: Boolean = false): DataFrame = {
    // if the index came from lshVectorIndex, its bucket column carries
    // the plane parameters — a mismatch would silently probe the wrong
    // buckets, so fail loudly instead
    val m = index.schema("bucket").metadata
    if (m.contains("nPlanes"))
      // a missing portable key counts as a mismatch (never an opaque
      // NoSuchElementException out of the metadata accessor)
      require(m.getLong("nPlanes") == nPlanes.toLong &&
          m.contains("portable") && m.getBoolean("portable") == portable,
        s"embeddingNearDupsIncremental: index was built with nPlanes=" +
          s"${m.getLong("nPlanes")} portable=" +
          s"${if (m.contains("portable")) m.getBoolean("portable") else "<absent>"} " +
          s"but probed with nPlanes=$nPlanes portable=$portable")
    val newBucketed = lshVectorIndex(newVecs, idCol, vecCol, nPlanes, portable)
    val all = index.select(col(idCol), col("__v"), col("__n"), col("bucket"))
      .unionByName(newBucketed)
    val l = newBucketed.select(col("bucket"), col(idCol).as("__pid"),
      col("__v").as("va"), col("__n").as("na"))
    val r = all.select(col("bucket"), col(idCol).as("__oid"),
      col("__v").as("vb"), col("__n").as("nb"))
    l.join(r, Seq("bucket"))
      .filter(col("__pid") =!= col("__oid"))
      .withColumn("cos_sim", round(cosByNorm(col("va"), col("vb"),
        col("na"), col("nb")), 6))
      // canonicalize ids AFTER scoring: the cosine is bit-symmetric
      // (elementwise products commute, summation order is element
      // order), so both orderings of a new×new collision carry the
      // same rounded value and collapse in the dedup
      .select(least(col("__pid"), col("__oid")).as("id_a"),
        greatest(col("__pid"), col("__oid")).as("id_b"), col("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * deduplication for training corpora: cluster the embeddings, then
    * within each cluster drop every vector that is ≥ `threshold`
    * cosine-similar to a PREFERRED same-cluster vector, where
    * preference is the paper's keep-hard rule — LOWEST cosine to the
    * cluster centroid first (low-centroid-similarity examples carry
    * the most diverse signal), ties to the lowest id. This matches the
    * published implementation exactly: items are ordered within the
    * cluster and an item is removed when ANY earlier item (kept or
    * not) is within threshold — no connected components, so the
    * decision for each vector is one EXISTS over its cluster.
    *
    * Output: one row per input vector — (idCol, centroid_id,
    * centroid_cos, kept). Callers filter kept for the surviving
    * corpus; the full frame is returned so drop accounting is free.
    *
    * `cents` supplies the quantizer — [[portableCentroids]] makes the
    * WHOLE operator (assignment, election order, pair cosines, the
    * EXISTS) replicable in a DuckDB oracle; [[trainCentroids]] is the
    * production path (same serving semantics, k-means quality).
    *
    * Scale: the only quadratic is WITHIN a cluster — the pair stage is
    * a self equi-join on centroid_id, a plain shuffle-partitionable
    * join whose cost is Σ|cluster|², controlled by nCentroids (the
    * SemDeDup design point: at 100 TB you raise nCentroids so clusters
    * stay ~10⁴-10⁵ rows and every cluster's pair block fits an
    * executor). Vectors must ride that one join (exact in-cluster
    * cosines need them); everything downstream of the EXISTS is
    * vector-free, and the assignment crossJoin broadcasts only the
    * centroid table.
    */
  def semDeDup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: DataFrame,
      threshold: Double): DataFrame = {
    val assigned = assignNearest(cleanVecs(corpus, vecCol)
        .select(col(idCol).as("__id"), col(vecCol).as("__v"),
          l2norm(col(vecCol)).as("__n")),
      cents, roundCos = true)
    // the argmax keeps only the winning centroid_id, so the winner's
    // cosine is re-derived with one broadcast join + one dot per row;
    // rounded to 6 decimals — the cross-engine-identical precision —
    // because it is BOTH an output column and the election key.
    // Checkpointed once: it feeds both sides of the pair join and the
    // final projection (three plan branches).
    val withSim = assigned
      .join(broadcast(cents.select(col("centroid_id"), col("cvec"),
        col("cnorm"))), "centroid_id")
      .select(col("__id"), col("centroid_id"), col("__v"), col("__n"),
        round(cosByNorm(col("__v"), col("cvec"), col("__n"), col("cnorm")), 6)
          .as("centroid_cos"))
      .localCheckpoint(true)
    val a = withSim.select(col("centroid_id"), col("__id").as("__ua"),
      col("__v").as("__va"), col("__n").as("__na"),
      col("centroid_cos").as("__ca"))
    val b = withSim.select(col("centroid_id"), col("__id").as("__ub"),
      col("__v").as("__vb"), col("__n").as("__nb"),
      col("centroid_cos").as("__cb"))
    // b is dropped when SOME a earlier in the (centroid_cos, id)
    // election order sits within threshold; the order filter halves
    // the pair stream before the dot products run
    val dropped = a.join(b, Seq("centroid_id"))
      .filter(col("__ca") < col("__cb") ||
        (col("__ca") === col("__cb") && col("__ua") < col("__ub")))
      .filter(round(cosByNorm(col("__va"), col("__vb"), col("__na"),
        col("__nb")), 6) >= threshold)
      .select(col("__ub").as("__id")).distinct()
    withSim
      .join(dropped.withColumn("__dropped", lit(true)), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("centroid_id"),
        col("centroid_cos"), col("__dropped").isNull.as("kept"))
  }

  /** Per-vector int8 scalar quantization — the memory lever for ANN at
    * corpus scale: codes are 0..255 per dimension (4× smaller than
    * float32, 8× smaller than the double pipeline) plus two scalars
    * (mn, scale) per vector. `code_i = floor((x_i - mn)/s + 0.5)` with
    * `s = (mx - mn)/255` — floor(+0.5), not round(), because the two
    * engines disagree on round()'s tie rule but floor is IEEE-exact in
    * both. Constant vectors (s = 0) get all-zero codes.
    *
    * Also emits the derived per-vector scalars the quantized pair
    * stage needs so pairwise work is O(1) + one integer dot:
    * `sum_codes = Σc_i`, `norm` = |dequantized| via the closed form
    * `sqrt(n·mn² + 2·mn·s·Σc + s²·Σc²)` (Σc² exact via
    * [[graft.functions.VecOps.vecDotI32]]).
    *
    * Output: (idCol, codes array<int>, mn, scale, n_dim, sum_codes,
    * norm).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withScale = df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__mn", array_min(col("__v")))
      .withColumn("__s", (array_max(col("__v")) - col("__mn")) / lit(255.0))
    val coded = withScale.withColumn("codes",
        when(col("__s") === 0,
          transform(col("__v"), _ => lit(0)))
          .otherwise(transform(col("__v"),
            x => floor((x - col("__mn")) / col("__s") + lit(0.5)).cast("int"))))
      .withColumn("sum_codes",
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c))
      .withColumn("__sd", graft.functions.VecOps.vecDotI32(
        col("codes"), col("codes")))
      .withColumn("n_dim", size(col("codes")))
    coded.select(col(idCol), col("codes"), col("__mn").as("mn"),
      col("__s").as("scale"), col("n_dim"), col("sum_codes"),
      sqrt(col("n_dim") * col("__mn") * col("__mn") +
        lit(2.0) * col("__mn") * col("__s") * col("sum_codes") +
        col("__s") * col("__s") * col("__sd")).as("norm"))
  }

  /** Brute-force cosine top-k over int8-QUANTIZED vectors: the
    * dequantized dot expands algebraically to
    * `n·mn_q·mn_c + mn_q·s_c·Σc_c + mn_c·s_q·Σc_q + s_q·s_c·(cq·cc)`,
    * so each pair costs one EXACT integer code dot
    * ([[graft.functions.VecOps.vecDotI32]]) plus O(1) scalar math on
    * per-vector precomputes — never a dequantized array. Both inputs
    * are [[quantizeInt8]] outputs; zero-norm vectors are excluded on
    * both sides (cosine undefined). Ranking follows [[topK]]:
    * (rounded cos desc, neighbor id), so an oracle replicating the
    * same closed form hash-matches.
    */
  def topKQuantized(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.filter(col("norm") > 0).select(
        col(idCol).as(s"${tag}_id"), col("codes").as(s"__c_$tag"),
        col("mn").as(s"__mn_$tag"), col("scale").as(s"__s_$tag"),
        col("n_dim").as(s"__n_$tag"), col("sum_codes").as(s"__sum_$tag"),
        col("norm").as(s"__norm_$tag"))
    val q = side(queries, "query")
    val c = side(corpus, "neighbor")
    val dotqc = graft.functions.VecOps.vecDotI32(
      col("__c_query"), col("__c_neighbor")).cast("double")
    val cos =
      (col("__n_query") * col("__mn_query") * col("__mn_neighbor") +
        col("__mn_query") * col("__s_neighbor") * col("__sum_neighbor") +
        col("__mn_neighbor") * col("__s_query") * col("__sum_query") +
        col("__s_query") * col("__s_neighbor") * dotqc) /
        (col("__norm_query") * col("__norm_neighbor"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cos, 6))
    rankTopK(scored, k)
  }
}
