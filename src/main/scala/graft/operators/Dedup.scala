package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, benchmark decontamination,
  * and pair-graph clustering (connected components → keeper election).
  * Each returns DataFrames, never collects, and banding/bucketing keeps
  * candidate generation at O(near-duplicates), not O(n²) — the property
  * that matters at 100 TB.
  */
object Dedup {

  /** Exact dedup: keep the row minimizing `keep` per normalized-content
    * hash. Hash-groupBy → one shuffle on the fingerprint; map-side
    * partial `min_by` keeps shuffle volume at one row per (partition ×
    * distinct hash).
    */
  def exactDedup(df: DataFrame, textCol: String, keep: Column): DataFrame = {
    val fp = TextAnalysis.fingerprintMd5(col(textCol))
    val others = df.columns.toSeq
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min_by(struct(others.map(col): _*), keep).as("__best"))
      .select(others.map(c => col(s"__best.$c")): _*)
  }

  /** MinHash signature: `numHashes` independent min-hashes over the
    * document's shingle set. Permutation i is simulated by
    * `xxhash64(shingle, i)` (the standard "hash with seed" trick); the
    * signature is an array<long>. Pure higher-order functions — codegen,
    * no UDF, no shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** Full MinHash+LSH near-dup pipeline: shingle → signature → bands →
    * self-join on (band_idx, band_hash) → verify with exact Jaccard on
    * shingle sets → pairs with jaccard >= threshold.
    *
    * Scale: the self-join shuffles on band_hash (uniform by
    * construction); the verify step only touches candidate pairs. Skewed
    * buckets (boilerplate shingles) are bounded because band hashes mix
    * `rowsPerBand` shingle-mins.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val withShingles = df
      .select(col(idCol), graft.functions.ShingleHashes
        .shingleHashes(lower(col(textCol)), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // Signature + banding in ONE codegen expression per document
    // (SketchSigs.minhashBands, bit-identical to the explode + groupBy
    // min-aggregate form this replaces): the signature stage needs no
    // shuffle and no aggregation at all. The array-typed higher-order
    // variant ([[minhashSignature]]) is interpreted (no codegen for
    // lambda functions) AND gets inlined into every band column by
    // Catalyst's project collapsing — a 16× recompute that turned that
    // stage quadratic in practice; the posexplode generator evaluates
    // its input once per row, so no such fan-out exists here.
    //
    // candidate generation joins ONLY (id, band) rows — the shingle
    // arrays stay out of the shuffle; they are re-attached for the
    // verify step after dedup + a lossless size-ratio prefilter
    // (jaccard >= t requires t*|B| <= |A| <= |B|/t)
    val bandedAll = withShingles.select(col(idCol),
      posexplode(graft.functions.SketchSigs
        .minhashBands(col("__sh"), numHashes, bands))
        .as(Seq("band_idx", "band_hash")))
    // hot-bucket cap (off by default): a bucket of B docs yields B²/2
    // candidates, so one boilerplate-heavy bucket can dominate the whole
    // join at corpus scale. Capping drops those buckets wholesale —
    // CCNet-style boilerplate exclusion traded against recall for docs
    // whose ONLY collisions were in dropped buckets (other bands still
    // catch them with minhash probability).
    val banded =
      if (maxBucketSize == Int.MaxValue) bandedAll
      else {
        // materialize once: without this the band signatures (the whole
        // codegen sketch stage) evaluate twice — once for the bucket
        // counts and once as the probe side of the semi join
        val bandedOnce = bandedAll.localCheckpoint(true)
        val ok = bandedOnce.groupBy("band_idx", "band_hash")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBucketSize)
          .select("band_idx", "band_hash")
        bandedOnce.join(ok, Seq("band_idx", "band_hash"), "left_semi")
      }
    bandCandidatesVerified(withShingles, banded, idCol, threshold)
  }

  /** Shared LSH tail: self-join the banded rows on (band_idx,
    * band_hash) to candidates, re-attach shingle sets, apply the
    * lossless size-ratio prefilter (jaccard >= t requires
    * t*|B| <= |A| <= |B|/t), and verify with exact Jaccard. Works for
    * any band-key type (long band hashes or portable string keys) and
    * any shingle element type — the set algebra is type-agnostic.
    */
  private def bandCandidatesVerified(
      withShingles: DataFrame,
      banded: DataFrame,
      idCol: String,
      threshold: Double): DataFrame = {
    val a = banded.select(col(idCol).as("id_a"), col("band_idx"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band_idx"), col("band_hash"))
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyCandidates(withShingles, cand, idCol, threshold)
  }

  /** Shared exact-verify tail over precomputed candidate pairs:
    * re-attach shingle sets, lossless size-ratio prefilter, rounded
    * exact Jaccard at the threshold.
    */
  private def verifyCandidates(
      withShingles: DataFrame,
      cand: DataFrame,
      idCol: String,
      threshold: Double): DataFrame = {
    val sets = withShingles.select(col(idCol), col("__sh"),
      size(col("__sh")).as("__n"))
    val withSets = cand
      .join(sets.select(col(idCol).as("id_a"), col("__sh").as("sh_a"),
        col("__n").as("na")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__sh").as("sh_b"),
        col("__n").as("nb")), "id_b")
      .filter(col("na") >= col("nb") * threshold &&
        col("nb") >= col("na") * threshold)
    // filter on the ROUNDED value so an oracle computing round-then-filter
    // can never disagree at the threshold boundary
    withSets.withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Engine-portable MinHash+LSH near-dups: same pipeline shape as
    * [[minhashNearDups]] but every hash is md5-derived
    * ([[graft.functions.Md5MinHash]]) and the shingles are the word
    * n-gram STRINGS themselves ([[TextAnalysis.wordShingles]]) — so a
    * DuckDB oracle can replicate the whole operator bit-for-bit
    * (signature minima, banding, candidate set, verified Jaccard) with
    * `md5` + list functions. The xxhash64 path stays the production
    * default (one 64-bit mix per hash vs a full md5); this variant is
    * the cross-engine-checkable twin, and the per-doc sketch is still
    * one codegen call with band-only shuffles.
    */
  def minhashNearDupsPortable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val withShingles = wordShingled(df, idCol, textCol, shingleLen)
    bandCandidatesVerified(withShingles,
      md5Banded(withShingles, idCol, numHashes, bands), idCol, threshold)
  }

  /** Word-shingle prep shared by the portable MinHash family. */
  private def wordShingled(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int): DataFrame =
    df.select(col(idCol),
        TextAnalysis.wordShingles(col(textCol), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0)

  /** md5 band keys of pre-shingled rows: (idCol, band_idx, band_hash). */
  private def md5Banded(
      shingled: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame =
    shingled.select(col(idCol),
      posexplode(graft.functions.Md5MinHash
        .bandKeys(col("__sh"), numHashes, bands))
        .as(Seq("band_idx", "band_hash")))

  /** Build the portable MinHash band INDEX once per corpus version:
    * (idCol, band_idx, band_hash), one row per (doc, band). This is
    * the persisted artifact [[minhashNearDupsIncrementalPortable]]
    * probes — at 100 TB the corpus is sketched once here, and each
    * daily batch pays only its own sketches plus a band equi-join.
    */
  def minhashBandIndexPortable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    md5Banded(wordShingled(df, idCol, textCol, shingleLen), idCol,
      numHashes, bands)
  }

  /** Incremental near-dup detection — the daily-ingest contract: band
    * ONLY the new batch and probe a prebuilt corpus band index
    * ([[minhashBandIndexPortable]]), so a batch of B docs against a
    * corpus of N costs O(B) sketches + one band equi-join — never a
    * corpus re-sketch. `corpus` raw docs are touched only to
    * re-shingle the candidate docs for exact verification (semi-join
    * first, so that scan is candidate-sized, and filters/column prune
    * push into it). Returned pairs are EXACTLY the full-corpus
    * [[minhashNearDupsPortable]] pairs that touch at least one new
    * doc (new×corpus from the index probe, new×new from the batch's
    * own bands), with (id_a, id_b) ordered. Ids must be disjoint
    * between corpus and batch (an ingest re-run dedups upstream).
    */
  def minhashNearDupsIncrementalPortable(
      corpusIndex: DataFrame,
      corpus: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    // the batch sketch feeds both the probe-target union and the probe
    // itself — pin it (batch-sized) so the md5 sketch runs once, the
    // same courtesy DedupStream gives its persisted increment
    minhashNearDupsIncrementalFromBands(corpusIndex, corpus, newDocs,
      md5Banded(wordShingled(newDocs, idCol, textCol, shingleLen), idCol,
        numHashes, bands).localCheckpoint(),
      idCol, textCol, shingleLen, threshold)
  }

  /** [[minhashNearDupsIncrementalPortable]] with the batch's band
    * sketch supplied by the CALLER — for pipelines that also persist
    * the sketch as the fold-in index increment (e.g.
    * [[graft.streaming.DedupStream]]): band the batch once, persist
    * that frame, and both the probe join here and the index append
    * read it, instead of each plan re-running the md5 sketch (the
    * dominant per-batch cost). `newBanded` must be
    * `minhashBandIndexPortable(newDocs, …)` for the same parameters;
    * results are identical to the self-sketching overload.
    */
  def minhashNearDupsIncrementalFromBands(
      corpusIndex: DataFrame,
      corpus: DataFrame,
      newDocs: DataFrame,
      newBanded: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val newShingled = wordShingled(newDocs, idCol, textCol, shingleLen)
    // probe target = corpus index ∪ the batch's own bands: new×new
    // pairs surface exactly like new×corpus ones
    val allBanded = corpusIndex
      .select(col(idCol), col("band_idx"), col("band_hash"))
      .unionByName(newBanded.select(col(idCol), col("band_idx"), col("band_hash")))
    val cand = newBanded
      .select(col(idCol).as("__p"), col("band_idx"), col("band_hash"))
      .join(allBanded.select(col(idCol).as("__o"),
        col("band_idx"), col("band_hash")), Seq("band_idx", "band_hash"))
      .filter(col("__p") =!= col("__o"))
      // canonicalize: both orderings of a new×new collision collapse
      .select(least(col("__p"), col("__o")).as("id_a"),
        greatest(col("__p"), col("__o")).as("id_b"))
      .distinct()
      // three consumers (both candIds legs + the verify join) and
      // candidate-pair-sized — pin once instead of probing the band
      // index three times
      .localCheckpoint()
    // verify needs shingle sets for candidate corpus docs only:
    // semi-join scopes the corpus scan to the candidate set
    val candIds = cand.select(col("id_a").as(idCol))
      .unionByName(cand.select(col("id_b").as(idCol))).distinct()
    val corpusShingled = wordShingled(
      corpus.join(candIds, Seq(idCol), "left_semi"),
      idCol, textCol, shingleLen)
    verifyCandidates(corpusShingled.unionByName(newShingled), cand,
      idCol, threshold)
  }

  /** Asymmetric near-CONTAINMENT detection (MOSS / RefinedWeb-style):
    * containment(A in B) = |fp(A) ∩ fp(B)| / |fp(A)| over distinct
    * winnowing fingerprints ([[TextAnalysis.winnowPortable]] — the
    * md5-portable family, so the WHOLE operator is oracle-checkable).
    * Symmetric Jaccard misses a small doc pasted into a much larger
    * one (the union denominator dominates); containment flags it.
    * Output (id_a, id_b, containment) keeps BOTH directions —
    * containment(A in B) and (B in A) genuinely differ.
    *
    * Scale: posting-list equi-join on fp — quadratic only within one
    * fingerprint's posting list; `maxDocFreq` drops boilerplate
    * fingerprints shared by more than that many docs (the CCNet-style
    * cap, bounding every list). Both the intersection counts AND the
    * per-doc denominators are computed over the capped universe, so
    * the ratio is internally consistent; counts flow through
    * aggregates and fingerprint sets never ride a shuffle whole.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // materialize the distinct fingerprint set ONCE: it fans into four
    // plan branches (df-cap count, cap semi-join probe, per-doc sizes,
    // both sides of the posting self-join) — without this the whole
    // winnow sketch re-executes per branch (same trap as the minhash
    // hot-bucket cap, Dedup.scala:93; measured 2.75 s → 2.04 s at
    // sf0.1 — the remaining cost is the posting join itself)
    val fps = TextAnalysis.winnowPortable(df, idCol, textCol, k, w)
      .select(col(idCol), col("fp")).distinct()
      .localCheckpoint(true)
    val kept =
      if (maxDocFreq == Int.MaxValue) fps
      else {
        val ok = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDocFreq).select("fp")
        fps.join(ok, Seq("fp"), "left_semi")
      }
    val sizes = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(idCol).as("id_a"), col("__n"))
    val inter = kept.select(col(idCol).as("id_a"), col("fp"))
      .join(kept.select(col(idCol).as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__i"))
    inter.join(sizes, Seq("id_a"))
      // round-then-filter so an oracle can never disagree at the
      // threshold boundary (same rule as the Jaccard operators)
      .withColumn("containment", round(col("__i") / col("__n"), 6))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  /** Sparse lexical cosine near-dup pairs — the idf-weighted
    * counterpart of [[ngramJaccardPairs]] and the LEXICAL counterpart
    * of the dense-embedding path: documents as L2-normalized idf
    * vectors over their DISTINCT word shingles, pair similarity as the
    * sparse dot product over shared shingles. Shape: one posting-list
    * self-join keyed on shingle, df-capped (`maxDf`) so a boilerplate
    * shingle can never turn the join quadratic — the same hot-list
    * discipline as containment detection. Parity discipline: idf and
    * normalized weights quantize to FIXED-POINT micros via floor —
    * floor of an identical IEEE double is bit-deterministic in every
    * engine, unlike round(x, n), whose Spark implementation rounds the
    * double's shortest DECIMAL representation while DuckDB rounds the
    * binary value (a real divergence: this operator's first draft lost
    * one pair to exactly that boundary). All sums are then integer —
    * exact and order-independent — so the cosine is bit-identical
    * across engines and partitionings and the threshold filter needs
    * no rounding guard. Degenerate all-common-shingle documents (zero
    * norm) are dropped rather than emitting NaN (whose comparison
    * semantics differ between engines).
    */
  def sparseCosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      maxDf: Int,
      minCos: Double): DataFrame = {
    // the shingle explode is evaluated by BOTH consumers below and
    // runs in the scan stage — spread it so a one-row-group input
    // doesn't serialize it (graft.Tables.spread scaladoc)
    val sh = graft.Tables.spread(df).select(col(idCol),
      explode(graft.operators.TextAnalysis.wordShingles(col(textCol),
        shingleLen)).as("__sh"))
    val dfreq = sh.groupBy("__sh").agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    // idf in fixed-point micros: floor(ln(N/df)·1e6) — exact long
    val w = sh.join(dfreq, "__sh")
      .crossJoin(broadcast(nDocs))
      .withColumn("__w6",
        floor(log(col("__n").cast("double") / col("__df")) * 1e6))
    val nrm = w.groupBy(idCol)
      .agg(sqrt(sum(col("__w6") * col("__w6")).cast("double"))
        .as("__nrm"))
    val wn = w.join(nrm, idCol)
      .filter(col("__nrm") > 0)
      // normalized weight, fixed-point micros again: values in [0, 1e6]
      .withColumn("__wn6",
        floor(col("__w6").cast("double") / col("__nrm") * 1e6))
      .filter(col("__df") <= maxDf)
      .select(col(idCol), col("__sh"), col("__wn6"))
      // Both sides of the posting self-join consume this subtree, and
      // Spark does NOT reuse the exchange across the two aliased copies
      // (verified: 0 ReusedExchange, 12 parquet scans — the whole
      // shingle/df/norm pipeline ran twice). Materialize the df-capped
      // posting list ONCE; it is the already-pruned small end of the
      // pipeline (distinct shingles per doc, hot shingles dropped), so
      // pinning it costs far less than recomputing the upstream joins.
      .localCheckpoint()
    wn.select(col(idCol).as("id_a"), col("__sh"), col("__wn6").as("__wa"))
      .join(wn.select(col(idCol).as("id_b"), col("__sh"),
        col("__wn6").as("__wb")), Seq("__sh"))
      .filter(col("id_a") < col("id_b"))
      // integer dot product: products ≤ 1e12, sums well inside long
      .groupBy("id_a", "id_b")
      .agg((sum(col("__wa") * col("__wb")).cast("double") / 1e12)
        .as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Exact Jaccard set-similarity JOIN with prefix filtering (the
    * AllPairs/PPJoin candidate rule): order each document's distinct
    * shingle set by global rarity (df asc, shingle — ONE common order),
    * keep only the first |s| − ⌈τ·|s|⌉ + 1 shingles as the prefix, and
    * equi-join on PREFIX shingles only. Lossless by pigeonhole: for a
    * qualifying pair the overlap o ≥ ⌈τ·|s|⌉ exceeds either suffix
    * (size ⌈τ·|s|⌉ − 1), so the globally smallest common shingle sits
    * in BOTH prefixes. Hot shingles (big postings) rank at the tail of
    * every prefix order and never drive the join — the property that
    * keeps candidate volume at O(near-dups) at 100 TB, with NO df cap
    * and NO loss (unlike the banded/capped probabilistic cousins).
    * Verification is exact and all-integer: intersection counted over
    * full sets, threshold by cross-multiplication, similarity reported
    * in floor-fixed-point micros (floor of an exact-in-double rational
    * — engine-portable, per the round() gotcha).
    *
    * The intended oracle is the UNFILTERED all-pairs definition:
    * matching row sets prove the prefix filter lossless, not merely
    * that two implementations of the same pruning agree.
    */
  def prefixJaccardJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    // each doc's shingle SET travels as one sorted array row: the
    // explode below feeds df-counts and the prefix rank, while the
    // verify step reads the arrays directly — an O(|set|)
    // array_intersect per candidate instead of re-exploding every
    // candidate pair into (pair × tokens) join rows (the first draft
    // did exactly that: ~50× the verify-join volume at sf0.1).
    // Shingles are 64-bit FNV hashes (ShingleHashes, the q35
    // convention — lower() upstream for full-Unicode folding): set
    // cardinalities are collision-free in practice (~n²/2⁶⁴), every
    // downstream join/group/intersect runs on longs instead of
    // ~25-byte strings, and the string-shingle DuckDB oracle still
    // matches because only CARDINALITIES reach the output. Measured
    // at sf0.1: strings 9.1 s → longs (see q153 bench entry).
    val sets = df.select(col(idCol),
      graft.functions.ShingleHashes.shingleHashes(lower(col(textCol)),
        shingleLen).as("__set"))
      .filter(size(col("__set")) > 0)
      .localCheckpoint()
    val toks = sets.select(col(idCol), size(col("__set")).as("__n"),
      explode(col("__set")).as("__tok"))
    val dfreq = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
    // ⌈τ·n⌉ = (n·num + den − 1) div den — exact integers end to end
    val ceilTauN =
      floor((col("__n") * tauNum + (tauDen - 1)) / lit(tauDen.toDouble))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__df"), col("__tok"))
    val prefix = toks.join(dfreq, "__tok")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__n") - ceilTauN + 1)
      .select(col(idCol), col("__tok"), col("__rn"), col("__n"))
      .localCheckpoint() // both sides of the candidate self-join
    // candidate pruning, both rules LOSSLESS (PPJoin):
    //  - length filter: Jaccard ≥ τ forces τ·max(n_a,n_b) ≤ min —
    //    wildly different sizes can't qualify;
    //  - positional filter: overlap ≤ min(n_a−rn_a, n_b−rn_b) + 1 for
    //    the shared token's positions, and a qualifying pair needs
    //    o ≥ ⌈τ/(1+τ)·(n_a+n_b)⌉. Lossless because the globally
    //    SMALLEST common token's row carries a bound ≥ the true
    //    overlap (all common tokens rank at or after it in both
    //    docs), so at least one row per qualifying pair survives.
    //    Measured at sf0.1/τ=1/2: 409k → 125k candidate pairs.
    val cand = prefix.select(col(idCol).as("id_a"), col("__tok"),
        col("__rn").as("__ra"), col("__n").as("__na"))
      .join(prefix.select(col(idCol).as("id_b"), col("__tok"),
        col("__rn").as("__rb"), col("__n").as("__nb")), Seq("__tok"))
      .filter(col("id_a") < col("id_b") &&
        col("__na") * tauNum <= col("__nb") * tauDen &&
        col("__nb") * tauNum <= col("__na") * tauDen &&
        (least(col("__na") - col("__ra"), col("__nb") - col("__rb")) +
          1) * (tauNum + tauDen) >= (col("__na") + col("__nb")) * tauNum)
      .select("id_a", "id_b").distinct()
    // verify: two id-keyed joins pull the full sets (compact array
    // payloads — shuffle hash join on id at scale, AQE broadcasts
    // when the corpus side fits), one codegen array_intersect each
    cand
      .join(sets.select(col(idCol).as("id_a"), col("__set").as("__sa")),
        Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("__set").as("__sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long")
          .as("n_inter"),
        (size(col("__sa")) + size(col("__sb"))).cast("long").as("__nn"))
      .withColumn("n_union", col("__nn") - col("n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_union") * tauNum)
      .select(col("id_a"), col("id_b"),
        col("n_inter").cast("bigint").as("n_inter"),
        col("n_union").cast("bigint").as("n_union"),
        floor(col("n_inter") * 1000000L / col("n_union"))
          .cast("bigint").as("jac_micros"))
  }

  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** All-pairs n-gram Jaccard above a threshold, exact: prefix-free
    * candidate generation by sharing at least one shingle (explode +
    * self-join on shingle), then exact verify. Quadratic only within a
    * shingle's posting list — acceptable for moderately sized corpora /
    * after boilerplate-shingle removal (`maxDocFreq` caps posting lists,
    * dropping ubiquitous shingles the way CCNet drops boilerplate).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // single-pass codegen shingle hashing (see ShingleHashes scaladoc):
    // identical set semantics to the string form, ~20x cheaper
    // lower() first: ShingleHashes folds ASCII only; Spark lower()
    // makes the set semantics full-Unicode, matching the DuckDB oracle
    val sh = df.select(col(idCol), graft.functions.ShingleHashes
        .shingleHashes(lower(col(textCol)), shingleLen).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val posting = sh.select(col(idCol), explode(col("__sh")).as("shingle"))
    val sizes = sh.select(col(idCol), size(col("__sh")).as("__n"))

    if (maxDocFreq == Int.MaxValue) {
      // Exact count-based verify: shingle sets are distinct per doc, so
      // the number of times a pair co-occurs in the posting join IS
      // |A ∩ B|, and jaccard = c / (|A| + |B| - c). No shingle array
      // ever enters a shuffle and there is no per-pair set arithmetic —
      // the whole operator is two shuffles (posting join + pair count).
      val counts = posting.select(col("shingle"), col(idCol).as("id_a"))
        .join(posting.select(col("shingle"), col(idCol).as("id_b")),
          Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("__c"))
      counts
        .join(sizes.select(col(idCol).as("id_a"), col("__n").as("na")), "id_a")
        .join(sizes.select(col(idCol).as("id_b"), col("__n").as("nb")), "id_b")
        // lossless size-ratio prefilter: jaccard >= t ⇒ t|B| <= |A| <= |B|/t
        .filter(col("na") >= col("nb") * threshold &&
          col("nb") >= col("na") * threshold)
        .withColumn("jaccard",
          round(col("__c") / (col("na") + col("nb") - col("__c")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    } else {
      // Scale path with boilerplate-shingle pruning (CCNet-style): the
      // capped posting lists undercount c, so candidates verify against
      // the full shingle sets.
      val freq = posting.groupBy("shingle").count()
        .filter(col("count") <= maxDocFreq).select("shingle")
      val pruned = posting.join(freq, "shingle")
      val cand = pruned.select(col("shingle"), col(idCol).as("id_a"))
        .join(pruned.select(col("shingle"), col(idCol).as("id_b")),
          Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val sets = sh.withColumn("__n", size(col("__sh")))
      val withSets = cand
        .join(sets.select(col(idCol).as("id_a"), col("__sh").as("sh_a"),
          col("__n").as("na")), "id_a")
        .join(sets.select(col(idCol).as("id_b"), col("__sh").as("sh_b"),
          col("__n").as("nb")), "id_b")
        .filter(col("na") >= col("nb") * threshold &&
          col("nb") >= col("na") * threshold)
      withSets.withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }

  /** Connected components over a near-dup PAIR graph — the stage that
    * turns pairwise matches into dedup clusters. Min-label propagation
    * WITH pointer doubling: each round every node adopts the minimum
    * over its own label, its neighbors' labels, and its label's label
    * (the doubling step) — so convergence is O(log diameter) rounds,
    * not O(diameter): a 1M-node chain settles in ~20 rounds where
    * plain propagation would need a million. Each round is two keyed
    * joins + one aggregation, labels localCheckpointed so the loop's
    * plan stays flat. Input (id_a, id_b) pairs; output (id, component)
    * with component = min id in the component.
    */
  /** Partition-LOCAL contraction pre-pass for [[connectedComponents]]
    * — the two-level scheme production CC runs at scale: shuffle the
    * edge list once on a LOCALITY key (a spatial block, an LSH band, a
    * shard id — anything that lands most of a component's edges in one
    * partition), run an in-memory union-find per partition, and emit
    * each node's partition-local min-member label as a spanning edge
    * (id, label). The output has the SAME components as the input —
    * every original edge was union-found in exactly one partition, and
    * a node split across partitions re-connects its two labels through
    * its own id — but the diameter collapses to the cross-partition
    * chain length, so the min-label loop that follows converges in a
    * handful of rounds instead of O(log·spatial-diameter) (measured on
    * q274's proximity graph: 20 rounds → 4, 14 s → 3 s). Per-partition
    * state is O(nodes in partition) — safe wherever a partition fits
    * in executor memory, which the locality key controls.
    */
  def localContract(pairs: DataFrame, block: Column,
      nPart: Int = 0): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val n = if (nPart > 0) nPart
      else scala.util.Try(s.conf
        .get("spark.sql.shuffle.partitions", "32").toInt)
        .toOption.filter(_ > 0).getOrElse(32)
    pairs.select(col("id_a").cast("long"), col("id_b").cast("long"),
        block.as("__blk"))
      .repartition(n, col("__blk"))
      .select(col("id_a"), col("id_b")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val nxt = parent(c); parent(c) = r; c = nxt
          }
          r
        }
        it.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          // union by MIN id so every root is its component's minimum
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        // snapshot keys before the final finds: path compression
        // updates the map in place, which must not race the iterator
        parent.keys.toArray.iterator.map(id => (id, find(id)))
          .filter { case (id, root) => id != root }
      }
      .toDF("id_a", "id_b")
  }

  def connectedComponents(
      pairs: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    try {
      while (!converged && round < maxRounds) {
        // each node pulls the min label over itself and its neighbors
        val neighborLabels = edges
          .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .select(col("src").as("id"), col("component"))
        // pointer doubling: chase one link of the label chain — my
        // label's current label is also an upper bound on my component
        val chased = labels.as("a")
          .join(labels.as("b"), col("a.component") === col("b.id"))
          .select(col("a.id").as("id"), col("b.component").as("component"))
        // one aggregation computes BOTH the new label (min over self +
        // neighbors + chased) and the old one (each id occurs exactly
        // once in `labels`, so max over the tagged copy recovers it) —
        // the convergence probe is then a filter over the checkpoint,
        // not an extra per-round shuffle join against the old labels
        val next = labels.withColumn("__old", col("component"))
          .unionByName(neighborLabels, allowMissingColumns = true)
          .unionByName(chased, allowMissingColumns = true)
          .groupBy("id").agg(min(col("component")).as("component"),
            max(col("__old")).as("__old"))
          .localCheckpoint(true)
        // the prior round's label checkpoint is dead once `next` is
        // materialized — drop its blocks now instead of letting
        // O(rounds) copies pile up in a long-lived session; re-point
        // `labels` at the new checkpoint IMMEDIATELY so the failure
        // handler below always owns the newest materialized blocks
        Checkpoints.drop(labels)
        labels = next
        // null-safe comparison: `labels` covers every edge endpoint by
        // construction, so __old is never null today — but if that
        // invariant ever broke (an id appearing only via neighborLabels
        // or chased), `=!=` would null-drop the row and silently count
        // it as converged. `<=>` turns such a break into extra rounds
        // (and ultimately the no-fixpoint error) instead of a premature
        // fixpoint with wrong labels.
        converged = next.filter(!(col("component") <=> col("__old"))).isEmpty
        labels = next.select("id", "component")
        round += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds — " +
            "component min-label distance exceeds 2^rounds; raise maxRounds")
    } catch { case t: Throwable =>
      // any failure path (no-fixpoint, a failed probe action, a lost
      // executor) abandons the newest labels checkpoint — drop it so
      // a caught exception leaks nothing
      Checkpoints.drop(labels)
      throw t
    } finally {
      // the edge-list checkpoint is dead on BOTH paths: the final
      // labels checkpoint is self-contained on success, and the catch
      // above released it on failure
      Checkpoints.drop(edges)
    }
    labels
  }

  /** Hamming-distance-1 near-duplicate pairs by POSITION-MASK blocking
    * (the FastSS / deletion-neighborhood trick, restricted to
    * substitutions): every string explodes to `length` variants, each
    * with one position deleted (the position rides in the join key, so
    * no sentinel is needed and equal key lengths force equal string
    * lengths), and two strings are
    * Hamming-1 neighbors iff they share a masked variant — so the
    * all-pairs comparison collapses to an equi-join on (position,
    * masked key) whose cost is Σ block-size², with blocks = strings
    * identical everywhere but one position (typically single digits).
    * This is the record-linkage analog of MinHash banding: candidates
    * from hash buckets, never a cross join — at 100 TB the quadratic
    * scan simply does not exist to optimize. A pair differing at
    * exactly one position meets in exactly ONE block (its differing
    * position), so no dedup pass is needed; identical strings (lev 0)
    * would meet in every block and are removed by the `levenshtein =
    * 1` post-filter, which also serves as the declared exactness
    * check. Output: (id_a, id_b, pos) with id_a < id_b.
    */
  def hamming1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // spread before the ×|s| deletion-neighborhood explode (the
    // single-row-group scan otherwise runs it in one task), and
    // checkpoint it once — BOTH sides of the blocking self-join
    // consume this frame, and Spark has no cross-alias subplan reuse
    val masked = graft.Tables.spread(
        df.select(col(idCol).as("__id"), col(strCol).as("__s")))
      .select(col("__id"), col("__s"), explode(transform(
        sequence(lit(1), length(col("__s"))),
        i => struct(i.as("pos"),
          concat(col("__s").substr(lit(1), i - 1),
            col("__s").substr(i + 1, length(col("__s"))))
            .as("k")))).as("__m"))
      .select(col("__id"), col("__s"),
        col("__m.pos").as("pos"), col("__m.k").as("k"))
      .localCheckpoint()
    masked.select(col("pos"), col("k"),
        col("__id").as("id_a"), col("__s").as("__sa"))
      .join(masked.select(col("pos"), col("k"),
        col("__id").as("id_b"), col("__s").as("__sb")), Seq("pos", "k"))
      .filter(col("id_a") < col("id_b"))
      .filter(levenshtein(col("__sa"), col("__sb")) === 1)
      .select(col("id_a"), col("id_b"), col("pos"))
  }

  /** Triangle statistics over an undirected graph — the clustering/
    * cohesion companion to [[connectedComponents]]: one row with
    * (n_nodes, n_edges, n_wedges, n_triangles). Edges are canonicalized
    * (least/greatest, self-loops and duplicates dropped) and then
    * ORIENTED from the (degree, node)-smaller endpoint to the larger —
    * the standard degree-orientation trick: every out-neighborhood is
    * bounded by O(√m) on any graph (arboricity bound), so the wedge
    * join generates Σ d_out² = O(m^1.5) candidates instead of the
    * Σ d² a hub-pivoted enumeration pays — the difference between a
    * feasible and an impossible pass when one celebrity node has 10⁸
    * neighbors. Each unordered triangle is counted exactly once: its
    * three nodes have a strict (degree, node) total order x<y<z, the
    * wedge is generated only at pivot x with (y, z) ordered, and the
    * closing edge y→z is oriented that way by construction. Everything
    * is joins + aggregates — no driver-side collection; the canonical
    * edge list, degree table, and oriented edge list are each
    * localCheckpointed once and reused, and the wedge stream is
    * consumed in a SINGLE pass: the closing-edge probe is a left join
    * whose hit flag is summed alongside the wedge count in one
    * aggregate — materializing or re-generating the O(m^1.5) wedge
    * set twice is exactly the cost this operator exists to avoid.
    */
  def triangleStats(edges0: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges0.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("a").as("n"))
      .unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, struct(col("a").as("x"), col("b").as("y"),
          col("db").as("dy")))
        .otherwise(struct(col("b").as("x"), col("a").as("y"),
          col("da").as("dy"))).as("o"))
      .select(col("o.x").as("x"), col("o.y").as("y"), col("o.dy").as("dy"))
      .localCheckpoint(true)
    val wedges = oriented.select(col("x"), col("y").as("y1"),
        col("dy").as("d1"))
      .join(oriented.select(col("x"), col("y").as("y2"),
        col("dy").as("d2")), Seq("x"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("y1") < col("y2")))
    // single wedge pass: closing edges are unique per (y1, y2), so the
    // left join preserves wedge multiplicity and the hit-flag sum IS
    // the triangle count
    val wedgeStats = wedges.join(
        oriented.select(col("x").as("y1"), col("y").as("y2"),
          lit(1L).as("__hit")),
        Seq("y1", "y2"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(wedgeStats)
  }

  /** Dedup keeper election from a pair graph: every clustered id maps
    * to its component's keeper (the minimum id — matching exactDedup's
    * min-keeper convention). Ids in no pair are implicitly their own
    * keeper and absent from the output.
    */
  def keeperPerCluster(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("id"), col("component").as("keeper_id"))
      .filter(col("id") =!= col("keeper_id"))

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` word-`shingleLen`-grams with ANY benchmark document —
    * the standard eval-leakage scrub for LLM training corpora (GPT-3
    * appendix C / PaLM-style n-gram collision). The benchmark side is
    * tiny relative to the corpus: its distinct shingles BROADCAST, so
    * the corpus-side cost is one explode + a broadcast semi-ish join +
    * per-doc count — no corpus×benchmark shuffle at any scale.
    *
    * Returns (idCol, n_overlap) for CONTAMINATED docs only.
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    val benchShingles = benchmark
      .select(explode(graft.functions.ShingleHashes
        .shingleHashes(lower(col(textCol)), shingleLen)).as("__s"))
      .distinct()
    val corpusShingles = corpus
      .select(col(idCol), explode(graft.functions.ShingleHashes
        .shingleHashes(lower(col(textCol)), shingleLen)).as("__s"))
    corpusShingles.join(broadcast(benchShingles), Seq("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Bloom-filter decontamination — the ZERO-SHUFFLE scale twin of
    * [[decontaminate]]. The benchmark's distinct shingle hashes fold
    * into a fixed-size Bloom sketch (`stat.bloomFilter`, a distributed
    * treeAggregate; only the sketch reaches the driver, never rows),
    * which is embedded as a BINARY literal so every corpus document
    * counts its flagged shingles in ONE per-row projection —
    * `size(filter(shingles, might_contain))`: no explode, no join, no
    * shuffle anywhere in the corpus path, vs the exact operator's
    * explode + broadcast join + groupBy. At 100 TB that is a map-only
    * scan instead of a corpus-wide shuffle; the price is false
    * POSITIVES bounded by `fpp` (never false negatives — both
    * directions asserted in DedupSpec against [[decontaminate]]).
    * The sketch (Spark's deterministic Murmur3 `BloomFilter`) costs
    * ~1.2·n·log2(1/fpp) bits — MBs for eval-benchmark-sized sets.
    *
    * Returns (idCol, n_overlap_bloom) for docs with ≥ `minOverlap`
    * bloom-flagged shingles.
    */
  def bloomDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minOverlap: Int = 1,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val benchShingles = benchmark
      .select(explode(graft.functions.ShingleHashes
        .shingleHashes(lower(col(textCol)), shingleLen)).as("__s"))
      .distinct()
    // the sketch needs an item estimate up front; counting the (small)
    // benchmark side is one cheap job on the side that is NOT 100 TB
    val nItems = math.max(1L, benchShingles.count())
    val bloom = benchShingles.stat.bloomFilter(col("__s"), nItems, fpp)
    val bytes = {
      val b = new java.io.ByteArrayOutputStream()
      bloom.writeTo(b)
      b.toByteArray
    }
    val bloomLit = Literal.create(bytes,
      org.apache.spark.sql.types.BinaryType)
    def mightContain(c: Column): Column =
      ColumnBridge.column(
        BloomFilterMightContain(bloomLit, ColumnBridge.expression(c)))
    corpus
      .select(col(idCol),
        size(filter(graft.functions.ShingleHashes
            .shingleHashes(lower(col(textCol)), shingleLen),
          s => mightContain(s))).as("n_overlap_bloom"))
      .filter(col("n_overlap_bloom") >= minOverlap)
  }

  /** Engine-PORTABLE Bloom decontamination — the md5-k-hash twin of
    * [[bloomDecontaminate]] (round-18, the q55/q58/q59 portable-family
    * pattern): same zero-join corpus path, but the sketch is an
    * explicit `mBits`-bit bitmap whose `kHashes` positions per shingle
    * are md5-hex slices (`conv(substr(md5(g), 1+8i, 8), 16, 10) %
    * mBits`, Kirsch-Mitzenmacher-free because the slices of one digest
    * are already independent), so a DuckDB oracle reproduces the EXACT
    * membership — bit-for-bit, false positives included — via the
    * equivalent position-set semi-join. Spark's `stat.bloomFilter`
    * (murmur3, engine-specific layout) stays the production default;
    * this variant makes the whole operator hash-gateable.
    *
    * Shape at scale is identical to the engine-native path: the
    * benchmark side (tiny — the eval suite, never the 100 TB corpus)
    * folds to ≤ kHashes·|shingles| distinct bit positions, collected
    * once to the driver and embedded as ONE array literal
    * (mBits/64 longs, 128 KB at the 2^20 default); the corpus path is
    * a map-only projection — per document, count shingles whose k
    * positions are all set ([[org.apache.spark.sql.catalyst.expressions.ShiftRight]]
    * through the bridge because the functions API only takes literal
    * shift amounts). No explode, no join, no shuffle.
    *
    * Returns (idCol, n_overlap_bloom) for docs with ≥ `minOverlap`
    * flagged shingles.
    */
  def bloomDecontaminatePortable(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minOverlap: Int = 1,
      mBits: Int = 1 << 20,
      kHashes: Int = 3): DataFrame = {
    require(kHashes >= 1 && kHashes <= 4,
      s"kHashes ($kHashes) must be 1..4 (md5 yields four 32-bit slices)")
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0 && mBits % 64 == 0,
      s"mBits ($mBits) must be a power of two multiple of 64")
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.ShiftRight
    def positions(g: Column): Seq[Column] = {
      val h = md5(g)
      (0 until kHashes).map(i =>
        pmod(conv(substring(h, 1 + 8 * i, 8), 16, 10).cast("long"),
          lit(mBits.toLong)))
    }
    // fold the benchmark's distinct shingles to their distinct bit
    // positions (k rows per shingle — the only non-map stage, on the
    // side that is NOT 100 TB), then set the bits driver-side
    val benchShingles = benchmark
      .select(explode(TextAnalysis.wordShingles(col(textCol), shingleLen))
        .as("__g"))
      .distinct()
    val posDf = positions(col("__g"))
      .map(p => benchShingles.select(p.as("p")))
      .reduce(_.unionByName(_)).distinct()
    val words = new Array[Long](mBits / 64)
    posDf.collect().foreach { r =>
      val p = r.getLong(0)
      words((p / 64).toInt) |= 1L << (p % 64)
    }
    val bitmap = typedLit(words.toSeq)
    def bitSet(p: Column): Column =
      ColumnBridge.column(ShiftRight(
        ColumnBridge.expression(element_at(bitmap, (p / 64).cast("int") + 1)),
        ColumnBridge.expression(pmod(p, lit(64L)).cast("int"))))
        .bitwiseAND(lit(1L)) === lit(1L)
    // digest ONCE per shingle (transform), THEN test the k positions on
    // the hex string: higher-order lambdas are interpreted with no
    // common-subexpression elimination, so a filter computing md5(g)
    // inside each of the k position tests would run k digests/shingle
    def posOfHex(h: Column, i: Int): Column =
      pmod(conv(substring(h, 1 + 8 * i, 8), 16, 10).cast("long"),
        lit(mBits.toLong))
    def flagged(h: Column): Column =
      (0 until kHashes).map(i => bitSet(posOfHex(h, i))).reduce(_ && _)
    corpus
      .select(col(idCol),
        size(filter(
          transform(TextAnalysis.wordShingles(col(textCol), shingleLen),
            g => md5(g)),
          h => flagged(h))).as("n_overlap_bloom"))
      .filter(col("n_overlap_bloom") >= minOverlap)
  }

  /** SimHash (64-bit) per document: per-bit signed vote (`+1` if the
    * token hash has the bit set, else `-1`) summed over tokens, sign →
    * bit — computed in ONE codegen pass per document
    * ([[graft.functions.SketchSigs.simhash64]], bit-identical to the
    * explode + 64-sum groupBy form it replaces, which shuffled one row
    * per token and carried 64 aggregation buffers per doc). Token-less
    * docs are filtered (the explode form emitted no row for them).
    *
    * Returns (idCol, simhash: long).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        TextAnalysis.normalizeText(col(textCol)).as("__norm"))
      .filter(col("__norm") =!= "")
      .select(col(idCol),
        graft.functions.SketchSigs.simhash64(col("__norm")).as("simhash"))

  /** The explode + groupBy reference forms the codegen expressions
    * replaced — retained (test-only) so SketchSigsParitySpec can assert
    * bit-identical results on real corpora.
    */
  private[operators] def simhashReference(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(filter(split(TextAnalysis.normalizeText(col(textCol)), " "),
        t => t =!= "")).as("__tok"))
    val hashed = toks.withColumn("__h", xxhash64(col("__tok")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$i")
    }
    val summed = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val word = (0 until 64).map { i =>
      when(col(s"__b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    summed.select(col(idCol), word.as("simhash"))
  }

  /** See [[simhashReference]]. */
  private[operators] def minhashBandsReference(
      shingled: DataFrame, idCol: String, numHashes: Int,
      bands: Int): DataFrame = {
    val posting = shingled.select(col(idCol), explode(col("__sh")).as("__s"))
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(col("__s"), lit(i))).as(s"__m$i"))
    val sigRows = posting.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until rows).map(r => col(s"__m${b * rows + r}").cast("string")): _*),
        lit(b))
    }
    sigRows.select(col(idCol),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Hamming distance between two simhash values. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Engine-portable SimHash near-dups — the md5-seeded twin of
    * [[simhashNearDups]], the same portability construction as
    * q51/q55/q56: per-token 60-bit md5-prefix hashes (15 hex chars —
    * the widest prefix a signed-64 parse handles on both engines) and
    * per-bit votes, computed in ONE codegen pass per doc
    * ([[graft.functions.Md5SimHash60]] — no explode row-blowup, no
    * per-bit aggregation buffers; the explode form is retained below
    * as [[simhashPortableReference]] for the parity spec), then 4 ×
    * 15-bit pigeonhole banding for hamming ≤ 3 (an 8-bit/32-bit first
    * cut put ~20 docs in every one of 256 buckets on clustered
    * corpora — 2.8M candidate pairs at sf0.1; 32k buckets keep the
    * candidate set near-linear). The xxhash64 codegen path
    * ([[simhash]]) stays the production default; this variant exists
    * so a DuckDB oracle can replicate the WHOLE operator — votes,
    * signature word, banding, candidate set, and verified hamming —
    * value-for-value (q58).
    */
  def simhashNearDupsPortable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // localCheckpoint: the banding self-join reads signatures on BOTH
    // sides (one becomes a broadcast), and without materialization each
    // side re-digests the whole corpus — signatures are (id, long),
    // tiny at any corpus scale, so compute once
    val sig = df.select(col(idCol),
        TextAnalysis.normalizeText(col(textCol)).as("__norm"))
      .filter(col("__norm") =!= "")
      .select(col(idCol),
        graft.functions.Md5SimHash60.md5Simhash60(col("__norm"))
          .as("__simhash"))
      .localCheckpoint()
    simhashBandPairs(sig, idCol, nChunks = 4, chunkBits = 15, maxHamming)
  }

  /** Shared pigeonhole-banding tail for the SimHash family: split each
    * `__simhash` into `nChunks` chunks of `chunkBits`, self-join per
    * chunk, dedup candidate pairs, verify hamming. The pigeonhole
    * guarantee — every pair within `maxHamming` collides on ≥ 1
    * chunk — requires `maxHamming < nChunks`, so that is ENFORCED
    * rather than silently returning an incomplete pair set.
    */
  private def simhashBandPairs(
      sig: DataFrame,
      idCol: String,
      nChunks: Int,
      chunkBits: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < nChunks,
      s"pigeonhole banding with $nChunks chunks only guarantees candidate " +
        s"recall for hamming < $nChunks; got maxHamming=$maxHamming " +
        "(raise nChunks/shrink chunks to widen the guarantee)")
    val mask = (1L << chunkBits) - 1
    val chunkCols = (0 until nChunks).map { i =>
      shiftright(col("__simhash"), i * chunkBits).bitwiseAND(lit(mask))
    }
    val chunks = sig.select(col(idCol), col("__simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col(idCol).as("id_a"), col("__simhash").as("sh_a"),
      col("chunk_idx"), col("chunk"))
    val b = chunks.select(col(idCol).as("id_b"), col("__simhash").as("sh_b"),
      col("chunk_idx"), col("chunk"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** The explode + per-bit-vote groupBy form
    * [[graft.functions.Md5SimHash60]] replaced — retained (test-only)
    * so PortableSketchSpec can assert bit-identical signatures on
    * real corpora. Returns (idCol, __simhash).
    */
  private[graft] def simhashPortableReference(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(filter(split(TextAnalysis.normalizeText(col(textCol)), " "),
        t => t =!= "")).as("__tok"))
    val hashed = toks.withColumn("__h",
      conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$i")
    }
    val summed = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val word = (0 until 60).map { i =>
      when(col(s"__b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    summed.select(col(idCol), word.as("__simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit simhash into 4 × 16-bit
    * chunks; near-dups (hamming <= 3 < 4 bands) must collide on at least
    * one chunk (pigeonhole) → join per chunk, verify hamming.
    */
  def simhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSh = simhash(df, idCol, textCol)
      .withColumnRenamed("simhash", "__simhash")
    simhashBandPairs(withSh, idCol, nChunks = 4, chunkBits = 16, maxHamming)
  }
}
