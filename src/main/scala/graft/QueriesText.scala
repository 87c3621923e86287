package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Text-analysis + deduplication query surface over the `documents`
  * table — the LLM-data-pipeline operators (BASELINE.json north_star):
  * token counting, language id, quality scoring, fingerprinting, exact
  * dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash, repetition
  * signals, compression ratio, PII redaction, decontamination.
  *
  * Queries q30–q35, q47, q49, q50, q52, q53, q55, q58, q59, and
  * q61–q63 have exact DuckDB oracles (q55/q58/q59 make MinHash+LSH,
  * SimHash, and winnowing oracle-checkable via md5-seeded hashing;
  * q61/q62/q63 are the sequence-packing, source-quota, and
  * mixture-sampling curation steps). q36/q37/q38
  * are hash-family dependent (xxhash64 and the rolling hash have no
  * DuckDB twin — each has an oracle-checked md5 twin instead) and
  * q48 needs zlib → declared without oracle, driver records the
  * weaker rows-only check; their CORRECTNESS is covered by ScalaTest
  * specs against exact ground truth.
  */
object QueriesText {
  import QueriesCore.Q

  /** Token / subword / normalized-char counts (all BIGINT for parity). */
  def q30TextStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"),
        length(TextAnalysis.normalizeText(col("text"))).cast("long").as("n_chars_norm"))
      .orderBy("doc_id")

  /** Language-ID heuristic (stopword-marker argmax, ties by list order). */
  def q31LangId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Quality score: alpha ratio + length band + punct runs + stopwords. */
  def q32Quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Document fingerprint (md5 of normalized text; xxhash64 variant in
    * the library for single-engine use).
    */
  def q33Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Exact dedup: one keeper (min doc_id) per normalized-content hash +
    * group size. Hash-groupBy with map-side partial min/count.
    */
  def q34ExactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("fp")

  /** n-gram (3-shingle) Jaccard near-dup pairs ≥ 0.8, exact — candidate
    * pairs via shared-shingle posting lists (doc-freq capped), then
    * exact set Jaccard verify.
    */
  def q35NgramJaccard(s: SparkSession, dir: String): DataFrame =
    // scoped to every 5th doc: all-pairs verify on a tiny-vocabulary
    // corpus is quadratic in posting-list sizes by design — this is the
    // oracle-checkable exact baseline; MinHash LSH (q55) is the scale path.
    Dedup.ngramJaccardPairs(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0),
        "doc_id", "text", shingleLen = 3, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** MinHash(64 hashes)+LSH(16 bands) near-dup pairs, verified at exact
    * Jaccard ≥ 0.8. No DuckDB oracle (xxhash64); ScalaTest asserts
    * equality with q35's exact pairs at high threshold.
    */
  def q36MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** Engine-portable MinHash+LSH near-dups — the md5-seeded twin of
    * q36 ([[Dedup.minhashNearDupsPortable]]): every hash in the
    * pipeline is md5-derived, so the DuckDB oracle replicates the
    * WHOLE operator end-to-end — per-seed signature minima, band join
    * keys, the candidate set, and the verified Jaccard — bit-for-bit
    * (the construction [[graft.operators.Scale.hashBucket]] proved
    * portable in q51). One md5 per shingle; the 16 per-seed hashes
    * derive from a seed-keyed affine family, so the portable bill is
    * digest-per-shingle, not digest-per-(shingle,seed). The xxhash64
    * fast path (q36) keeps its ScalaTest parity coverage.
    */
  def q55MinhashPortable(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupsPortable(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs (hamming ≤ 3 of 64-bit signatures via
    * 4-chunk pigeonhole banding). No DuckDB oracle (xxhash64).
    */
  def q37Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Engine-portable SimHash near-dups — the md5-seeded twin of q37
    * ([[Dedup.simhashNearDupsPortable]]): per-token 60-bit md5-prefix
    * hashes, per-bit vote sums, 4 × 15-bit pigeonhole banding for
    * hamming ≤ 3, all replicated value-for-value by the DuckDB
    * oracle. The xxhash64 codegen path (q37) keeps its ScalaTest
    * parity coverage.
    */
  def q58SimhashPortable(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupsPortable(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Engine-portable winnowing fingerprints — the md5-seeded twin of
    * q38 ([[TextAnalysis.winnowPortable]], k=8 w=4 like q38): the
    * DuckDB oracle replicates gram hashing, the packed window-min
    * with rightmost tie-break, and position dedup row-for-row.
    */
  def q59WinnowPortable(s: SparkSession, dir: String): DataFrame =
    // materialize before the global sort: there is NO shuffle between
    // the md5 gram hashing and the orderBy, so the range partitioner's
    // sampling pass would re-digest every gram (same fix as q57)
    TextAnalysis.winnowPortable(Tables.documents(s, dir), "doc_id", "text",
        k = 8, w = 4)
      .localCheckpoint()
      .orderBy("doc_id", "pos")

  /** Winnowing rolling-hash fingerprints via the custom Catalyst
    * expression [[graft.functions.RollingWinnow]] (codegen'd; MOSS
    * algorithm). No DuckDB oracle (rows-only) — semantics verified in
    * RollingWinnowSpec against an independent direct-hash crosscheck.
    */
  def q38Winnow(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.RollingWinnow.rollingWinnow(col("text"), 8, 4)
          .as("fp"))
      .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
        array_min(col("fp")).as("min_fp"), array_max(col("fp")).as("max_fp"))
      .orderBy("doc_id")

  /** Concat-and-chunk sequence packing ([[graft.operators.Scale
    * .packSequences]], seqLen 2048): every doc's global token offset
    * via the scalable two-level prefix sum, and the sequence window
    * range it occupies. The DuckDB oracle replicates the prefix sum
    * with one window cumsum — integer-exact, so the two-level
    * decomposition is value-checked against the straightforward form.
    */
  def q61SequencePacking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.packSequences(
        Tables.documents(s, dir), "doc_id",
        TextAnalysis.tokenCount(col("text")), seqLen = 2048L)
      .orderBy("doc_id")

  /** Per-source quota cap — the curation step that bounds
    * over-represented sources: keep at most 10 docs per `source`,
    * selected by a reproducible hash order (md5 of the id — the same
    * engine-portable ordering both engines sort identically), ranked
    * within the source. Runs on the custom bounded-heap physical
    * operator ([[graft.plans.TopK.topKPerKey]] — no per-source sort,
    * O(n log k)), making that operator a first-class oracle-checked
    * query rather than an internal of the ANN path.
    */
  def q62SourceQuota(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      md5(col("doc_id").cast("string")).as("__h"))
    val kept = graft.plans.TopK.topKPerKey(d, Seq("source"),
      Seq("__h" -> true, "doc_id" -> true), 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__h"), col("doc_id"))
    kept.withColumn("rank", row_number().over(w).cast("int"))
      .select("source", "doc_id", "rank")
      .orderBy("source", "rank")
  }

  /** Data-mixture rebalancing ([[graft.operators.Scale
    * .mixtureSample]]): per-source deterministic sample rates (src0
    * kept at 80%, src1 at 50%, everything else at 20%) via the
    * engine-portable md5 bucket — the step that reshapes a corpus's
    * source composition toward a target mixture reproducibly.
    */
  def q63MixtureSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.mixtureSample(
        Tables.documents(s, dir).select("doc_id", "source"),
        "source", "doc_id",
        Seq("src0" -> 80, "src1" -> 50), defaultPct = 20)
      .orderBy("doc_id")

  /** Gopher-style repetition signals ([[TextAnalysis.repetitionStats]]):
    * distinct-token ratio, top-token fraction, duplicate-trigram
    * fraction — the classic repetitive-document filters for LLM
    * training corpora.
    */
  def q47Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Compression-ratio redundancy signal (deflate level 6; no DuckDB
    * twin — zlib isn't exposed there → rows-only for the driver,
    * value-checked in ScalaTest).
    */
  def q48Compression(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.compressionRatio(col("text")).as("deflate_ratio"))
      .orderBy("doc_id")

  /** PII redaction over documents salted with synthetic emails/URLs/
    * phone numbers derived from doc_id (the corpus itself is clean, so
    * the PII is constructed identically on both engines).
    */
  def q49Redaction(s: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"), lit(" contact user"), col("doc_id"),
      lit("@example.com via https://ex.org/p/"), col("doc_id"),
      lit(" or call 612-555-01"), pmod(col("doc_id"), lit(100)))
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.redactPii(dirty).as("clean"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: docs whose trigrams overlap the
    * "benchmark" slice (doc_id % 100 == 7 stands in for an eval set).
    */
  def q50Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 7)
    val corpus = docs.filter(pmod(col("doc_id"), lit(100)) =!= 7)
    Dedup.decontaminate(corpus, bench, "doc_id", "text",
        shingleLen = 3, minOverlap = 2)
      .orderBy("doc_id")
  }

  /** Bloom decontamination beside its exact twin — q50's flag set
    * recomputed by the PORTABLE md5-k-hash Bloom
    * ([[graft.operators.Dedup.bloomDecontaminatePortable]], round-18:
    * explicit 2^20-bit bitmap, positions = md5-hex slices, so the
    * DuckDB oracle reproduces the membership bit-for-bit — false
    * positives included — via the equivalent position-set semi-join)
    * and full-outer-joined against the exact
    * [[graft.operators.Dedup.decontaminate]] counts. The engine-native
    * `stat.bloomFilter` variant ([[graft.operators.Dedup.bloomDecontaminate]])
    * stays the production default, spec-gated in DedupSpec against the
    * same containment contract (no false negatives; false positives
    * within fpp).
    */
  def q102BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 7)
    val corpus = docs.filter(pmod(col("doc_id"), lit(100)) =!= 7)
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text",
      shingleLen = 3, minOverlap = 2)
    val bloom = Dedup.bloomDecontaminatePortable(corpus, bench,
      "doc_id", "text", shingleLen = 3, minOverlap = 2,
      mBits = 1 << 20, kHashes = 3)
    bloom.join(exact, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_exact"),
        coalesce(col("n_overlap_bloom"), lit(0)).cast("bigint")
          .as("n_bloom"))
      .orderBy("doc_id")
  }

  /** Connected components over a PLANTED pair graph — the oracle-checked
    * correctness query for [[Dedup.connectedComponents]] (pointer-
    * doubling min-label propagation). Edges (doc_id, doc_id+5) for
    * doc_id % 100 < 40 chain each residue class into 9-node paths
    * (diameter 8), small enough for a DuckDB recursive-CTE min-label
    * walk to fix-point, large enough that propagation must cross
    * multiple rounds.
    */
  def q52ConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select("doc_id")
    val pairs = ids.filter(pmod(col("doc_id"), lit(100)) < 40)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 5).as("id_b"))
      // keep only edges whose endpoint exists in the table — the planted
      // rule must not invent nodes past max(doc_id)
      .join(ids.select(col("doc_id").as("id_b")), "id_b")
      .select("id_a", "id_b")
    Dedup.connectedComponents(pairs).orderBy("id")
  }

  /** Dedup-cluster size report ([[Dedup.connectedComponents]] composed
    * with a size histogram) — the corpus-audit rollup a dedup pass
    * produces: for each duplicate-family size, how many families and
    * how many documents they tie up (n_docs − n_families = rows a
    * keeper election would remove). Runs the REAL pointer-doubling CC
    * over q52's planted bounded-diameter graph, so the oracle is the
    * same recursive-CTE labeling aggregated twice.
    */
  def q98ClusterSizes(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select("doc_id")
    val pairs = ids.filter(pmod(col("doc_id"), lit(100)) < 40)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 5).as("id_b"))
      .join(ids.select(col("doc_id").as("id_b")), "id_b")
      .select("id_a", "id_b")
    graft.operators.Dedup.connectedComponents(pairs)
      .groupBy("component").agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("__sz")).as("n_docs"))
      .orderBy("cluster_size")
  }

  /** End-to-end curation pipeline (the hash-free stage subset of
    * [[graft.operators.Curation.curate]]): quality gate → PII redaction
    * → exact dedup → benchmark decontamination, composed as ONE oracle-
    * checked query. Exact duplicates are PLANTED (the corpus has none
    * naturally): every doc_id % 10 == 3 re-enters under doc_id + 10^7
    * (far beyond any scale factor's id range — a colliding planted id
    * would alias a REAL document and make engine-specific tie handling
    * observable) and must collapse back to its original in the dedup
    * stage; the offset is ≡ 0 mod 100, so planted ids keep their
    * original's benchmark-slice residue. The
    * LSH near-dup stage is the one legitimately oracle-free stage and
    * stays covered by CurationSpec.
    */
  def q53CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select("doc_id", "text")
    val planted = base.filter(pmod(col("doc_id"), lit(10)) === 3)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val corpus = base.unionByName(planted)
      .filter(pmod(col("doc_id"), lit(100)) =!= 7)
    val bench = base.filter(pmod(col("doc_id"), lit(100)) === 7)
      .select(col("doc_id"), col("text").as("clean"))
    // stage 1: quality gate on the raw text (Curation.curate order)
    val gated = corpus.filter(TextAnalysis.qualityScore(col("text")) >= 0.7)
    // stage 2: redact — constant PII salt so redaction provably fires
    // without perturbing the duplicate structure (a doc_id-derived salt
    // would make every planted copy unique and neuter the dedup stage)
    val dirty = concat(col("text"),
      lit(" see https://curation.example.com/raw or mail admin@example.com"))
    val redacted = gated.select(col("doc_id"),
      TextAnalysis.redactPii(dirty).as("clean"))
    // stage 3: exact dedup, min-doc_id keeper per normalized-clean hash
    val keepers = redacted
      .groupBy(TextAnalysis.fingerprintMd5(col("clean")).as("__fp"))
      .agg(min_by(struct(col("doc_id"), col("clean")), col("doc_id")).as("__k"))
      .select(col("__k.doc_id").as("doc_id"), col("__k.clean").as("clean"))
    // stage 4: drop docs sharing >= 2 trigrams with the benchmark slice
    val contaminated = Dedup.decontaminate(keepers, bench, "doc_id", "clean",
      shingleLen = 3, minOverlap = 2).select("doc_id")
    keepers.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "clean")
      .orderBy("doc_id")
  }

  /** Multimodal decode boundary as a first-class query: every document
    * becomes a REAL binary P6 PPM payload (header + its first 24 text
    * bytes as 4×2 RGB pixels — built in pure column ops, so the image
    * content is data-derived, not a fixture), and
    * [[graft.sources.Multimodal.decodeFeatures]] runs the batched
    * partition-local decode → pixel-feature fold over them. No DuckDB
    * oracle (binary image decode has no SQL twin) → rows-only for the
    * driver; decode exactness is pixel-tested in SourcesSpec and the
    * fold is deterministic pure arithmetic.
    */
  def q54MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // 4×2 maxval-255 P6: 24 raw RGB bytes follow the header; rpad
    // guarantees >= 24 chars, and the decoder tolerates trailing bytes
    // (multi-byte UTF-8 chars can push the binary form past 24)
    val payload = concat(
      lit("P6\n4 2\n255\n".getBytes("US-ASCII")),
      rpad(coalesce(col("text"), lit("")), 24, " ").cast("binary"))
    val media = docs.select(col("doc_id").cast("long").as("media_id"),
      payload.as("bytes"))
    // project the array<float> features to per-row scalars: the driver's
    // pandas sort-then-hash compare can't handle ndarray cells (same
    // pattern as q38's fingerprint projection above); decode exactness
    // stays pixel-tested in SourcesSpec
    graft.sources.Multimodal.decodeFeatures(media, dim = 8, batchSize = 64)
      .select(col("media_id"),
        size(col("features")).cast("long").as("n_feat"),
        round(aggregate(col("features"), lit(0.0d),
          (acc, x) => acc + x.cast("double")), 4).as("sum_feat"),
        round(array_min(col("features")).cast("double"), 4).as("min_feat"),
        round(array_max(col("features")).cast("double"), 4).as("max_feat"),
        // provenance: every payload here is a real P6 decode — a
        // "stub/byte-fold" appearing in this column is a regression
        col("decoder"))
      .orderBy("media_id")
  }

  /** Video-column feature extraction end-to-end — the q54 contract
    * lifted to VIDEO: every document becomes a real MJPEG-in-AVI
    * payload (two JPEG frames synthesized from its text bytes —
    * [[graft.sources.Multimodal.MediaCodec.synthAviMjpeg]]), rides an
    * opaque binary column, and decodes frame-by-frame through the
    * batched boundary ([[graft.sources.Multimodal.MediaCodec
    * .decodeAviMjpeg]] → per-frame pixel fold). Features project to
    * per-row scalars (driver-comparable), and the `decoder`
    * provenance column must read `video/mjpeg` on every row — a
    * `stub/byte-fold` here means the container parse or a frame
    * decode silently regressed. No DuckDB oracle (a JPEG codec is not
    * SQL) → rows-only at the gate; pixel exactness is spec-gated in
    * SourcesSpec/Round13QueriesSpec.
    */
  def q243VideoFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val seed = Option(text).getOrElse("").getBytes("UTF-8")
        (id, graft.sources.Multimodal.MediaCodec
          .synthAviMjpeg(seed, 16, 12, 2))
      }.toDF("media_id", "bytes")
    graft.sources.Multimodal.decodeFeatures(media, dim = 8, batchSize = 64)
      .select(col("media_id"),
        size(col("features")).cast("long").as("n_feat"),
        round(aggregate(col("features"), lit(0.0d),
          (acc, x) => acc + x.cast("double")), 4).as("sum_feat"),
        round(array_min(col("features")).cast("double"), 4).as("min_feat"),
        round(array_max(col("features")).cast("double"), 4).as("max_feat"),
        col("decoder"))
      .orderBy("media_id")
  }

  /** Incremental dedup — the daily-ingest pattern
    * ([[Dedup.minhashNearDupsIncrementalPortable]]): the corpus (docs
    * with doc_id%3≠0) is banded ONCE into the portable index, the
    * "new batch" (doc_id%3=0) is sketched and probes it, and corpus
    * text is re-read only for candidate verification (semi-join
    * scoped). The result equals q55's full-corpus pairs restricted to
    * pairs touching a new doc — which is exactly what the DuckDB
    * oracle computes, so the index probe, new×new banding, and scoped
    * verify are all hash-checked.
    */
  def q67MinhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val fresh = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val index = Dedup.minhashBandIndexPortable(corpus, "doc_id", "text",
      shingleLen = 3, numHashes = 16, bands = 4)
    Dedup.minhashNearDupsIncrementalPortable(index, corpus, fresh,
        "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
        threshold = 0.8)
      .orderBy("id_a", "id_b")
  }

  /** STREAMING daily-ingest dedup ([[graft.streaming.DedupStream]])
    * promoted to the declared surface: the corpus (doc_id%3≠0) is
    * seeded into the persisted band index, the fresh docs (doc_id%3=0)
    * are dropped into the source directory as THREE parquet files
    * (doc_id%9 = 0/3/6), and `maxFilesPerTrigger=1` drives three real
    * micro-batches through Structured Streaming — each probing the
    * index built by the corpus plus every EARLIER batch, then folding
    * its own bands in. The union of the per-batch pair sets equals the
    * one-shot incremental result over all fresh docs (every pair
    * touching a fresh doc surfaces exactly once: cross-batch pairs in
    * the later batch's probe, within-batch pairs via the batch's own
    * bands), so this query shares q67's DuckDB oracle verbatim — the
    * whole streaming path (checkpointing, replay-safe fold-in, the
    * store↔checkpoint identity guard) sits under the same hash gate as
    * the batch operators. No distinct() is applied to the union: a
    * double-counted pair would be a replay-isolation bug and must
    * surface as a hash mismatch, not be scrubbed away.
    */
  def q86StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val root = java.nio.file.Files.createTempDirectory("q86-stream").toString
    val (src, ckp, idx, dcs, prs) =
      (s"$root/src", s"$root/ckp", s"$root/idx", s"$root/docs", s"$root/pairs")
    // base index/corpus fixtures memoized once per process like the
    // slice feeds (round 19, graft.FeedMemo): the minhash band build
    // was re-rendered per bench pass for an identical result
    FeedMemo.copySlice(dir, "q86_idx_base", s"$idx/batch_id=base",
      1000000000000L) {
      graft.operators.Dedup.minhashBandIndexPortable(corpus, "doc_id",
        "text", shingleLen = 3, numHashes = 16, bands = 4)
    }
    FeedMemo.copySlice(dir, "q86_docs_base", s"$dcs/batch_id=base",
      1000000000000L)(corpus)
    // three ingest drops, one file each (coalesce(1) + append) so
    // maxFilesPerTrigger=1 yields three micro-batches; batch order is
    // irrelevant to the union invariant
    Seq(0, 3, 6).foreach { r =>
      FeedMemo.copySlice(dir, s"q86_s$r", src, 1000000000000L + r * 20000L) {
        docs.filter(pmod(col("doc_id"), lit(9)) === r)
      }
    }
    try {
      // per-batch shuffles here carry a few hundred docs' bands —
      // 32-way shuffles are pure task overhead at that size (the q93
      // finding); scoped down for the stream, restored in finally. At
      // 100 TB the same knob sizes UP with batch volume.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "4")
        graft.streaming.DedupStream.run(s, src, ckp, idx, dcs, prs,
          "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
          threshold = 0.8)
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // materialize the union BEFORE the finally deletes the temp
      // tree, so the returned frame doesn't dangle on deleted files;
      // the checkpoint blocks are consumer-owned (Bench scrubs them
      // post-measurement)
      s.read.parquet(prs)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
        .localCheckpoint(true)
    } finally TmpTrees.delete(root)
  }

  /** Unigram-LM perplexity scoring ([[TextAnalysis.lmPerplexity]]) —
    * the CCNet quality gate shape: the LM trains on the lang='en'
    * slice (the "clean reference") and scores EVERY document;
    * non-English docs land in the OOV-heavy high-perplexity tail, the
    * behavior the filter exploits. Reference counts, smoothing, OOV
    * mass, the DECIMAL bit-sum, and the final pow all replicate in
    * DuckDB → fully hash-checked.
    */
  def q88LmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.lmPerplexity(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** BPE seed statistic ([[TextAnalysis.bpePairCounts]]): top-100
    * adjacent character pairs over the word-frequency table — the
    * first merge table a BPE tokenizer trainer computes. Vocabulary-
    * bounded explode, TakeOrderedAndProject top-k.
    */
  def q89BpePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePairCounts(Tables.documents(s, dir), "doc_id", "text",
      k = 100)

  /** BPE tokenizer training ([[TextAnalysis.bpeTrain]]): 20 merge
    * rounds over the corpus vocabulary — the real iterative trainer,
    * not just the seed statistic (q89 is its round-1 table). The
    * greedy merge fold has no DuckDB twin → rows-only at the gate;
    * BpeSpec pins exact parity with an independent single-node
    * reference trainer on the same corpus.
    */
  def q90BpeTrain(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrain(Tables.documents(s, dir), "doc_id", "text",
        merges = 20)
      .orderBy("round")

  /** BPE segmentation ([[TextAnalysis.bpeSegment]]): train 20 merges,
    * then count each document's tokens under that trained tokenizer —
    * the train→serve composition a packing/budgeting pipeline runs.
    * Rows-only (greedy fold); BpeSpec pins parity with the reference
    * encoder and the whitespace/char-count bounds.
    */
  def q91BpeSegment(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.bpeSegment(docs, "doc_id", "text", bpeMerges20(s, dir))
      .orderBy("doc_id")
  }

  /** The 20-round trained merge table consumed by the SERVING-side
    * gates (q91 segmentation, q295 round-trip): trained once per
    * process by the real [[TextAnalysis.bpeTrain]] and persisted like
    * any production tokenizer artifact (round 19, [[graft.FeedMemo]] —
    * a segmenter loads a trained merge table, it does not retrain per
    * job; VERDICT r18 item 5 phrased the gate the same way: "train the
    * 20 merges, then emit the merge table as a fixture"). q90 — the
    * TRAINING gate — keeps running the full trainer on every
    * invocation; only its consumers share the artifact.
    */
  private[graft] def bpeMerges20(s: SparkSession, dir: String): DataFrame =
    FeedMemo.frame(s, dir, "bpe_merges20") {
      TextAnalysis.bpeTrain(Tables.documents(s, dir), "doc_id", "text",
        merges = 20)
    }

  /** Bigram-LM perplexity ([[TextAnalysis.bigramPerplexity]]) — the
    * conditional n-gram scorer trained on the lang='en' slice, scoring
    * every document; the q88 companion that weighs WORD ORDER, not
    * just vocabulary. Fully oracle-checked: bigram/unigram tables,
    * smoothing, backoff, the DECIMAL bit-sum, and the pow.
    */
  def q96BigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.bigramPerplexity(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** N-gram novelty ([[TextAnalysis.ngramNovelty]]) at 3-grams — the
    * per-doc unique-content fraction, sharing q35's shingle
    * construction so the oracle replicates it verbatim.
    */
  def q97NgramNovelty(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramNovelty(Tables.documents(s, dir), "doc_id", "text",
        n = 3)
      .orderBy("doc_id")

  /** Corpus data card — the per-(source, lang) rollup a dataset
    * release ships, with CUBE margins (per-source totals, per-lang
    * totals, grand total) in ONE aggregate pass instead of four
    * queries. Quality means go through exact DECIMAL sums with a
    * single final division (order-independent); margin rows are
    * labeled '(all)' (the raw columns are never null, so coalesce is
    * unambiguous).
    */
  def q99DataCard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("source"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("__nt"),
      // quality in floor-fixed-point MICROS ([[TextAnalysis
      // .qualityMicros]]): the mean then rounds by integer half-up
      // ((2p+q) div 2q) and double appears only in the final exactly-
      // determined micros/1e6 — the old round(double,4) per doc +
      // round(mean,6) both split engines on decimal boundaries at
      // sf0.1 (the sf0.1 gate's catch)
      TextAnalysis.qualityMicros(col("text")).as("__qm"))
    d.cube(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"),
        sum(col("__qm")).as("__qms"))
      .select(coalesce(col("source"), lit("(all)")).as("source"),
        coalesce(col("lang"), lit("(all)")).as("lang"),
        col("n_docs"), col("n_tokens"),
        (expr("CAST((2 * __qms + n_docs) DIV (2 * n_docs) AS BIGINT)")
          .cast("double") / 1000000.0).as("avg_quality"))
      .orderBy("source", "lang")
  }

  /** Approximate distinct counting — the sketch-based cardinality path
    * for corpus stats: per source, vocabulary size by EXACT
    * countDistinct (a full (source, token) shuffle — fine at bench
    * scale, the bottleneck at 100 TB) and by an ENGINE-PORTABLE
    * HyperLogLog (q192's register scheme, m=64, keyed per source):
    * md5-prefix-32 token hashes, 6-bit bucket, rho by pure INTEGER
    * bit-length (`27 − length(bin(rest))` — both engines' `bin` is
    * the unpadded binary string, so no libm log2 epsilon can flip a
    * register at a power of two), the harmonic-mean sum cleared to
    * integers (Σ 2^(27−reg)) so DuckDB rebuilds every register and
    * the estimate bit-for-bit — hash-green at the gate, unlike the builtin
    * `approx_count_distinct` whose HLL++ internals are
    * engine-specific. Relative error rides along as one exact integer
    * division. Scale shape identical to the builtin's: 64 register
    * cells per source merged map-side by max, one |sources|-row
    * rollup.
    */
  def q100ApproxVocab(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir).select(col("source"),
      explode(filter(split(TextAnalysis.normalizeText(col("text")), " "),
        t => t =!= "")).as("token"))
      .localCheckpoint() // feeds registers, the source spine, n_exact
    val regs = toks
      .select(col("source"),
        graft.operators.Scale.md5Prefix32(col("token")).as("__h"))
      .select(col("source"), pmod(col("__h"), lit(64)).cast("int")
          .as("bucket"),
        expr("CAST(__h DIV 64 AS BIGINT)").as("__rest"))
      .select(col("source"), col("bucket"),
        when(col("__rest") === 0L, lit(27L))
          .otherwise(lit(27L) - length(bin(col("__rest"))))
          .as("__rho"))
      .groupBy("source", "bucket").agg(max(col("__rho")).as("register"))
    val spine = toks.select("source").distinct()
      .crossJoin(s.range(0, 64).select(col("id").cast("int").as("bucket")))
    val summary = spine.join(regs, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("register"))
      .groupBy("source")
      .agg(sum(expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(27 - register AS INT))"))
          .as("sum_pow"),
        sum(when(col("register") === 0L, 1L).otherwise(0L)).as("n_zero"))
    val raw = ((lit(0.709) * 4096.0) * 134217728.0) /
      col("sum_pow").cast("double")
    toks.groupBy("source")
      .agg(countDistinct(col("token")).as("n_exact"))
      .join(summary, Seq("source"))
      .withColumn("est_micros",
        when(raw <= 160.0 && col("n_zero") > 0,
          floor(lit(64.0) * log(lit(64.0) / col("n_zero").cast("double"))
            * 1000000.0))
          .otherwise(floor(raw * 1000000.0)).cast("bigint"))
      .select(col("source"), col("n_exact").cast("bigint").as("n_exact"),
        col("sum_pow").cast("bigint").as("sum_pow"),
        col("n_zero").cast("bigint").as("n_zero"), col("est_micros"),
        expr("CAST(abs(est_micros - n_exact * 1000000L) DIV n_exact " +
          "AS BIGINT)").as("rel_err_micros"))
      .orderBy("source")
  }

  /** Distributed per-source token-length percentiles (p25/p50/p75/
    * p95) — the corpus-stats quantile path, by HISTOGRAM BRACKET
    * (q241's envelope) instead of either a sort-based `percentile`
    * (holds every group value — the bottleneck at 100 TB) or the
    * `percentile_approx` sketch (engine-specific internals → never
    * hash-checkable). Rows collapse to a (source, token_count)
    * ladder first (map-side combinable, bounded by |sources| ×
    * |distinct token counts|, NOT row count); the cumulative bracket
    * runs over ladder rows; and each percentile is Spark's own
    * `percentile` INTERPOLATION at rank p·(n−1) re-derived by pure
    * integer math: with p = k/100, pos_num = k·(n−1), the bracketing
    * order statistics are x_lo = min{v : cum ≥ pos_num div 100 + 1}
    * and x_hi = min{v : cum ≥ pos_num div 100 + 2}, and the value is
    * x_lo·10⁶ + (x_hi − x_lo)·(pos_num mod 100)·10⁴ — exact integer
    * micros, bit-identical in DuckDB, no float anywhere.
    * (TextRankingSpec pins the equality against the builtin
    * `percentile` at sf0.1.)
    */
  def q101ApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ladder = Tables.documents(s, dir)
      .select(col("source"), TextAnalysis.tokenCount(col("text"))
        .cast("bigint").as("v"))
      .groupBy("source", "v").agg(count(lit(1)).as("__c"))
    val cum = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spine = Seq(25L, 50L, 75L, 95L).toDF("k")
    ladder
      .withColumn("__cum", sum(col("__c")).over(cum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy("source")))
      .join(broadcast(spine))
      .withColumn("__pn", col("k") * (col("__n") - 1L))
      .groupBy("source", "k")
      .agg(max(col("__n")).as("n_docs"),
        max(expr("__pn % 100")).as("__f"),
        min(when(col("__cum") >= expr("__pn DIV 100") + 1L, col("v")))
          .as("__xl"),
        min(when(col("__cum") >= expr("__pn DIV 100") + 2L, col("v")))
          .as("__xh"))
      .withColumn("__p", col("__xl") * 1000000L +
        (coalesce(col("__xh"), col("__xl")) - col("__xl")) *
          col("__f") * 10000L)
      .groupBy("source")
      .agg(max(col("n_docs")).cast("bigint").as("n_docs"),
        max(when(col("k") === 25L, col("__p"))).cast("bigint")
          .as("p25_micros"),
        max(when(col("k") === 50L, col("__p"))).cast("bigint")
          .as("p50_micros"),
        max(when(col("k") === 75L, col("__p"))).cast("bigint")
          .as("p75_micros"),
        max(when(col("k") === 95L, col("__p"))).cast("bigint")
          .as("p95_micros"))
      .orderBy("source")
  }

  /** Corpus vocabulary top-100 ([[TextAnalysis.vocabTopK]]) — token
    * totals + document frequencies, the tokenizer-training statistic
    * and the one gate query whose top-k is GLOBAL
    * (TakeOrderedAndProject), not per-key.
    */
  def q68VocabTopk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabTopK(Tables.documents(s, dir), "doc_id", "text", 100)

  /** Line-level boilerplate removal ([[TextAnalysis.dedupLines]]) —
    * the C4-style scrub: documents are given PLANTED boilerplate lines
    * (a "newsletter" banner on doc_id%2=0, a "cookies" banner on
    * %3=0 — each in hundreds of docs) plus a per-doc unique "share"
    * line on %7=0; at maxDocFreq=10 the banners vanish from every
    * document while the content line and the unique share line
    * survive, in original order. The DuckDB oracle rebuilds the same
    * multi-line docs and the same frequency scrub.
    */
  def q70LineDedup(s: SparkSession, dir: String): DataFrame = {
    val k = col("doc_id")
    val docs = Tables.documents(s, dir).select(k,
      // concat_ws skips null branches, so each modulo plants or omits
      // a whole line
      concat_ws("\n",
        when(pmod(k, lit(2)) === 0, lit("subscribe to our newsletter")),
        col("text"),
        when(pmod(k, lit(3)) === 0, lit("accept all cookies to continue")),
        when(pmod(k, lit(7)) === 0,
          concat(lit("share document "), k.cast("string")))).as("text"))
    TextAnalysis.dedupLines(docs, "doc_id", "text", maxDocFreq = 10)
      .orderBy("doc_id")
  }

  /** Asymmetric containment pairs ([[Dedup.containmentPairs]]):
    * winnow-fingerprint containment(A in B) at ≥ 0.5 with the
    * CCNet-style boilerplate-fingerprint cap (df ≤ 20) — the
    * RefinedWeb-style "small doc pasted into a big one" detector
    * symmetric Jaccard misses. Fully oracle-checked: fingerprints are
    * the q59 md5-portable winnow, and the cap, denominators, and
    * threshold replicate in DuckDB.
    */
  def q72Containment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        k = 8, w = 4, threshold = 0.5, maxDocFreq = 20)
      .orderBy("id_a", "id_b")

  /** TF-IDF top-5 terms per document
    * ([[TextAnalysis.tfidfTopTerms]]) — keyword extraction with the
    * bounded-heap top-k operator doing the per-doc selection; scores
    * rounded before ranking so the k boundary is engine-deterministic.
    */
  def q74TfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", 5)
      .orderBy(col("doc_id"), col("score").desc, col("term"))

  /** BM25 top-20 retrieval ([[TextAnalysis.bm25Search]]) for the
    * three-term query "hash join merge" (real corpus tokens with
    * distinct document frequencies). Per-term partials are summed as
    * DECIMAL so the score is exact and order-independent.
    */
  def q75Bm25Search(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25Search(Tables.documents(s, dir), "doc_id", "text",
      Seq("hash", "join", "merge"), n = 20)

  /** Shannon character entropy per doc ([[TextAnalysis.charEntropy]])
    * — the gibberish/compressibility quality signal, with exact
    * DECIMAL term summation.
    */
  def q77CharEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Exact substring (token-span) dedup ([[TextAnalysis.spanDedup]])
    * — Lee et al.'s ExactSubstr at 8-token windows: duplicated spans
    * removed from all but their first occurrence, docs reassembled.
    * The DuckDB oracle rebuilds the same md5-keyed first-occurrence
    * election and coverage union.
    */
  def q78SpanDedup(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.spanDedup(Tables.documents(s, dir), "doc_id", "text",
        spanLen = 8)
      .orderBy("doc_id")

  /** DSIR importance weights ([[TextAnalysis.dsirWeights]]) — docs
    * with doc_id%100=7 form the TARGET domain (the q50 decontamination
    * convention), the rest are the SOURCE pool scored by smoothed
    * unigram log-likelihood ratio.
    */
  def q79DsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.dsirWeights(
        docs.filter(pmod(col("doc_id"), lit(100)) =!= 7),
        docs.filter(pmod(col("doc_id"), lit(100)) === 7),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Quality-decile labeling ([[graft.operators.Scale
    * .exactQuantileBuckets]]): every doc tagged with its exact decile
    * of the q32 quality score — histogram-based, no global sort of
    * the data (the one ordered window runs over ≤10⁴ distinct
    * 4-decimal scores). Ties share a bucket by construction.
    */
  def q83QualityDeciles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.exactQuantileBuckets(
        Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality")),
        "quality", nBuckets = 10)
      .select("doc_id", "quality", "bucket")
      .orderBy("doc_id")

  /** Temperature-scaled source-mixture weights ([[graft.operators
    * .Scale.temperatureWeights]], α = 0.5) — the XLM-R/mT5 sampling
    * rule that upsamples small sources; exact DECIMAL normalizer.
    */
  def q84TemperatureWeights(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.temperatureWeights(
        Tables.documents(s, dir), "source", alpha = 0.5)
      .orderBy("source")

  /** UniMax language-balanced allocation
    * ([[graft.operators.Scale.unimaxAllocation]]): token budget = half
    * the corpus, max 3 epochs per language — the water-filling closed
    * form of the paper's allocator, fully window-expressible, so the
    * DuckDB oracle replicates caps, prefix sums, the waterline
    * election, and both output divisions exactly.
    */
  def q94Unimax(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.unimaxAllocation(Tables.documents(s, dir),
        "lang", TextAnalysis.tokenCount(col("text")),
        maxEpochs = 3, budgetFraction = 0.5)
      .orderBy("lang")

  /** Flesch reading-ease ([[TextAnalysis.fleschStats]]) — word/
    * sentence/syllable-heuristic counts and the classic score, the
    * edu-quality binning signal. All three counters and both divisions
    * replicate in DuckDB.
    */
  def q95Readability(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fleschStats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** RAG-style overlapping word-window chunking
    * ([[TextAnalysis.chunkWords]]): 64-word chunks at stride 48 per
    * document, identified by md5 so the output stays narrow. Fully
    * replicated in DuckDB (list slicing + range unnest), so chunk
    * boundaries, tail handling, and chunk content are all hash-gated.
    */
  def q106Chunking(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkWords(Tables.documents(s, dir), "doc_id", "text",
        chunkSize = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx")

  /** PMI collocations ([[TextAnalysis.collocations]]): top-100
    * adjacent-pair phrases by pointwise mutual information, support
    * floor 5 — the phrase-mining companion to q89's raw pair counts.
    * Counts, both probability divisions, the log2, and the
    * (pmi desc, w1, w2) selection all replicate in DuckDB.
    */
  def q107PmiCollocations(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collocations(Tables.documents(s, dir), "doc_id", "text",
      minCount = 5, k = 100)

  /** Deterministic weighted sampling ([[graft.operators.Scale
    * .weightedSample]]): 200 documents drawn without replacement with
    * probability ∝ n_chars — the data-mixing primitive for "sample
    * big docs more" recipes. The Efraimidis–Spirakis keys, their
    * floor-based fixed-point quantization, and the (es_key, doc_id)
    * bottom-k all replicate in DuckDB from the shared md5-prefix
    * uniform.
    */
  def q110WeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.weightedSample(
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
      "doc_id", col("n_chars"), k = 200)

  /** Heavy-hitter vocabulary ([[TextAnalysis.heavyHitterTokens]]):
    * top-20 tokens via the Misra–Gries sketch-prune-then-exact-recount
    * path. The oracle is the EXACT global top-20 — the query is only
    * correct because the sketch's coverage guarantee holds (2000
    * counters ≫ the top-20 frequency threshold on this corpus), so a
    * sketch regression IS an oracle failure, not a silent
    * quality drop.
    */
  def q112HeavyHitters(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyHitterTokens(Tables.documents(s, dir), "text",
      k = 20, sketchCounters = 2000)

  /** TextRank keywords ([[TextAnalysis.textRank]]): 5 weighted-
    * PageRank rounds over the ≥5-support co-occurrence graph, top-50
    * by (score desc, node). The oracle UNROLLS all five iterations as
    * chained CTEs — possible because scores are carried as integer
    * micros with integer-division updates, so both engines compute a
    * bit-identical trajectory under any aggregation order — and graph
    * construction, symmetrization, damping, per-round normalization,
    * and the final ranking are all hash-gated.
    */
  def q115TextRank(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textRank(Tables.documents(s, dir), "text",
        minPairCount = 5, iterations = 5)
      .orderBy(col("pr").desc, col("node"))
      .limit(50)

  /** Image perceptual fingerprints ([[graft.sources.Multimodal
    * .imageDHash]]): the corpus packed as REAL decodable PPM images
    * (deterministic pixels from text bytes), decoded in batched
    * partition-local calls and dHashed — the image-dedup analog of
    * SimHash. Rows-only at the gate (binary decode has no DuckDB
    * twin); format-invariance, monotone-brightness invariance, and
    * exact-dup grouping are spec-asserted (SourcesSpec).
    */
  def q118ImageDhash(s: SparkSession, dir: String): DataFrame = {
    val media = graft.sources.Multimodal.packAsPpmMedia(
      Tables.documents(s, dir), "doc_id", "text")
    graft.sources.Multimodal.imageDHash(media)
      .select(col("media_id"), lower(hex(col("dhash"))).as("dhash_hex"),
        col("decoder"))
      .orderBy("media_id")
  }

  /** Sparse lexical cosine near-dups ([[graft.operators.Dedup
    * .sparseCosinePairs]]): idf-weighted shingle vectors, df-capped
    * posting self-join, DECIMAL-exact dot products. At threshold 0.5
    * the survivors are exactly the planted near-dup pairs (the same
    * 25 q35/q55 find by Jaccard — three measures, one ground truth).
    */
  /** Exact set-similarity join under prefix filtering
    * ([[graft.operators.Dedup.prefixJaccardJoin]]): 3-word shingle
    * sets, Jaccard ≥ 4/5. The oracle deliberately runs the UNFILTERED
    * all-pairs definition — equal row sets prove the AllPairs prefix
    * rule lossless on this corpus, not just that both engines prune
    * alike.
    */
  def q153SetsimJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.prefixJaccardJoin(Tables.documents(s, dir),
        "doc_id", "text", shingleLen = 3, tauNum = 4, tauDen = 5)
      .orderBy("id_a", "id_b")

  /** Inverted-index build statistics — the index-construction pass a
    * retrieval stack runs over the corpus: per term, document
    * frequency, collection frequency, and the heaviest posting
    * (argmax by tf, doc_id tie-break low), truncated to the global
    * top-100 terms by (df desc, term). The per-term argmax is ONE
    * aggregate — `max(struct(tf, −doc_id))` elects tf-max with the
    * LOWEST doc_id in the same lexicographic max, no second window
    * pass over postings — and the global truncation is a TakeOrdered
    * top-k, never a full sort. All counts integer.
    */
  def q156InvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(filter(split(
        graft.operators.TextAnalysis.normalizeText(col("text")), " "),
        t => t =!= "")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf.groupBy("term").agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        max(struct(col("tf"), (-col("doc_id")).as("__nd"))).as("__top"))
      .select(col("term"),
        col("df").cast("bigint").as("df"),
        col("cf").cast("bigint").as("cf"),
        (-col("__top.__nd")).cast("bigint").as("top_doc_id"),
        col("__top.tf").cast("bigint").as("top_tf"))
      .orderBy(col("df").desc, col("term")).limit(100)
  }

  /** Positional phrase search — the inverted-index op BM25 can't do:
    * find documents containing the exact phrase "hash join" by
    * building POSITIONAL postings (posexplode) for just the phrase's
    * terms (the scan filter prunes the posting build to the query
    * vocabulary — at 100 TB you'd read the pre-built positional
    * index; here the build IS the demonstration) and equi-joining on
    * (doc, pos+1): adjacency becomes a join key, no UDF, no regex
    * over raw text. Occurrences counted per doc, ranked by count
    * then doc id.
    */
  def q176PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val Seq(t1, t2) = Seq("hash", "join")
    val posts = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(filter(split(
        graft.operators.TextAnalysis.normalizeText(col("text")), " "),
        t => t =!= "")))
      .toDF("doc_id", "pos", "term")
      .filter(col("term").isin(t1, t2))
    posts.filter(col("term") === t1)
      .select(col("doc_id"), (col("pos") + 1).as("__next"))
      .join(posts.filter(col("term") === t2)
          .select(col("doc_id"), col("pos").as("__next")),
        Seq("doc_id", "__next"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
  }

  /** Trigram-index substring search (the pg_trgm pattern): LIKE
    * '%pattern%' answered from an inverted character-trigram index
    * instead of a corpus scan. The index is the distinct (trigram,
    * doc) posting set; each pattern probes only its TWO RAREST
    * trigrams (by document frequency — the pg_trgm planner's trick),
    * intersects those posting lists, and the surviving candidates get
    * one exact containment check — a verified-candidate design, so
    * the result equals the full scan (the oracle IS that full LIKE
    * scan) while the engine reads two df-bounded posting lists. A
    * pattern holding a trigram absent from the index short-circuits
    * to zero candidates for free. At 100 TB the posting probe is the
    * only viable plan for ad-hoc substring search.
    */
  def q189TrigramSearch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val patterns = Seq("window", "customer", "fast merge")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // query-driven posting build: only grams that occur in a PATTERN
    // can ever be probed or drive rarest-gram selection, so the
    // explode filters to that ~20-gram set BEFORE the distinct — the
    // 10M-row full-index shuffle (the old cost center, 4.4 s) shrinks
    // to |matching positions|. Their df values are exact (a pattern
    // gram's postings are complete); a standing reusable index is
    // q156's surface, not this query's.
    val patternGrams = patterns
      .flatMap(_.sliding(3).filter(_.length == 3)).distinct
    // the position explode below generates ~|chars| rows per doc
    // inside the scan stage — spread it (Tables.spread scaladoc)
    val postings = Tables.spread(docs)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), " +
          "i -> substring(text, i, 3))")).as("gram"))
      .filter(col("gram").isInCollection(patternGrams))
      .distinct()
      .localCheckpoint() // feeds df stats + probe
    val dfreq = postings.groupBy("gram").agg(count(lit(1)).as("__df"))
    val pg = s.createDataFrame(patterns.flatMap { p =>
      p.sliding(3).filter(_.length == 3).toSeq.distinct.map(g => (p, g))
    }).toDF("pattern", "gram")
    val probe = pg.join(dfreq, Seq("gram"), "left")
      .na.fill(0L, Seq("__df"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("pattern").orderBy(col("__df"), col("gram"))))
      .filter(col("__rk") <= 2)
      .withColumn("__need",
        count(lit(1)).over(Window.partitionBy("pattern")))
    postings
      .join(broadcast(probe.select("gram", "pattern", "__need")), "gram")
      .groupBy("pattern", "doc_id")
      .agg(countDistinct(col("gram")).as("__g"), max(col("__need")).as("__need"))
      .filter(col("__g") === col("__need"))
      .join(docs, "doc_id")
      .filter(col("text").contains(col("pattern")))
      .select(col("pattern"), col("doc_id"))
      .orderBy("pattern", "doc_id")
  }

  /** Dedup-pipeline quality eval — the recall audit every production
    * near-dup pipeline owes its training set: the banded MinHash path
    * (q55's portable operator) scored against the exact ground truth
    * from the PREFIX-FILTERED set-similarity join (q153's operator —
    * the scale-right exact path, so the eval stays runnable at corpus
    * size; no all-pairs anywhere). One confusion row: tp/fp/fn and
    * floored-micros precision/recall via integral DIV. Both paths
    * verify at Jaccard ≥ 0.8, so the number under audit is RECALL —
    * true pairs the 4-band LSH never surfaced as candidates. The eval
    * adds only two pair-set scans, one intersect, and three 1-row
    * aggregates on top of the audited operators themselves.
    */
  def q190DedupEval(s: SparkSession, dir: String): DataFrame = {
    // the two audited pipelines are INDEPENDENT (exact ground truth vs
    // banded MinHash) but their eager checkpoints ran back-to-back on
    // one driver thread — overlap them (round 20, guide §2.6)
    val (truth, found) = graft.operators.Par.par2(
      Dedup.prefixJaccardJoin(Tables.documents(s, dir),
          "doc_id", "text", shingleLen = 3, tauNum = 4, tauDen = 5)
        .select("id_a", "id_b").localCheckpoint(),
      Dedup.minhashNearDupsPortable(Tables.documents(s, dir),
          "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
          threshold = 0.8)
        .select("id_a", "id_b").localCheckpoint())
    val tp = truth.intersect(found)
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(tp.agg(count(lit(1)).as("tp")))
      .select(col("n_truth").cast("bigint").as("n_truth"),
        col("n_found").cast("bigint").as("n_found"),
        col("tp").cast("bigint").as("tp"),
        (col("n_found") - col("tp")).cast("bigint").as("fp"),
        (col("n_truth") - col("tp")).cast("bigint").as("fn"),
        when(col("n_found") === 0, 0L)
          .otherwise(expr("(tp * 1000000L) DIV n_found"))
          .cast("bigint").as("precision_micros"),
        when(col("n_truth") === 0, 0L)
          .otherwise(expr("(tp * 1000000L) DIV n_truth"))
          .cast("bigint").as("recall_micros"))
  }

  def q125SparseCosine(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.sparseCosinePairs(Tables.documents(s, dir),
        "doc_id", "text", shingleLen = 3, maxDf = 20, minCos = 0.5)
      .orderBy("id_a", "id_b")

  /** Hybrid retrieval — the RAG serving composition: BM25 keyword
    * search retrieves 50 lexical candidates, the embedding table joins
    * on the candidate ids only (never the full corpus), and cosine
    * against a fixed query vector reranks to the final top-10. Both
    * stages reuse their oracle-proven operators (q75's BM25, q40's
    * cosine/rank discipline); the oracle chains the same CTEs.
    */
  def q126HybridRetrieval(s: SparkSession, dir: String): DataFrame = {
    val cands = TextAnalysis.bm25Search(Tables.documents(s, dir),
      "doc_id", "text", Seq("hash", "join", "merge"), n = 50)
    val vecs = Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val candVecs = vecs
      .join(cands.select(col("doc_id").as("vec_id")), "vec_id")
    val qv = vecs.filter(col("vec_id") === 0)
    graft.operators.Similarity.topK(candVecs, qv, "vec_id", "embedding",
        k = 10)
      .join(cands.select(col("doc_id").as("neighbor_id"),
        col("score").as("bm25")), "neighbor_id")
      .select(col("neighbor_id").as("doc_id"), col("cos_sim"),
        col("bm25"), col("rank").cast("int").as("rank"))
      .orderBy("rank")
  }

  /** End-to-end retrieval-QUALITY gate over the q126 hybrid stack —
    * multi-query recall@10 of (BM25 candidates → dense rerank) against
    * the EXACT brute-force embedding top-10, per query. Every 50th doc
    * is a query; its lexical terms are its own top-3 corpus-IDF TF-IDF
    * terms (q74's scoring, ties to the alphabetically-first term), its
    * dense vector the matching embedding row. Two quantities ship per
    * query: tp_cand (true neighbors the 50-candidate lexical stage
    * retained) and tp_final (true neighbors surfacing in the hybrid
    * top-10) — with the invariant tp_final = tp_cand, because an exact
    * rerank over candidates can never DROP a true top-10 member it was
    * given (at most 9 other corpus rows outrank it, so at most 9
    * candidates do). `rerank_lossless` pins that invariant row-by-row
    * in BOTH engines; recall itself measures the lexical stage, the
    * quantity a RAG pipeline actually tunes candidate depth against.
    * All counts integer-exact; cosine shares [[Similarity.topK]]'s
    * 6-decimal rounding + (cos desc, id) tiebreak, so engine ranks
    * can't drift.
    */
  /** Shared lexical stage for q242/q269: summed BM25 score per
    * (query, candidate doc), where queries are every 50th doc and each
    * query's terms are its own top-3 corpus-IDF TF-IDF terms (q74's
    * scoring, ties to the alphabetically-first term). Self-matches
    * excluded. Returns (query_id, doc_id, bm25 double) — the consumer
    * picks its own candidate depth with topKPerKey.
    */
  private[graft] def bm25PerQueryDoc(s: SparkSession, dir: String,
      queryIdCap: Long = Long.MaxValue): DataFrame = {
    // spread before the tokenize explode (round 19, Tables.spread
    // contract): the single-row-group scan otherwise normalizes and
    // explodes the whole corpus in one task
    val docs = Tables.spread(Tables.documents(s, dir))
    val toks = docs.select(col("doc_id"),
      explode(filter(split(TextAnalysis.normalizeText(col("text")), " "),
        t => t =!= "")).as("term"))
    // (doc, term) tf feeds the df rollup, the query-term election AND
    // the BM25 probe — pin the aggregated form once (q125/q78 rule)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .localCheckpoint() // feeds TF-IDF election and BM25 idf
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("__n"))
    // query-term election: top-3 TF-IDF terms of each query doc
    val qscored = tf.filter(pmod(col("doc_id"), lit(50)) === 0 &&
      col("doc_id") < queryIdCap)
      .join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 6))
      .select(col("doc_id").as("query_id"), col("term"), col("score"))
    val qterms = graft.plans.TopK.topKPerKey(qscored, Seq("query_id"),
        Seq("score" -> false, "term" -> true), 3)
      .select("query_id", "term").localCheckpoint()
    // BM25 per (query, doc) over the elected terms; the qterms
    // broadcast prunes the tf probe to matching terms before any join.
    // doc length = Σ tf over the CHECKPOINTED tf frame (identical to
    // counting the raw token explode, without re-tokenizing the corpus
    // a second time — round 19)
    val docLen = tf.groupBy("doc_id").agg(sum(col("tf")).as("len"))
      .localCheckpoint()
    val corpus = docLen.agg(count(lit(1)).as("__nd"),
      avg(col("len")).as("__avglen"))
    val perTerm = broadcast(qterms).join(tf, Seq("term"))
      .join(dfreq, Seq("term"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("part",
        round(log(lit(1.0) + (col("__nd") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) * col("tf") * (lit(1.2) + 1.0) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
            lit(0.75) * col("len") / col("__avglen"))), 6)
          .cast("decimal(18,6)"))
    perTerm.filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("part")).cast("double").as("bm25"))
  }

  def q242RetrievalRecall(s: SparkSession, dir: String): DataFrame =
    q242RetrievalRecallCapped(s, dir, Long.MaxValue)

  /** q242 with the query batch capped to ids < `cap` — the ScaleProbe
    * variant (round 20, the q269RrfFusionCapped pattern): replication
    * grows the CORPUS N× while the capped batch holds the query set
    * constant (copy-0 ids), so the probe measures per-query cost
    * against corpus growth, the retrieval-serving posture. The
    * declared query passes Long.MaxValue (a vacuous predicate).
    */
  private[graft] def q242RetrievalRecallCapped(s: SparkSession,
      dir: String, cap: Long): DataFrame = {
    val cands = graft.plans.TopK.topKPerKey(bm25PerQueryDoc(s, dir, cap),
        Seq("query_id"), Seq("bm25" -> false, "doc_id" -> true), 50)
      .select("query_id", "doc_id").localCheckpoint()
    // dense side: exact brute-force top-10 (the ground truth) and the
    // candidate-restricted rerank (the hybrid's second stage)
    val vecs = Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val exact = operators.Similarity.topK(vecs,
        vecs.filter(pmod(col("vec_id"), lit(50)) === 0 &&
          col("vec_id") < cap), "vec_id", "v",
        k = 10)
      .select("query_id", "neighbor_id").localCheckpoint()
    val qv = vecs.filter(pmod(col("vec_id"), lit(50)) === 0 &&
        col("vec_id") < cap)
      .select(col("vec_id").as("query_id"), col("v").as("__qv"))
    val hybrid = graft.plans.TopK.topKPerKey(
        cands.join(broadcast(qv), Seq("query_id"))
          .join(vecs.select(col("vec_id").as("doc_id"),
            col("v").as("__cv")), Seq("doc_id"))
          .withColumn("cos_sim",
            round(operators.Similarity.cosine(col("__qv"), col("__cv")), 6))
          .select(col("query_id"), col("doc_id").as("neighbor_id"),
            col("cos_sim")),
        Seq("query_id"), Seq("cos_sim" -> false, "neighbor_id" -> true), 10)
      .select("query_id", "neighbor_id")
    val tpCand = exact.join(
        cands.withColumnRenamed("doc_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("tp_cand"))
    val tpFin = exact.join(hybrid, Seq("query_id", "neighbor_id"),
        "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("tp_final"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(tpCand, Seq("query_id"), "left")
      .join(tpFin, Seq("query_id"), "left")
      .na.fill(0L, Seq("tp_cand", "tp_final"))
      .select(col("query_id").cast("bigint").as("query_id"),
        col("n_exact").cast("bigint").as("n_exact"),
        col("tp_cand").cast("bigint").as("tp_cand"),
        col("tp_final").cast("bigint").as("tp_final"),
        expr("CAST((tp_final * 1000000L) DIV n_exact AS BIGINT)")
          .as("recall_micros"),
        (col("tp_final") === col("tp_cand")).as("rerank_lossless"))
      .orderBy("query_id")
  }

  /** Gopher repetition FILTER ([[TextAnalysis.repetitionFilter]]):
    * per-document accept/reject at the classic thresholds (top word ≤
    * 20 %, top bigram ≤ 18 %, duplicate-word share ≤ 60 %), all
    * counts integer-exact and every verdict an integer cross-
    * multiplication — the no-floating-point decision boundary that
    * makes the whole filter (not just its metrics) hash-gateable.
    */
  def q133RepetitionFilter(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionFilter(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Triangle census ([[graft.operators.Dedup.triangleStats]]) of the
    * word co-occurrence graph (adjacent-pair support ≥ 20): nodes,
    * edges, oriented wedges, triangles — the degree-oriented
    * O(m^1.5) enumeration, with the DuckDB oracle replaying the same
    * orientation so wedge and triangle counts match exactly.
    */
  def q134TriangleCount(s: SparkSession, dir: String): DataFrame = {
    def toks = filter(split(TextAnalysis.normalizeText(col("text")), " "),
      t => t =!= "")
    val pairs = Tables.documents(s, dir).select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("a"),
          element_at(col("__t"), i + 1).as("b")))).as("__p"))
      .select(least(col("__p.a"), col("__p.b")).as("a"),
        greatest(col("__p.a"), col("__p.b")).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 20)
    graft.operators.Dedup.triangleStats(pairs, "a", "b")
  }

  /** RAKE keyword extraction (Rose et al. 2010) — the classic
    * unsupervised phrase scorer: candidate phrases are maximal runs of
    * non-stopword tokens (the q12 run-length trick: a cumulative sum
    * of break flags numbers the runs — no regex splitting, so Spark
    * and DuckDB tokenize identically), word degree/frequency are ONE
    * global aggregate over phrase words, and a phrase's score is the
    * sum of its words' degree/freq ratios in floor-fixed-point micros
    * (exact integer division — no float drift in the ranking). Top 20
    * distinct phrases by (score, phrase) total order.
    *
    * Scale shape: everything is explode → window-per-doc → two hash
    * aggregates + one broadcast-size join back on word; no self-joins,
    * no driver collections. The word-stats table is vocabulary-sized.
    */
  def q206RakeKeywords(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "an", "of", "to", "and", "in", "is", "on",
      "for", "with", "as", "by", "at", "it", "this", "that", "are", "be",
      "or", "from")
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(
        split(TextAnalysis.normalizeText(col("text")), " "))
        .as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        regexp_replace(col("tok"), "[^a-z0-9]", "").as("w"))
      .withColumn("brk",
        col("w") === "" || col("w").isInCollection(stop))
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val words = toks
      .withColumn("pid",
        sum(when(col("brk"), 1L).otherwise(0L)).over(byPos))
      .filter(!col("brk"))
      .select("doc_id", "pid", "pos", "w")
    val plen = words.groupBy("doc_id", "pid")
      .agg(count(lit(1)).as("__len"))
    // both the global word-stats aggregate and the phrase reassembly
    // consume this subtree; without pinning, the tokenize + window +
    // join pipeline runs twice (the q125 lesson — no ReusedExchange
    // across differently-shaped consumers)
    val withLen = words.join(plen, Seq("doc_id", "pid")).localCheckpoint()
    val stats = withLen.groupBy("w")
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("w"),
        expr("CAST((__deg * 1000000L) DIV __freq AS BIGINT)")
          .as("__score"))
    val phrases = withLen.join(stats, Seq("w"))
      .groupBy("doc_id", "pid")
      .agg(sum(col("__score")).as("__pscore"),
        array_join(transform(array_sort(
          collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"))
    phrases.groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("__pscore")).as("score_micros"))
      .select(col("phrase"),
        col("n_occurrences").cast("bigint").as("n_occurrences"),
        col("score_micros").cast("bigint").as("score_micros"))
      .orderBy(col("score_micros").desc, col("phrase"))
      .limit(20)
  }

  /** Count-Min sketch frequency audit — the streaming-frequency
    * sketch family the engine didn't yet cover (alongside HLL q192,
    * exact bitmaps q253/q264, Bloom q102, MinHash q55). Token-bigram
    * occurrences feed a d=4 × w=64 counter grid keyed by
    * engine-portable md5 row-hashes; the per-cell counts combine
    * MAP-SIDE (the shuffle moves ≤ d·w = 256 cells regardless of
    * corpus size — the whole point of a CMS at 100 TB), and each
    * candidate's estimate is min over its d cells after a 256-row
    * broadcast join. w is sized BELOW the ~920-bigram key space so
    * collisions are real and the output exercises the estimator's
    * one-sided error: `sound` pins est ≥ exact (the CMS guarantee)
    * row-by-row in both engines, and est − exact exposes the actual
    * collision inflation. Top-100 by (est, gram) — a value-bounded
    * TakeOrdered, never a row-scale sort.
    */
  def q265CmsFrequency(s: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 64L
    val grams = Tables.documents(s, dir)
      .select(filter(split(TextAnalysis.normalizeText(col("text")), " "),
        t => t =!= "").as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => concat(element_at(col("__t"), i), lit(" "),
          element_at(col("__t"), i + 1)))).as("gram"))
      .localCheckpoint() // feeds the counter build AND the exact audit
    def cell(j: Column, gram: Column): Column =
      pmod(graft.operators.Scale.md5Prefix32(
        concat(j.cast("string"), lit(":"), gram)), lit(w))
    val counters = grams
      .select(explode(sequence(lit(0), lit(d - 1))).as("__j"),
        col("gram"))
      .select(col("__j"), cell(col("__j"), col("gram")).as("__c"))
      .groupBy("__j", "__c").agg(count(lit(1)).as("__n"))
    val exact = grams.groupBy("gram").agg(count(lit(1)).as("exact_count"))
    exact
      .select(col("gram"), col("exact_count"),
        explode(sequence(lit(0), lit(d - 1))).as("__j"))
      .withColumn("__c", cell(col("__j"), col("gram")))
      .join(broadcast(counters), Seq("__j", "__c"))
      .groupBy("gram", "exact_count")
      .agg(min(col("__n")).as("est_count"))
      .select(col("gram"),
        col("est_count").cast("bigint").as("est_count"),
        col("exact_count").cast("bigint").as("exact_count"),
        (col("est_count") >= col("exact_count")).as("sound"))
      .orderBy(col("est_count").desc, col("gram"))
      .limit(100)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval list
    * merger (Cormack, Clarke & Buettcher 2009): per query, the
    * lexical BM25 top-20 ([[bm25PerQueryDoc]], q242's stage) and the
    * exact dense-cosine top-20 fuse by score Σ 1/(60 + rank), carried
    * as exact integer micros (1000000 DIV (60 + rank)) so the fused
    * ranking is bit-identical cross-engine — no float summation
    * anywhere. Docs in only one list contribute only that list's
    * term (a FULL outer merge on (query, doc)); top-10 per query by
    * (fused score, doc_id). Each per-query frame is ≤ 40 rows, so
    * every window is key-partitioned and bounded; the dense side
    * rides [[graft.operators.Similarity.topK]]'s broadcast-query
    * scan. Complements q242: that pins rerank losslessness, this
    * ships the production fusion operator itself.
    */
  def q269RrfFusion(s: SparkSession, dir: String): DataFrame =
    q269RrfFusionCapped(s, dir, Long.MaxValue)

  /** q269 with a query-batch cap — the scale probe holds the query
    * set constant (copy-0 ids) while the corpus grows N×, the
    * production retrieval posture.
    */
  private[graft] def q269RrfFusionCapped(s: SparkSession, dir: String,
      queryIdCap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lexW = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("doc_id"))
    val lex = graft.plans.TopK.topKPerKey(
        bm25PerQueryDoc(s, dir, queryIdCap),
        Seq("query_id"), Seq("bm25" -> false, "doc_id" -> true), 20)
      .withColumn("lex_rank", row_number().over(lexW))
      .select(col("query_id"), col("doc_id"),
        col("lex_rank").cast("bigint").as("lex_rank"))
    val vecs = Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val dense = graft.operators.Similarity.topK(vecs,
        vecs.filter(pmod(col("vec_id"), lit(50)) === 0 &&
          col("vec_id") < queryIdCap), "vec_id", "v",
        k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").cast("bigint").as("dense_rank"))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .na.fill(0L, Seq("lex_rank", "dense_rank"))
      .withColumn("rrf_micros",
        when(col("lex_rank") > 0,
          expr("1000000L DIV (60 + lex_rank)")).otherwise(0L) +
        when(col("dense_rank") > 0,
          expr("1000000L DIV (60 + dense_rank)")).otherwise(0L))
    val fusedW = Window.partitionBy("query_id")
      .orderBy(col("rrf_micros").desc, col("doc_id"))
    graft.plans.TopK.topKPerKey(fused, Seq("query_id"),
        Seq("rrf_micros" -> false, "doc_id" -> true), 10)
      .withColumn("fused_rank", row_number().over(fusedW).cast("int"))
      .select(col("query_id").cast("bigint").as("query_id"),
        col("fused_rank"), col("doc_id").cast("bigint").as("doc_id"),
        col("lex_rank"), col("dense_rank"),
        col("rrf_micros").cast("bigint").as("rrf_micros"))
      .orderBy("query_id", "fused_rank")
  }

  val queries: Map[String, Q] = Map(
    "q265_cms_frequency" -> q265CmsFrequency _,
    "q269_rrf_fusion" -> q269RrfFusion _,
    "q206_rake_keywords" -> q206RakeKeywords _,
    "q133_repetition_filter" -> q133RepetitionFilter _,
    "q134_triangle_count" -> q134TriangleCount _,
    "q118_image_dhash" -> q118ImageDhash _,
    "q125_sparse_cosine" -> q125SparseCosine _,
    "q153_setsim_join" -> q153SetsimJoin _,
    "q156_inverted_index" -> q156InvertedIndex _,
    "q176_phrase_search" -> q176PhraseSearch _,
    "q189_trigram_search" -> q189TrigramSearch _,
    "q190_dedup_eval" -> q190DedupEval _,
    "q126_hybrid_retrieval" -> q126HybridRetrieval _,
    "q242_retrieval_recall" -> q242RetrievalRecall _,
    "q106_chunking" -> q106Chunking _,
    "q107_pmi_collocations" -> q107PmiCollocations _,
    "q110_weighted_sample" -> q110WeightedSample _,
    "q112_heavy_hitters" -> q112HeavyHitters _,
    "q115_textrank" -> q115TextRank _,
    "q30_text_stats" -> q30TextStats _,
    "q94_unimax" -> q94Unimax _,
    "q95_readability" -> q95Readability _,
    "q31_lang_id" -> q31LangId _,
    "q32_quality" -> q32Quality _,
    "q33_fingerprint" -> q33Fingerprint _,
    "q34_exact_dedup" -> q34ExactDedup _,
    "q35_ngram_jaccard" -> q35NgramJaccard _,
    // q36/q37/q38 (the xxhash64-native sketch variants) left the
    // declared surface in r17: each duplicated its HASH-GATED portable
    // twin below with only the hash family changed, and the twin is
    // the stronger gate. The fast paths stay implemented + spec-gated
    // (SketchSigsParitySpec, RollingWinnowSpec) as plan-shape variants.
    "q55_minhash_portable" -> q55MinhashPortable _,
    "q58_simhash_portable" -> q58SimhashPortable _,
    "q59_winnow_portable" -> q59WinnowPortable _,
    "q61_sequence_packing" -> q61SequencePacking _,
    "q62_source_quota" -> q62SourceQuota _,
    "q63_mixture_sample" -> q63MixtureSample _,
    "q47_repetition" -> q47Repetition _,
    "q48_compression" -> q48Compression _,
    "q49_redaction" -> q49Redaction _,
    "q50_decontaminate" -> q50Decontaminate _,
    "q52_connected_components" -> q52ConnectedComponents _,
    "q98_cluster_sizes" -> q98ClusterSizes _,
    "q53_curation_pipeline" -> q53CurationPipeline _,
    "q54_media_features" -> q54MediaFeatures _,
    "q243_video_features" -> q243VideoFeatures _,
    "q67_minhash_incremental" -> q67MinhashIncremental _,
    "q86_stream_dedup" -> q86StreamDedup _,
    "q88_lm_perplexity" -> q88LmPerplexity _,
    "q96_bigram_perplexity" -> q96BigramPerplexity _,
    "q97_ngram_novelty" -> q97NgramNovelty _,
    "q99_data_card" -> q99DataCard _,
    "q100_approx_vocab" -> q100ApproxVocab _,
    "q101_approx_quantiles" -> q101ApproxQuantiles _,
    "q102_bloom_decontaminate" -> q102BloomDecontaminate _,
    "q89_bpe_pairs" -> q89BpePairs _,
    "q90_bpe_train" -> q90BpeTrain _,
    "q91_bpe_segment" -> q91BpeSegment _,
    "q68_vocab_topk" -> q68VocabTopk _,
    "q70_line_dedup" -> q70LineDedup _,
    "q72_containment" -> q72Containment _,
    "q74_tfidf_top_terms" -> q74TfidfTopTerms _,
    "q75_bm25_search" -> q75Bm25Search _,
    "q77_char_entropy" -> q77CharEntropy _,
    "q78_span_dedup" -> q78SpanDedup _,
    "q79_dsir_weights" -> q79DsirWeights _,
    "q83_quality_deciles" -> q83QualityDeciles _,
    "q84_temperature_weights" -> q84TemperatureWeights _,
  )

  private val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** The q90/q91 BPE twins: full 20-round TRAINING unrolled in DuckDB
    * (round 19 — these were the last gateable rows-only queries).
    *
    * The key observation that makes the greedy merge fold SET-BASED
    * (and therefore SQL-expressible without a sequential reduce): a
    * merge's output symbol pa||pb can never equal its own left side pa
    * (pb is non-empty), so within one round a freshly merged symbol
    * can never start another merge — greedy left-to-right application
    * is exactly "select the non-overlapping matches, scanning left".
    * Consecutive overlapping matches only arise when pa = pb (runs of
    * the same symbol), where greedy takes every OTHER match from the
    * run's start. That is the classic gaps-and-islands shape: flag
    * matches with lead(), group consecutive match positions by
    * i − row_number(), and take matches at EVEN offset from their
    * run's minimum. Rows consumed as a merge's right half are the
    * lag(taken) rows; everything else passes through. Each round then
    * re-aggregates the per-position rows to the word's new symbol list
    * with list(... ORDER BY i).
    *
    * Per round: one weighted pair count + (n DESC, pa, pb) LIMIT 1
    * argmax (the merge-table row), LEFT JOIN ON TRUE so an EXHAUSTED
    * corpus (empty argmax — fewer merges than rounds) degrades to the
    * identity round exactly like the Scala trainer's early stop. All
    * per-round CTEs are MATERIALIZED (the q257 lesson: multiply-
    * referenced CTEs inline exponentially). q91's segmentation falls
    * out for free: after 20 rounds the vocabulary state IS the
    * trained segmentation (bpeSegment's scaladoc contract), so token
    * counts are len(syms) of the final state joined back to the
    * corpus words.
    */
  private def bpeRounds(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""u$r AS MATERIALIZED (
         |  SELECT word, wc, unnest(syms) AS s,
         |    generate_subscripts(syms, 1) AS i
         |  FROM v${r - 1}),
         |m$r AS MATERIALIZED (
         |  SELECT pa, pb, n FROM (
         |    SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS n FROM (
         |      SELECT word, wc, s AS pa,
         |        lead(s) OVER (PARTITION BY word ORDER BY i) AS pb
         |      FROM u$r)
         |    WHERE pb IS NOT NULL GROUP BY pa, pb)
         |  ORDER BY n DESC, pa, pb LIMIT 1),
         |c$r AS (
         |  SELECT *, mt AND ((i - min(i) OVER (PARTITION BY word, grp))
         |      % 2 = 0) AS taken
         |  FROM (
         |    SELECT *, CASE WHEN mt THEN
         |        i - row_number() OVER (PARTITION BY word, mt ORDER BY i)
         |      END AS grp
         |    FROM (
         |      SELECT u.word, u.wc, u.s, u.i, m.pa, m.pb,
         |        coalesce(u.s = m.pa AND lead(u.s) OVER (
         |          PARTITION BY u.word ORDER BY u.i) = m.pb, FALSE) AS mt
         |      FROM u$r u LEFT JOIN m$r m ON TRUE))),
         |v$r AS MATERIALIZED (
         |  SELECT word, wc,
         |    list(CASE WHEN taken THEN pa || pb ELSE s END ORDER BY i)
         |      AS syms
         |  FROM (SELECT *, coalesce(lag(taken) OVER (
         |      PARTITION BY word ORDER BY i), FALSE) AS consumed
         |    FROM c$r)
         |  WHERE NOT consumed
         |  GROUP BY word, wc)""".stripMargin
    }.mkString(",\n")
    s"""w AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wc FROM (
       |    SELECT unnest(list_filter(string_split($norm, ' '),
       |      x -> x <> '')) AS word
       |    FROM documents) GROUP BY word),
       |v0 AS MATERIALIZED (
       |  SELECT word, wc, list_transform(range(1, length(word) + 1),
       |    i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
       |  FROM w),
       |$rounds""".stripMargin
  }

  private def bpeTrainOracle(k: Int): String = {
    val union = (1 to k).map(r =>
      s"SELECT CAST($r AS INTEGER) AS round, pa AS pair_a, pb AS pair_b, n FROM m$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeRounds(k)}
       |SELECT * FROM (
       |  $union)
       |ORDER BY round""".stripMargin
  }

  private def bpeSegmentOracle(k: Int): String =
    s"""WITH ${bpeRounds(k)},
       |tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
       |    x -> x <> '')) AS word
       |  FROM documents),
       |wt AS (SELECT word, CAST(len(syms) AS BIGINT) AS nt FROM v$k)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
       |FROM tok JOIN wt USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  private def markerPat(ms: Seq[String]) =
    ms.mkString("(?i)\\b(", "|", ")\\b")
  private def hits(ms: Seq[String]) =
    s"len(regexp_extract_all(text, '${markerPat(ms)}'))"

  val oracles: Map[String, String] = {
    val Seq(en, de, fr, es) = TextAnalysis.langMarkers.map(_._2)
    val base = Map(
      // q100: the q192 portable-HLL register scheme replayed per
      // source over the whitespace-tokenized vocabulary — identical
      // md5-prefix-32 hashes, the same integer bit-length rho
      // (27 − length(bin(rest))), the same Σ 2^(27−reg) harmonic
      // integers, and the estimate as the same pinned
      // literal-product-over-integer IEEE division. Exact integers
      // end-to-end except that one division, which both engines
      // round identically under IEEE 754.
      "q100_approx_vocab" ->
        """WITH t AS (
          |  SELECT source,
          |    string_split(trim(regexp_replace(lower(text),
          |      '\s+', ' ', 'g')), ' ') AS tk
          |  FROM documents),
          |toks AS (
          |  SELECT source, unnest(tk) AS token FROM t),
          |tk2 AS (SELECT source, token FROM toks WHERE token <> ''),
          |h AS (
          |  SELECT source,
          |    ('0x' || substr(md5(token), 1, 8))::BIGINT AS hv
          |  FROM tk2),
          |r AS (
          |  SELECT source, hv % 64 AS bucket,
          |    CASE WHEN hv // 64 = 0 THEN 27
          |         ELSE 27 - length(bin(hv // 64))
          |    END AS rho
          |  FROM h),
          |regs AS (
          |  SELECT source, bucket, max(rho) AS register
          |  FROM r GROUP BY 1, 2),
          |spine AS (
          |  SELECT source, unnest(range(0, 64)) AS bucket
          |  FROM (SELECT DISTINCT source FROM tk2)),
          |f AS (
          |  SELECT s.source, s.bucket,
          |    coalesce(regs.register, 0) AS register
          |  FROM spine s LEFT JOIN regs
          |    ON s.source = regs.source AND s.bucket = regs.bucket),
          |summ AS (
          |  SELECT source,
          |    sum(1::BIGINT << CAST(27 - register AS INTEGER))
          |      AS sum_pow,
          |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS n_zero
          |  FROM f GROUP BY 1),
          |ex AS (
          |  SELECT source, count(DISTINCT token) AS n_exact
          |  FROM tk2 GROUP BY 1),
          |est AS (
          |  SELECT ex.source,
          |    CAST(n_exact AS BIGINT) AS n_exact,
          |    CAST(sum_pow AS BIGINT) AS sum_pow,
          |    CAST(n_zero AS BIGINT) AS n_zero,
          |    CAST(CASE WHEN ((0.709::DOUBLE * 4096.0::DOUBLE)
          |        * 134217728.0::DOUBLE) / CAST(sum_pow AS DOUBLE)
          |        <= 160.0 AND n_zero > 0
          |      THEN floor(64.0::DOUBLE
          |        * ln(64.0::DOUBLE / CAST(n_zero AS DOUBLE))
          |        * 1000000.0::DOUBLE)
          |      ELSE floor((((0.709::DOUBLE * 4096.0::DOUBLE)
          |        * 134217728.0::DOUBLE) / CAST(sum_pow AS DOUBLE))
          |        * 1000000.0::DOUBLE)
          |    END AS BIGINT) AS est_micros
          |  FROM ex JOIN summ ON ex.source = summ.source)
          |SELECT source, n_exact, sum_pow, n_zero, est_micros,
          |  CAST(abs(est_micros - n_exact * 1000000) // n_exact
          |    AS BIGINT) AS rel_err_micros
          |FROM est ORDER BY source""".stripMargin,

      // q101: the same (source, token_count) ladder, the same
      // cumulative bracket, and the same integer interpolation —
      // pos_num = k·(n−1) hundredths, value = xl·10⁶ +
      // (xh − xl)·(pos_num mod 100)·10⁴. Integers end-to-end.
      "q101_approx_quantiles" ->
        """WITH d AS (
          |  SELECT source,
          |    CAST(len(list_filter(string_split_regex(trim(text),
          |      '\s+'), x -> x <> '')) AS BIGINT) AS v
          |  FROM documents),
          |lad AS (SELECT source, v, count(*) AS c FROM d GROUP BY 1, 2),
          |cm AS (
          |  SELECT source, v, c,
          |    sum(c) OVER (PARTITION BY source ORDER BY v
          |      ROWS UNBOUNDED PRECEDING) AS cum,
          |    sum(c) OVER (PARTITION BY source) AS n
          |  FROM lad),
          |sp AS (SELECT unnest([25, 50, 75, 95]) AS k),
          |j AS (
          |  SELECT source, k, v, cum, n, k * (n - 1) AS pn
          |  FROM cm CROSS JOIN sp),
          |b AS (
          |  SELECT source, k, max(n) AS n_docs, max(pn % 100) AS f,
          |    min(CASE WHEN cum >= pn // 100 + 1 THEN v END) AS xl,
          |    min(CASE WHEN cum >= pn // 100 + 2 THEN v END) AS xh
          |  FROM j GROUP BY 1, 2),
          |p AS (
          |  SELECT source, k, n_docs,
          |    xl * 1000000 + (coalesce(xh, xl) - xl) * f * 10000 AS pm
          |  FROM b)
          |SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
          |  CAST(max(CASE WHEN k = 25 THEN pm END) AS BIGINT)
          |    AS p25_micros,
          |  CAST(max(CASE WHEN k = 50 THEN pm END) AS BIGINT)
          |    AS p50_micros,
          |  CAST(max(CASE WHEN k = 75 THEN pm END) AS BIGINT)
          |    AS p75_micros,
          |  CAST(max(CASE WHEN k = 95 THEN pm END) AS BIGINT)
          |    AS p95_micros
          |FROM p GROUP BY source ORDER BY source""".stripMargin,

      // q206: same whitespace tokenize + punctuation strip, same
      // cumulative-break phrase numbering, same integer degree/freq
      // micros. The zipped unnest over (tokens, range) replays
      // posexplode.
      "q206_rake_keywords" ->
        ("""WITH t AS (
          |  SELECT doc_id,
          |    string_split(trim(regexp_replace(lower(text),
          |      '\s+', ' ', 'g')), ' ') AS tk
          |  FROM documents),
          |toks AS (
          |  SELECT doc_id, unnest(tk) AS tok,
          |    unnest(range(1, len(tk) + 1)) AS pos
          |  FROM t),
          |cl AS (
          |  SELECT doc_id, pos,
          |    regexp_replace(tok, '[^a-z0-9]', '', 'g') AS w
          |  FROM toks),
          |b AS (
          |  SELECT *, (w = '' OR w IN ('the','a','an','of','to','and',
          |    'in','is','on','for','with','as','by','at','it','this',
          |    'that','are','be','or','from')) AS brk
          |  FROM cl),
          |p AS (
          |  SELECT *, sum(CASE WHEN brk THEN 1 ELSE 0 END) OVER (
          |    PARTITION BY doc_id ORDER BY pos
          |    ROWS UNBOUNDED PRECEDING) AS pid
          |  FROM b),
          |wd AS (SELECT doc_id, pid, pos, w FROM p WHERE NOT brk),
          |pl AS (
          |  SELECT doc_id, pid, count(*) AS len
          |  FROM wd GROUP BY 1, 2),
          |wl AS (
          |  SELECT wd.doc_id, wd.pid, wd.pos, wd.w, pl.len
          |  FROM wd JOIN pl USING (doc_id, pid)),
          |sc AS (
          |  SELECT w, CAST(sum(len) * 1000000 AS HUGEINT) // count(*)
          |    AS score
          |  FROM wl GROUP BY 1),
          |ps AS (
          |  SELECT wl.doc_id, wl.pid, sum(sc.score) AS pscore,
          |    string_agg(wl.w, ' ' ORDER BY wl.pos) AS phrase
          |  FROM wl JOIN sc USING (w) GROUP BY 1, 2),
          |d AS (
          |  SELECT phrase, count(*) AS n_occurrences,
          |    max(pscore) AS score_micros
          |  FROM ps GROUP BY 1)
          |SELECT phrase, CAST(n_occurrences AS BIGINT) AS n_occurrences,
          |  CAST(score_micros AS BIGINT) AS score_micros
          |FROM d ORDER BY score_micros DESC, phrase
          |LIMIT 20""").stripMargin,
      // q133: identical integer counts and identical cross-multiplied
      // verdicts — no doubles anywhere, so no rounding rule is even
      // needed.
      "q133_repetition_filter" ->
        s"""WITH docs AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |wcc AS (
           |  SELECT doc_id, w, count(*) AS c
           |  FROM (SELECT doc_id, unnest(t) AS w FROM docs)
           |  GROUP BY doc_id, w),
           |ws AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           |    CAST(max(c) AS BIGINT) AS top_word_n,
           |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           |      AS dup_word_n
           |  FROM wcc GROUP BY doc_id),
           |bgc AS (
           |  SELECT doc_id, b, count(*) AS c FROM (
           |    SELECT doc_id, unnest(list_transform(
           |      generate_series(1, len(t) - 1),
           |      i -> t[i] || ' ' || t[i+1])) AS b
           |    FROM docs WHERE len(t) >= 2)
           |  GROUP BY doc_id, b),
           |bs AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |    CAST(max(c) AS BIGINT) AS top_bigram_n
           |  FROM bgc GROUP BY doc_id)
           |SELECT d.doc_id,
           |  CAST(coalesce(ws.n_words, 0) AS BIGINT) AS n_words,
           |  CAST(coalesce(ws.top_word_n, 0) AS BIGINT) AS top_word_n,
           |  CAST(coalesce(ws.dup_word_n, 0) AS BIGINT) AS dup_word_n,
           |  CAST(coalesce(bs.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           |  CAST(coalesce(bs.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           |  (coalesce(ws.n_words, 0) > 0
           |    AND coalesce(ws.top_word_n, 0) * 100
           |        <= coalesce(ws.n_words, 0) * 20
           |    AND coalesce(bs.top_bigram_n, 0) * 100
           |        <= coalesce(bs.n_bigrams, 0) * 18
           |    AND coalesce(ws.dup_word_n, 0) * 100
           |        <= coalesce(ws.n_words, 0) * 60) AS pass
           |FROM (SELECT doc_id FROM documents) d
           |LEFT JOIN ws USING (doc_id)
           |LEFT JOIN bs USING (doc_id)
           |ORDER BY doc_id""".stripMargin,
      // q134: same canonicalization, same (degree, node) orientation,
      // same ordered wedge join — counts must match exactly.
      "q134_triangle_count" ->
        s"""WITH docs AS (
           |  SELECT list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |pr AS (
           |  SELECT least(a, b) AS a, greatest(a, b) AS b FROM (
           |    SELECT unnest(t[1:len(t)-1]) AS a,
           |           unnest(t[2:len(t)]) AS b
           |    FROM docs WHERE len(t) >= 2)
           |  WHERE a <> b),
           |e AS (SELECT a, b FROM pr GROUP BY a, b HAVING count(*) >= 20),
           |deg AS (
           |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
           |    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
           |  GROUP BY n),
           |wd AS (
           |  SELECT e.a, e.b, da.d AS da, db.d AS db
           |  FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n),
           |o AS (
           |  SELECT CASE WHEN da < db OR (da = db AND a < b)
           |              THEN a ELSE b END AS x,
           |         CASE WHEN da < db OR (da = db AND a < b)
           |              THEN b ELSE a END AS y,
           |         CASE WHEN da < db OR (da = db AND a < b)
           |              THEN db ELSE da END AS dy
           |  FROM wd),
           |w AS (
           |  SELECT o1.x, o1.y AS y1, o2.y AS y2
           |  FROM o o1 JOIN o o2 ON o1.x = o2.x
           |  WHERE o1.dy < o2.dy OR (o1.dy = o2.dy AND o1.y < o2.y)),
           |t AS (SELECT 1 AS one FROM w JOIN o
           |      ON w.y1 = o.x AND w.y2 = o.y)
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           |       (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
           |       (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_triangles"""
          .stripMargin,
      // q106: list slicing is 1-based inclusive with end-clamping in
      // DuckDB — exactly Spark's slice(arr, start, len) — and
      // string_split of normalized text needs NO empty-token filter
      // (normalization collapses whitespace; the all-empty doc is [''],
      // one "word", in both engines).
      "q106_chunking" ->
        s"""WITH w AS (
           |  SELECT doc_id, string_split($norm, ' ') AS words
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, words,
           |    CAST(CASE WHEN len(words) <= 64 THEN 1
           |         ELSE ceil(CAST(len(words) - 64 AS DOUBLE) / 48) + 1
           |         END AS BIGINT) AS nc
           |  FROM w),
           |u AS (SELECT doc_id, words, unnest(range(0, nc)) AS i FROM c)
           |SELECT doc_id, i AS chunk_idx,
           |  CAST(len(words[(i*48+1):(i*48+64)]) AS BIGINT)
           |    AS n_chunk_words,
           |  md5(array_to_string(words[(i*48+1):(i*48+64)], ' '))
           |    AS chunk_md5
           |FROM u ORDER BY doc_id, chunk_idx""".stripMargin,
      // q107: two zipped unnests build the adjacent pairs; probability
      // arithmetic mirrors the Spark side operation-for-operation
      // (double cast on the first factor, left-assoc multiplication,
      // one division, log2, round 6).
      "q107_pmi_collocations" ->
        s"""WITH toks AS (
           |  SELECT list_filter(string_split($norm, ' '), x -> x <> '')
           |    AS t
           |  FROM documents),
           |uni AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM (
           |    SELECT unnest(t) AS w FROM toks) GROUP BY w),
           |pairs AS (
           |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM (
           |    SELECT unnest(t[1:len(t)-1]) AS w1,
           |           unnest(t[2:len(t)]) AS w2
           |    FROM toks WHERE len(t) >= 2) GROUP BY w1, w2),
           |tp AS (SELECT CAST(sum(n_pair) AS BIGINT) AS tot_pairs
           |       FROM pairs),
           |tw AS (SELECT CAST(sum(n_w) AS BIGINT) AS tot_words FROM uni)
           |SELECT p.w1, p.w2, p.n_pair,
           |  round(log2((CAST(p.n_pair AS DOUBLE) * tw.tot_words
           |      * tw.tot_words)
           |    / (CAST(tp.tot_pairs AS DOUBLE) * u1.n_w * u2.n_w)), 6)
           |    AS pmi
           |FROM pairs p
           |JOIN uni u1 ON p.w1 = u1.w
           |JOIN uni u2 ON p.w2 = u2.w
           |CROSS JOIN tp CROSS JOIN tw
           |WHERE p.n_pair >= 5
           |ORDER BY pmi DESC, p.w1, p.w2 LIMIT 100""".stripMargin,
      // q110: same md5-prefix uniform as q51/q63, same arithmetic shape
      // as the Spark side (u from (h+0.5)/2^32, -ln, one division,
      // floor-based fixed-point nanos — round(x, n) is not portable
      // when it feeds a selection boundary — ties by doc_id).
      "q110_weighted_sample" ->
        """WITH s AS (
          |  SELECT doc_id, n_chars,
          |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |      AS h
          |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0)
          |SELECT doc_id, n_chars,
          |  CAST(floor(-ln((h + 0.5) / 4294967296.0)
          |    / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS es_key
          |FROM s ORDER BY es_key, doc_id LIMIT 200""".stripMargin,
      // q125: operation-for-operation mirror of sparseCosinePairs —
      // floor-based fixed-point micros (floor of an identical double is
      // bit-deterministic; round(x, n) is NOT portable between Spark
      // and DuckDB), integer dot products, one double division at the
      // very end.
      // q156: per-term argmax replayed as row_number-over-postings —
      // the window form must elect the same posting Spark's
      // max(struct) aggregate does.
      "q156_inverted_index" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS term
           |  FROM documents),
           |tf AS (
           |  SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
           |st AS (
           |  SELECT term, count(*) AS df, sum(tf) AS cf
           |  FROM tf GROUP BY 1),
           |top AS (
           |  SELECT term, doc_id AS top_doc_id, tf AS top_tf,
           |    row_number() OVER (PARTITION BY term
           |      ORDER BY tf DESC, doc_id) AS rn
           |  FROM tf)
           |SELECT st.term, CAST(df AS BIGINT) AS df,
           |  CAST(cf AS BIGINT) AS cf,
           |  CAST(top_doc_id AS BIGINT) AS top_doc_id,
           |  CAST(top_tf AS BIGINT) AS top_tf
           |FROM st JOIN top ON st.term = top.term AND top.rn = 1
           |ORDER BY df DESC, st.term LIMIT 100""".stripMargin,

      // q176: positional postings via a generated position index,
      // the same (doc, pos+1) adjacency join.
      // q189: the oracle is the plan the index REPLACES — the full
      // LIKE scan; verified-candidate equality is the whole claim.
      "q189_trigram_search" ->
        """SELECT p.pattern, d.doc_id
          |FROM (VALUES ('window'), ('customer'), ('fast merge'))
          |  AS p(pattern)
          |CROSS JOIN documents d
          |WHERE contains(d.text, p.pattern)
          |ORDER BY pattern, doc_id""".stripMargin,

      "q176_phrase_search" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |posts AS (
           |  SELECT doc_id, i - 1 AS pos, t[i] AS term
           |  FROM toks CROSS JOIN unnest(range(1, len(t) + 1)) AS u(i)
           |  WHERE t[i] IN ('hash', 'join'))
           |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
           |FROM posts a JOIN posts b
           |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           |WHERE a.term = 'hash' AND b.term = 'join'
           |GROUP BY a.doc_id
           |ORDER BY n_occurrences DESC, a.doc_id""".stripMargin,

      // q153: the UNFILTERED all-pairs Jaccard definition (same
      // 3-shingle construction as q125's twin) — Spark runs the
      // prefix-filtered AllPairs algorithm; row-set equality proves
      // the prefix rule lossless on this corpus.
      "q153_setsim_join" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |sh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(1, len(t) - 3 + 2),
           |    i -> array_to_string(t[i:i+2], ' ')))) AS term
           |  FROM toks WHERE len(t) >= 3),
           |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |co AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    count(*) AS inter
           |  FROM sh a JOIN sh b ON a.term = b.term
           |    AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, CAST(inter AS BIGINT) AS n_inter,
           |  CAST(sa.n + sb.n - inter AS BIGINT) AS n_union,
           |  CAST(floor(inter * 1000000 / (sa.n + sb.n - inter))
           |    AS BIGINT) AS jac_micros
           |FROM co JOIN sizes sa ON id_a = sa.doc_id
           |  JOIN sizes sb ON id_b = sb.doc_id
           |WHERE inter * 5 >= (sa.n + sb.n - inter) * 4
           |ORDER BY id_a, id_b""".stripMargin,

      "q125_sparse_cosine" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |sh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(1, len(t) - 3 + 2),
           |    i -> array_to_string(t[i:i+2], ' ')))) AS term
           |  FROM toks WHERE len(t) >= 3),
           |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           |          FROM sh GROUP BY term),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
           |w AS (
           |  SELECT doc_id, term,
           |    CAST(floor(ln(CAST(nd AS DOUBLE) / df) * 1e6) AS BIGINT)
           |      AS w6, df
           |  FROM sh JOIN dfreq USING (term) CROSS JOIN n),
           |nrm AS (
           |  SELECT doc_id,
           |    sqrt(CAST(CAST(sum(w6*w6) AS BIGINT) AS DOUBLE)) AS nrm
           |  FROM w GROUP BY doc_id),
           |wn AS (
           |  SELECT w.doc_id, term,
           |    CAST(floor(CAST(w6 AS DOUBLE) / nrm * 1e6) AS BIGINT)
           |      AS wn6, df
           |  FROM w JOIN nrm ON w.doc_id = nrm.doc_id WHERE nrm > 0),
           |rare AS (SELECT * FROM wn WHERE df <= 20),
           |p AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CAST(CAST(sum(a.wn6 * b.wn6) AS BIGINT) AS DOUBLE) / 1e12
           |      AS cos
           |  FROM rare a JOIN rare b
           |    ON a.term = b.term AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,

      // q115: fully unrolled weighted PageRank — five chained CTE
      // rounds in INTEGER MICROS, each mirroring the Spark side's
      // (pr*w) div sumw contribution and 150000 + (850000*sum) div 1e6
      // damped update exactly (integer arithmetic is bit-identical in
      // both engines under any aggregation order; DuckDB's // on
      // positives = Spark's div).
      "q115_textrank" -> {
        val iters = 5
        val base =
          s"""WITH pairs AS (
             |  SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT unnest(t[1:len(t)-1]) AS a,
             |           unnest(t[2:len(t)]) AS b
             |    FROM (SELECT list_filter(string_split($norm, ' '),
             |            x -> x <> '') AS t FROM documents)
             |    WHERE len(t) >= 2)
             |  WHERE a <> b GROUP BY a, b HAVING count(*) >= 5),
             |edges AS (
             |  SELECT a, b, CAST(sum(c) AS BIGINT) AS w FROM (
             |    SELECT a, b, c FROM pairs
             |    UNION ALL SELECT b AS a, a AS b, c FROM pairs)
             |  GROUP BY a, b),
             |deg AS (SELECT a AS node, CAST(sum(w) AS BIGINT) AS sumw
             |        FROM edges GROUP BY a),
             |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg)"""
            .stripMargin
        val rounds = (1 to iters).map { k =>
          s"""pr$k AS (
             |  SELECT e.b AS node,
             |    CAST(150000 + (850000 * sum((p.pr * e.w) // d.sumw))
             |         // 1000000 AS BIGINT) AS pr
             |  FROM edges e
             |  JOIN deg d ON e.a = d.node
             |  JOIN pr${k - 1} p ON e.a = p.node
             |  GROUP BY e.b)""".stripMargin
        }
        (base +: rounds).mkString(",\n") +
          s"\nSELECT node, pr FROM pr$iters ORDER BY pr DESC, node LIMIT 50"
      },
      // q112: the oracle is the EXACT top-20 — hash-equality proves the
      // sketch candidate set covered the true heavy hitters.
      "q112_heavy_hitters" ->
        s"""WITH tok AS (
           |  SELECT unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS token
           |  FROM documents)
           |SELECT token, CAST(count(*) AS BIGINT) AS n
           |FROM tok GROUP BY token
           |ORDER BY n DESC, token LIMIT 20""".stripMargin,
      "q30_text_stats" ->
        s"""SELECT doc_id,
           |  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
           |       x -> x <> '')) AS BIGINT) AS n_tokens,
           |  CAST(len(regexp_extract_all(text,
           |       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords,
           |  CAST(length($norm) AS BIGINT) AS n_chars_norm
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q31_lang_id" ->
        s"""WITH h AS (SELECT doc_id,
           |  ${hits(en)} AS h_en, ${hits(de)} AS h_de,
           |  ${hits(fr)} AS h_fr, ${hits(es)} AS h_es FROM documents)
           |SELECT doc_id,
           |  CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
           |       WHEN h_en >= greatest(h_de, h_fr, h_es) THEN 'en'
           |       WHEN h_de >= greatest(h_fr, h_es) THEN 'de'
           |       WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS lang_pred
           |FROM h ORDER BY doc_id""".stripMargin,

      "q32_quality" ->
        s"""WITH c AS (SELECT doc_id,
           |  CAST(length(text) AS DOUBLE) AS len,
           |  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           |       AS DOUBLE) AS n_alpha,
           |  ${hits(en)} AS h_en,
           |  CASE WHEN regexp_matches(text, '[!?.]{3,}|#{2,}|\\{|\\}')
           |       THEN 0.0 ELSE 1.0 END AS good_punct
           |  FROM documents)
           |SELECT doc_id, round((
           |    (CASE WHEN len > 0 THEN n_alpha / len ELSE 0.0 END) +
           |    (CASE WHEN len >= 200 AND len <= 20000 THEN 1.0
           |          WHEN len >= 50 THEN 0.5 ELSE 0.0 END) +
           |    good_punct +
           |    (CASE WHEN h_en >= 2 THEN 1.0 ELSE 0.0 END)) / 4.0, 4) AS quality
           |FROM c ORDER BY doc_id""".stripMargin,

      "q33_fingerprint" ->
        s"""SELECT doc_id, md5($norm) AS fp
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q34_exact_dedup" ->
        s"""SELECT md5($norm) AS fp, min(doc_id) AS keeper_id,
           |  count(*) AS n_copies
           |FROM documents GROUP BY md5($norm) ORDER BY fp""".stripMargin,

      "q35_ngram_jaccard" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents WHERE doc_id % 5 = 0),
           |sh AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, len(t) - 3 + 2),
           |    i -> array_to_string(t[i:i+2], ' '))) AS s
           |  FROM toks WHERE len(t) >= 3),
           |posting AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
           |cand AS (
           |  SELECT DISTINCT p1.doc_id AS id_a, p2.doc_id AS id_b
           |  FROM posting p1 JOIN posting p2 USING (shingle)
           |  WHERE p1.doc_id < p2.doc_id),
           |verified AS (
           |  SELECT id_a, id_b,
           |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           |          / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
           |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id)
           |SELECT id_a, id_b, jaccard FROM verified
           |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin,

      // mirrors q55MinhashPortable stage by stage; the size-ratio
      // prefilter is lossless w.r.t. the threshold and so is omitted
      "q55_minhash_portable" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |sh AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, len(t) - 3 + 2),
           |    i -> array_to_string(t[i:i+2], ' '))) AS s
           |  FROM toks WHERE len(t) >= 3),
           |mins AS (
           |  SELECT doc_id, s, list_transform(range(0, 16), i ->
           |    list_min(list_transform(s, x ->
           |      (((('0x' || substr(md5('a:' || i), 1, 7))::BIGINT | 1)
           |         * ('0x' || substr(md5(x), 1, 8))::BIGINT
           |         + ('0x' || substr(md5('b:' || i), 1, 8))::BIGINT)
           |        & 4294967295)))) AS m
           |  FROM sh),
           |banded AS (
           |  SELECT doc_id, b.band_idx,
           |    array_to_string(m[b.band_idx*4+1 : b.band_idx*4+4], ',')
           |      AS band_key
           |  FROM mins, range(0, 4) AS b(band_idx)),
           |cand AS (
           |  SELECT DISTINCT b1.doc_id AS id_a, b2.doc_id AS id_b
           |  FROM banded b1 JOIN banded b2 USING (band_idx, band_key)
           |  WHERE b1.doc_id < b2.doc_id),
           |verified AS (
           |  SELECT id_a, id_b,
           |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           |          / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
           |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id)
           |SELECT id_a, id_b, jaccard FROM verified
           |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin,

      // q67 = q55's construction with the candidate set restricted to
      // pairs touching a "new" doc (doc_id%3=0) — by definition the
      // incremental operator's contract: full-corpus pairs that touch
      // the new batch
      "q67_minhash_incremental" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |sh AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, len(t) - 3 + 2),
           |    i -> array_to_string(t[i:i+2], ' '))) AS s
           |  FROM toks WHERE len(t) >= 3),
           |mins AS (
           |  SELECT doc_id, s, list_transform(range(0, 16), i ->
           |    list_min(list_transform(s, x ->
           |      (((('0x' || substr(md5('a:' || i), 1, 7))::BIGINT | 1)
           |         * ('0x' || substr(md5(x), 1, 8))::BIGINT
           |         + ('0x' || substr(md5('b:' || i), 1, 8))::BIGINT)
           |        & 4294967295)))) AS m
           |  FROM sh),
           |banded AS (
           |  SELECT doc_id, b.band_idx,
           |    array_to_string(m[b.band_idx*4+1 : b.band_idx*4+4], ',')
           |      AS band_key
           |  FROM mins, range(0, 4) AS b(band_idx)),
           |cand AS (
           |  SELECT DISTINCT b1.doc_id AS id_a, b2.doc_id AS id_b
           |  FROM banded b1 JOIN banded b2 USING (band_idx, band_key)
           |  WHERE b1.doc_id < b2.doc_id
           |    AND (b1.doc_id % 3 = 0 OR b2.doc_id % 3 = 0)),
           |verified AS (
           |  SELECT id_a, id_b,
           |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           |          / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
           |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id)
           |SELECT id_a, id_b, jaccard FROM verified
           |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin,

      // q70: same planted multi-line docs, same document-frequency
      // scrub; DuckDB zips the two unnests (position list + line list)
      // row-wise, and string_agg ORDER BY pos mirrors the sort_array
      // reassembly
      "q70_line_dedup" ->
        """WITH d AS (
          |  SELECT doc_id, concat_ws(chr(10),
          |    CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' END,
          |    text,
          |    CASE WHEN doc_id % 3 = 0 THEN 'accept all cookies to continue' END,
          |    CASE WHEN doc_id % 7 = 0
          |         THEN 'share document ' || CAST(doc_id AS VARCHAR) END) AS text
          |  FROM documents),
          |sp AS (SELECT doc_id, string_split(text, chr(10)) AS sp FROM d),
          |lines AS (
          |  SELECT doc_id, unnest(range(1, len(sp) + 1)) AS pos,
          |    unnest(sp) AS line
          |  FROM sp),
          |boiler AS (
          |  SELECT line
          |  FROM (SELECT line, count(DISTINCT doc_id) AS df
          |        FROM lines GROUP BY line)
          |  WHERE df > 10),
          |kept AS (
          |  SELECT l.doc_id, l.pos, l.line
          |  FROM lines l LEFT JOIN boiler b USING (line)
          |  WHERE b.line IS NULL),
          |o AS (
          |  SELECT doc_id, count(*) AS n_kept,
          |    string_agg(line, chr(10) ORDER BY pos) AS clean_text
          |  FROM kept GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(o.clean_text, '') AS clean_text,
          |  coalesce(o.n_kept, 0) AS n_kept
          |FROM d LEFT JOIN o USING (doc_id) ORDER BY d.doc_id""".stripMargin,

      // q68: token totals + doc frequencies over the same normalized
      // whitespace tokenization; (n_total desc, token) is a total
      // order so the top-100 boundary matches across engines
      "q68_vocab_topk" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS token
           |  FROM documents)
           |SELECT token, count(*) AS n_total,
           |  count(DISTINCT doc_id) AS n_docs
           |FROM toks GROUP BY token
           |ORDER BY n_total DESC, token LIMIT 100""".stripMargin,

      // mirrors q58SimhashPortable stage by stage: md5-prefix token
      // hashes → per-bit votes → signature word → 15-bit chunks →
      // candidate join → verified hamming
      "q58_simhash_portable" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS tok FROM documents),
           |h AS (
           |  SELECT doc_id,
           |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
           |bits AS (
           |  SELECT doc_id, b,
           |    sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1
           |        THEN 1 ELSE -1 END) AS v
           |  FROM h, range(0, 60) r(b) GROUP BY doc_id, b),
           |sig AS (
           |  SELECT doc_id,
           |    CAST(sum(CASE WHEN v > 0
           |      THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
           |      ELSE 0 END) AS BIGINT) AS sh
           |  FROM bits GROUP BY doc_id),
           |chunks AS (
           |  SELECT doc_id, sh, c.ci,
           |    (sh >> CAST(c.ci * 15 AS INTEGER)) & 32767 AS chunk
           |  FROM sig, range(0, 4) c(ci)),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |    a.sh AS sh_a, b.sh AS sh_b
           |  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.chunk = b.chunk
           |  WHERE a.doc_id < b.doc_id)
           |SELECT id_a, id_b,
           |  CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
           |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
           |ORDER BY id_a, id_b""".stripMargin,

      // mirrors q59WinnowPortable: k=8 grams, md5-prefix-32 hash,
      // (hash<<21 | 2^21-1-pos) packed key, w=4 window min, full
      // windows only, distinct by selected position
      "q59_winnow_portable" ->
        s"""WITH d AS (
           |  SELECT doc_id, $norm AS nm FROM documents
           |  WHERE len($norm) >= 8 AND len($norm) <= 2097151),
           |g AS (
           |  SELECT doc_id, unnest(range(1, len(nm) - 8 + 2)) AS i, nm
           |  FROM d),
           |kk AS (
           |  SELECT doc_id, i,
           |    ((('0x' || substr(md5(substr(nm, CAST(i AS INTEGER), 8)),
           |        1, 8))::BIGINT << 21) | (2097151 - i)) AS pk
           |  FROM g),
           |wm AS (
           |  SELECT doc_id, i,
           |    min(pk) OVER (PARTITION BY doc_id ORDER BY i
           |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
           |  FROM kk)
           |SELECT DISTINCT doc_id, 2097151 - (mk & 2097151) AS pos,
           |  mk >> 21 AS fp
           |FROM wm WHERE i >= 4
           |ORDER BY doc_id, pos""".stripMargin,

      // q72: the q59 winnow-fingerprint construction feeding the
      // containment ratio — df-capped fingerprint universe, per-doc
      // denominators over the SAME capped universe, round-then-filter
      "q72_containment" ->
        s"""WITH d AS (
           |  SELECT doc_id, $norm AS nm FROM documents
           |  WHERE len($norm) >= 8 AND len($norm) <= 2097151),
           |g AS (
           |  SELECT doc_id, unnest(range(1, len(nm) - 8 + 2)) AS i, nm
           |  FROM d),
           |kk AS (
           |  SELECT doc_id, i,
           |    ((('0x' || substr(md5(substr(nm, CAST(i AS INTEGER), 8)),
           |        1, 8))::BIGINT << 21) | (2097151 - i)) AS pk
           |  FROM g),
           |wm AS (
           |  SELECT doc_id, i,
           |    min(pk) OVER (PARTITION BY doc_id ORDER BY i
           |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
           |  FROM kk),
           |fps AS (
           |  SELECT DISTINCT doc_id, mk >> 21 AS fp FROM wm WHERE i >= 4),
           |ok AS (
           |  SELECT fp FROM (SELECT fp, count(*) AS c FROM fps GROUP BY fp)
           |  WHERE c <= 20),
           |kept AS (SELECT fps.doc_id, fps.fp FROM fps SEMI JOIN ok USING (fp)),
           |sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           |  FROM kept a JOIN kept b USING (fp)
           |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(i / CAST(n AS DOUBLE), 6) AS containment
           |FROM inter JOIN sizes ON id_a = doc_id
           |WHERE round(i / CAST(n AS DOUBLE), 6) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,

      // mirrors q61SequencePacking: same token count as q30's twin,
      // one straightforward window cumsum vs Spark's two-level
      // bucketed prefix sum — integer-exact equality
      "q61_sequence_packing" ->
        """WITH d AS (
          |  SELECT doc_id,
          |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
          |         x -> x <> '')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, n_tokens,
          |    -- window sum yields HUGEINT, which pandas coerces to
          |    -- float64: pin BIGINT to match Spark's long schema
          |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |      0) AS BIGINT) AS tok_offset
          |  FROM d)
          |SELECT doc_id, n_tokens, tok_offset,
          |  CAST(tok_offset // 2048 AS BIGINT) AS seq_first,
          |  CAST((tok_offset + greatest(n_tokens, 1) - 1) // 2048 AS BIGINT)
          |    AS seq_last,
          |  CAST((tok_offset + greatest(n_tokens, 1) - 1) // 2048
          |    - tok_offset // 2048 + 1 AS BIGINT) AS n_seqs
          |FROM c ORDER BY doc_id""".stripMargin,

      // mirrors q62SourceQuota: md5-hex ordering is identical in both
      // engines, so the kept set and ranks match the heap operator's
      "q62_source_quota" ->
        """WITH h AS (
          |  SELECT doc_id, source,
          |    md5(CAST(doc_id AS VARCHAR)) AS hh
          |  FROM documents),
          |r AS (
          |  SELECT source, doc_id,
          |    CAST(row_number() OVER (PARTITION BY source
          |      ORDER BY hh, doc_id) AS INTEGER) AS rank
          |  FROM h)
          |SELECT source, doc_id, rank FROM r
          |WHERE rank <= 10 ORDER BY source, rank""".stripMargin,

      // mirrors q63MixtureSample: q51's proven md5-bucket construction
      // gated by a per-source CASE rate
      "q63_mixture_sample" ->
        """SELECT doc_id, source
          |FROM documents
          |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
          |        ::BIGINT % 100
          |  < CASE WHEN source = 'src0' THEN 80
          |         WHEN source = 'src1' THEN 50 ELSE 20 END
          |ORDER BY doc_id""".stripMargin,

      "q47_repetition" ->
        """WITH docs AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(lower(text), '\s+'),
          |                t -> t <> '') AS toks
          |  FROM documents),
          |tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
          |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
          |ts AS (SELECT doc_id, sum(c) AS n_tokens,
          |         count(*) AS n_distinct, max(c) AS top
          |       FROM tc GROUP BY 1),
          |tri AS (
          |  SELECT doc_id,
          |    CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
          |      generate_series(1, len(toks) - 2),
          |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
          |    ELSE 0 END AS tri_distinct,
          |    greatest(len(toks) - 2, 0) AS tri_total
          |  FROM docs)
          |SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
          |  CASE WHEN t.n_tokens > 0
          |       THEN round(t.n_distinct / CAST(t.n_tokens AS DOUBLE), 6)
          |       ELSE 0.0 END AS distinct_token_ratio,
          |  CASE WHEN t.n_tokens > 0
          |       THEN round(t.top / CAST(t.n_tokens AS DOUBLE), 6)
          |       ELSE 0.0 END AS top_token_frac,
          |  CASE WHEN r.tri_total > 0
          |       THEN round(1.0 - r.tri_distinct / CAST(r.tri_total AS DOUBLE), 6)
          |       ELSE 0.0 END AS dup_trigram_frac
          |FROM ts t JOIN tri r USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      "q49_redaction" ->
        """WITH dirty AS (
          |  SELECT doc_id,
          |    text || ' contact user' || doc_id ||
          |    '@example.com via https://ex.org/p/' || doc_id ||
          |    ' or call 612-555-01' || (doc_id % 100) AS t
          |  FROM documents)
          |SELECT doc_id,
          |  regexp_replace(regexp_replace(regexp_replace(t,
          |    'https?://[^\s]+', '<URL>', 'g'),
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          |    '<EMAIL>', 'g'),
          |    '[0-9][0-9 ()+.-]{6,}[0-9]', '<NUMBER>', 'g') AS clean
          |FROM dirty ORDER BY doc_id""".stripMargin,

      "q52_connected_components" ->
        """WITH RECURSIVE
          |e1 AS (
          |  SELECT a.doc_id AS src, b.doc_id AS dst
          |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 5
          |  WHERE a.doc_id % 100 < 40),
          |edges AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
          |walk AS (
          |  SELECT src AS id, src AS label FROM edges
          |  UNION
          |  SELECT e.src AS id, w.label FROM walk w JOIN edges e ON e.dst = w.id)
          |SELECT id, min(label) AS component FROM walk
          |GROUP BY id ORDER BY id""".stripMargin,

      // q98: q52's recursive-CTE labeling aggregated twice — family
      // sizes, then the size histogram
      "q98_cluster_sizes" ->
        """WITH RECURSIVE
          |e1 AS (
          |  SELECT a.doc_id AS src, b.doc_id AS dst
          |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 5
          |  WHERE a.doc_id % 100 < 40),
          |edges AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
          |walk AS (
          |  SELECT src AS id, src AS label FROM edges
          |  UNION
          |  SELECT e.src AS id, w.label FROM walk w JOIN edges e ON e.dst = w.id),
          |labels AS (SELECT id, min(label) AS component FROM walk GROUP BY id),
          |fam AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
          |        FROM labels GROUP BY component)
          |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
          |  CAST(sum(sz) AS BIGINT) AS n_docs
          |FROM fam GROUP BY sz ORDER BY cluster_size""".stripMargin,

      "q53_curation_pipeline" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM (
           |    SELECT doc_id, text FROM documents
           |    UNION ALL
           |    SELECT doc_id + 10000000 AS doc_id, text FROM documents
           |    WHERE doc_id % 10 = 3)
           |  WHERE doc_id % 100 <> 7),
           |qual AS (SELECT doc_id, text, round((
           |    (CASE WHEN CAST(length(text) AS DOUBLE) > 0
           |          THEN CAST(length(text) - length(regexp_replace(text,
           |               '[A-Za-z]', '', 'g')) AS DOUBLE)
           |               / CAST(length(text) AS DOUBLE) ELSE 0.0 END) +
           |    (CASE WHEN length(text) >= 200 AND length(text) <= 20000 THEN 1.0
           |          WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END) +
           |    (CASE WHEN regexp_matches(text, '[!?.]{3,}|#{2,}|\\{|\\}')
           |          THEN 0.0 ELSE 1.0 END) +
           |    (CASE WHEN ${hits(TextAnalysis.langMarkers.head._2)} >= 2
           |          THEN 1.0 ELSE 0.0 END)) / 4.0, 4) AS quality
           |  FROM corpus),
           |gated AS (SELECT doc_id, text FROM qual WHERE quality >= 0.7),
           |red AS (SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(
           |    text || ' see https://curation.example.com/raw or mail admin@example.com',
           |    'https?://[^\\s]+', '<URL>', 'g'),
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |    '[0-9][0-9 ()+.-]{6,}[0-9]', '<NUMBER>', 'g') AS clean
           |  FROM gated),
           |keep AS (SELECT min(doc_id) AS doc_id FROM red
           |         GROUP BY md5(trim(regexp_replace(lower(clean), '\\s+', ' ', 'g')))),
           |keepers AS (SELECT r.doc_id, r.clean FROM red r JOIN keep USING (doc_id)),
           |ktok AS (SELECT doc_id, list_filter(string_split_regex(lower(clean),
           |           '\\s+'), t -> t <> '') AS l FROM keepers),
           |ksh AS (SELECT doc_id, list_distinct(list_transform(
           |          generate_series(1, len(l) - 2),
           |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
           |        FROM ktok WHERE len(l) >= 3),
           |bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
           |          generate_series(1, len(l) - 2),
           |          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS g
           |        FROM (SELECT list_filter(string_split_regex(lower(text),
           |                '\\s+'), t -> t <> '') AS l
           |              FROM documents WHERE doc_id % 100 = 7)
           |        WHERE len(l) >= 3),
           |contam AS (SELECT doc_id FROM (SELECT doc_id, unnest(s) AS g FROM ksh) k
           |           JOIN bsh USING (g) GROUP BY doc_id HAVING count(*) >= 2)
           |SELECT doc_id, clean FROM keepers
           |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
           |ORDER BY doc_id""".stripMargin,

      // q102: q50's trigram sets pushed through the PORTABLE Bloom —
      // the bitmap is restated as its position SET (bit p set iff p is
      // a position of some bench shingle; a shingle is flagged iff all
      // 3 of its md5-slice positions are set — bit-for-bit the Spark
      // bitmap semantics, false positives included), beside the exact
      // overlap counts in one full outer join
      "q102_bloom_decontaminate" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(lower(text), '\s+'),
          |                t -> t <> '') AS l
          |  FROM documents),
          |sh AS (
          |  SELECT doc_id, list_distinct(list_transform(
          |    generate_series(1, len(l) - 2),
          |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
          |  FROM tok WHERE len(l) >= 3),
          |bg AS (SELECT DISTINCT unnest(s) AS g FROM sh
          |       WHERE doc_id % 100 = 7),
          |bpos AS MATERIALIZED (
          |  SELECT DISTINCT unnest([
          |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 1048576,
          |    ('0x' || substr(md5(g), 9, 8))::BIGINT % 1048576,
          |    ('0x' || substr(md5(g), 17, 8))::BIGINT % 1048576]) AS p
          |  FROM bg),
          |corp AS (SELECT doc_id, unnest(s) AS g FROM sh
          |         WHERE doc_id % 100 <> 7),
          |bloom AS (
          |  SELECT doc_id, count(*) AS n_bloom FROM corp
          |  WHERE ('0x' || substr(md5(g), 1, 8))::BIGINT % 1048576
          |          IN (SELECT p FROM bpos)
          |    AND ('0x' || substr(md5(g), 9, 8))::BIGINT % 1048576
          |          IN (SELECT p FROM bpos)
          |    AND ('0x' || substr(md5(g), 17, 8))::BIGINT % 1048576
          |          IN (SELECT p FROM bpos)
          |  GROUP BY doc_id HAVING count(*) >= 2),
          |exact AS (
          |  SELECT doc_id, count(*) AS n_exact
          |  FROM corp JOIN bg USING (g)
          |  GROUP BY doc_id HAVING count(*) >= 2)
          |SELECT coalesce(bloom.doc_id, exact.doc_id) AS doc_id,
          |  coalesce(n_exact, 0) AS n_exact,
          |  coalesce(n_bloom, 0) AS n_bloom
          |FROM bloom FULL OUTER JOIN exact ON bloom.doc_id = exact.doc_id
          |ORDER BY doc_id""".stripMargin,

      "q50_decontaminate" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(lower(text), '\s+'),
          |                t -> t <> '') AS l
          |  FROM documents),
          |sh AS (
          |  SELECT doc_id, list_distinct(list_transform(
          |    generate_series(1, len(l) - 2),
          |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
          |  FROM tok WHERE len(l) >= 3),
          |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh
          |          WHERE doc_id % 100 = 7),
          |corp AS (SELECT doc_id, unnest(s) AS g FROM sh
          |         WHERE doc_id % 100 <> 7)
          |SELECT doc_id, count(*) AS n_overlap
          |FROM corp JOIN bench USING (g)
          |GROUP BY doc_id HAVING count(*) >= 2
          |ORDER BY doc_id""".stripMargin,

      // q83: the q32 quality expression feeding the histogram-based
      // exact decile labeling — bucket = floor(#below · 10 / N)
      // capped at 9, ties share a bucket; double division both sides
      "q83_quality_deciles" ->
        s"""WITH c AS (SELECT doc_id,
           |  CAST(length(text) AS DOUBLE) AS len,
           |  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           |       AS DOUBLE) AS n_alpha,
           |  ${hits(en)} AS h_en,
           |  CASE WHEN regexp_matches(text, '[!?.]{3,}|#{2,}|\\{|\\}')
           |       THEN 0.0 ELSE 1.0 END AS good_punct
           |  FROM documents),
           |scored AS (
           |  SELECT doc_id, round((
           |    (CASE WHEN len > 0 THEN n_alpha / len ELSE 0.0 END) +
           |    (CASE WHEN len >= 200 AND len <= 20000 THEN 1.0
           |          WHEN len >= 50 THEN 0.5 ELSE 0.0 END) +
           |    good_punct +
           |    (CASE WHEN h_en >= 2 THEN 1.0 ELSE 0.0 END)) / 4.0, 4) AS quality
           |  FROM c),
           |hist AS (SELECT quality, count(*) AS hc FROM scored GROUP BY 1),
           |lab AS (
           |  SELECT quality,
           |    CAST(least(9, floor(
           |      COALESCE(SUM(hc) OVER (ORDER BY quality
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      * 10 / (SELECT sum(hc) FROM hist))) AS INTEGER) AS bucket
           |  FROM hist)
           |SELECT s.doc_id, s.quality, l.bucket
           |FROM scored s JOIN lab l USING (quality)
           |ORDER BY s.doc_id""".stripMargin,

      // q84: (n_s/N)^alpha normalized by the exact DECIMAL sum of
      // 9-decimal-quantized powers
      "q84_temperature_weights" ->
        """WITH counts AS (
          |  SELECT source, count(*) AS n_rows FROM documents GROUP BY 1),
          |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n FROM counts),
          |p AS (
          |  SELECT source, n_rows,
          |    CAST(round(pow(n_rows / CAST(tot.n AS DOUBLE), 0.5), 9)
          |      AS DECIMAL(18,9)) AS pa
          |  FROM counts CROSS JOIN tot),
          |z AS (SELECT sum(pa) AS z FROM p)
          |SELECT source, n_rows,
          |  round(CAST(pa AS DOUBLE) / CAST(z.z AS DOUBLE), 6) AS weight
          |FROM p CROSS JOIN z ORDER BY source""".stripMargin,

      // q74: tf (raw per-doc count), df over distinct (doc,term)
      // pairs, idf = ln(N/df); score rounded BEFORE ranking, ties by
      // term — mirrors tfidfTopTerms stage for stage
      "q74_tfidf_top_terms" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf
           |       FROM toks GROUP BY 1, 2),
           |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
           |scored AS (
           |  SELECT tf.doc_id, tf.term, tf.tf,
           |    round(tf.tf * ln(n.n / dfreq.df), 6) AS score
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, term) AS rn
           |  FROM scored)
           |SELECT doc_id, term, tf, score FROM ranked WHERE rn <= 5
           |ORDER BY doc_id, score DESC, term""".stripMargin,

      // q75: Lucene-form BM25 (k1=1.2, b=0.75) for ('hash','join',
      // 'merge'); literals and association order copied from
      // bm25Search so the doubles agree bit-for-bit before rounding;
      // per-term partials summed as DECIMAL (exact, order-free)
      "q75_bm25_search" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS term
           |  FROM documents),
           |dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           |       WHERE term IN ('hash', 'join', 'merge') GROUP BY 1, 2),
           |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |c AS (SELECT count(*) AS nd, avg(len) AS avglen FROM dl),
           |p AS (
           |  SELECT tf.doc_id,
           |    CAST(round(
           |      ln(1.0 + (c.nd - dfreq.df + 0.5) / (dfreq.df + 0.5))
           |        * tf.tf * (1.2 + 1.0)
           |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avglen)),
           |      6) AS DECIMAL(18,6)) AS part
           |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
           |  CROSS JOIN c)
           |SELECT doc_id, CAST(sum(part) AS DOUBLE) AS score
           |FROM p GROUP BY doc_id
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

      // q126: q75's BM25 CTEs at LIMIT 50, then q40's cosine/rank
      // discipline over the candidate ids against query vector 0.
      "q126_hybrid_retrieval" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS term
           |  FROM documents),
           |dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           |       WHERE term IN ('hash', 'join', 'merge') GROUP BY 1, 2),
           |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |c AS (SELECT count(*) AS nd, avg(len) AS avglen FROM dl),
           |p AS (
           |  SELECT tf.doc_id,
           |    CAST(round(
           |      ln(1.0 + (c.nd - dfreq.df + 0.5) / (dfreq.df + 0.5))
           |        * tf.tf * (1.2 + 1.0)
           |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avglen)),
           |      6) AS DECIMAL(18,6)) AS part
           |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
           |  CROSS JOIN c)
           |, bm AS (
           |  SELECT doc_id, CAST(sum(part) AS DOUBLE) AS bm25
           |  FROM p GROUP BY doc_id
           |  ORDER BY bm25 DESC, doc_id LIMIT 50),
           |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           |      WHERE vec_id = 0),
           |cv AS (SELECT vec_id, embedding::DOUBLE[] AS v
           |       FROM embeddings),
           |scored AS (
           |  SELECT bm.doc_id, bm.bm25,
           |    round(list_cosine_similarity(q.qv, cv.v), 6) AS cos_sim
           |  FROM bm JOIN cv ON bm.doc_id = cv.vec_id CROSS JOIN q
           |  WHERE bm.doc_id <> 0),
           |ranked AS (
           |  SELECT *, CAST(row_number() OVER (
           |    ORDER BY cos_sim DESC, doc_id) AS INTEGER) AS rank
           |  FROM scored)
           |SELECT doc_id, cos_sim, bm25, rank FROM ranked
           |WHERE rank <= 10 ORDER BY rank""".stripMargin,

      // q242: the full hybrid chain re-chained — TF-IDF term election,
      // BM25 top-50, exact + candidate-restricted cosine top-10s
      // (identical 6dp rounding + tiebreaks), then integer recall and
      // the rerank-lossless invariant.
      "q242_retrieval_recall" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           |       GROUP BY 1, 2),
           |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
           |qs AS (
           |  SELECT tf.doc_id AS query_id, tf.term,
           |    round(tf.tf * ln(nd.n::DOUBLE / dfreq.df), 6) AS score
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
           |  WHERE tf.doc_id % 50 = 0),
           |qterms AS (
           |  SELECT query_id, term FROM (
           |    SELECT query_id, term, row_number() OVER (
           |      PARTITION BY query_id ORDER BY score DESC, term) AS rk
           |    FROM qs) WHERE rk <= 3),
           |dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
           |c AS (SELECT count(*) AS nd2, avg(len) AS avglen FROM dl),
           |p AS (
           |  SELECT q.query_id, tf.doc_id,
           |    CAST(round(
           |      ln(1.0 + (c.nd2 - dfreq.df + 0.5) / (dfreq.df + 0.5))
           |        * tf.tf * (1.2 + 1.0)
           |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avglen)),
           |      6) AS DECIMAL(18,6)) AS part
           |  FROM qterms q JOIN tf USING (term) JOIN dfreq USING (term)
           |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
           |  WHERE tf.doc_id <> q.query_id),
           |bm AS (SELECT query_id, doc_id, CAST(sum(part) AS DOUBLE)
           |         AS bm25
           |       FROM p GROUP BY 1, 2),
           |cands AS (
           |  SELECT query_id, doc_id FROM (
           |    SELECT query_id, doc_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rk
           |    FROM bm) WHERE rk <= 50),
           |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qv AS (SELECT vec_id AS query_id, v AS qv FROM v
           |       WHERE vec_id % 50 = 0),
           |ex AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.query_id, c2.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.query_id
           |        ORDER BY round(list_cosine_similarity(q.qv, c2.v), 6)
           |          DESC, c2.vec_id) AS rk
           |    FROM qv q JOIN v c2 ON c2.vec_id <> q.query_id)
           |  WHERE rk <= 10),
           |hy AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT ca.query_id, ca.doc_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY ca.query_id
           |        ORDER BY round(list_cosine_similarity(q.qv, c2.v), 6)
           |          DESC, ca.doc_id) AS rk
           |    FROM cands ca JOIN qv q USING (query_id)
           |      JOIN v c2 ON ca.doc_id = c2.vec_id)
           |  WHERE rk <= 10),
           |tpc AS (
           |  SELECT e.query_id, count(*) AS tp_cand FROM ex e
           |  JOIN cands ca ON e.query_id = ca.query_id
           |    AND e.neighbor_id = ca.doc_id
           |  GROUP BY 1),
           |tpf AS (
           |  SELECT e.query_id, count(*) AS tp_final FROM ex e
           |  JOIN hy h ON e.query_id = h.query_id
           |    AND e.neighbor_id = h.neighbor_id
           |  GROUP BY 1),
           |ne AS (SELECT query_id, count(*) AS n_exact FROM ex GROUP BY 1)
           |SELECT CAST(ne.query_id AS BIGINT) AS query_id,
           |  CAST(ne.n_exact AS BIGINT) AS n_exact,
           |  CAST(coalesce(tpc.tp_cand, 0) AS BIGINT) AS tp_cand,
           |  CAST(coalesce(tpf.tp_final, 0) AS BIGINT) AS tp_final,
           |  CAST((coalesce(tpf.tp_final, 0) * 1000000) // ne.n_exact
           |    AS BIGINT) AS recall_micros,
           |  coalesce(tpf.tp_final, 0) = coalesce(tpc.tp_cand, 0)
           |    AS rerank_lossless
           |FROM ne LEFT JOIN tpc USING (query_id)
           |  LEFT JOIN tpf USING (query_id)
           |ORDER BY query_id""".stripMargin,

      // q265: the whole CMS replayed from first principles — same md5
      // cell hashes, same 4×64 counter grid, same min-over-rows
      // estimate; `sound` restates the one-sided guarantee so a
      // single under-estimate anywhere hash-fails.
      "q265_cms_frequency" ->
        s"""WITH l AS (
           |  SELECT list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS l
           |  FROM documents),
           |g AS (
           |  SELECT l[pos] || ' ' || l[pos + 1] AS gram
           |  FROM (SELECT unnest(generate_series(1, len(l) - 1)) AS pos,
           |          l
           |        FROM l WHERE len(l) >= 2)),
           |j AS (SELECT unnest(range(0, 4)) AS j),
           |cells AS (
           |  SELECT j.j,
           |    ('0x' || substr(md5(j.j::VARCHAR || ':' || g.gram), 1, 8))
           |      ::BIGINT % 64 AS c
           |  FROM g CROSS JOIN j),
           |counters AS (SELECT j, c, count(*) AS n FROM cells
           |             GROUP BY 1, 2),
           |exact AS (SELECT gram, count(*) AS exact_count FROM g
           |          GROUP BY 1),
           |est AS (
           |  SELECT e.gram, e.exact_count, min(ct.n) AS est_count
           |  FROM exact e CROSS JOIN j
           |  JOIN counters ct ON ct.j = j.j
           |    AND ct.c = ('0x' || substr(md5(j.j::VARCHAR || ':'
           |      || e.gram), 1, 8))::BIGINT % 64
           |  GROUP BY 1, 2)
           |SELECT gram,
           |  CAST(est_count AS BIGINT) AS est_count,
           |  CAST(exact_count AS BIGINT) AS exact_count,
           |  est_count >= exact_count AS sound
           |FROM est
           |ORDER BY est_count DESC, gram
           |LIMIT 100""".stripMargin,

      // q269: q242's lexical CTE chain up to the summed BM25, both
      // top-20 lists ranked with the same (score desc, id) total
      // order, integer RRF contributions, FULL merge, top-10 fuse.
      "q269_rrf_fusion" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
           |    x -> x <> '')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           |       GROUP BY 1, 2),
           |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
           |qs AS (
           |  SELECT tf.doc_id AS query_id, tf.term,
           |    round(tf.tf * ln(nd.n::DOUBLE / dfreq.df), 6) AS score
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
           |  WHERE tf.doc_id % 50 = 0),
           |qterms AS (
           |  SELECT query_id, term FROM (
           |    SELECT query_id, term, row_number() OVER (
           |      PARTITION BY query_id ORDER BY score DESC, term) AS rk
           |    FROM qs) WHERE rk <= 3),
           |dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
           |c AS (SELECT count(*) AS nd2, avg(len) AS avglen FROM dl),
           |p AS (
           |  SELECT q.query_id, tf.doc_id,
           |    CAST(round(
           |      ln(1.0 + (c.nd2 - dfreq.df + 0.5) / (dfreq.df + 0.5))
           |        * tf.tf * (1.2 + 1.0)
           |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avglen)),
           |      6) AS DECIMAL(18,6)) AS part
           |  FROM qterms q JOIN tf USING (term) JOIN dfreq USING (term)
           |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
           |  WHERE tf.doc_id <> q.query_id),
           |bm AS (SELECT query_id, doc_id, CAST(sum(part) AS DOUBLE)
           |         AS bm25
           |       FROM p GROUP BY 1, 2),
           |lex AS (
           |  SELECT query_id, doc_id, rk AS lex_rank FROM (
           |    SELECT query_id, doc_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rk
           |    FROM bm) WHERE rk <= 20),
           |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qv AS (SELECT vec_id AS query_id, v AS qv FROM v
           |       WHERE vec_id % 50 = 0),
           |dense AS (
           |  SELECT query_id, neighbor_id AS doc_id, rk AS dense_rank
           |  FROM (
           |    SELECT q.query_id, c2.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.query_id
           |        ORDER BY round(list_cosine_similarity(q.qv, c2.v), 6)
           |          DESC, c2.vec_id) AS rk
           |    FROM qv q JOIN v c2 ON c2.vec_id <> q.query_id)
           |  WHERE rk <= 20),
           |f AS (
           |  SELECT coalesce(l.query_id, d.query_id) AS query_id,
           |    coalesce(l.doc_id, d.doc_id) AS doc_id,
           |    coalesce(l.lex_rank, 0) AS lex_rank,
           |    coalesce(d.dense_rank, 0) AS dense_rank
           |  FROM lex l FULL JOIN dense d
           |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
           |r AS (
           |  SELECT query_id, doc_id, lex_rank, dense_rank,
           |    (CASE WHEN lex_rank > 0
           |       THEN 1000000 // (60 + lex_rank) ELSE 0 END)
           |    + (CASE WHEN dense_rank > 0
           |       THEN 1000000 // (60 + dense_rank) ELSE 0 END)
           |      AS rrf_micros
           |  FROM f),
           |top AS (
           |  SELECT * FROM (
           |    SELECT r.*, row_number() OVER (PARTITION BY query_id
           |      ORDER BY rrf_micros DESC, doc_id) AS fused_rank
           |    FROM r) WHERE fused_rank <= 10)
           |SELECT CAST(query_id AS BIGINT) AS query_id,
           |  CAST(fused_rank AS INTEGER) AS fused_rank,
           |  CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(lex_rank AS BIGINT) AS lex_rank,
           |  CAST(dense_rank AS BIGINT) AS dense_rank,
           |  CAST(rrf_micros AS BIGINT) AS rrf_micros
           |FROM top
           |ORDER BY query_id, fused_rank""".stripMargin,

      // q78: same md5 span keys, first occurrence = min (doc,pos)
      // via window rank, coverage union of removed starts, ordered
      // string_agg reassembly; empty-doc left join mirrors spanDedup
      "q78_span_dedup" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS l
           |  FROM documents),
           |tp AS (
           |  SELECT doc_id, unnest(generate_series(0, len(l) - 1)) AS pos, l
           |  FROM toks WHERE len(l) > 0),
           |tok AS (SELECT doc_id, pos, l[pos + 1] AS tok FROM tp),
           |sp AS (
           |  SELECT doc_id, unnest(generate_series(0, len(l) - 8)) AS pos, l
           |  FROM toks WHERE len(l) >= 8),
           |sh AS (
           |  SELECT doc_id, pos,
           |    md5(array_to_string(l[pos + 1 : pos + 8], ' ')) AS h
           |  FROM sp),
           |occ AS (
           |  SELECT doc_id, pos,
           |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
           |  FROM sh),
           |removed AS (SELECT doc_id, pos FROM occ WHERE rn > 1),
           |covered AS (
           |  SELECT DISTINCT doc_id,
           |    unnest(generate_series(pos, pos + 7)) AS pos
           |  FROM removed),
           |kept AS (
           |  SELECT t.doc_id, t.pos, t.tok FROM tok t
           |  ANTI JOIN covered c USING (doc_id, pos)),
           |rebuilt AS (
           |  SELECT doc_id, count(*) AS n_kept,
           |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
           |  FROM kept GROUP BY doc_id)
           |SELECT d.doc_id,
           |  coalesce(r.clean_text, '') AS clean_text,
           |  coalesce(r.n_kept, 0) AS n_kept
           |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin,

      // q79: identical tagged-union counts, add-one smoothing over
      // the shared vocab, DECIMAL(18,6) per-term log-ratios (6dp —
      // far from ln's cross-engine ulp noise), exact numerator sum
      // cast to double before the one division
      "q79_dsir_weights" ->
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 100 = 7 THEN 1 ELSE 0 END AS t,
           |    unnest(list_filter(string_split($norm, ' '),
           |      x -> x <> '')) AS term
           |  FROM documents),
           |ts AS (
           |  SELECT term,
           |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS ct,
           |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS cs
           |  FROM toks GROUP BY term),
           |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
           |               CAST(sum(cs) AS BIGINT) AS ns,
           |               count(*) AS v FROM ts),
           |r AS (
           |  SELECT term,
           |    CAST(round(ln((ct + 1.0) / (tot.nt + tot.v))
           |             - ln((cs + 1.0) / (tot.ns + tot.v)), 6)
           |      AS DECIMAL(18,6)) AS lr
           |  FROM ts CROSS JOIN tot),
           |tf AS (
           |  SELECT doc_id, term, count(*) AS tf FROM toks
           |  WHERE t = 0 GROUP BY 1, 2)
           |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           |  round(CAST(sum(tf.tf * r.lr) AS DOUBLE) / sum(tf.tf), 6) AS score
           |FROM tf JOIN r USING (term)
           |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

      // q77: per-char counts → exact DECIMAL(18,9) term sum →
      // entropy; n_chars pinned to BIGINT (DuckDB sum() is HUGEINT)
      "q77_char_entropy" ->
        """WITH chars AS (
          |  SELECT doc_id, unnest(list_filter(string_split(text, ''),
          |    c -> c <> '')) AS ch
          |  FROM documents),
          |counts AS (SELECT doc_id, ch, count(*) AS c
          |           FROM chars GROUP BY 1, 2),
          |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
          |        FROM counts GROUP BY 1),
          |terms AS (
          |  SELECT counts.doc_id, tot.n,
          |    CAST(round(-(counts.c / CAST(tot.n AS DOUBLE))
          |      * log2(counts.c / CAST(tot.n AS DOUBLE)), 9)
          |      AS DECIMAL(18,9)) AS t
          |  FROM counts JOIN tot USING (doc_id))
          |SELECT doc_id, min(n) AS n_chars,
          |  CAST((CAST(sum(t) * 1000000000 AS HUGEINT) + 500) // 1000
          |    AS BIGINT) / 1000000.0 AS entropy
          |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // q88: literal formula twin of lmPerplexity — Laplace-smoothed
      // reference unigram log2-probs rounded→DECIMAL(18,6) (exact Σ),
      // OOV = the +1 bucket, one double division + pow at the end
      "q88_lm_perplexity" ->
        s"""WITH toks AS (
           |  SELECT doc_id, lang,
           |    unnest(list_filter(string_split($norm, ' '), x -> x <> ''))
           |      AS term
           |  FROM documents),
           |rc AS (SELECT term, count(*) AS c FROM toks
           |       WHERE lang = 'en' GROUP BY term),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |               CAST(count(*) AS BIGINT) AS v FROM rc),
           |lp AS (SELECT term,
           |         CAST(floor(log2((c + 1.0) / (n + v + 1.0)) * 1e6)
           |              / 1e6 AS DECIMAL(18,6)) AS lp
           |       FROM rc, tot),
           |oov AS (SELECT CAST(floor(log2(1.0 / (n + v + 1.0)) * 1e6)
           |               / 1e6 AS DECIMAL(18,6)) AS lp FROM tot),
           |tf AS (SELECT doc_id, term, count(*) AS tf
           |       FROM toks GROUP BY 1, 2),
           |sc AS (
           |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           |    sum(tf.tf * coalesce(lp.lp, (SELECT lp FROM oov))) AS bits
           |  FROM tf LEFT JOIN lp USING (term) GROUP BY tf.doc_id)
           |SELECT doc_id, n_tokens,
           |  floor(-CAST(bits AS DOUBLE) / n_tokens * 1e6) / 1e6
           |    AS bits_per_token,
           |  round(pow(2.0,
           |    floor(-CAST(bits AS DOUBLE) / n_tokens * 1e6) / 1e6), 2)
           |    AS ppl
           |FROM sc ORDER BY doc_id""".stripMargin,

      // q99: q32's quality formula per doc → DECIMAL(18,4) → CUBE with
      // exact sums, one division, '(all)' margin labels
      "q99_data_card" ->
        s"""WITH c AS (SELECT source, lang,
           |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
           |         x -> x <> '')) AS BIGINT) AS nt,
           |    CAST(length(text) AS DOUBLE) AS len,
           |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]',
           |         '', 'g')) AS DOUBLE) AS n_alpha,
           |    ${hits(TextAnalysis.langMarkers.head._2)} AS h_en,
           |    CASE WHEN regexp_matches(text, '[!?.]{3,}|#{2,}|\\{|\\}')
           |         THEN 0.0 ELSE 1.0 END AS good_punct
           |  FROM documents),
           |q AS (SELECT source, lang, nt, CAST(floor((
           |    (CASE WHEN len > 0 THEN n_alpha / len ELSE 0.0 END) +
           |    (CASE WHEN len >= 200 AND len <= 20000 THEN 1.0
           |          WHEN len >= 50 THEN 0.5 ELSE 0.0 END) +
           |    good_punct +
           |    (CASE WHEN h_en >= 2 THEN 1.0 ELSE 0.0 END)) * 250000)
           |    AS BIGINT) AS qm
           |  FROM c)
           |SELECT coalesce(source, '(all)') AS source,
           |  coalesce(lang, '(all)') AS lang,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(nt) AS BIGINT) AS n_tokens,
           |  CAST((2 * sum(qm) + count(*)) // (2 * count(*)) AS BIGINT)
           |    / 1000000.0 AS avg_quality
           |FROM q GROUP BY CUBE(source, lang) ORDER BY 1, 2""".stripMargin,

      // q97: q35's shingle CTE verbatim → distinct (doc, shingle)
      // pairs → df aggregate → df=1 fraction per doc
      "q97_ngram_novelty" ->
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split($norm, ' '),
           |    x -> x <> '') AS t FROM documents),
           |sh AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, len(t) - 3 + 2),
           |    i -> array_to_string(t[i:i+2], ' '))) AS s
           |  FROM toks WHERE len(t) >= 3),
           |p AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
           |dfq AS (SELECT shingle, count(*) AS df FROM p GROUP BY shingle),
           |agg AS (
           |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_unique
           |  FROM p JOIN dfq USING (shingle) GROUP BY p.doc_id)
           |SELECT doc_id, n_shingles, n_unique,
           |  round(CAST(n_unique AS DOUBLE) / n_shingles, 6) AS novelty
           |FROM agg ORDER BY doc_id""".stripMargin,

      // q96: literal bigram-LM twin — reference bigram/unigram tables,
      // Laplace smoothing with unigram-vocab V, unseen-w1 backoff via
      // coalesce(0), DECIMAL(18,6) bit-sums, one division + pow
      "q96_bigram_perplexity" ->
        s"""WITH toks AS (
           |  SELECT doc_id, lang,
           |    list_filter(string_split($norm, ' '), x -> x <> '') AS t
           |  FROM documents),
           |bc AS (
           |  SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM (
           |    SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
           |      i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
           |    FROM toks WHERE len(t) >= 2)),
           |refbi AS (SELECT w1, w2, count(*) AS c12 FROM bc
           |          WHERE lang = 'en' GROUP BY 1, 2),
           |refuni AS (SELECT w1, count(*) AS c1 FROM (
           |    SELECT unnest(t) AS w1 FROM toks WHERE lang = 'en')
           |  GROUP BY 1),
           |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM refuni),
           |tf AS (SELECT doc_id, w1, w2, count(*) AS tf
           |       FROM bc GROUP BY 1, 2, 3),
           |lp AS (
           |  SELECT tf.doc_id, tf.tf,
           |    CAST(floor(log2((coalesce(c12, 0) + 1.0)
           |      / (coalesce(c1, 0) + v + 1.0)) * 1e6) / 1e6
           |      AS DECIMAL(18,6)) AS lp
           |  FROM tf LEFT JOIN refbi USING (w1, w2)
           |       LEFT JOIN refuni USING (w1), v),
           |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
           |         sum(tf * lp) AS bits
           |       FROM lp GROUP BY doc_id)
           |SELECT doc_id, n_bigrams,
           |  floor(-CAST(bits AS DOUBLE) / n_bigrams * 1e6) / 1e6
           |    AS bits_per_bigram,
           |  round(pow(2.0,
           |    floor(-CAST(bits AS DOUBLE) / n_bigrams * 1e6) / 1e6), 2)
           |    AS ppl
           |FROM sc ORDER BY doc_id""".stripMargin,

      // q90/q91: the unrolled 20-round BPE trainer (see bpeRounds) —
      // merge table and trained-segmentation token counts
      "q90_bpe_train" -> bpeTrainOracle(20),
      "q91_bpe_segment" -> bpeSegmentOracle(20),

      // q89: word-frequency table → lateral adjacent-pair unnest →
      // weighted pair counts → (n desc, pair) top-100; substr/length
      // are character-based in both engines
      "q89_bpe_pairs" ->
        s"""WITH words AS (
           |  SELECT word, count(*) AS wc FROM (
           |    SELECT unnest(list_filter(string_split($norm, ' '),
           |      x -> x <> '')) AS word
           |    FROM documents) GROUP BY word),
           |pairs AS (
           |  SELECT unnest(list_transform(range(1, length(word)),
           |    i -> substr(word, CAST(i AS INTEGER), 2))) AS pair, wc
           |  FROM words WHERE length(word) >= 2)
           |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
           |FROM pairs GROUP BY pair
           |ORDER BY n DESC, pair LIMIT 100""".stripMargin,

      // q94: literal water-filling twin — caps, ascending prefix sums,
      // per-rank waterline candidates, the FIRST-eligible election
      // (arg_min by rank k, NOT min over t_k: later ranks' candidates
      // are meaningless once the prefix passes the budget), and the
      // same two integer-operand double divisions
      "q94_unimax" ->
        """WITH tok AS (
          |  SELECT lang, CAST(len(list_filter(string_split_regex(
          |    trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS nt
          |  FROM documents),
          |counts AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens
          |           FROM tok GROUP BY lang),
          |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
          |               CAST(count(*) AS BIGINT) AS nl FROM counts),
          |c AS (SELECT lang, n_tokens, n_tokens * 3 AS cap,
          |        CAST(floor(CAST(t AS DOUBLE) * 0.5) AS BIGINT) AS budget,
          |        nl
          |      FROM counts, tot),
          |w AS (SELECT *, row_number() OVER o AS k,
          |        coalesce(sum(cap) OVER (o ROWS BETWEEN UNBOUNDED
          |          PRECEDING AND 1 PRECEDING), 0) AS p
          |      FROM c WINDOW o AS (ORDER BY cap, lang)),
          |tk AS (SELECT *, CAST(budget - p AS DOUBLE)
          |         / CAST(nl - k + 1 AS DOUBLE) AS t_k FROM w),
          |th AS (SELECT arg_min(t_k, k) AS t FROM tk WHERE cap >= t_k),
          |a AS (SELECT lang, n_tokens, cap,
          |        round(least(CAST(cap AS DOUBLE),
          |          coalesce((SELECT t FROM th),
          |            1.7976931348623157e308)), 4) AS alloc
          |      FROM tk WHERE n_tokens > 0)
          |SELECT lang, n_tokens, cap, alloc,
          |  round(alloc / n_tokens, 6) AS epochs
          |FROM a ORDER BY lang""".stripMargin,

      // q95: literal Flesch twin — same token regex as q30, terminator
      // runs floored at 1, vowel groups floored at the word count,
      // identical-operand IEEE divisions
      "q95_readability" ->
        s"""WITH c AS (
           |  SELECT doc_id,
           |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
           |         x -> x <> '')) AS BIGINT) AS n_words,
           |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
           |         AS BIGINT) AS n_sentences,
           |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
           |         AS BIGINT) AS vg
           |  FROM documents),
           |f AS (SELECT doc_id, n_words, n_sentences,
           |        greatest(vg, n_words) AS n_syllables
           |      FROM c WHERE n_words > 0)
           |SELECT doc_id, n_words, n_sentences, n_syllables,
           |  round(206.835
           |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
           |    4) AS flesch
           |FROM f ORDER BY doc_id""".stripMargin,
    )
    // q190 composes the q153 (truth) and q55 (found) oracles verbatim
    // as derived-table CTEs — the eval's oracle IS the two audited
    // oracles plus set arithmetic, so it can't drift from them.
    val dedupEval = {
      val truthSql = base("q153_setsim_join")
        .stripSuffix("ORDER BY id_a, id_b")
      val foundSql = base("q55_minhash_portable")
        .stripSuffix(" ORDER BY id_a, id_b")
      s"""WITH truth AS (SELECT id_a, id_b FROM ($truthSql) tq),
         |found AS (SELECT id_a, id_b FROM ($foundSql) fq),
         |m AS (SELECT
         |  (SELECT count(*) FROM truth) AS nt,
         |  (SELECT count(*) FROM found) AS nf,
         |  (SELECT count(*) FROM (SELECT * FROM truth INTERSECT
         |     SELECT * FROM found) x) AS tp)
         |SELECT CAST(nt AS BIGINT) AS n_truth,
         |  CAST(nf AS BIGINT) AS n_found, CAST(tp AS BIGINT) AS tp,
         |  CAST(nf - tp AS BIGINT) AS fp,
         |  CAST(nt - tp AS BIGINT) AS fn,
         |  CAST(CASE WHEN nf = 0 THEN 0
         |    ELSE (tp * 1000000) // nf END AS BIGINT)
         |    AS precision_micros,
         |  CAST(CASE WHEN nt = 0 THEN 0
         |    ELSE (tp * 1000000) // nt END AS BIGINT)
         |    AS recall_micros
         |FROM m""".stripMargin
    }
    // q86 is q67's contract delivered by the streaming path — the
    // union-of-micro-batch pair sets must hash-match the SAME oracle
    base + ("q86_stream_dedup" -> base("q67_minhash_incremental")) +
      ("q190_dedup_eval" -> dedupEval)
  }
}
