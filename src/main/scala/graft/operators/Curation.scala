package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composition the individual
  * operators exist for, as one declarative pipeline a 100 TB run would
  * execute stage by stage:
  *
  *   1. quality gate       — language + quality-score + repetition +
  *                           compression-ratio floors (per-doc codegen,
  *                           no shuffle beyond repetition's aggregation)
  *   2. PII redaction      — codegen regexp scrub, no shuffle
  *   3. exact dedup        — hash-groupBy, one shuffle
  *   4. near-dup removal   — MinHash+LSH pairs → connected components →
  *                           drop every non-keeper
  *   5. decontamination    — drop docs overlapping the benchmark set
  *
  * Every stage is a DataFrame→DataFrame function of the operators in
  * this package; nothing collects; every shuffle is keyed by doc or
  * hash. Stages prune monotonically, so the expensive pair generation
  * runs on the already-reduced corpus.
  */
object Curation {

  /** Tuning knobs with corpus-pipeline-typical defaults.
    * `reliableStorage` switches stage materialization from
    * localCheckpoint (executor-local blocks — fastest, but one executor
    * loss fails the run and storage pressure is unbounded) to
    * `persist(DISK_ONLY_2)`: disk-backed, replicated ×2, lineage
    * retained so a lost block recomputes instead of failing — the right
    * setting for a 100 TB run on a real cluster.
    */
  case class Params(
      lang: String = "en",
      minQuality: Double = 0.3,
      maxTopTokenFrac: Double = 0.3,
      maxDupTrigramFrac: Double = 0.5,
      minCompressionRatio: Double = 0.05,
      jaccardThreshold: Double = 0.8,
      decontaminateMinOverlap: Int = 2,
      reliableStorage: Boolean = false)

  /** Materialize a stage per the Params storage policy (see [[Params]]). */
  private def mat(df: DataFrame, p: Params): DataFrame =
    if (p.reliableStorage)
      df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY_2)
    else df.localCheckpoint(true)

  /** Per-stage surviving-document counts for the run report. */
  case class Report(
      input: Long, afterQuality: Long, afterExact: Long,
      afterNearDup: Long, afterDecontaminate: Long)

  /** Curate `docs` (idCol, textCol) against `benchmark`; returns the
    * surviving documents with redacted text plus a stage-count report
    * (the counts trigger evaluation — callers wanting a single lazy
    * plan use [[curateLazy]]).
    */
  def curate(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      p: Params = Params()): (DataFrame, Report) = {
    // each stage is materialized ONCE (per the Params storage policy —
    // localCheckpoint by default, DISK_ONLY_2 persist for large-corpus
    // reliability) before its count — without this, every count()
    // action would re-execute the whole upstream pipeline (the quality
    // stage alone carries two shuffles and a join), multiplying total
    // work several-fold
    val input = docs.count()
    val clean = mat(curateQuality(docs, idCol, textCol, p), p)
    val afterQuality = clean.count()
    val exact = mat(Dedup.exactDedup(clean, textCol, col(idCol)), p)
    val afterExact = exact.count()
    val deduped = mat(dropNearDups(exact, idCol, textCol, p), p)
    val afterNearDup = deduped.count()
    val out = mat(dropContaminated(deduped, benchmark, idCol, textCol, p), p)
    (out, Report(input, afterQuality, afterExact, afterNearDup, out.count()))
  }

  /** The same pipeline as one composition without stage counts or
    * checkpoints. NOT fully lazy: the near-dup clustering stage
    * ([[Dedup.connectedComponents]]) is iterative and runs its
    * fixpoint jobs — including MinHash pair generation — when this is
    * CALLED, not when the result is acted on; only the surrounding
    * stages defer.
    */
  def curateLazy(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      p: Params = Params()): DataFrame =
    dropContaminated(
      dropNearDups(
        Dedup.exactDedup(curateQuality(docs, idCol, textCol, p),
          textCol, col(idCol)),
        idCol, textCol, p),
      benchmark, idCol, textCol, p)

  /** Stage 1+2: quality floors, then redact surviving text. */
  private def curateQuality(
      docs: DataFrame, idCol: String, textCol: String, p: Params): DataFrame = {
    val rep = TextAnalysis.repetitionStats(docs, idCol, textCol)
      .select(col(idCol), col("top_token_frac"), col("dup_trigram_frac"))
    docs
      .filter(TextAnalysis.langId(col(textCol)) === p.lang)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= p.minQuality)
      .filter(TextAnalysis.compressionRatio(col(textCol)) >=
        p.minCompressionRatio)
      .join(rep, Seq(idCol)) // token-less docs drop here by absence
      .filter(col("top_token_frac") <= p.maxTopTokenFrac &&
        col("dup_trigram_frac") <= p.maxDupTrigramFrac)
      .drop("top_token_frac", "dup_trigram_frac")
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
  }

  /** Stage 4: LSH pairs → clusters → drop non-keepers. */
  private def dropNearDups(
      docs: DataFrame, idCol: String, textCol: String, p: Params): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol,
      threshold = p.jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val losers = Dedup.keeperPerCluster(pairs)
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Stage 5: benchmark n-gram overlap. */
  private def dropContaminated(
      docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, p: Params): DataFrame = {
    val contaminated = Dedup.decontaminate(docs, benchmark, idCol, textCol,
      minOverlap = p.decontaminateMinOverlap)
      .select(col(idCol))
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}
