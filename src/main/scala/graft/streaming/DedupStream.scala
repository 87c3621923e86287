package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming daily-ingest near-dup detection — the incremental MinHash
  * contract ([[graft.operators.Dedup.minhashNearDupsIncrementalPortable]])
  * driven by Structured Streaming: each micro-batch of documents
  * probes the PERSISTED band index (original corpus + every earlier
  * batch), emits its near-dup pairs, and then appends its own bands
  * and raw docs to the index stores. Later batches therefore collide
  * with earlier ones, so the union of per-batch pair sets equals the
  * one-shot incremental result over all streamed docs — the invariant
  * DedupStreamSpec asserts.
  *
  * Idempotency under checkpoint replay: every per-batch write
  * (pairs, bands, docs) goes to its own `batch_id=N` directory in
  * overwrite mode, the same pattern as [[ChangesStream]], AND the
  * index/docs reads exclude batch ids >= the current one — a replayed
  * batch whose fold-in writes landed before a crash would otherwise
  * see its own docs on both sides of the verify join and rewrite
  * DIFFERENT (duplicated) pair content instead of identical content.
  *
  * Scale: the per-batch cost is O(batch) sketches + one band
  * equi-join against the index — the corpus is never re-sketched; at
  * 100 TB the index stores would live on the lake (partitioned
  * parquet exactly as here) and the probe join is
  * shuffle-partitionable on the band key.
  */
object DedupStream {

  /** Drain `sourceDir` (parquet docs: idCol, textCol) as micro-batches
    * against the band index rooted at `indexDir` (pre-seeded with the
    * corpus bands under `batch_id=base`; corpus raw docs under
    * `docsDir/batch_id=base`), writing pair sets under `pairsDir`.
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      indexDir: String,
      docsDir: String,
      pairsDir: String,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6,
      maxFilesPerTrigger: Int = 1): Unit = {
    // Store↔checkpoint identity guard: the stream's identity is its
    // checkpoint id (STABLE across legitimate restarts from the same
    // checkpoint); the store remembers which stream built it. Batch-id
    // arithmetic cannot make this safe — a lost checkpoint restarting
    // at id 0 over a store whose max id is 0 is indistinguishable from
    // a legitimate replay by ids alone — so pairing ids is the only
    // sound check, and it runs ONCE per run, not per batch.
    val marker = java.nio.file.Paths.get(indexDir, "_stream_id")
    val ckpMeta = java.nio.file.Paths.get(checkpointDir, "metadata")
    val ckpId: Option[String] =
      if (java.nio.file.Files.exists(ckpMeta))
        "\"id\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(java.nio.file.Files.readString(ckpMeta))
          .map(_.group(1))
      else None
    if (java.nio.file.Files.exists(marker)) {
      val prev = java.nio.file.Files.readString(marker).trim
      require(ckpId.contains(prev),
        s"DedupStream: store at $indexDir was built by stream $prev but " +
          s"this checkpoint is ${ckpId.getOrElse("fresh")} — a new " +
          "checkpoint over an existing store would replay batch ids and " +
          "silently drop or clobber earlier batches; use a fresh store " +
          "or the original checkpoint")
    } else require(ckpId.isEmpty,
      s"DedupStream: checkpoint $checkpointDir has committed batches but " +
        s"the store at $indexDir carries no _stream_id marker — reusing " +
        "a checkpoint over a fresh store would skip its committed " +
        "batches; use a fresh checkpoint with a fresh store")
    val schema = spark.read.parquet(s"$docsDir").select(idCol, textCol).schema
    val stream = spark.readStream.schema(schema)
      // one file per micro-batch by default: each ingest drop probes
      // the index BEFORE being folded in, the daily-ingest cadence
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val s = rawBatch.sparkSession
        // the batch feeds three pipelines (probe sketch, fold-in
        // sketch, docs write) — persist it so the source file is read
        // once. The md5 sketch itself still runs twice (probe + fold-
        // in); a deployment with large drops should band once and
        // derive both from that frame.
        val batch = rawBatch.persist()
        try {
          // the index/docs reads must not see this batch's OWN dirs.
          // Within one attempt that holds by write ordering, but a
          // checkpoint REPLAY of a batch whose fold-in writes landed
          // before the crash would re-read them and violate the
          // disjoint-ids precondition (duplicated pairs) — so exclude
          // this batch id and any later one explicitly.
          def past(dir: String) = s.read.parquet(dir)
            .filter(col("batch_id") === "base" ||
              expr("try_cast(batch_id AS BIGINT)") < batchId)
          val index = past(indexDir).select(idCol, "band_idx", "band_hash")
          val knownDocs = past(docsDir).select(idCol, textCol)
          val pairs = Dedup.minhashNearDupsIncrementalPortable(
            index, knownDocs, batch, idCol, textCol,
            shingleLen, numHashes, bands, threshold)
          pairs.write.mode("overwrite")
            .parquet(s"$pairsDir/batch_id=$batchId")
          // now fold the batch into the stores so the NEXT batch
          // collides with it
          Dedup.minhashBandIndexPortable(batch, idCol, textCol,
              shingleLen, numHashes, bands)
            .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
          batch.select(idCol, textCol).write.mode("overwrite")
            .parquet(s"$docsDir/batch_id=$batchId")
        } finally batch.unpersist()
      }
      .start()
    // first run against this store: record the stream identity (q.id
    // IS the checkpoint id, stable across restarts)
    if (!java.nio.file.Files.exists(marker))
      java.nio.file.Files.writeString(marker, q.id.toString)
    q.processAllAvailable()
    q.stop()
  }
}
