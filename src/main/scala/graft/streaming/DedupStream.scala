package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * overwrite mode, the same pattern as [[ChangesStream]] — an
  * at-least-once redelivery rewrites identical content instead of
  * duplicating it.
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
    val schema = spark.read.parquet(s"$docsDir").select(idCol, textCol).schema
    val stream = spark.readStream.schema(schema)
      // one file per micro-batch by default: each ingest drop probes
      // the index BEFORE being folded in, the daily-ingest cadence
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // the index/docs reads must NOT see this batch's own dirs —
        // they are written only after the pairs action completes
        val index = s.read.parquet(indexDir)
          .select(idCol, "band_idx", "band_hash")
        val knownDocs = s.read.parquet(docsDir).select(idCol, textCol)
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
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
