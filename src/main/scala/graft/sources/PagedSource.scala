package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Paged / keyed external-source ingestion (reference S3-S5: the Pure
  * REST changes feed `extractor_loaders/pure_api_changes.py:98` and
  * per-uuid document lookups `pure_api_persons.py:142`,
  * `pure_to_edw/collection.py:48`). No network exists in this
  * environment, so the fetch is an injected function; the Spark-side
  * shapes are the real design:
  *
  *  - a paged changes feed is DRIVER-fetched (it is a single cursor —
  *    inherently sequential) and parallelizes immediately after
  *    `toDF`, with the resume offset carried as max(downloaded)
  *    ([[graft.etl.PureDocs.resumeOffset]]);
  *  - keyed lookups fan out via `mapPartitions` with per-batch fetches
  *    — the set-level replacement for the reference's N+1 loop: 1000
  *    executors × batched gets instead of one Python process.
  */
object PagedSource {

  /** S3: drain a paged feed from `startOffset` until an empty page.
    * `fetch(offset, page)` returns the page's raw JSON rows. Returns
    * (uuid, json, downloaded) rows; `downloadedAt` is stamped by the
    * caller for determinism.
    */
  def drainPages(
      spark: SparkSession,
      fetch: (Int, Int) => Seq[(String, String)],
      pageSize: Int,
      downloadedAt: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    val pages = Iterator.from(0)
      .map(p => fetch(p, pageSize))
      .takeWhile(_.nonEmpty)
      .flatten
      .toSeq
    pages.toDF("uuid", "json")
      .withColumn("downloaded", lit(downloadedAt))
  }

  /** S4/S5: batched keyed lookup distributed over the cluster — the ids
    * frame is partitioned; each partition issues `fetch` once per
    * `batchSize` keys (reference: one HTTP GET per record on the
    * driver). `fetch` must be serializable and is executed on
    * executors.
    */
  def fetchByKeys(
      ids: Dataset[String],
      batchSize: Int,
      fetch: Seq[String] => Seq[(String, String)]): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => fetch(batch.toSeq))
    }.toDF("uuid", "json")
  }

  /** S10: rotated gzip JSON processed-record log (reference
    * `loggers.py:20-60` appends to daily-rotated gzip files): an
    * append-mode gzip JSON sink partitioned by log date — rotation is
    * the partition column; retention is dropping old partitions.
    */
  def appendGzipJsonLog(df: DataFrame, dir: String, logDate: String): Unit =
    df.withColumn("log_date", lit(logDate))
      .write.mode("append")
      .partitionBy("log_date")
      .option("compression", "gzip")
      .json(dir)
}
