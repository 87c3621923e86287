package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north_star): image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run as BATCHED partition-local
  * transforms (the Scala analog of pandas-batched UDFs: amortize
  * per-batch setup — codec init, model load — across `batchSize` rows).
  *
  * The byte-level DECODE IS A STUB in this environment (no image/audio
  * libraries in the container): `decodeFeatures` derives a
  * deterministic pseudo-feature vector from the bytes. Everything
  * around it — schema, partitioning, batch shape, null handling — is
  * real and tested; swapping in a real decoder changes only the body of
  * [[MediaCodec.decodeBatch]].
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType), // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("codec", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("meta", metaSchema)))

  /** STUB decoder boundary: a real implementation would initialize the
    * codec once per batch and decode `rows` bytes together (GPU/SIMD
    * batch). Here the "decoded features" are a deterministic fold of
    * the payload bytes into `dim` floats — stable across runs/engines.
    */
  object MediaCodec {
    def decodeBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
      payloads.map { bytes =>
        val out = new Array[Float](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            out(i % dim) += (bytes(i) & 0xFF) / 255.0f
            i += 1
          }
        }
        out
      }
  }

  /** Pack a text table into the media schema with deterministic fake
    * payloads — stands in for `spark.read.format("binaryFile")` or a
    * blob-store scan in production.
    */
  def packAsMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("bytes"),
      struct(
        lit("image").as("kind"),
        (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("duration_ms"),
        lit("fake/raw").as("codec")).as("meta"))

  /** Batched partition-local feature extraction: mapPartitions pulls
    * `batchSize` rows at a time through [[MediaCodec.decodeBatch]] —
    * the plumbing a real decoder needs (no per-row codec setup, no
    * driver involvement, arbitrary partition count).
    * Output: (media_id, features array<float>).
    */
  def decodeFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = MediaCodec.decodeBatch(batch.map(_._2), dim)
        batch.map(_._1).zip(feats)
      }
    }.toDF("media_id", "features")
  }

  /** "Resize" metadata transform — pure column math on the typed meta
    * struct (a real resize would pair this with a decodeBatch body).
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) > maxDim,
      lit(maxDim).cast("double") / greatest(w, h)).otherwise(lit(1.0))
    media.withColumn("meta", struct(
      col("meta.kind").as("kind"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.codec").as("codec")))
  }

  /** Frame sampling for video-kind rows: one output row per sampled
    * frame timestamp (explode of a generated sequence — stays in
    * codegen; the per-frame decode would go through decodeFeatures).
    */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame =
    media.filter(col("meta.kind") === "video" &&
        col("meta.duration_ms").isNotNull)
      .select(col("media_id"), col("meta"),
        explode(sequence(lit(0), col("meta.duration_ms"),
          lit(everyMs))).as("frame_ms"))
}
