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
  * Decode: uncompressed 24-bit BMP and binary PPM (P6) payloads are
  * REALLY decoded (pure JVM header parse → RGB pixels,
  * [[MediaCodec.decodeBmp]] / [[MediaCodec.decodePpm]]); all other
  * codecs are a declared STUB (no image/audio libraries in this
  * container) that folds raw payload bytes into a deterministic
  * pseudo-feature vector. Everything around the boundary — schema,
  * partitioning, batch shape, null handling — is real and tested;
  * supporting jpeg/png/wav changes only [[MediaCodec.decodeBatch]].
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

  /** Decoder boundary. A real deployment would initialize the codec
    * once per batch and decode `rows` bytes together (GPU/SIMD batch).
    * Two paths here:
    *  - uncompressed 24-bit BMP payloads get a REAL pure-JVM decode
    *    (header parse → top-down RGB pixels) — no external codec
    *    library needed, so the batch boundary is exercised by genuine
    *    image bytes;
    *  - anything else falls back to a deterministic fold of the raw
    *    payload bytes (STUB — the container ships no image/audio
    *    libraries; jpeg/png/wav would slot in beside decodeBmp).
    */
  object MediaCodec {

    /** One decoded frame: top-down row-major RGB, 3 bytes per pixel. */
    final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

    private def i32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def i16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

    /** Parse an uncompressed (BI_RGB) 24-bit BMP: 'BM' magic, little-
      * endian header fields, 4-byte-padded BGR rows stored bottom-up
      * (or top-down when height is negative). Returns None for
      * anything that isn't exactly this shape — the caller falls back
      * to the stub rather than guessing.
      */
    def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 54 ||
        bytes(0) != 'B' || bytes(1) != 'M') return None
      val pixelOff = i32(bytes, 10)
      val width = i32(bytes, 18)
      val rawHeight = i32(bytes, 22)
      val bpp = i16(bytes, 28)
      val compression = i32(bytes, 30)
      if (bpp != 24 || compression != 0 || width <= 0 ||
        rawHeight == 0 || rawHeight == Int.MinValue) return None
      val height = math.abs(rawHeight)
      val bottomUp = rawHeight > 0
      // ALL size math in Long: a crafted width (e.g. 0x2AAAAAAB) makes
      // width*3 overflow Int negative, sails past a naive bounds check,
      // and NegativeArraySizeException kills the task — this decoder's
      // contract on malformed bytes is None, never a throw
      val rowSize = ((width.toLong * 3 + 3) / 4) * 4 // rows pad to 4 bytes
      if (pixelOff < 54 || rowSize * height > bytes.length.toLong -
        pixelOff || width.toLong * height * 3 > Int.MaxValue) return None
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        // bounds proven above, so the Int narrowing is exact
        val srcRow = (pixelOff + (if (bottomUp) (height - 1 - y) else y) *
          rowSize).toInt
        var x = 0
        while (x < width) {
          val s = srcRow + x * 3 // BGR on disk
          val d = (y * width + x) * 3
          rgb(d) = bytes(s + 2) // R
          rgb(d + 1) = bytes(s + 1) // G
          rgb(d + 2) = bytes(s) // B
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(width, height, rgb))
    }

    /** Parse a binary PPM (P6, maxval 255): ASCII header `P6 <w> <h>
      * 255` with #-comments, single whitespace after maxval, then raw
      * RGB triplets — already top-down row-major, no reordering needed.
      * None for anything else (P3 ASCII, 16-bit maxval, truncated).
      */
    def decodePpm(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 10 ||
        bytes(0) != 'P' || bytes(1) != '6') return None
      var i = 2
      def skipSpaceAndComments(): Unit = {
        var more = true
        while (more && i < bytes.length) {
          if (bytes(i) == '#') { // comment runs to end of line
            while (i < bytes.length && bytes(i) != '\n') i += 1
          } else if (bytes(i) == ' ' || bytes(i) == '\t' ||
            bytes(i) == '\n' || bytes(i) == '\r') i += 1
          else more = false
        }
      }
      def readInt(): Long = {
        skipSpaceAndComments()
        var v = 0L
        var any = false
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); i += 1; any = true
          if (v > Int.MaxValue) return -1
        }
        if (any) v else -1
      }
      val width = readInt()
      val height = readInt()
      val maxval = readInt()
      if (width <= 0 || height <= 0 || maxval != 255) return None
      // ONE whitespace delimiter after maxval — and it must BE
      // whitespace: skipping blindly would decode pixels shifted by
      // one for malformed headers instead of refusing. A Windows
      // text-mode CRLF counts as one logical delimiter (consuming only
      // the '\r' would also shift every pixel by one).
      if (i >= bytes.length || !(bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r')) return None
      if (bytes(i) == '\r' && i + 1 < bytes.length && bytes(i + 1) == '\n')
        i += 1
      i += 1
      val n = width * height * 3
      if (n > Int.MaxValue || i + n > bytes.length) return None
      Some(DecodedImage(width.toInt, height.toInt,
        java.util.Arrays.copyOfRange(bytes, i, i + n.toInt)))
    }

    /** Deterministic byte-fold pseudo-features — the stub path for
      * codecs this container can't decode.
      */
    private def foldBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
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

    /** Features from real pixels: fold normalized RGB intensities into
      * `dim` buckets in pixel order — a stand-in for an embedding
      * model, but computed from genuinely decoded image content.
      */
    private def pixelFeatures(img: DecodedImage, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < img.rgb.length) {
        out(i % dim) += (img.rgb(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }

    def decodeBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
      payloads.map { bytes =>
        decodeBmp(bytes).orElse(decodePpm(bytes)) match {
          case Some(img) => pixelFeatures(img, dim)
          case None => foldBytes(bytes, dim)
        }
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
