package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable MinHash band keys: the md5-seeded twin of
  * [[SketchSigs.minhashBandsCompute]], built so a DuckDB oracle can
  * replicate every hash bit-for-bit (xxhash64 has no DuckDB twin; md5
  * exists everywhere — the same construction [[graft.operators.Scale
  * .hashBucket]] uses, which q51 hash-matches cross-engine).
  *
  * Per shingle STRING s and seed i, the hash is the first 60 bits of
  * `md5(utf8(s) ++ ":" ++ decimal(i))` read big-endian — exactly
  * `('0x' || substr(md5(s || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT`
  * in DuckDB (15 hex chars = 60 bits, always positive, fits a long).
  * The signature is the per-seed minimum over the document's shingles;
  * each band of `numHashes / bands` consecutive minima is emitted as a
  * comma-joined decimal string — the join key itself, matching DuckDB's
  * `array_to_string(mins[b*r+1 : b*r+r], ',')` with no second hash to
  * port.
  *
  * One codegen call per document (no shuffle, no aggregation buffers,
  * no per-element lambda fan-out); the xxhash64 path stays the fast
  * default for production corpora — this variant computes a FULL md5
  * per (shingle, seed) pair (numHashes digests per shingle vs one
  * 64-bit mix), so on a real corpus expect roughly an order of
  * magnitude more hash work than [[SketchSigs.minhashBands]]. Use it
  * where cross-engine reproducibility is the point (oracle checks,
  * engine migrations), not as the hot path.
  */
object Md5MinHash {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** ASCII-decimal seed byte strings, cached process-wide: rebuilding
    * `numHashes` Integer.toString arrays per ROW was measurable noise
    * next to the md5 work. Monotone grow-only publish — racing writers
    * install equivalent tables, so lock-free volatile swap is safe.
    */
  @volatile private var digitsCache: Array[Array[Byte]] = Array.empty
  private def seedDigits(n: Int): Array[Array[Byte]] = {
    val cached = digitsCache
    if (cached.length >= n) cached
    else {
      val fresh = Array.tabulate(math.max(n, 64))(i =>
        Integer.toString(i).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      digitsCache = fresh
      fresh
    }
  }

  /** First 60 bits of md5(s ++ ":" ++ i) as a non-negative long —
    * digest bytes 0..6 then the high nibble of byte 7, i.e. the value
    * of the first 15 lowercase-hex characters.
    */
  def md5Seeded60(md: java.security.MessageDigest, sBytes: Array[Byte],
      seedDigits: Array[Byte]): Long = {
    md.reset()
    md.update(sBytes)
    md.update(':'.toByte)
    md.update(seedDigits)
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xFF); b += 1 }
    (v << 4) | ((d(7) & 0xF0) >>> 4)
  }

  def bandKeysCompute(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = arr.numElements()
    // an empty shingle set has NO minima: emit an empty band array (no
    // join keys) rather than all-Long.MaxValue keys, which would put
    // every empty doc in one degenerate bucket per band (an O(n²)
    // candidate blowup) and diverge from the DuckDB twin, where
    // list_min over an empty list is NULL
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val digits = seedDigits(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = mdLocal.get()
    var j = 0
    while (j < n) {
      val sBytes = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < numHashes) {
        val h = md5Seeded60(md, sBytes, digits(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    val rows = numHashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rows + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: array<string> shingles → array<string>
    * band keys (index = band). An EMPTY shingle array yields an empty
    * band array — such documents produce no LSH join keys and so can
    * never pair (callers typically also filter `size(shingles) > 0`
    * so signature-less docs don't ride the pipeline at all).
    */
  def bandKeys(shingles: Column, numHashes: Int, bands: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(Md5MinHashBandKeys(
      ColumnBridge.expression(shingles), numHashes, bands))
  }
}

case class Md5MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && numHashes % bands == 0,
    s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Md5MinHash.bandKeysCompute(input.asInstanceOf[ArrayData], numHashes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5MinHash.bandKeysCompute($c, $numHashes, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_minhash_band_keys"
}
