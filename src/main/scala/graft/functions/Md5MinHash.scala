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
  * default for production corpora.
  */
object Md5MinHash {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
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
    val seedDigits = Array.tabulate(numHashes)(i =>
      Integer.toString(i).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = mdLocal.get()
    var j = 0
    while (j < n) {
      val sBytes = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < numHashes) {
        val h = md5Seeded60(md, sBytes, seedDigits(i))
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
    * band keys (index = band).
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
