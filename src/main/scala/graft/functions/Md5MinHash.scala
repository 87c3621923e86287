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
  * Each shingle STRING s is digested ONCE: `h = ('0x' ||
  * substr(md5(s), 1, 8))::BIGINT` (first 32 bits, always positive).
  * The per-seed hashes come from a seed-derived affine family —
  * `h_i = (a_i * h + b_i) & 0xFFFFFFFF` with `a_i` the first 28 bits
  * of `md5('a:' || i)` forced odd and `b_i` the first 32 bits of
  * `md5('b:' || i)` — classic universal-hash MinHash, and every step
  * is plain 63-bit-safe integer arithmetic DuckDB reproduces exactly
  * (`a_i ≤ 2^28`, `h < 2^32` → product < 2^60, no overflow). The
  * signature is the per-seed minimum over the document's shingles;
  * each band of `numHashes / bands` consecutive minima is emitted as
  * a comma-joined decimal string — the join key itself, matching
  * DuckDB's `array_to_string(mins[b*r+1 : b*r+r], ',')` with no
  * second hash to port.
  *
  * One codegen call per document (no shuffle, no aggregation buffers,
  * no per-element lambda fan-out). Cost: one md5 digest per shingle
  * plus `numHashes` multiply-adds — the earlier scheme digested per
  * (shingle, seed), numHashes× more md5 work, which made the portable
  * query the heaviest in the whole bench suite. The xxhash64 path
  * ([[SketchSigs.minhashBands]]) remains the production default
  * (xxhash64 is still several times cheaper than md5); use this
  * variant where cross-engine reproducibility is the point (oracle
  * checks, engine migrations).
  */
object Md5MinHash {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Seed-derived affine constants (a_i odd 28-bit, b_i 32-bit, both
    * md5-derived so DuckDB can rebuild them), cached process-wide.
    * Monotone grow-only publish — racing writers install equivalent
    * tables, so lock-free volatile swap is safe.
    */
  @volatile private var abCache: (Array[Long], Array[Long]) =
    (Array.empty, Array.empty)
  private def seedConsts(n: Int): (Array[Long], Array[Long]) = {
    val cached = abCache
    if (cached._1.length >= n) cached
    else {
      val md = mdLocal.get()
      val m = math.max(n, 64)
      def prefix(tag: String, i: Int, hexChars: Int): Long = {
        md.reset()
        val d = md.digest(s"$tag:$i".getBytes(
          java.nio.charset.StandardCharsets.US_ASCII))
        var v = 0L
        var c = 0
        while (c < hexChars) {
          val nib =
            if (c % 2 == 0) (d(c / 2) & 0xF0) >>> 4 else d(c / 2) & 0x0F
          v = (v << 4) | nib
          c += 1
        }
        v
      }
      val fresh = (Array.tabulate(m)(i => prefix("a", i, 7) | 1L),
        Array.tabulate(m)(i => prefix("b", i, 8)))
      abCache = fresh
      fresh
    }
  }

  /** First 32 bits of md5(s) as a non-negative long — the value of
    * the first 8 lowercase-hex characters of the digest (the shared
    * [[PortableBytes]] primitive).
    */
  def md5Prefix32(md: java.security.MessageDigest,
      sBytes: Array[Byte]): Long =
    PortableBytes.md5Prefix32(md, sBytes, 0, sBytes.length)

  def bandKeysCompute(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = arr.numElements()
    // an empty shingle set has NO minima: emit an empty band array (no
    // join keys) rather than all-Long.MaxValue keys, which would put
    // every empty doc in one degenerate bucket per band (an O(n²)
    // candidate blowup) and diverge from the DuckDB twin, where
    // list_min over an empty list is NULL
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val (as, bs) = seedConsts(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = mdLocal.get()
    var j = 0
    while (j < n) {
      val h = md5Prefix32(md, arr.getUTF8String(j).getBytes)
      var i = 0
      while (i < numHashes) {
        val hi = (as(i) * h + bs(i)) & 0xFFFFFFFFL
        if (hi < mins(i)) mins(i) = hi
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
