package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass sketch signatures for the dedup operators
  * ([[graft.operators.Dedup]]). Both expressions are BIT-IDENTICAL to
  * the explode + groupBy forms they replace — every hash goes through
  * Spark's own [[XxHash64Function]] with the same child order and the
  * default seed 42, so `xxhash64(x, lit(i))` and these agree value for
  * value — but compute per DOCUMENT in one codegen call instead of
  * shuffling one row per (element × doc) through a hash aggregate:
  * the signature stage costs zero shuffles and zero aggregation
  * buffers.
  */
object SketchSigs {

  /** MinHash band hashes: per-seed minima over the shingle-hash array
    * (seed trick: h_i(s) = xxhash64(s, i)), then each band of
    * `numHashes / bands` consecutive minima is folded to one long
    * exactly like `xxhash64(concat_ws(",", mins…cast(string)), lit(b))`.
    * An empty shingle array yields band hashes over all-MaxValue minima
    * — callers filter empty docs first (as [[graft.operators.Dedup]]
    * does), since "no shingles" has no meaningful signature.
    */
  def minhashBandsCompute(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val m = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < m) {
      // shared prefix: xxhash64(s, i) = hashInt(i, hashLong(s, 42))
      val h0 = XxHash64Function.hash(arr.getLong(j), LongType, 42L)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(i, IntegerType, h0)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rows + r))
        r += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(b) = XxHash64Function.hash(b, IntegerType,
        XxHash64Function.hash(u, StringType, 42L))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over space-separated tokens of pre-normalized text
    * (single-space separators, as [[graft.operators.TextAnalysis
    * .normalizeText]] produces; leading/trailing/runs of spaces are
    * tolerated and skipped). Token hash = `xxhash64(token)`; per-bit
    * ±1 votes; bit set iff vote sum positive. A token-less input
    * yields 0L — callers filter empty docs first for parity with the
    * explode form, which emits no row at all for them.
    */
  def simhash64Compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    val votes = new Array[Int](64)
    var i = 0
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        val start = i
        while (i < len && bytes(i) != ' ') i += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val h = XxHash64Function.hash(tok, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var word = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) word |= (1L << b)
      b += 1
    }
    word
  }

  def minhashBands(shingles: Column, numHashes: Int, bands: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(MinHashBands(
      ColumnBridge.expression(shingles), numHashes, bands))
  }

  def simhash64(normalizedText: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(normalizedText)))
  }
}

case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && numHashes % bands == 0,
    s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchSigs.minhashBandsCompute(input.asInstanceOf[ArrayData], numHashes,
      bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchSigs.minhashBandsCompute($c, $numHashes, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchSigs.simhash64Compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchSigs.simhash64Compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
