package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm) as a native Catalyst expression with codegen.
  *
  * Computes Karp-Rabin rolling hashes of every k-byte gram in O(n) —
  * something `transform`+`substring` built-ins can only do in O(n·k)
  * with interpreted lambdas — then keeps the minimum hash of each
  * w-hash window (rightmost-min rule, consecutive duplicates dropped).
  * The resulting fingerprint set is position-robust: near-duplicate
  * documents share most fingerprints even under edits, which is the
  * guarantee plain k-gram MinHash lacks for long documents.
  *
  * Tier (b) of the custom-operator ladder: a scalar `Expression` with
  * `doGenCode` delegating to a static implementation — the call stays
  * inside whole-stage codegen (no virtual `eval` dispatch, no UDF
  * serialization). Reference for the fingerprint surface:
  * document fingerprinting in BASELINE.json north_star.
  */
case class RollingWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    RollingWinnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingWinnow.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_winnow"
}

object RollingWinnow {
  /** Modulus/base for the Karp-Rabin hash: p = 2^31-1 keeps every
    * intermediate below 2^63 (no Long overflow, identical results on
    * any platform).
    */
  final val P = 2147483647L
  final val B = 257L

  /** Static implementation shared by eval and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling hashes of all k-grams
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var h = 0L
    var pow = 1L // B^(k-1) mod P
    var i = 0
    while (i < k) {
      h = (h * B + (bytes(i) & 0xFF)) % P
      if (i < k - 1) pow = (pow * B) % P
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = (h - ((bytes(i - 1) & 0xFF) * pow) % P + P) % P
      h = (h * B + (bytes(i + k - 1) & 0xFF)) % P
      hashes(i) = h
      i += 1
    }
    if (nh <= w) {
      // document shorter than one window: keep the single minimum
      var min = hashes(0); i = 1
      while (i < nh) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    // winnowing: rightmost minimum of each w-window, record when the
    // selected position changes
    val out = new scala.collection.mutable.ArrayBuffer[Long](nh / w + 4)
    var minPos = -1
    var start = 0
    while (start + w <= nh) {
      if (minPos < start) {
        minPos = start
        var j = start + 1
        while (j < start + w) { if (hashes(j) <= hashes(minPos)) minPos = j; j += 1 }
        out += hashes(minPos)
      } else {
        val newest = start + w - 1
        if (hashes(newest) <= hashes(minPos)) { minPos = newest; out += hashes(minPos) }
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def rollingWinnow(c: Column, k: Int = 8, w: Int = 4): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(RollingWinnow(ColumnBridge.expression(c), k, w))
  }
}
