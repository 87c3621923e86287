package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes in one pass — the workhorse of
  * the dedup operators ([[graft.operators.Dedup]]).
  *
  * Semantics match the composable form exactly for ASCII text
  * (normalize to lowercase with collapsed whitespace, split, n-token
  * windows, distinct) — case folding here is ASCII-only ('A'-'Z'),
  * whereas lower() folds full Unicode; non-ASCII corpora should
  * lower() the column first. But
  * where the built-in pipeline chains SEVEN interpreted higher-order /
  * regex expressions and allocates every shingle string, this
  * expression scans the bytes once and emits 64-bit shingle hashes
  * (FNV-1a per token, order-sensitive polynomial combine per window).
  * Profiled at ~10s → sub-second for 5000 documents at sf0.1.
  * Downstream set algebra (posting joins, Jaccard counts, MinHash) is
  * hash-equality based, so the long form is drop-in; collision odds at
  * 2^-64 per pair are far below the float-rounding tolerances already
  * accepted by the oracle gate.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Combine = 0x9e3779b97f4a7c15L

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** One-pass tokenize (whitespace runs, ASCII lowercase) + n-token
    * rolling window combine + distinct. Returns sorted longs.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token hashes (FNV-1a over lowercased bytes)
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        var h = FnvOffset
        while (i < len && !isSpace(bytes(i))) {
          var b = bytes(i)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          h = (h ^ (b & 0xFF)) * FnvPrime
          i += 1
        }
        tokenHashes += h
      }
    }
    val m = tokenHashes.length
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new java.util.HashSet[java.lang.Long](m * 2)
    val arr = new scala.collection.mutable.ArrayBuffer[Long](m - n + 1)
    var s = 0
    while (s <= m - n) {
      var h = Combine
      var j = 0
      while (j < n) {
        h = java.lang.Long.rotateLeft(h, 5) * FnvPrime ^ tokenHashes(s + j)
        j += 1
      }
      if (out.add(h)) arr += h
      s += 1
    }
    val sorted = arr.toArray
    java.util.Arrays.sort(sorted)
    new GenericArrayData(sorted)
  }

  /** Column-API entry point. */
  def shingleHashes(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
  }
}
