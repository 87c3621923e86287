package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable winnowing in one codegen pass — the md5 twin of
  * [[RollingWinnow]], for q59's DuckDB-oracled variant.
  *
  * Input is the ALREADY-NORMALIZED text (the caller applies
  * `normalizeText`, mirroring the oracle's `$norm`). Grams are k
  * CHARACTERS (code points — `substr`/`len` semantics shared by
  * Spark and DuckDB), each digested once (md5 prefix 32,
  * `('0x' || substr(md5(substr(nm,i,k)),1,8))::BIGINT`). Each gram's
  * (hash, position) packs into one long `hash << 21 | (2^21-1 - pos)`
  * (pos is 1-based), so the window minimum implements the MOSS
  * rightmost-min rule; selected positions are non-decreasing across
  * consecutive windows, so consecutive dedup equals global dedup.
  * Returns packed keys in selection order; callers unpack with
  * `>> 21` / `& (2^21-1)`. Docs longer than 2^21-1 chars return an
  * empty array (the pack can't represent them — callers filter the
  * same bound, as the oracle does).
  *
  * The window-min DataFrame form is retained (test-only) as
  * [[graft.operators.TextAnalysis.winnowPortableReference]]: it
  * shuffles every doc through a window exchange for a computation
  * that is purely per-document, which is exactly the overhead this
  * expression removes (profiled 4.2 s → sub-second at sf0.1).
  */
case class Md5Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Md5Winnow.compute(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Winnow.compute($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_winnow"
}

object Md5Winnow {
  final val PosBits = 21
  final val PosMask: Long = (1L << PosBits) - 1

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // byte offset of every char start, plus the end sentinel
    val offs = new scala.collection.mutable.ArrayBuffer[Int](64)
    var bi = 0
    while (bi < nBytes) {
      offs += bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
    }
    offs += nBytes
    val nChars = offs.length - 1
    if (nChars < k || nChars > PosMask)
      return new GenericArrayData(Array.empty[Long])
    val nh = nChars - k + 1
    if (nh < w) return new GenericArrayData(Array.empty[Long])
    val keys = new Array[Long](nh)
    val md = mdLocal.get()
    var i = 0
    while (i < nh) {
      val bs = offs(i)
      val h = PortableBytes.md5Prefix32(md, bytes, bs, offs(i + k) - bs)
      keys(i) = (h << PosBits) | (PosMask - (i + 1)) // pos is 1-based
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](nh - w + 1)
    var last = Long.MinValue
    var j = w
    while (j <= nh) {
      // O(w) scan per window: w is small (4 in q38/q59); a monotonic
      // deque would be the move for large w
      var mk = Long.MaxValue
      var t = j - w
      while (t < j) { if (keys(t) < mk) mk = keys(t); t += 1 }
      if (mk != last) { out += mk; last = mk }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: normalized text → array of packed
    * (hash<<21 | 2^21-1-pos) winnow keys.
    */
  def md5Winnow(c: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(Md5Winnow(ColumnBridge.expression(c), k, w))
  }
}
