package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 32-bit SimHash in one pass — the md5 twin of
  * [[SketchSigs.simhash64]], for q58's DuckDB-oracled variant.
  *
  * Semantics are exactly the explode + per-bit vote form the oracle
  * replicates: full-Unicode lowercase, tokens split on ASCII
  * whitespace runs (every occurrence votes — multiset, not distinct),
  * per-token hash = first 32 bits of `md5(token)` (`('0x' ||
  * substr(md5(tok), 1, 8))::BIGINT` in DuckDB), bit b of the
  * signature set iff the sum over tokens of (+1 if bit set else -1)
  * is positive. One digest per token occurrence, 32 int counters, no
  * explode row-blowup and no 32-buffer aggregation — the explode
  * reference form is retained (test-only) in
  * [[graft.operators.Dedup.simhashPortableReference]] for the parity
  * spec.
  *
  * Callers must filter empty-normalized docs first (an input with no
  * tokens returns 0, which is NOT a valid signature of any real doc —
  * same contract as [[graft.operators.Dedup.simhash]]'s pre-filter).
  */
case class Md5SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Md5SimHash32.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SimHash32.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_simhash32"
}

object Md5SimHash32 {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  def compute(text: UTF8String): Long = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val votes = new Array[Int](32)
    val md = mdLocal.get()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column-API entry point. */
  def md5Simhash32(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(Md5SimHash32(ColumnBridge.expression(c)))
  }
}
