package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 60-bit SimHash in one pass — the md5 twin of
  * [[SketchSigs.simhash64]], for q58's DuckDB-oracled variant.
  *
  * Semantics are exactly the explode + per-bit vote form the oracle
  * replicates: full-Unicode lowercase, tokens split on ASCII
  * whitespace runs (every occurrence votes — multiset, not distinct),
  * per-token hash = first 60 bits of `md5(token)` (`('0x' ||
  * substr(md5(tok), 1, 15))::BIGINT` in DuckDB — 15 hex chars keep
  * the parse inside signed-64 range), bit b of the
  * signature set iff the sum over tokens of (+1 if bit set else -1)
  * is positive. One digest per distinct token (occurrence counts weight
  * the votes), 60 int counters, no explode row-blowup and no
  * per-bit aggregation buffers — the explode
  * reference form is retained (test-only) in
  * [[graft.operators.Dedup.simhashPortableReference]] for the parity
  * spec.
  *
  * Callers must filter empty-normalized docs first (an input with no
  * tokens returns 0, which is NOT a valid signature of any real doc —
  * same contract as [[graft.operators.Dedup.simhash]]'s pre-filter).
  */
case class Md5SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Md5SimHash60.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SimHash60.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_simhash60"
}

object Md5SimHash60 {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(text: UTF8String): Long = {
    val bytes = text.toLowerCase.getBytes
    // count occurrences per DISTINCT token first: each distinct token
    // is digested once and its votes weighted by the count — repeated
    // tokens (the common case in natural text) skip repeat digests.
    // Tokenization is the shared [[PortableBytes]] contract.
    val counts = new java.util.HashMap[String, Array[Int]]()
    PortableBytes.foreachToken(bytes) { (start, end) =>
      val tok = new String(bytes, start, end - start,
        java.nio.charset.StandardCharsets.UTF_8)
      val c = counts.get(tok)
      if (c == null) counts.put(tok, Array(1)) else c(0) += 1
    }
    val votes = new Array[Int](60)
    val md = mdLocal.get()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      val d = md.digest(e.getKey.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var bb = 0
      while (bb < 7) { h = (h << 8) | (d(bb) & 0xFFL); bb += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >>> 4) // first 15 hex chars
      val cnt = e.getValue()(0)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += cnt else votes(b) -= cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column-API entry point. */
  def md5Simhash60(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(Md5SimHash60(ColumnBridge.expression(c)))
  }
}
