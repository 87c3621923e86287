package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle STRINGS in one pass — the string twin
  * of [[ShingleHashes]], for the portable operators whose DuckDB
  * oracles hash the shingle text itself (q55: `md5(shingle)`).
  *
  * Semantics are exactly the composable form
  * `array_distinct(transform(starts, i => concat_ws(" ",
  * slice(tokens, i+1, n))))` over `tokens = filter(split(
  * normalizeText(text), " "), _ != "")`: full-Unicode lowercase
  * (`UTF8String.toLowerCase`, the same kernel Spark's `lower()`
  * uses), tokens split on ASCII whitespace runs (Java regex `\s`:
  * space, \t, \n, \x0B, \f, \r — what `normalizeText`'s
  * `regexp_replace(lower(text), "\\s+", " ")` matches), shingles
  * joined with single spaces, first-occurrence-distinct. Multi-byte
  * UTF-8 sequences always have the high bit set, so the ASCII
  * whitespace scan never splits inside a code point.
  *
  * The composable form chains several interpreted higher-order /
  * regex expressions and re-runs in every consumer CollapseProject
  * inlines it into (profiled ~9.5 s for 5000 sf0.1 docs, evaluated
  * once more per self-join side); this expression scans the
  * lowercased bytes once per call.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle length must be positive: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** One-pass tokenize + n-token window join + first-occurrence
    * distinct. Returns shingle strings in first-occurrence order
    * (matching `array_distinct` of the composable form). Tokenization
    * is the shared [[PortableBytes]] contract.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    // token byte ranges [start, end) in the lowercased bytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    PortableBytes.foreachToken(bytes) { (s, e) => starts += s; ends += e }
    val m = starts.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](m - n + 1)
    var s = 0
    while (s <= m - n) {
      var size = n - 1 // single joining spaces
      var j = 0
      while (j < n) { size += ends(s + j) - starts(s + j); j += 1 }
      val buf = new Array[Byte](size)
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val tl = ends(s + j) - starts(s + j)
        System.arraycopy(bytes, starts(s + j), buf, off, tl)
        off += tl
        j += 1
      }
      val u = UTF8String.fromBytes(buf)
      if (seen.add(u)) out += u
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def wordShingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
  }
}
