package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).length /
  * text.length, rounded to 6 decimals. Highly repetitive or templated
  * documents compress far below natural prose (~0.3–0.6 for English),
  * making this a cheap single-number redundancy detector used by
  * LLM-corpus pipelines alongside the Gopher repetition fractions
  * ([[graft.operators.TextAnalysis.repetitionStats]]). Pure JVM
  * `java.util.zip.Deflater` (level 6, fixed) — deterministic across
  * runs and JVMs for a given payload; empty input → 0.0.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio"
}

object DeflateRatio {
  // one native zlib stream per task thread, reused via reset() — a
  // fresh Deflater per ROW would allocate/free ~256KB of native state
  // per document, dominating the cost on short docs at corpus scale.
  // The per-thread Deflater is INTENTIONALLY never end()ed: Spark's
  // task-runner threads are a fixed long-lived pool, so retention is
  // bounded at ~256KB × pool size for the executor lifetime, and an
  // end-of-task cleanup hook would defeat the cross-task reuse this
  // exists for. If run on an engine that churns executor threads,
  // swap this for a TaskContext completion listener doing remove()+end().
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue = new java.util.zip.Deflater(6, true)
  }

  def compute(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return 0.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    math.rint(compressed.toDouble / bytes.length * 1e6) / 1e6
  }

  def deflateRatio(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))
  }
}
