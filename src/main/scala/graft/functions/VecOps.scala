package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen dot product over two `array<double>` columns — the hot
  * kernel of every similarity operator ([[graft.operators.Similarity]]:
  * brute-force top-k, near-dup verify, LSH re-rank, IVF assign).
  *
  * Bit-compatible with the `aggregate(zip_with(a, b, (p,q) => p*q),
  * 0.0, (acc,v) => acc + v)` form it replaces: same element order,
  * same double multiply-then-add sequence — so oracle cosine values
  * are unchanged — but one fused loop over the two `ArrayData`s
  * instead of an interpreted lambda pipeline that materializes the
  * zipped products array per pair. Null semantics also match the
  * composable form: null array, length mismatch (zip_with pads with
  * null), or null element → null result.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("dotBoxed")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = graft.functions.VecOps.dotOrNull($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Integer sibling of [[VecDot]] for `array<int>` quantization codes
  * (int8 values ride int arrays): an EXACT long dot product — no FP
  * summation-order concerns for the oracle at all. Same null
  * semantics.
  */
case class VecDotI32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotI32OrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("dotBoxed")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long $boxed = graft.functions.VecOps.dotI32OrNull($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot_i32"
}

object VecOps {

  /** Fused dot product; null for length mismatch or null elements
    * (the zip_with/aggregate null semantics).
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Exact integer dot product over int arrays; null semantics as
    * [[dotOrNull]].
    */
  def dotI32OrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Column-API entry point: dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Column-API entry point: exact dot product of two array<int>
    * columns (quantization codes) as a long.
    */
  def vecDotI32(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(VecDotI32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
