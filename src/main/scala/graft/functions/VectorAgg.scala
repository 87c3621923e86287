package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector sum as a typed [[Aggregator]] (the sanctioned
  * custom-aggregation tier, SURVEY §2.11): aggregating embedding
  * columns WITHOUT exploding one row per dimension. With map-side
  * partial aggregation the shuffle carries one buffer per (partition ×
  * group) instead of `dim` rows per input row — the difference between
  * shuffling 64× the corpus and shuffling the group count when
  * computing k-means centroids over 100 TB of embeddings.
  *
  * Null/empty rows are ignored; the first non-empty row fixes the
  * dimension and a later mismatch fails loudly (silent truncation
  * would corrupt every centroid downstream).
  */
class VectorSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.empty[Double]

  override def reduce(buf: Array[Double], a: Seq[Double]): Array[Double] =
    if (a == null || a.isEmpty) buf
    else if (buf.isEmpty) a.toArray
    else {
      require(buf.length == a.length,
        s"VectorSum: mixed dimensions ${buf.length} vs ${a.length}")
      var i = 0
      while (i < buf.length) { buf(i) += a(i); i += 1 }
      buf
    }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length,
        s"VectorSum: mixed dimensions ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoderShim.doubleArray
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoderShim.doubleSeq
}

private[functions] object ExpressionEncoderShim {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  // native array encoders (UnsafeArrayData), not java serialization —
  // the buffer crosses the wire in partial aggregation
  val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val doubleSeq: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  val stringSeq: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  val stringLongMap: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  // mutable buffer for in-place sketch aggregation (MisraGries) —
  // ScalaReflection builds Map subtypes through their companion
  // newBuilder, so the mutable HashMap round-trips like any Map
  val mutableStringLongMap
      : Encoder[scala.collection.mutable.HashMap[String, Long]] =
    ExpressionEncoder[scala.collection.mutable.HashMap[String, Long]]()
}

object VectorAgg {
  /** Column-API entry: element-wise sum of an array<double> column. */
  def vectorSum(c: Column): Column = udaf(new VectorSum()).apply(c)
}
