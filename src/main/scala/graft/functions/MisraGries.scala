package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] (the
  * sanctioned custom-aggregation tier — same ladder rung as
  * [[VectorSum]]): a bounded map of at most `counters` entries that,
  * after seeing n tokens, is GUARANTEED to contain every token whose
  * true count exceeds n/(counters+1), with per-entry undercount at
  * most n/(counters+1). `reduce` folds one document's token array at a
  * time (one call per doc, not per token); `merge` sums two sketches
  * and restores the bound by subtracting the (counters+1)-th largest
  * value from every entry — the standard mergeable-summary rule, which
  * preserves the error guarantee under ANY partitioning/merge order.
  *
  * Scale shape: with map-side partial aggregation the shuffle carries
  * ONE ≤counters-entry buffer per partition instead of the corpus
  * vocabulary — the sketch pass that prunes a 100 TB token stream to a
  * candidate set WITHOUT a vocabulary-wide shuffle. Counter VALUES are
  * merge-order-dependent (only the bounds are deterministic), so
  * downstream consumers must exact-recount the candidate keys (see
  * TextAnalysis.heavyHitterTokens) rather than report sketch counts.
  */
class MisraGries(counters: Int)
    extends Aggregator[Seq[String],
      scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {
  require(counters > 0, s"counters=$counters")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def zero: Buf = scala.collection.mutable.HashMap.empty

  // Aggregator permits mutating and returning the incoming buffer —
  // Spark's object-hash aggregation hands the SAME buffer object back
  // for every row of a group, so in-place mutation makes the sketch
  // pass O(tokens) amortized instead of the O(rows × counters)
  // full-map copy a persistent-Map buffer would force per document.
  override def reduce(m: Buf, toks: Seq[String]): Buf = {
    if (toks == null || toks.isEmpty) return m
    for (t <- toks if t != null) {
      m.get(t) match {
        case Some(c) => m(t) = c + 1
        case None if m.size < counters => m(t) = 1L
        case None =>
          // decrement-all step: O(counters), amortized O(1) per token
          for ((kk, vv) <- m.toArray) {
            if (vv <= 1L) m.remove(kk) else m(kk) = vv - 1
          }
      }
    }
    m
  }

  override def merge(x: Buf, y: Buf): Buf =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      for ((t, c) <- y) x(t) = x.getOrElse(t, 0L) + c
      if (x.size > counters) {
        // subtract the (counters+1)-th largest count from every entry;
        // ≤ counters survive and the MG undercount bound is preserved
        val cut = x.values.toArray.sorted(Ordering[Long].reverse)(counters)
        for ((kk, vv) <- x.toArray) {
          val nv = vv - cut
          if (nv <= 0L) x.remove(kk) else x(kk) = nv
        }
      }
      x
    }

  override def finish(buf: Buf): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[Buf] =
    ExpressionEncoderShim.mutableStringLongMap
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoderShim.stringLongMap
}

object HeavyHitters {
  /** Column-API entry: Misra–Gries sketch of a token-array column. */
  def misraGries(tokens: Column, counters: Int): Column =
    udaf(new MisraGries(counters), ExpressionEncoderShim.stringSeq)
      .apply(tokens)
}
