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
    extends Aggregator[Seq[String], Map[String, Long], Map[String, Long]] {
  require(counters > 0, s"counters=$counters")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], toks: Seq[String]): Map[String, Long] = {
    if (toks == null || toks.isEmpty) return buf
    val m = scala.collection.mutable.Map.empty[String, Long] ++ buf
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
    m.toMap
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val m = scala.collection.mutable.Map.empty[String, Long] ++ x
      for ((t, c) <- y) m(t) = m.getOrElse(t, 0L) + c
      if (m.size > counters) {
        // subtract the (counters+1)-th largest count from every entry;
        // ≤ counters survive and the MG undercount bound is preserved
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(counters)
        for ((kk, vv) <- m.toArray) {
          val nv = vv - cut
          if (nv <= 0L) m.remove(kk) else m(kk) = nv
        }
      }
      m.toMap
    }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoderShim.stringLongMap
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoderShim.stringLongMap
}

object HeavyHitters {
  /** Column-API entry: Misra–Gries sketch of a token-array column. */
  def misraGries(tokens: Column, counters: Int): Column =
    udaf(new MisraGries(counters), ExpressionEncoderShim.stringSeq)
      .apply(tokens)
}
