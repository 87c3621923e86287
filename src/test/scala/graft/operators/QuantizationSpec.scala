package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Int8 scalar quantization (q60): the algebraic pair formula must
  * equal a naive dequantize-then-cosine reference EXACTLY (same
  * double ops, just factored), and quantized top-k must stay close to
  * exact top-k on the real embeddings (the 255-level grid loses
  * little).
  */
class QuantizationSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def vecs = graft.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>")
      .as("embedding"))

  test("codes reconstruct within half a quantization step") {
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .join(vecs, "vec_id")
    val rows = q.select(col("vec_id"), col("embedding"), col("codes"),
        col("mn"), col("scale"))
      .as[(Long, Seq[Double], Seq[Int], Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((id, v, codes, mn, s) <- rows) {
      assert(codes.forall(c => c >= 0 && c <= 255), s"vec $id code range")
      for ((x, c) <- v.zip(codes)) {
        val deq = mn + c * s
        assert(math.abs(deq - x) <= s / 2 + 1e-12,
          s"vec $id reconstruction off by more than s/2")
      }
    }
  }

  test("algebraic quantized cosine equals naive dequantized cosine") {
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
    val got = Similarity.topKQuantized(q,
        q.filter(pmod(col("vec_id"), lit(100)) === 0), "vec_id", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    val byId = q.select(col("vec_id"), col("codes"), col("mn"), col("scale"))
      .as[(Long, Seq[Int], Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for ((qid, nid, cos, _) <- got) {
      val (cq, mnq, sq) = byId(qid)
      val (cc, mnc, sc) = byId(nid)
      def deq(c: Seq[Int], mn: Double, s: Double) = c.map(mn + _ * s)
      val a = deq(cq, mnq, sq)
      val b = deq(cc, mnc, sc)
      val naive = a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      // the factored formula reorders the double sums, so equality is
      // to rounding tolerance, not bit-exact vs THIS naive fold — the
      // DuckDB oracle replicates the factored order and IS bit-exact
      assert(math.abs(cos - naive) < 1e-6, s"pair ($qid,$nid)")
    }
  }

  test("quantized top-k stays close to exact top-k (recall@10 >= 0.8)") {
    val queries = vecs.filter(pmod(col("vec_id"), lit(50)) === 0)
    val exact = Similarity.topK(vecs, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
    val quant = Similarity.topKQuantized(q,
        q.filter(pmod(col("vec_id"), lit(50)) === 0), "vec_id", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (qid, ex) =>
      quant(qid).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean")
  }

  test("constant and zero vectors: zero scale, zero codes, norm guard") {
    val docs = Seq(
      (1L, Seq(3.0, 3.0, 3.0, 3.0)), // constant: s=0, norm>0
      (2L, Seq(0.0, 0.0, 0.0, 0.0)), // zero: norm=0 → excluded
      (3L, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(docs, "vec_id", "embedding")
    val rows = q.select(col("vec_id"), col("codes"), col("scale"),
        col("norm"))
      .as[(Long, Seq[Int], Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._2.forall(_ == 0) && rows(1L)._3 == 0.0 &&
      rows(1L)._4 > 0)
    assert(rows(2L)._4 == 0.0)
    val topk = Similarity.topKQuantized(q, q, "vec_id", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // the zero vector appears on neither side
    assert(topk.forall(p => p._1 != 2L && p._2 != 2L))
  }
}
