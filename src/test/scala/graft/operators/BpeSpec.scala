package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** BPE trainer ([[TextAnalysis.bpeTrain]]): hand-computed merge
  * sequences (greedy non-overlap, same-round left-participation,
  * tie-breaks) and exact merge-table parity against an independent
  * single-node reference trainer — the verification standing in for
  * the DuckDB oracle the greedy fold can't have.
  */
class BpeSpec extends AnyFunSuite {
  import spark.implicits._

  /** Independent single-node reference: the textbook Sennrich
    * implementation — mutable pair counting + greedy list merge,
    * sharing no code with the Spark operator.
    */
  private def referenceBpe(
      words: Map[String, Long], merges: Int): List[(Int, String, String, Long)] = {
    def mergeGreedy(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    var vocab = words.toList.map { case (w, c) =>
      (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (round <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, c) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
        counts((a, b)) += c
      if (counts.isEmpty) done = true
      else {
        val ((pa, pb), n) = counts.minBy { case ((a, b), m) => (-m, a, b) }
        out += ((round, pa, pb, n))
        vocab = vocab.map { case (syms, c) => (mergeGreedy(syms, pa, pb), c) }
        round += 1
      }
    }
    out.toList
  }

  private def train(docs: Seq[(Long, String)], merges: Int) =
    TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
      .orderBy("round").as[(Int, String, String, Long)].collect().toList

  test("hand-computed merges: greedy overlap, merged-symbol reuse, tie-break, early stop") {
    // "aaab": r1 (a,a) n=2 (greedy: aa,a,b); r2 tie n=1 between
    // (aa,a) and (a,b) → (a,b) wins lexicographically → aa,ab;
    // r3 (aa,ab); then exhausted before round 4
    assert(train(Seq(1L -> "aaab"), 10) ==
      List((1, "a", "a", 2L), (2, "a", "b", 1L), (3, "aa", "ab", 1L)))
    // "aaa": greedy non-overlap counts (a,a) twice but merges once
    assert(train(Seq(1L -> "aaa"), 10) ==
      List((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("merge table matches the independent reference trainer on real corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val words = docs.select(explode(filter(
        split(TextAnalysis.normalizeText(col("text")), " "), t => t =!= ""))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .as[(String, Long)].collect().toMap
    val expected = referenceBpe(words, 15)
    assert(expected.size == 15, "corpus should support 15 merges")
    assert(train(docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq, 15) == expected)
  }

  test("bpeSegment matches the reference encoder's per-doc token counts") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val words = docs.select(col("doc_id"),
        explode(filter(split(TextAnalysis.normalizeText(col("text")), " "),
          t => t =!= "")).as("word"))
      .as[(Long, String)].collect()
    val vocab = words.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val merges = referenceBpe(vocab, 15).map(m => (m._2, m._3))
    def encode(w: String): Int = {
      var syms = w.map(_.toString).toList
      for ((a, b) <- merges)
        syms = syms.foldLeft(List.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
          else acc :+ s
        }
      syms.size
    }
    val expected = words.groupBy(_._1).map { case (id, g) =>
      id -> ((g.size.toLong, g.map(x => encode(x._2).toLong).sum)) }
    val got = TextAnalysis.bpeSegment(docs, "doc_id", "text",
        TextAnalysis.bpeTrain(docs, "doc_id", "text", 15))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
    // sanity bounds: token count between word count and char count
    got.foreach { case (id, (nw, nt)) =>
      assert(nt >= nw, s"doc $id: fewer tokens than words") }
  }

  test("round-1 pair equals the q89 seed statistic's argmax") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val top = TextAnalysis.bpePairCounts(docs, "doc_id", "text", 1)
      .as[(String, Long)].collect().head
    val r1 = TextAnalysis.bpeTrain(docs, "doc_id", "text", 1)
      .as[(Int, String, String, Long)].collect().head
    assert((r1._2 + r1._3, r1._4) == top)
  }
}
