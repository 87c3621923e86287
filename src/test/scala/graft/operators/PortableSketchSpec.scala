package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark

/** Guards the engine-portable md5-seeded SimHash (q58) and winnowing
  * (q59) twins with INDEPENDENT Scala references that go through the
  * md5 hex-string representation — the construction their DuckDB
  * oracles use (`('0x' || substr(md5(x),1,8))::BIGINT`) — rather than
  * the Column pipeline under test.
  */
class PortableSketchSpec extends AnyFunSuite {
  import spark.implicits._

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def refSimhash(text: String): Long = {
    val toks = text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty)
    (0 until 32).map { b =>
      val v = toks.map(t => if (((h32(t) >> b) & 1L) == 1L) 1 else -1).sum
      if (v > 0) 1L << b else 0L
    }.sum
  }

  test("portable simhash: planted pair's hamming matches the hex reference") {
    val base = "the quick brown fox jumps over the lazy dog while counting tokens"
    val near = base + " lazy" // hamming 2 against base under md5-prefix-32
    val refH = java.lang.Long.bitCount(refSimhash(base) ^ refSimhash(near))
    assert(refH <= 3, s"planted pair drifted to hamming $refH — pick closer docs")
    val far = "completely different content about parquet shuffles and joins"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val got = Dedup.simhashNearDupsPortable(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got.get((1L, 2L)).contains(refH))
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("portable simhash: identical docs collide at hamming 0") {
    val t = "identical corpus entry for the portable twin"
    val got = Dedup.simhashNearDupsPortable(
        Seq((1L, t), (2L, t)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 0)))
  }

  test("portable winnow matches the hex-reference rightmost-min selection") {
    val text = "The  quick brown\tfox jumps over the lazy dog"
    val k = 8
    val w = 4
    val nm = text.toLowerCase.trim.replaceAll("\\s+", " ")
    val grams = (1 to nm.length - k + 1)
      .map(i => (i.toLong, h32(nm.substring(i - 1, i - 1 + k))))
    val expected = (w to grams.length).map { j =>
      val window = grams.slice(j - w, j)
      val minH = window.map(_._2).min
      window.filter(_._2 == minH).last // rightmost min — the MOSS rule
    }.distinct.toSet
    val got = TextAnalysis.winnowPortable(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(got == expected)
  }

  test("codegen Md5SimHash32 matches the explode-vote reference on real docs") {
    import org.apache.spark.sql.functions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (200001L, "  Mixed\tWHITESPACE  and\nCase "),
      (200002L, "Ünïcödé TÖKENS Straße ΣΟΦΙΑ"),
      (200003L, "repeat repeat repeat distinct"))
      .toDF("doc_id", "text")
    for (docs <- Seq(real, edge)) {
      val fast = docs
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("text")).as("__norm"))
        .filter(col("__norm") =!= "")
        .select(col("doc_id"),
          graft.functions.Md5SimHash32.md5Simhash32(col("__norm")).as("s"))
        .as[(Long, Long)].collect().toMap
      val ref = Dedup.simhashPortableReference(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(fast == ref)
    }
  }

  test("portable winnow: no full window → no rows") {
    val short = Seq((1L, "tiny doc!")).toDF("doc_id", "text") // 2 grams < w
    assert(TextAnalysis.winnowPortable(short, "doc_id", "text", 8, 4)
      .count() == 0)
  }
}
