package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark
import graft.operators.{Dedup, TextAnalysis}

/** Guards the engine-portable md5 MinHash family (q55): band keys are
  * checked against an INDEPENDENT reference that goes through the hex
  * string representation (the construction the DuckDB oracle uses —
  * `substr(md5(..), 1, 8)` parsed base-16 plus the seed-derived
  * affine family), not through [[Md5MinHash.md5Prefix32]]'s byte
  * arithmetic; the end-to-end operator is checked against the exact
  * n-gram Jaccard pairs.
  */
class Md5MinHashSpec extends AnyFunSuite {
  import spark.implicits._

  private def hexPrefix(s: String, hexChars: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, hexChars), 16)
  }

  private def refHash(s: String, seed: Int): Long = {
    val a = hexPrefix("a:" + seed, 7) | 1L
    val b = hexPrefix("b:" + seed, 8)
    (a * hexPrefix(s, 8) + b) & 0xFFFFFFFFL
  }

  private def refBandKeys(
      shingles: Seq[String], numHashes: Int, bands: Int): Seq[String] = {
    val mins = (0 until numHashes).map(i => shingles.map(refHash(_, i)).min)
    val rows = numHashes / bands
    (0 until bands).map(b => mins.slice(b * rows, (b + 1) * rows).mkString(","))
  }

  test("band keys bit-match the independent hex-string md5 reference") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box  with five\tdozen liquor jugs for the WINTER trip"),
      (3L, "Ünïcödé tökens såmple traîning çorpus dédup tèst with ümlaut wörds"))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        Md5MinHash.bandKeys(TextAnalysis.wordShingles($"text", 3), 16, 4)
          .as("bk"))
      .as[(Long, Seq[String])].collect().toMap
    val sh = docs.select($"doc_id",
        TextAnalysis.wordShingles($"text", 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    for ((id, shingles) <- sh) {
      assert(shingles.nonEmpty, s"doc $id fixture must shingle")
      assert(got(id) == refBandKeys(shingles, 16, 4), s"doc $id")
    }
  }

  test("empty shingle input yields an empty band array (no join keys)") {
    val docs = Seq((1L, "too short"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        Md5MinHash.bandKeys(TextAnalysis.wordShingles($"text", 3), 16, 4)
          .as("bk"))
      .as[(Long, Seq[String])].collect()
    assert(got.forall(_._2.isEmpty))
  }

  test("portable near-dups equal the exact pairs on planted duplicates") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, base),
      (2L, base + " uniform"), // 18 of 19 shingles shared: j = 18/19
      (3L, "completely different words entirely unrelated content here now"),
      (4L, base), // exact duplicate of 1: identical signature, j = 1.0
      (5L, "tiny")) // shingle-less: must not appear anywhere
      .toDF("doc_id", "text")
    val portable = Dedup.minhashNearDupsPortable(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleLen = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // the verify stage recomputes exact jaccard, so portable ⊆ exact by
    // construction; on this fixture banding also catches every pair
    assert(portable == exact)
    assert(portable.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(portable.contains((1L, 4L, 1.0)))
  }

  test("codegen WordShingles matches the composable form on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val edge = Seq(
      (100001L, "  leading\t\tand trailing   whitespace mixed\nacross lines  "),
      (100002L, "Ünïcödé TÖKENS Straße ΣΟΦΙΑ smalltext"),
      (100003L, "dup dup dup dup dup"), // repeated shingles collapse
      (100004L, "one two"), // fewer tokens than n → empty
      (100005L, ""), (100006L, "   \t  "))
      .toDF("doc_id", "text")
    for (docs <- Seq(real, edge)) {
      val both = docs.select($"doc_id",
          TextAnalysis.wordShingles($"text", 3).as("fast"),
          TextAnalysis.wordShinglesComposable($"text", 3).as("ref"))
        .as[(Long, Seq[String], Seq[String])].collect()
      for ((id, fast, ref) <- both)
        assert(fast == ref, s"doc $id shingle mismatch")
    }
  }
}
