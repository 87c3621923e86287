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

  private def hexPrefix(s: String, hexChars: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, hexChars), 16)
  }

  private def h32(s: String): Long = hexPrefix(s, 8)

  private def refSimhash(text: String): Long = {
    val toks = text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty)
    (0 until 60).map { b =>
      val v = toks.map(t =>
        if (((hexPrefix(t, 15) >> b) & 1L) == 1L) 1 else -1).sum
      if (v > 0) 1L << b else 0L
    }.sum
  }

  test("portable simhash: planted pair's hamming matches the hex reference") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three four " +
      "five six seven eight nine ten eleven twelve thirteen fourteen fifteen"
    val near = base + " five" // hamming 1 against base under md5-prefix-60
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

  test("codegen Md5SimHash60 matches the explode-vote reference on real docs") {
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
          graft.functions.Md5SimHash60.md5Simhash60(col("__norm")).as("s"))
        .as[(Long, Long)].collect().toMap
      val ref = Dedup.simhashPortableReference(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(fast == ref)
    }
  }

  test("codegen Md5Winnow matches the window-min reference on real docs") {
    import org.apache.spark.sql.functions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (300001L, "Ünïcödé chäracters shift byte offsets but not char grams"),
      (300002L, "aaaaaaaaaaaaaaaaaaaaaaaa"), // constant grams: one fp
      (300003L, "  collapse   runs\tof whitespace before gramming  "))
      .toDF("doc_id", "text")
    for (docs <- Seq(real, edge)) {
      val fast = TextAnalysis.winnowPortable(docs, "doc_id", "text", 8, 4)
        .as[(Long, Long, Long)].collect().toSet
      val ref = TextAnalysis
        .winnowPortableReference(docs, "doc_id", "text", 8, 4)
        .as[(Long, Long, Long)].collect().toSet
      assert(fast == ref)
    }
  }

  test("portable winnow: no full window → no rows") {
    val short = Seq((1L, "tiny doc!")).toDF("doc_id", "text") // 2 grams < w
    assert(TextAnalysis.winnowPortable(short, "doc_id", "text", 8, 4)
      .count() == 0)
  }

  test("portable winnow plan has NO exchange — winnowing is per-doc") {
    val docs = Seq((1L, "winnowing is embarrassingly parallel over docs"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.winnowPortable(docs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // the reference form pays a window exchange for the same answer —
    // that difference is the point of the codegen path
    val refPlan = TextAnalysis
      .winnowPortableReference(docs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(refPlan.contains("Exchange"))
  }

  test("randomized parity: codegen twins equal references on fuzzed text") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokenGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("the", "déjà", "Straße", "ΣΟΦΙΑ", "a", "!!", "x7"),
      Gen.listOfN(3, Gen.choose('а', 'я')).map(_.mkString)) // cyrillic
    val wsGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val docGen = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, tokenGen)
      seps <- Gen.listOfN(n, wsGen)
    } yield toks.zip(seps).map { case (t, s) => t + s }.mkString
    val docs = (1 to 24).flatMap { i =>
      docGen(Gen.Parameters.default, Seed(1234L + i)).map(t => (i.toLong, t))
    }.toDF("doc_id", "text")
    // shingles
    val sh = docs.select(col("doc_id"),
        TextAnalysis.wordShingles(col("text"), 3).as("fast"),
        TextAnalysis.wordShinglesComposable(col("text"), 3).as("ref"))
      .as[(Long, Seq[String], Seq[String])].collect()
    for ((id, fast, ref) <- sh) assert(fast == ref, s"shingles doc $id")
    // simhash
    val fastSig = docs.select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("__norm"))
      .filter(col("__norm") =!= "")
      .select(col("doc_id"),
        graft.functions.Md5SimHash60.md5Simhash60(col("__norm")).as("s"))
      .as[(Long, Long)].collect().toMap
    val refSig = Dedup.simhashPortableReference(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fastSig == refSig)
    // winnow
    val fastW = TextAnalysis.winnowPortable(docs, "doc_id", "text", 4, 3)
      .as[(Long, Long, Long)].collect().toSet
    val refW = TextAnalysis.winnowPortableReference(docs, "doc_id", "text", 4, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(fastW == refW)
  }

  test("incremental minhash equals full-dedup pairs touching the batch") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter("doc_id % 3 != 0")
    val fresh = docs.filter("doc_id % 3 = 0")
    val full = Dedup.minhashNearDupsPortable(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val expected = full.filter { case (a, b, _) => a % 3 == 0 || b % 3 == 0 }
    assert(expected.nonEmpty,
      "fixture has no cross-batch near-dups at 0.7 — lower the threshold")
    val index = Dedup.minhashBandIndexPortable(corpus, "doc_id", "text",
      shingleLen = 3, numHashes = 16, bands = 4)
    val inc = Dedup.minhashNearDupsIncrementalPortable(index, corpus, fresh,
        "doc_id", "text", shingleLen = 3, numHashes = 16, bands = 4,
        threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == expected)
    // corpus-only pairs never surface through the incremental path
    assert(inc.forall { case (a, b, _) => a % 3 == 0 || b % 3 == 0 })
  }
}
