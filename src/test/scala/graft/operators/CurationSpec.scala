package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** End-to-end curation pipeline over a planted corpus: every stage must
  * drop exactly the documents planted for it and nothing else.
  */
class CurationSpec extends AnyFunSuite {
  import spark.implicits._

  // long-enough VARIED English prose that passes every quality floor
  // (a naively repeated sentence would trip the dup-trigram and
  // compression filters — which is exactly what they're for). Seed
  // words alternate with stopwords so every word-trigram contains a
  // seed token: prose from different seeds shares ZERO trigrams, which
  // keeps cross-doc near-dup and decontamination overlap at exactly
  // the planted relations.
  private def prose(seed: String): String =
    (1 to 8).map(i =>
      s"${seed}a$i the ${seed}b$i of ${seed}c$i is ${seed}d$i that " +
        s"${seed}e$i in ${seed}f$i and ${seed}g$i it ${seed}h$i")
      .mkString(" ")

  test("curation drops planted bad docs, keeps and redacts good ones") {
    val keepA = prose("amber")
    val keepB = prose("bronze")
    val docs = Seq(
      1L -> keepA, // survives
      2L -> keepB, // survives
      3L -> keepA, // exact duplicate of 1 -> dropped
      4L -> (keepA + "unique trailing addendum sentence here today"),
        // near-dup of 1 -> dropped
      5L -> ("der die das und ist nicht ein zu " * 20), // German -> dropped
      6L -> ("spam " * 100), // repetitive: top-token + compression -> dropped
      7L -> prose("contaminated"), // overlaps benchmark -> dropped
      8L -> (prose("secret") +
        " contact alice@example.com or https://leak.example/x 612-555-0100"))
      .toDF("doc_id", "text")
    val benchmark = Seq(10L -> prose("contaminated")).toDF("doc_id", "text")

    val (out, report) = Curation.curate(docs, benchmark, "doc_id", "text")
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 8L), s"kept: $kept\nreport: $report")

    // stage accounting: 8 in; quality removes 5 and 6; exact removes 3;
    // near-dup removes 4; decontamination removes 7
    assert(report == Curation.Report(8, 6, 5, 4, 3), report)

    // PII in the survivor is redacted, prose is intact
    val t8 = out.filter($"doc_id" === 8L).select("text").first().getString(0)
    assert(t8.contains("<EMAIL>") && t8.contains("<URL>") &&
      t8.contains("<NUMBER>"))
    assert(!t8.contains("alice@example.com") && !t8.contains("612-555-0100"))
    assert(t8.contains("secret"))

    // lazy composition selects the same survivors
    val lazyKept = Curation.curateLazy(docs, benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(lazyKept == kept)

    // the reliable-storage materialization policy (persist DISK_ONLY_2
    // instead of localCheckpoint) is a pure storage swap: same
    // survivors, same stage accounting
    val (outR, reportR) = Curation.curate(docs, benchmark, "doc_id", "text",
      Curation.Params(reliableStorage = true))
    assert(outR.select("doc_id").as[Long].collect().toSet == kept)
    assert(reportR == report)
  }

  test("curation is idempotent: curating the curated corpus is a no-op") {
    val docs = Seq(
      1L -> prose("amber"), 2L -> prose("bronze"),
      3L -> (prose("citrus") + " ping bob@example.com now"))
      .toDF("doc_id", "text")
    val benchmark = Seq(10L -> prose("benchmarked")).toDF("doc_id", "text")
    val (once, _) = Curation.curate(docs, benchmark, "doc_id", "text")
    val (twice, report2) = Curation.curate(once, benchmark, "doc_id", "text")
    val a = once.as[(Long, String)].collect().toMap
    val b = twice.as[(Long, String)].collect().toMap
    assert(a == b, "second curation changed the corpus")
    assert(report2.input == report2.afterDecontaminate)
    // redaction is idempotent too: placeholders don't rematch
    assert(a(3L).contains("<EMAIL>") && !a(3L).contains("bob@example.com"))
  }

  test("bloomDecontaminate: no false negatives vs exact, planted corpus") {
    val bench = Seq(10L -> prose("evalset")).toDF("doc_id", "text")
    val corpus = Seq(
      1L -> prose("amber"), // disjoint from the benchmark
      2L -> prose("evalset"), // fully contaminated
      3L -> (prose("bronze") + " " + prose("evalset")) // partial overlap
    ).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        shingleLen = 3, minOverlap = 1)
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.bloomDecontaminate(corpus, bench, "doc_id", "text",
        shingleLen = 3, minOverlap = 1, fpp = 1e-4)
      .as[(Long, Int)].collect().toMap
    assert(exact.contains(2L) && exact.contains(3L) && !exact.contains(1L))
    // the contract: never a false negative, per-doc count never lower
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"doc $id flagged exact but not bloom")
      assert(bloom(id) >= n, s"doc $id bloom ${bloom(id)} < exact $n")
    }
    // at fpp 1e-4 over this corpus, extras are overwhelmingly unlikely
    assert(bloom.keySet == exact.keySet, s"bloom=$bloom exact=$exact")
    // the corpus path is map-only: scan → project → filter, no
    // exchange and no join anywhere (the sketch was folded before)
    val plan = Dedup.bloomDecontaminate(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"corpus path not map-only:\n$plan")
  }

  test("q102: bloom flags match exact flags at sf0.1") {
    val out = graft.QueriesText
      .q102BloomDecontaminate(spark, "/root/testdata/sf0.1")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every exact-flagged doc (n_exact >= 2, q50's threshold) must be
    // bloom-flagged with at least as many shingle hits
    out.foreach { case (id, nExact, nBloom) =>
      if (nExact >= 2)
        assert(nBloom >= nExact, s"doc $id exact=$nExact bloom=$nBloom")
    }
    // false-positive docs (bloom-only rows) bounded: λ ≈ 90·1e-4 per
    // doc → P(≥2 false hits) ~ 4e-5; over ~495 docs expect none, allow
    // a safety margin of 2
    val falseDocs = out.count { case (_, e, b) => e < 2 && b >= 2 }
    assert(falseDocs <= 2, s"$falseDocs bloom-only docs")
  }
}
