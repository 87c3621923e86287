package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark
import graft.functions.{ShingleHashes, SketchSigs}

/** The single-pass codegen sketch expressions must be BIT-IDENTICAL to
  * the explode + groupBy forms they replaced (same XxHash64 family,
  * same child order, same seed) — checked on the real documents corpus,
  * not toy strings.
  */
class SketchSigsParitySpec extends AnyFunSuite {
  import spark.implicits._

  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("simhash64 expression equals the explode+vote reference form") {
    val got = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val ref = Dedup.simhashReference(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got.size == ref.size && got.size > 400)
    assert(got == ref)
  }

  test("minhash band hashes equal the explode+min-agg reference form") {
    val shingled = docs.select(col("doc_id"),
        ShingleHashes.shingleHashes(lower(col("text")), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val got = shingled.select(col("doc_id"),
        posexplode(SketchSigs.minhashBands(col("__sh"), 16, 4))
          .as(Seq("band_idx", "band_hash")))
      .as[(Long, Int, Long)].collect().toSet
    val ref = Dedup.minhashBandsReference(shingled, "doc_id", 16, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(got.size == ref.size && got.size > 1600)
    assert(got == ref)
  }

  test("sketch expressions stay inside whole-stage codegen") {
    val plan = Dedup.simhash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen spans in plan toString
    assert(plan.contains("*(1) Project") && plan.contains("simhash64"), plan)
    // one simhash evaluation per row — no aggregate, no exchange
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }
}
