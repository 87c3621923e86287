package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

class RollingWinnowSpec extends AnyFunSuite {
  import spark.implicits._

  private def winnow(texts: Seq[String], k: Int = 8, w: Int = 4): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(RollingWinnow.rollingWinnow(col("t"), k, w).as("fp"))
      .as[Seq[Long]].collect().toSeq

  /** direct (non-rolling) polynomial hash — independent crosscheck. */
  private def directHash(s: String, from: Int, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 0L
    for (i <- from until from + k)
      h = (h * RollingWinnow.B + (bytes(i) & 0xFF)) % RollingWinnow.P
    h
  }

  test("fingerprints are a subset of the direct k-gram hashes") {
    val s = "the quick brown fox jumps over the lazy dog"
    val fp = winnow(Seq(s)).head.toSet
    val all = (0 to s.getBytes("UTF-8").length - 8)
      .map(i => directHash(s, i, 8)).toSet
    assert(fp.nonEmpty && fp.subsetOf(all))
  }

  test("identical text → identical fingerprints; edits preserve most") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val edited = base.replace("token20", "EDITED")
    val Seq(a, b, c) = winnow(Seq(base, base, edited))
    assert(a == b)
    val overlap = a.toSet.intersect(c.toSet).size.toDouble / a.toSet.size
    assert(overlap > 0.6, s"local edit should keep most fingerprints: $overlap")
  }

  test("edge cases: empty, shorter than k, shorter than one window") {
    val Seq(e1, e2, e3) = winnow(Seq("", "abc", "abcdefghij"), k = 8, w = 4)
    assert(e1.isEmpty)
    assert(e2.isEmpty) // shorter than k
    assert(e3.length == 1) // fewer than w hashes → single global min
  }

  test("SQL registration matches the Column API") {
    graft.GraftExtensions.register(spark)
    Seq("sql and column must agree on this text").toDF("t")
      .createOrReplaceTempView("rw_docs")
    val viaSql = spark.sql(
      "SELECT rolling_winnow(t, 8, 4) AS fp FROM rw_docs")
      .as[Seq[Long]].first()
    val viaCol = winnow(Seq("sql and column must agree on this text")).head
    assert(viaSql == viaCol)
  }

  test("ShingleHashes matches the composable string-shingle pipeline") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.limit(200).select(col("doc_id"),
      ShingleHashes.shingleHashes(col("text"), 3).as("h"),
      graft.operators.TextAnalysis.wordShingles(col("text"), 3).as("s"))
    // identical distinct-set cardinality per document...
    assert(both.filter(size(col("h")) =!= size(col("s"))).count() == 0)
    // ...and identical pairwise intersection sizes (set semantics agree)
    val a = both.select(col("doc_id").as("ida"), col("h").as("ha"),
      col("s").as("sa"))
    val b = both.select(col("doc_id").as("idb"), col("h").as("hb"),
      col("s").as("sb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(2000)
      .select(size(array_intersect(col("ha"), col("hb"))).as("ih"),
        size(array_intersect(col("sa"), col("sb"))).as("is"))
    assert(pairs.filter(col("ih") =!= col("is")).count() == 0)
  }

  test("expression participates in codegen plans over real data") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = docs.select(col("doc_id"),
        RollingWinnow.rollingWinnow(col("text"), 8, 4).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        array_min(col("fp")).as("min_fp"))
    assert(out.count() == 500)
    assert(out.agg(min("n_fp")).first().getInt(0) >= 1)
  }
}
