package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

/** Every custom Catalyst expression must be reachable from PLAIN SQL
  * through [[graft.GraftExtensions]] and agree exactly with its
  * Column-API construction — the SQL surface (views, spark.sql
  * pipelines, JDBC consumers) is a first-class citizen, not an
  * afterthought for one function.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  import spark.implicits._

  private lazy val docs = {
    graft.GraftExtensions.register(spark)
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .limit(50)
    df.createOrReplaceTempView("ge_docs")
    df
  }

  private lazy val vecs = {
    graft.GraftExtensions.register(spark)
    // vec_dot's contract is array<double> — every call site casts the
    // float[] parquet column first (QueriesSim's convention)
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .limit(20)
    df.createOrReplaceTempView("ge_vecs")
    df
  }

  /** SQL expression text vs a Column-API expression over the same
    * rows, compared exactly (both are deterministic). */
  private def agree(sqlExpr: String, colExpr: Column): Unit = {
    val viaSql = spark.sql(
        s"SELECT doc_id, $sqlExpr AS x FROM ge_docs ORDER BY doc_id")
      .collect().map(r => r.get(0) -> r.get(1)).toSeq
    val viaCol = docs.select(col("doc_id"), colExpr.as("x"))
      .orderBy("doc_id")
      .collect().map(r => r.get(0) -> r.get(1)).toSeq
    assert(viaSql == viaCol, s"SQL '$sqlExpr' drifted from Column API")
    assert(viaSql.nonEmpty)
  }

  test("rolling_winnow SQL ≡ Column") {
    docs
    agree("rolling_winnow(text, 8, 4)",
      ColumnBridge.column(RollingWinnow(ColumnBridge.expression(col("text")), 8, 4)))
  }

  test("md5_winnow SQL ≡ Column") {
    docs
    agree("md5_winnow(text, 8, 4)",
      ColumnBridge.column(Md5Winnow(ColumnBridge.expression(col("text")), 8, 4)))
  }

  test("simhash64 and md5_simhash60 SQL ≡ Column") {
    docs
    agree("simhash64(text)", ColumnBridge.column(SimHash64(ColumnBridge.expression(col("text")))))
    agree("md5_simhash60(text)",
      ColumnBridge.column(Md5SimHash60(ColumnBridge.expression(col("text")))))
  }

  test("deflate_ratio SQL ≡ Column") {
    docs
    agree("deflate_ratio(text)",
      ColumnBridge.column(DeflateRatio(ColumnBridge.expression(col("text")))))
  }

  test("shingle_hashes and word_shingles SQL ≡ Column") {
    docs
    agree("shingle_hashes(text, 3)",
      ColumnBridge.column(ShingleHashes(ColumnBridge.expression(col("text")), 3)))
    agree("word_shingles(text, 3)",
      ColumnBridge.column(WordShingles(ColumnBridge.expression(col("text")), 3)))
  }

  test("minhash_bands and md5_minhash_band_keys SQL ≡ Column") {
    docs
    // both take a SHINGLES array child — composed in SQL exactly as
    // the DataFrame pipelines compose them (q36 / q55)
    agree("minhash_bands(shingle_hashes(text, 3), 16, 4)",
      ColumnBridge.column(MinHashBands(
        ColumnBridge.expression(ShingleHashes.shingleHashes(
          col("text"), 3)), 16, 4)))
    agree("md5_minhash_band_keys(word_shingles(text, 3), 16, 4)",
      ColumnBridge.column(Md5MinHashBandKeys(
        ColumnBridge.expression(ColumnBridge.column(
          WordShingles(ColumnBridge.expression(col("text")), 3))),
        16, 4)))
  }

  test("vec_dot and vec_dot_i32 SQL ≡ Column on real embeddings") {
    val vcol = "embedding"
    vecs // force registration + view
    val viaSql = spark.sql(
        s"SELECT vec_dot($vcol, $vcol) FROM ge_vecs").as[Double]
      .collect().toSeq
    val viaCol = vecs.select(ColumnBridge.column(
        VecDot(ColumnBridge.expression(col(vcol)),
          ColumnBridge.expression(col(vcol)))).as("d")).as[Double]
      .collect().toSeq
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // i32 path: quantize once, then dot must agree SQL vs Column
    graft.GraftExtensions.register(spark)
    val q = vecs.select(transform(col(vcol),
        x => (x * 127).cast("int")).as("qv"))
    q.createOrReplaceTempView("ge_qvecs")
    val s2 = spark.sql(
        "SELECT vec_dot_i32(qv, qv) FROM ge_qvecs").as[Long]
      .collect().toSeq
    val c2 = q.select(ColumnBridge.column(
        VecDotI32(ColumnBridge.expression(col("qv")),
          ColumnBridge.expression(col("qv")))).as("d")).as[Long]
      .collect().toSeq
    assert(s2 == c2 && s2.nonEmpty)
  }

  test("non-literal sizing argument fails at analysis, not silently") {
    docs
    val ex = intercept[Exception] {
      spark.sql("SELECT rolling_winnow(text, CAST(length(text) AS INT), 4) FROM ge_docs")
        .collect()
    }
    assert(ex.getMessage.contains("integer literal"),
      s"expected a loud analysis failure, got: ${ex.getMessage}")
  }
}
