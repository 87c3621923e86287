package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark

class PagedSourceSpec extends AnyFunSuite {
  import spark.implicits._

  test("drainPages consumes until the first empty page, stamps offset") {
    val data = (0 until 25).map(i => (s"u$i", s"""{"n":$i}"""))
    val t = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val df = PagedSource.drainPages(spark,
      (page, size) => data.slice(page * size, (page + 1) * size),
      pageSize = 10, downloadedAt = t)
    assert(df.count() == 25)
    assert(df.select(max("downloaded")).first().getTimestamp(0) == t)
    // resume offset comes back out via max(downloaded)
    val off = graft.etl.PureDocs.resumeOffset(
      df.select("downloaded"), df.limit(0).select("downloaded"))
    assert(off.first().getTimestamp(0) == t)
  }

  test("fetchByKeys issues batched lookups on executors") {
    val ids = (1 to 10).map(i => s"k$i").toDS().repartition(3)
    val df = PagedSource.fetchByKeys(ids, batchSize = 4,
      batch => batch.map(k => (k, s"""{"id":"$k","batch":${batch.size}}""")))
    assert(df.count() == 10)
    // every batch size must be <= 4 (recorded inside the payload)
    val sizes = df.select(get_json_object(col("json"), "$.batch").cast("int"))
      .as[Int].collect()
    assert(sizes.forall(_ <= 4))
  }

  test("gzip json log sink appends date partitions") {
    val dir = java.nio.file.Files.createTempDirectory("gzlog").toString
    val df1 = Seq(("u1", "{}")).toDF("uuid", "json")
    PagedSource.appendGzipJsonLog(df1, dir, "2020-01-01")
    PagedSource.appendGzipJsonLog(df1, dir, "2020-01-02")
    PagedSource.appendGzipJsonLog(df1, dir, "2020-01-02")
    val back = spark.read.json(dir)
    assert(back.count() == 3)
    assert(back.select("log_date").distinct().count() == 2)
    val gz = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".gz")).count()
    assert(gz >= 2)
  }

  test("owner reassignment to root org on org delete") {
    val pubs = Seq(("p1", "orgA"), ("p2", "orgB"))
      .toDF("uuid", "owner_pure_org_uuid")
    val deleted = Seq("orgA").toDF("uuid")
    val got = graft.etl.PureDocs.reassignOwnerToRoot(pubs, deleted, "ROOT")
      .select("uuid", "owner_pure_org_uuid").as[(String, String)]
      .collect().toMap
    assert(got == Map("p1" -> "ROOT", "p2" -> "orgB"))
  }
}
