package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.FixtureLoader.spark
import graft.Tables

class TopKPerKeySpec extends AnyFunSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("custom top-k operator matches the window row_number plan") {
    val orders = Tables.orders(spark, sf)
    val got = TopK.topKPerKey(orders, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("physical plan uses the heap operator with no Sort or Window") {
    val orders = Tables.orders(spark, sf)
    val df = TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false), k = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
    // the required ClusteredDistribution inserts exactly one exchange
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("ties and k larger than group size behave like the window form") {
    val df = Seq((1, 10, 5.0), (1, 11, 5.0), (1, 12, 5.0), (2, 20, 1.0))
      .toDF("k", "id", "score")
    val got = TopK.topKPerKey(df, Seq("k"),
        Seq("score" -> false, "id" -> true), k = 2)
      .select("k", "id").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 11), (2, 20)))
  }

  test("max-keys guard fails fast instead of growing the heap map") {
    val orders = Tables.orders(spark, sf) // ~1500 distinct custkeys
    spark.conf.set(TopK.maxKeysConf, "100")
    try {
      val ex = intercept[org.apache.spark.SparkException] {
        TopK.topKPerKey(orders.repartition(1), Seq("o_custkey"),
          Seq("o_totalprice" -> false), k = 2).count()
      }
      val msg = ex.getMessage + Option(ex.getCause).fold("")(_.getMessage)
      assert(msg.contains("distinct keys in one partition"), msg)
      assert(msg.contains("highCardinality"), msg)
    } finally spark.conf.unset(TopK.maxKeysConf)
  }

  test("highCardinality fallback matches the heap plan and is spillable") {
    val orders = Tables.orders(spark, sf)
    val keys = Seq("o_custkey")
    val ord = Seq("o_totalprice" -> false, "o_orderkey" -> true)
    val viaWindow = TopK.topKPerKey(orders, keys, ord, k = 3,
      highCardinality = true)
    val viaHeap = TopK.topKPerKey(orders, keys, ord, k = 3)
    assert(viaWindow.select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet ==
      viaHeap.select("o_custkey", "o_orderkey")
        .as[(Long, Long)].collect().toSet)
    // the fallback is the disk-backed sort plan, not the heap exec
    val plan = viaWindow.queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("TopKPerKey"), plan)
  }

  test("both plans accept dotted column names identically") {
    val df = Seq((1, 10, 5.0), (1, 11, 7.0), (2, 20, 1.0))
      .toDF("the.key", "id", "score.usd")
    val viaHeap = TopK.topKPerKey(df, Seq("the.key"),
        Seq("score.usd" -> false), k = 1)
      .select("id").as[Int].collect().toSet
    val viaWindow = TopK.topKPerKey(df, Seq("the.key"),
        Seq("score.usd" -> false), k = 1, highCardinality = true)
      .select("id").as[Int].collect().toSet
    assert(viaHeap == Set(11, 20) && viaWindow == viaHeap)
  }
}
