package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.FixtureLoader.spark
import graft.QueriesCycle

/** The batch≡stream identity of the whole-cycle composition: q346
  * (Runner.syncCycle driven as Structured Streaming micro-batches,
  * EDW state threaded through the foreachBatch loop) must produce
  * row-identical cycle-2 outputs to q345 (the same two cycles in one
  * batch plan). The driver additionally hash-gates q346 against
  * q345's DuckDB twin; this spec localizes a divergence to the
  * engine side.
  */
class StreamingCycleSpec extends AnyFunSuite {

  private val sf001 = "/root/testdata/sf0.001"

  test("q346 streamed cycle-2 outputs equal q345's batch outputs") {
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getString(2)}")
        .sorted.toSeq
    val streamed = canon(QueriesCycle.q346StreamCycle(spark, sf001))
    val batch = canon(QueriesCycle.q345SecondCycle(spark, sf001))
    assert(streamed.size == batch.size,
      s"row counts differ: stream ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch)
  }
}
