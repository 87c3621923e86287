package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.etl.FixtureLoader.spark

/** Batch-drives-stream tests over the driver testdata events table. */
class EventsStreamSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // streaming parquet sources need a DIRECTORY; stage events.parquet alone
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed counts over the stream match the batch equivalent") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val got = EventsStream.runToMemory(
      EventsStream.windowedCounts(stream), "win_counts", OutputMode.Append())
    // append mode emits only windows fully below the final watermark;
    // every emitted window must match the batch computation exactly
    val batch = graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    val g = got.select($"window.start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val b = batch.select($"window.start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    assert(g.nonEmpty)
    assert(g.subsetOf(b))
  }

  test("stateful gap sessionization emits one state per user") {
    val stream = EventsStream.readEvents(spark, streamDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStream.Event]
    val got = EventsStream.runToMemory(
      EventsStream.sessionize(stream, gapMinutes = 60).toDF(),
      "sessions", OutputMode.Update())
    val users = graft.Tables.events(spark, dir)
      .select(countDistinct($"user_id")).first().getLong(0)
    assert(got.select("user_id").distinct().count() == users)
    assert(got.agg(sum("n_events")).first().getLong(0) > 0)
  }
}
