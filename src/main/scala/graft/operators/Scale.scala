package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the shuffle-shaping tools the 100 TB design
  * leans on when AQE alone isn't enough — key salting for skewed
  * shuffle joins and bucketed table layout for co-located (exchange-
  * free) repeated joins.
  */
object Scale {

  /** Salted inner equi-join for skewed keys: the left (skewed) side
    * gets a random salt in [0, saltFactor); the right side is exploded
    * `saltFactor`× so every (key, salt) bucket finds its match. Breaks
    * a hot key's single monster partition into `saltFactor` tasks at
    * the cost of replicating the right side — use when one side is
    * small-ish per key (dimension-like) but too big or too skewed to
    * broadcast whole.
    *
    * Result equals `left.join(right, keys)` exactly (inner join).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }

  /** Write a table partitioned by a derived date column: readers
    * filtering on `partitionCol` scan only matching directories
    * (partition pruning — PartitionFilters in the plan), the layout
    * move that turns a 100 TB time-ranged scan into a day's worth.
    */
  def writeDatePartitioned(
      df: DataFrame,
      path: String,
      tsCol: String,
      partitionCol: String = "event_date"): Unit =
    df.withColumn(partitionCol, to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Write a table bucketed + sorted by `key` into the session catalog:
    * subsequent equi-joins between tables bucketed the same way plan
    * with ZERO Exchange on either side (SortMergeJoin over pre-shuffled
    * files) — the "pre-partition once, join many times" pattern for
    * fact-fact joins repeated across a pipeline.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
