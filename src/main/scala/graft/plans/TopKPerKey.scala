package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.jdk.CollectionConverters._

/** Tier (c) of the custom-operator ladder: a whole physical operator —
  * logical node + planner strategy + SparkPlan — for bounded top-k per
  * key.
  *
  * Spark's native shape for "k best rows per key" is
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k`,
  * which SORTS every partition in full (O(n log n) per partition,
  * spilling at scale) to keep k rows. This operator declares only
  * `ClusteredDistribution(keys)` — no child ordering — and maintains a
  * bounded heap per key (O(n log k), memory O(#keys × k)): the right
  * physical algorithm for ANN top-k and latest-k-per-entity pipelines
  * at 100 TB, where k ≪ rows-per-key.
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** -0.0/0.0 and NaN bit patterns must land in one group, as they do
    * for groupBy/Window keys — Spark's NormalizeFloatingNumbers rule
    * only covers standard operators, so the exec normalizes its own
    * keys (distribution AND grouping projection must agree).
    */
  private def normalizedKeys: Seq[Expression] =
    keys.map(org.apache.spark.sql.graftshim.ColumnBridge.normalizeFloats)

  /** Rows of one key must meet in one partition — but need NOT be
    * sorted: the heap does the selection.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(normalizedKeys) :: Nil

  /** Output stays clustered exactly as the child was partitioned;
    * advertising it saves downstream same-key operations a reshuffle.
    */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keysLocal = normalizedKeys
    val orderLocal = order
    // memory contract: the heap map is O(distinct keys per partition ×
    // k) with NO spill path — the whole point is avoiding the Window
    // plan's full per-partition sort. The guard below turns the would-be
    // OOM into a diagnosable error; resolved driver-side (conf is not
    // available inside the task closure).
    val maxKeys = conf.getConfString(TopK.maxKeysConf, "4000000").toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ordering = RowOrdering.create(orderLocal, childOutput)
      // heap head = WORST retained row (reverse ordering), evicted when
      // a better row arrives and the heap is full
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          if (heaps.size() >= maxKeys)
            throw new IllegalStateException(
              s"TopKPerKeyExec: more than $maxKeys distinct keys in one " +
                s"partition (heap memory is O(keys × k), unspillable). " +
                s"Use TopK.topKPerKey(..., highCardinality = true) for " +
                s"the sort-based spillable plan, or raise " +
                s"${TopK.maxKeysConf}.")
          pq = new java.util.PriorityQueue[InternalRow](kLocal + 1,
            ordering.reverse)
          heaps.put(key.copy(), pq)
        }
        if (pq.size < kLocal) pq.add(row.copy())
        else if (ordering.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.add(row.copy())
        }
      }
      heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Max distinct keys one partition's heap map may hold before the
    * exec fails fast instead of creeping toward OOM.
    */
  val maxKeysConf = "spark.graft.topk.maxKeysPerPartition"

  /** Keep the k best rows per key under `order` (column name →
    * ascending?; best = first in that order). Column references are
    * built as catalyst UnresolvedAttributes directly — the Spark 4
    * Column API wraps expressions in lazy ColumnNodes that the
    * analyzer only unwraps inside standard operators, not custom
    * nodes. Output row order within a key is undefined — sort
    * afterwards if presentation order matters.
    *
    * Memory contract: the default heap-based plan holds O(distinct
    * keys per partition × k) rows in executor memory with no spill
    * path — ideal when keys-per-partition is bounded (ANN query sets,
    * per-entity latest-k over well-partitioned entities) and guarded
    * by [[maxKeysConf]] (default 4M keys). For unbounded key
    * cardinality ("latest-k over 10^9 entities"), pass
    * `highCardinality = true` to get the sort-based
    * row_number-over-Window plan, which spills to disk instead of
    * growing a map.
    */
  def topKPerKey(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int,
      highCardinality: Boolean = false): DataFrame = {
    require(k >= 1, s"topKPerKey requires k >= 1, got $k")
    require(keys.nonEmpty, "topKPerKey requires at least one key column")
    if (highCardinality) return windowTopK(df, keys, order, k)
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Descending
    import org.apache.spark.sql.graftshim.ColumnBridge
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerKey(k, keys.map(UnresolvedAttribute.quoted),
        sortOrder, ColumnBridge.logicalPlan(df)))
  }

  /** The spillable fallback: same result set via
    * row_number().over(Window) — full per-partition sort (O(n log n),
    * disk-backed UnsafeExternalSorter) instead of bounded heaps.
    */
  private def windowTopK(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    // quote names so a dotted column ("price.usd") resolves as one
    // attribute, exactly as the heap path's UnresolvedAttribute.quoted
    // does — the two plans this flag toggles must accept the same input
    def qcol(n: String) = col(s"`${n.replace("`", "``")}`")
    val w = Window.partitionBy(keys.map(qcol): _*)
      .orderBy(order.map { case (n, asc) =>
        if (asc) qcol(n).asc else qcol(n).desc }: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
