package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the Deequ-shaped
  * validation pass a lake pipeline runs before publishing a table.
  * Column constraints COMPILE TO ONE AGGREGATE PASS over the table
  * (each constraint contributes one aggregate expression; adding a
  * constraint never adds a scan), then pivot to one report row per
  * constraint via a single explode. Referential constraints are the
  * one exception: each needs its own anti-join, planned broadcast
  * when the parent key set is small. Nothing touches the driver — the
  * report is itself a DataFrame.
  */
object Quality {

  sealed trait Constraint
  /** Null fraction of `column` must be ≤ maxNullFrac (default: none). */
  final case class NotNull(column: String, maxNullFrac: Double = 0.0)
    extends Constraint
  /** `column` must have no duplicate non-null values. */
  final case class Unique(column: String) extends Constraint
  /** All non-null values of `column` must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
    extends Constraint

  /** Evaluate column constraints in one aggregate pass.
    * Output: (constraint, metric, pass) — metric is the null fraction
    * (rounded 6 for DISPLAY only), duplicate count, or out-of-range
    * count respectively. Verdicts are computed from the UNROUNDED
    * aggregate: a 1-in-10⁷ null violation must fail even though its
    * displayed fraction rounds to 0.0.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val metrics = constraints.map {
      case NotNull(c, _) =>
        avg(when(col(c).isNull, 1.0).otherwise(0.0))
      case Unique(c) =>
        // duplicates among NON-NULL values (SQL UNIQUE semantics:
        // nulls are all distinct) — count(col), never count(*)
        (count(col(c)) - countDistinct(col(c))).cast("double")
      case InRange(c, lo, hi) =>
        coalesce(sum(when(col(c) < lo || col(c) > hi, 1L)
          .otherwise(0L)), lit(0L)).cast("double")
    }.zipWithIndex.map { case (m, i) => m.as(s"__m$i") }
    val row = df.agg(metrics.head, metrics.tail: _*)
    val reportRows = constraints.zipWithIndex.map { case (c, i) =>
      val raw = col(s"__m$i")
      val (name, metric, pass) = c match {
        case NotNull(cc, f) =>
          (s"not_null:$cc", round(raw, 6), raw <= f)
        case Unique(cc)     => (s"unique:$cc", raw, raw === 0.0)
        case InRange(cc, lo, hi) =>
          (s"in_range:$cc[$lo,$hi]", raw, raw === 0.0)
      }
      struct(lit(name).as("constraint"), metric.as("metric"),
        pass.as("pass"))
    }
    row.select(explode(array(reportRows: _*)).as("r")).select("r.*")
  }

  /** k-anonymity audit — the privacy-risk profile a dataset release
    * runs over its quasi-identifier columns: every row should be
    * indistinguishable from at least k−1 others on the QI tuple.
    * Output: one row with the minimum equivalence-class size, class
    * count, and the fraction of rows at risk (in classes smaller than
    * k). Two chained aggregates, both map-side combined; the QI class
    * table never leaves the cluster.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, s"qiCols=$qiCols k=$k")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__sz"))
      .agg(min(col("__sz")).as("k_min"),
        count(lit(1)).as("n_groups"),
        sum(col("__sz")).as("n_rows"),
        coalesce(sum(when(col("__sz") < k, col("__sz"))), lit(0L))
          .as("at_risk_rows"))
      .select(lit(qiCols.mkString(",")).as("quasi_identifiers"),
        col("k_min"), col("n_groups"), col("n_rows"), col("at_risk_rows"),
        round(col("at_risk_rows").cast("double") / col("n_rows"), 6)
          .as("risk_frac"))
  }

  /** l-diversity audit — k-anonymity's companion gate: a QI class
    * whose rows all share one sensitive value leaks that value even
    * when the class is large, so every equivalence class must carry
    * at least `l` DISTINCT sensitive values. Output is per-class
    * (unlike [[kAnonymity]]'s one-row summary): the QI tuple, class
    * size, distinct-sensitive count, and the verdict. One aggregate
    * pass (count + count-distinct per class), map-side combined; the
    * sensitive column never leaves its class row.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty && l >= 2, s"qiCols=$qiCols l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .select(qiCols.map(col) ++ Seq(
        col("n_rows"), col("l_distinct"),
        (col("l_distinct") >= l).as("is_diverse")): _*)
  }

  /** Referential-integrity constraint: values of `childCol` must exist
    * in `parentCol`. One anti-join (broadcast when the parent key set
    * is dimension-sized); metric = orphan row count.
    */
  def checkRef(
      child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String): DataFrame =
    child.select(col(childCol).as("__k"))
      .join(parent.select(col(parentCol).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).cast("double").as("metric"))
      .select(lit(s"ref:$childCol->$parentCol").as("constraint"),
        col("metric"), (col("metric") === 0.0).as("pass"))

  /** t-closeness audit — completes the k-anonymity / l-diversity
    * privacy trio: an equivalence class is safe only when its
    * sensitive-attribute DISTRIBUTION stays within Earth-Mover's
    * Distance t of the global distribution (an l-diverse class can
    * still be 95 % one value when the corpus is 50/50). For an
    * ORDERED attribute with k bands, EMD is the mean absolute
    * cumulative difference: Σⱼ |Σᵢ≤ⱼ (pᵢ − qᵢ)| / (k−1). All
    * arithmetic is cleared-denominator integers — the cumulative
    * term is carried as cntᵍᵢ·N − cntᵢ·nᵍ over denominator nᵍ·N, so
    * Spark and DuckDB agree bitwise and the verdict cross-multiplies
    * (num·100 ≤ t%·den) per the no-division threshold rule.
    *
    * Shape: one count aggregate over (QI, band), a broadcast of the
    * k-row global band distribution, a k-per-group band spine so
    * zero-count bands still contribute, and a k-frame window per
    * group — the sensitive column itself never shuffles.
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String], bandCol: String,
      bands: Seq[String], tPct: Int): DataFrame = {
    require(qiCols.nonEmpty && bands.size >= 2 && tPct > 0,
      s"qiCols=$qiCols bands=$bands tPct=$tPct")
    val qi = qiCols.map(col)
    val bandIdx = bands.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (b, i)) =>
        when(col(bandCol) === b, lit(i)).otherwise(acc)
      }
    // fail LOUDLY on a band value outside the declared list: a -1 row
    // would be dropped from the band spine / cumulative EMD yet still
    // counted in __ng and __nn, so per-class distributions silently
    // stop summing to 1 and the verdict skews. Callers must pass an
    // exhaustive band list (q202 does); anything else is a caller bug.
    val rows = df.select(qi :+ bandIdx.cast("int").as("__b")
        :+ col(bandCol).as("__bv"): _*)
      .withColumn("__b", when(col("__b") >= 0, col("__b"))
        .otherwise(raise_error(concat(
          lit(s"tCloseness: $bandCol value outside declared bands " +
            s"${bands.mkString("[", ",", "]")}: "), col("__bv")))))
      .drop("__bv")
    // per-(group, band) and global-band counts, one shuffle each
    val gb = rows.groupBy(qi :+ col("__b"): _*)
      .agg(count(lit(1)).as("__cg"))
    val glob = rows.groupBy("__b").agg(count(lit(1)).as("__c"))
      .crossJoin(rows.agg(count(lit(1)).as("__nn")))
    val ng = rows.groupBy(qi: _*).agg(count(lit(1)).as("__ng"))
    // k-row spine per group: zero-count bands must still cumulate
    val spined = ng
      .withColumn("__b", explode(array(bands.indices.map(i => lit(i)): _*)))
      .join(gb, qiCols :+ "__b", "left")
      .na.fill(0L, Seq("__cg"))
      .join(broadcast(glob), Seq("__b"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(qi: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spined
      .withColumn("__cum",
        sum(col("__cg") * col("__nn") - col("__c") * col("__ng")).over(w))
      .groupBy(qi :+ col("__ng").as("n_rows"): _*)
      .agg(sum(abs(col("__cum"))).as("emd_num"),
        max(lit(bands.size - 1) * col("__ng") * col("__nn"))
          .as("emd_den"))
      .select(qi ++ Seq(col("n_rows").cast("bigint").as("n_rows"),
        col("emd_num").cast("bigint").as("emd_num"),
        col("emd_den").cast("bigint").as("emd_den"),
        expr("CAST((emd_num * 1000000L) DIV emd_den AS BIGINT)")
          .as("emd_micros"),
        (col("emd_num") * 100 <= col("emd_den") * tPct)
          .as("is_close")): _*)
  }
}
