package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core relational-op library (SURVEY.md §7.1 step 3): each op is a
  * pure `DataFrame => DataFrame` composition of built-in Catalyst
  * expressions, so pushdown / pruning / whole-stage codegen apply
  * untouched. Every op is written for 100 TB scale: no driver-side
  * collection, shuffles only on declared keys, window partitions bounded
  * by key cardinality.
  */
object Relational {

  /** W6/J4/A1: latest row per key. `order` columns are priority-ordered,
    * highest wins (pass e.g. `col("ts").desc`). Implemented as a single
    * window `row_number` — one shuffle on `keys`, streaming rank inside
    * each partition, no materialized sort of the whole relation.
    *
    * Reference: correlated `max(timestamp)` subquery
    * `oit_to_edw/demographics.py:4-14` and desc-order-take-first
    * `transformer_loaders/pure_api_pub.py:64-72`.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SO1/SO2: snapshot-diff CDC — rows of `current` that are new or
    * changed versus the latest history row per key (reference
    * `oit_to_edw/person.py:129-186`: `MINUS` against a correlated
    * max-timestamp subselect). `compareCols` defaults to all columns of
    * `current` (full-row diff).
    */
  def snapshotDiff(
      current: DataFrame,
      history: DataFrame,
      keys: Seq[String],
      historyOrder: Seq[Column],
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols = if (compareCols.nonEmpty) compareCols else current.columns.toSeq
    val latestHist =
      latestPerKey(history, keys, historyOrder).select(cols.map(col): _*)
    current.select(cols.map(col): _*).except(latestHist)
  }

  /** W2: run-length sessionization — start a new group whenever any of
    * `changeKeys` differs from the previous row within the
    * `partitionKeys` × `order` sequence (reference `group_entries`,
    * `oit_to_edw/employee_job.py:205-231`). Adds `sessionCol` (long,
    * 1-based, per partition). One shuffle; lag + running sum are both
    * single-pass within the partition.
    */
  def sessionize(
      df: DataFrame,
      partitionKeys: Seq[String],
      order: Seq[Column],
      changeKeys: Seq[String],
      sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(order: _*)
    val changed = changeKeys
      .map(k => !(col(k) <=> lag(col(k), 1).over(w)))
      .reduce(_ || _)
    // first row always opens a group; later rows open one on any change
    val flag = when(row_number().over(w) === 1, lit(1))
      .otherwise(when(changed, lit(1)).otherwise(lit(0)))
    df.withColumn("__chg", flag)
      .withColumn(sessionCol,
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__chg")
  }

  /** W3: stint splitting (reference `split_entries_into_stints`,
    * `oit_to_edw/affiliate_job.py:111-147`): within each
    * `partitionKeys` group ordered by `order`,
    *  - a new stint starts at an inactive→active transition of
    *    `activeFlag`;
    *  - the group is truncated after the first row where `truncFlag`
    *    is true (later rows dropped).
    * Adds `stint_id`; keeps surviving rows only.
    */
  def splitStints(
      df: DataFrame,
      partitionKeys: Seq[String],
      order: Seq[Column],
      activeFlag: Column,
      truncFlag: Column): DataFrame = {
    // every window shares ONE (partition, order) spec — row_number, lag,
    // the running stint sum and the whole-frame truncation min all land
    // in a single WindowExec (one shuffle, one sort, one pass); the
    // earlier partition-only spec for the truncation min forced a second
    // whole-partition buffering pass
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val prevActive = lag(activeFlag, 1).over(w)
    val newStint =
      when(row_number().over(w) === 1, lit(1))
        .when(activeFlag && !coalesce(prevActive, lit(true)), lit(1))
        .otherwise(lit(0))
    val truncPos = min(when(truncFlag, row_number().over(w))).over(full)
    df.withColumn("__pos", row_number().over(w))
      .withColumn("stint_id", sum(newStint).over(cum))
      .withColumn("__cut", truncPos)
      .filter(col("__cut").isNull || col("__pos") <= col("__cut"))
      .drop("__pos", "__cut")
  }

  /** F-ELECT: deterministic priority election — exactly one winner per
    * partition. `priority` is an ascending score (lower = better, build
    * with a `when` cascade); `tieBreak` columns make the order total,
    * replacing the reference's "just pick one" nondeterminism
    * (`oit_to_edw/person.py:319-459`). Adds boolean `isPrimaryCol`.
    */
  def electPrimary(
      df: DataFrame,
      partitionKeys: Seq[String],
      priority: Column,
      tieBreak: Seq[Column],
      isPrimaryCol: String = "is_primary"): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(priority +: tieBreak: _*)
    df.withColumn(isPrimaryCol, row_number().over(w) === 1)
  }

  /** D5: keep-one-with-preference — one row per key, the row maximizing
    * `prefer` (build with `struct(...)`; struct ordering is
    * lexicographic). Reference `transform_staff_org_assoc_id`
    * `oit_to_edw/person.py:272-317`. Uses `max_by`, which computes with
    * partial (map-side) aggregation — cheaper than a window at scale.
    */
  def keepOnePreferred(df: DataFrame, keys: Seq[String], prefer: Column): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.toSeq.map(col): _*), prefer).as("__best"))
      .select(keys.map(col) ++ others.map(c => col(s"__best.$c")): _*)
  }

  /** SO4: symmetric difference of two keyed sets → tagged union with a
    * `side` column: 'left_only' rows to delete, 'right_only' rows to
    * insert (reference association-set reconciliation
    * `pure_api_internal_person.py:163-186,292-323`). ONE shuffle total:
    * union both sides with presence flags, one keyed aggregation of two
    * map-side max bits, filter keys present on exactly one side — the
    * anti-join formulation cost four distinct/anti stages (7 exchanges
    * in the plan) for the same result.
    */
  def symmetricDiff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = left.select(keys.map(col): _*)
      .withColumn("__l", lit(1)).withColumn("__r", lit(0))
      .unionByName(right.select(keys.map(col): _*)
        .withColumn("__l", lit(0)).withColumn("__r", lit(1)))
    val agged = tagged.groupBy(keys.map(col): _*)
      .agg(max(col("__l")).as("__inl"), max(col("__r")).as("__inr"))
    // SQL join semantics: a key tuple containing NULL matches NOTHING,
    // so a null-keyed tuple present on both sides is BOTH left_only and
    // right_only (the anti-join formulation this replaced behaved that
    // way); grouping alone would silently swallow it as a "match"
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    val normal = agged.filter(!nullKey && col("__inl") =!= col("__inr"))
      .select(keys.map(col) :+
        when(col("__inl") === 1, lit("left_only"))
          .otherwise(lit("right_only")).as("side"): _*)
    val nullSides = agged.filter(nullKey)
      .select(keys.map(col) :+ explode(concat(
        when(col("__inl") === 1, array(lit("left_only")))
          .otherwise(array().cast("array<string>")),
        when(col("__inr") === 1, array(lit("right_only")))
          .otherwise(array().cast("array<string>")))).as("side"): _*)
    normal.unionByName(nullSides)
  }

  /** Scratch→target merge (§1.1): rows of `updates` replace same-key rows
    * of `target`; unmatched target rows survive; new rows append — i.e.
    * `MERGE INTO` upsert semantics (reference
    * `oit_to_edw/person.py:67-78`). With a Delta-style table this becomes
    * a literal MERGE; on plain parquet it is anti-join ∪ updates.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates.select(target.columns.toSeq.map(col): _*))

  /** Full CDC MERGE — [[upsert]] generalized to a change FEED: `changes`
    * carries the complete target row shape plus an op column
    * (`'U'` upsert / `'D'` delete) and a strictly-ordering sequence
    * column (CDC offset, commit ts). Net effect per key is
    * LAST-OP-WINS by `seqCol` (`max_by` over one groupBy — a single
    * shuffle on the keys reduces an arbitrarily long feed to one row
    * per touched key BEFORE touching the target), then: untouched
    * target rows pass through an anti join, net-`'U'` rows replace or
    * insert, net-`'D'` rows vanish — exactly Delta/Iceberg
    * `MERGE WHEN MATCHED [UPDATE|DELETE] WHEN NOT MATCHED INSERT`
    * applied at change-feed granularity. `seqCol` must be unique per
    * key (true for log offsets); ties would make max_by
    * nondeterministic.
    */
  def mergeCdc(
      target: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String): DataFrame = {
    val payload = target.columns.toSeq.filterNot(keys.contains)
    val net = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct((opCol +: payload).map(col): _*), col(seqCol))
        .as("__net"))
      .select(keys.map(col) ++ (opCol +: payload)
        .map(c => col(s"__net.$c").as(c)): _*)
    target.join(net.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(net.filter(col(opCol) =!= "D")
        .select(target.columns.toSeq.map(col): _*))
  }

  /** As-of join (time-series point lookup): for every left row, attach
    * the latest right row with `rightTs <= leftTs` within the same
    * `keys`. Composed from built-ins — tier (a) of the custom-operator
    * ladder — as a tagged union + running last-known-value window: one
    * shuffle on (keys), single ordered pass per partition, no range
    * join explosion and no custom physical operator. `payload` names
    * the right-side columns to carry (prefixed `asof_`).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal ts
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(p,
            right.schema(p).dataType)))))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(payload.map(col): _*))
    val rShaped = r.select(
      (keys.map(col) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__side"), col("__payload"))): _*)
    val lShaped = l.select(
      (keys.map(col) ++ lCols.filterNot(keys.contains).map(col) ++
        Seq(col("__ts"), col("__side"), col("__payload"))): _*)
    val unioned = lShaped.unionByName(rShaped)
    // payload hash as final tie-break: several right rows at the same
    // (keys, ts) would otherwise resolve arbitrarily per shuffle
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"),
        xxhash64(to_json(col("__payload"))))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__last", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(s"asof_$p"))): _*)
  }

  /** Forward as-of join with optional tolerance — pandas
    * merge_asof(direction="forward") semantics: for every left row,
    * attach the EARLIEST right row with `rightTs >= leftTs` within the
    * same keys; with `toleranceSec`, matches farther than the
    * tolerance are nulled (the left row survives unmatched). Reuses
    * [[asOfJoin]]'s single-shuffle tagged-union core on NEGATED
    * microsecond timestamps — "earliest at-or-after" is exactly
    * "latest at-or-before" on the reversed axis, including the
    * equal-instant rule. The matched right timestamp rides along as an
    * internal payload column for the tolerance test and is dropped
    * before returning.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val l2 = left.withColumn("__neg", -unix_micros(col(leftTs)))
    val r2 = right.withColumn("__neg", -unix_micros(col(rightTs)))
    val carry = if (payload.contains(rightTs)) payload
      else payload :+ rightTs
    val joined = asOfJoin(l2, r2, keys, "__neg", "__neg", carry)
    val withinTol = toleranceSec match {
      case Some(t) => col(s"asof_$rightTs").isNotNull &&
        unix_micros(col(s"asof_$rightTs")) - unix_micros(col(leftTs)) <=
          t * 1000000L
      case None => col(s"asof_$rightTs").isNotNull
    }
    val tolApplied = payload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"asof_$p", when(withinTol, col(s"asof_$p")))
    }
    val dropRightTs = if (payload.contains(rightTs)) Nil
      else Seq(s"asof_$rightTs")
    tolApplied.drop("__neg" +: dropRightTs: _*)
  }

  /** Nearest as-of join — pandas merge_asof(direction="nearest"): for
    * every left row, attach the right row whose timestamp is CLOSEST
    * (before or after) within the same keys, optionally bounded by
    * `toleranceSec`; an exact-distance tie prefers the EARLIER
    * (backward) match. ONE shuffle and ONE sort: the same tagged-union
    * core as [[asOfJoin]], with the backward candidate as a running
    * `last(ignoreNulls)` over the preceding frame and the forward
    * candidate as `first(ignoreNulls)` over the strictly-following
    * frame of the SAME window partitioning — not two chained as-of
    * passes, which would shuffle the union twice for the same answer.
    * An equal-timestamp right row sorts before the left row (the
    * [[asOfJoin]] side rule) and is therefore only seen by the
    * backward frame — harmless, because its distance 0 wins the
    * nearest comparison and ties prefer backward anyway. Several
    * right rows at one (keys, ts) resolve by the same payload-hash
    * tie-break as [[asOfJoin]] on the backward side and its mirror
    * (first by hash) on the forward side.
    */
  def asOfJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val carry = if (payload.contains(rightTs)) payload else payload :+ rightTs
    val payloadT = org.apache.spark.sql.types.StructType(
      carry.map(p => org.apache.spark.sql.types.StructField(p,
        right.schema(p).dataType)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadT))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(carry.map(col): _*))
    val rShaped = r.select(
      (keys.map(col) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__side"), col("__payload"))): _*)
    val lShaped = l.select(
      (keys.map(col) ++ lCols.filterNot(keys.contains).map(col) ++
        Seq(col("__ts"), col("__side"), col("__payload"))): _*)
    val ord = Seq(col("__ts"), col("__side"),
      xxhash64(to_json(col("__payload"))))
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val both = lShaped.unionByName(rShaped)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val bDist = unix_micros(col(leftTs)) -
      unix_micros(col(s"__b.$rightTs"))
    val fDist = unix_micros(col(s"__f.$rightTs")) -
      unix_micros(col(leftTs))
    val tolUs = toleranceSec.map(_ * 1000000L)
    val bOk = col("__b").isNotNull &&
      tolUs.map(t => bDist <= t).getOrElse(lit(true))
    val fOk = col("__f").isNotNull &&
      tolUs.map(t => fDist <= t).getOrElse(lit(true))
    val useB = bOk && (!fOk || bDist <= fDist)
    both.select((lCols.map(col) ++ payload.map { p =>
      when(useB, col(s"__b.$p"))
        .when(fOk, col(s"__f.$p")).as(s"asof_$p")
    }): _*)
  }

  /** Interval (range) join: for every point row, attach every interval
    * row with the same `keys` whose half-open [start, end) window
    * contains the point's timestamp. Spark has no native range-join
    * strategy, and the naive formulation — equi-join on keys with a
    * BETWEEN residual — plans the whole key group as a per-key
    * cartesian product that a hot key turns quadratic. Bucketed
    * decomposition instead: each interval explodes to the fixed-width
    * time buckets it covers, each point maps to its SINGLE bucket, and
    * the join becomes a pure equi-join on (keys, bucket) with the
    * containment predicate as a cheap post-filter. Every matching
    * (point, interval) pair meets in exactly one bucket — the
    * point's — so no dedup pass exists to pay for. Cost scales with
    * Σ(interval span / bucketWidth) exploded rows: pick bucketWidth
    * near the typical interval span so intervals explode to ~2 buckets
    * each; AQE's skew handling covers residual hot buckets. Bucket
    * assignment uses true FLOOR division (`div` adjusted by the
    * remainder sign) so pre-1970 (negative-epoch) timestamps get
    * uniform-width buckets like everything else: plain `div`
    * truncates toward zero, which — being monotone — never dropped a
    * matching pair, but silently merged (−width, 0) and [0, width)
    * into one double-width bucket 0, and the earlier scaladoc-only
    * "assume non-negative epochs" contract had nothing enforcing it.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startTs: String,
      endTs: String,
      bucketWidthSec: Long,
      payload: Seq[String]): DataFrame = {
    require(bucketWidthSec > 0, s"bucketWidthSec=$bucketWidthSec")
    val wUs = bucketWidthSec * 1000000L
    // floor division on possibly-negative epochs: div truncates toward
    // zero, so subtract 1 whenever the remainder is negative
    def floorDiv(e: String): String =
      s"(($e) div $wUs - (CASE WHEN ($e) % $wUs < 0 THEN 1 ELSE 0 END))"
    val p = points.withColumn("__b", expr(floorDiv(s"unix_micros($pointTs)")))
    val iv = intervals
      .filter(col(endTs) > col(startTs)) // empty intervals match nothing
      .withColumn("__b", explode(sequence(
        expr(floorDiv(s"unix_micros($startTs)")),
        expr(floorDiv(s"unix_micros($endTs) - 1")))))
      .select((keys.map(col) ++ Seq(col("__b"),
        col(startTs).as("__start"), col(endTs).as("__end")) ++
        payload.map(c => col(c).as(s"iv_$c"))): _*)
    p.join(iv, keys :+ "__b")
      .filter(col(pointTs) >= col("__start") && col(pointTs) < col("__end"))
      .drop("__b", "__start", "__end")
  }

  /** J12: iterative parent-pointer tree expansion — returns
    * (id, root_id, depth, path) for every node reachable from the roots.
    * Breadth-first self-join loop to a fixpoint with a depth cap; each
    * iteration is one broadcast-able join (org trees are small dims —
    * reference `db_org_depth_first_search`
    * `pure_api_internal_org.py:117-134`). For genuinely deep/huge graphs
    * swap in GraphFrames-style iteration with checkpointing.
    */
  def treeClosure(
      nodes: DataFrame, // columns: id, parent_id (parent null for roots)
      idCol: String = "id",
      parentCol: String = "parent_id",
      maxDepth: Int = 32): DataFrame =
    closureWithSortPath(nodes, idCol, parentCol, maxDepth).drop("__sortpath")

  /** treeClosure plus a collision-proof DFS sort key: `__sortpath` is the
    * concatenation of fixed-width (8-digit) sibling ordinals, ordinals
    * assigned by id order within each parent. Unlike the display `path`
    * (id segments joined by '/'), it is unambiguous for ids containing
    * '/' or any other character, and lexicographic order on it IS
    * preorder DFS with siblings in id order — WITHIN one root. Roots
    * start with an EMPTY `__sortpath` (no root segment at all — neither
    * a globally windowed ordinal, which would funnel every root through
    * a single partition, nor a per-root hash, which would make
    * correctness depend on hash uniqueness): the path identifies a node
    * only together with `root_id`, so consumers structurally cannot
    * compare paths across roots without also joining/partitioning on
    * `root_id` ([[mpttLabels]] conjoins root_id equality in its prefix
    * join and partitions its windows by root_id).
    */
  private[operators] def closureWithSortPath(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxDepth: Int): DataFrame = {
    // fixed-width segment; >= 10^8 siblings under one parent would
    // silently truncate and corrupt the prefix semantics — fail loudly
    val seg = (ord: Column) =>
      when(ord >= lit(100000000L), raise_error(lit(
        "closureWithSortPath: more than 10^8 siblings under one parent " +
          "— the fixed-width ordinal segment would truncate")))
        .otherwise(lpad(ord.cast("string"), 8, "0"))
    val roots = nodes.filter(col(parentCol).isNull)
      .select(col(idCol).as("id"), col(idCol).as("root_id"),
        lit(0).as("depth"), col(idCol).cast("string").as("path"),
        lit("").as("__sortpath"))
    val sibW = Window.partitionBy(col(parentCol)).orderBy(col(idCol))
    // checkpoint the ordinal-labeled edge set ONCE: the loop joins it at
    // every level, and without materialization the sibling window (and
    // the scan under it) would re-execute per level. localCheckpoint
    // stores blocks executor-side with lineage truncated — an executor
    // loss mid-closure fails the job. Acceptable for tree-sized dims
    // (this operator's contract); point huge/deep graphs at reliable
    // checkpoint or persist(DISK_ONLY_2) instead.
    val edges = nodes.filter(col(parentCol).isNotNull)
      .withColumn("__ord", row_number().over(sibW))
      .select(col(idCol).as("child"), col(parentCol).as("parent"),
        seg(col("__ord")).as("__seg"))
      .localCheckpoint(eager = true)
    var frontier = roots
    var acc = roots
    var depth = 0
    var done = false
    // every level's frontier checkpoint, so the failure path can drop
    // them all (an abandoned `acc` would otherwise pin each level's
    // blocks with no owner left to release them)
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      while (!done) {
        val next = frontier.join(edges, frontier("id") === edges("parent"))
          .select(col("child").as("id"), col("root_id"),
            (col("depth") + 1).as("depth"),
            concat_ws("/", col("path"), col("child")).as("path"),
            concat(col("__sortpath"), col("__seg")).as("__sortpath"))
        // localCheckpoint truncates lineage so the loop's plan doesn't grow
        // exponentially; each frontier is small (tree levels).
        frontier = next.localCheckpoint(eager = true)
        levels += frontier
        done = frontier.isEmpty
        if (!done) {
          depth += 1
          // throw only when nodes genuinely exist beyond the cap — a tree
          // of depth exactly maxDepth (all leaves at the cap) is fine
          if (depth > maxDepth)
            throw new IllegalStateException(
              s"treeClosure: depth cap $maxDepth exceeded with a non-empty " +
                "frontier — deeper nodes would be silently dropped")
          acc = acc.unionByName(frontier)
        }
      }
    } catch { case t: Throwable =>
      levels.foreach(Checkpoints.drop(_))
      throw t
    } finally {
      // the ordinal edge set is dead on BOTH paths once the loop ends:
      // acc's surviving frames are checkpoint-backed
      Checkpoints.drop(edges)
    }
    // `acc` still references every LEVEL's frontier checkpoint (those
    // stay until the consumer is done — session-lifetime contract),
    // but the final EMPTY frontier was never unioned into acc
    Checkpoints.drop(frontier)
    acc
  }

  /** MPTT nested-set labels (left/right/depth) recomputed from parent
    * pointers (reference mutates them incrementally,
    * `pure_api_internal_org.py:136-192`; we recompute declaratively).
    * Siblings are ordered by id (deterministic across runs). Preorder
    * and subtree membership use the fixed-width ordinal sort path from
    * `closureWithSortPath`, so ids containing '/' (or any other
    * character) are labeled exactly. Tree-sized data (a dimension), so
    * the per-root sort is fine.
    */
  def mpttLabels(
      nodes: DataFrame,
      idCol: String = "id",
      parentCol: String = "parent_id"): DataFrame = {
    // the closure emits canonical (id, root_id, depth, path) column
    // names regardless of idCol — normalize the input and restore the
    // caller's name on output
    val canonical = nodes.select(col(idCol).as("id"),
      col(parentCol).as("parent_id"))
    val closure = closureWithSortPath(canonical, "id", "parent_id", 32)
    val w = Window.partitionBy(col("root_id")).orderBy(col("__sortpath"))
    val ranked = closure.withColumn("preorder", row_number().over(w))
    // subtree size WITHOUT a quadratic prefix theta join (the naive
    // form is a BroadcastNestedLoopJoin on startsWith — quadratic
    // within a root): because segments are fixed-width, a node's strict
    // ancestors' sort paths are exactly the 8·k-length prefixes of its
    // own path (k = 0..depth-1, k = 0 being the root's empty path). So
    // every row EMITS its ancestor prefixes (≤ maxDepth rows each) and
    // one aggregation keyed by (root_id, prefix) counts each node's
    // descendants — two uniform keyed shuffles, linear in n·depth, and
    // safe to point at a billion-node hierarchy.
    val prefixes = ranked.filter(col("depth") >= 1)
      .select(col("root_id"),
        explode(transform(sequence(lit(0), col("depth") - 1),
          k => col("__sortpath").substr(lit(1), k * lit(8)))).as("__anc"))
    val sizes = prefixes
      .groupBy(col("root_id").as("__szroot"), col("__anc"))
      .agg(count(lit(1)).as("n_desc"))
    val joined = ranked.join(sizes,
        ranked("root_id") === sizes("__szroot") &&
          ranked("__sortpath") === sizes("__anc"), "left")
      .drop("__szroot", "__anc")
      .withColumn("n_desc", coalesce(col("n_desc"), lit(0L)))
    // Euler-tour left label from preorder rank alone: when v is
    // visited, each of the preorder(v)-1 earlier nodes has emitted its
    // lft slot and — unless it is one of v's depth(v) still-open strict
    // ancestors — its rgt slot too, so with labels starting at 1:
    //   lft(v) = 2*(preorder(v)-1) - depth(v) + 1
    // (q44 hash-checks this against DuckDB's recursive-CTE labeling)
    val labeled = joined
      .withColumn("lft", (lit(2) * (col("preorder") - 1) - col("depth") + 1)
        .cast("long"))
      .withColumn("rgt", col("lft") + lit(2) * col("n_desc") + 1)
    labeled.select(col("id").as(idCol), col("root_id"), col("depth"),
      col("preorder"), col("n_desc"), col("lft"), col("rgt"))
  }

  /** DISTRIBUTED total-order ordinals — the scale-safe replacement for
    * `row_number()/sum() OVER (ORDER BY …)` with an empty PARTITION BY
    * (which funnels the whole relation through ONE task): range-partition
    * on the sort key, compute the row_number / running sums LOCALLY per
    * partition (parallel windows), then add per-partition offsets from a
    * |partitions|-row rollup. Equal keys land in one range partition, so
    * `rnCol` is exactly the global sort's row_number under `sort` (which
    * must therefore be a TOTAL order — include a tiebreak column), and
    * each `runningSums` output is exactly the global
    * `sum(expr) OVER (ORDER BY sort ROWS UNBOUNDED PRECEDING..CURRENT)`.
    * The only unpartitioned window left runs over the bounded
    * |partitions|-row offset rollup. Generalizes the q224 quantile-norm
    * scheme; q175/q181/q182/q185/q231/q232/q237 all ride it.
    *
    * @param nPart range partitions for the ordinal pass; ≤ 0 (the
    *        default) reads `spark.sql.shuffle.partitions`, falling
    *        back to 32 when the conf is unset or non-numeric (e.g.
    *        "auto" on some runtimes).
    * @param runningSums output-column → summand expression (evaluated
    *        against `df`'s columns) for inclusive global prefix sums.
    */
  def globalOrdinals(
      df: DataFrame,
      sort: Seq[Column],
      nPart: Int = 0,
      rnCol: String = "__rn",
      runningSums: Seq[(String, Column)] = Nil): DataFrame = {
    val n = if (nPart > 0) nPart
      else scala.util.Try(df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt)
        .toOption.filter(_ > 0).getOrElse(32)
    val w = Window.partitionBy("__gopid").orderBy(sort: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val summed = runningSums.foldLeft(
      df.repartitionByRange(n, sort: _*)
        .withColumn("__gopid", spark_partition_id())
        .withColumn(rnCol, row_number().over(w))) {
      case (acc, (out, e)) => acc.withColumn(out, sum(e).over(run))
    }
    // CORRECTNESS-CRITICAL, not a perf note: the eager localCheckpoint
    // pins ONE evaluation of the non-deterministic spark_partition_id()
    // so the offset rollup below and the row-level join both see the
    // SAME partition ids; without it the two consumers could re-execute
    // the scan and disagree. The scheme also assumes repartitionByRange
    // with an EXPLICIT numPartitions, which AQE never coalesces.
    val local = summed.localCheckpoint()
    // per-partition totals → exclusive prefix offsets (|partitions| rows;
    // the unpartitioned window here is bounded by construction)
    val offW = Window.orderBy("__gopid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy("__gopid")
      // partition totals re-aggregate the SUMMANDS (not the inclusive
      // running column — non-monotone under negative summands)
      .agg(count(lit(1)).as("__gon"),
        runningSums.map { case (out, e) =>
          sum(e).as(s"__got_$out") }: _*)
      .withColumn("__goffn", coalesce(sum(col("__gon")).over(offW), lit(0L)))
      .select(col("__gopid") :: col("__goffn") ::
        runningSums.map { case (out, _) =>
          coalesce(sum(col(s"__got_$out")).over(offW), lit(0L))
            .as(s"__goff_$out") }.toList: _*)
    val joined = local.join(broadcast(offsets), Seq("__gopid"))
      .withColumn(rnCol, col(rnCol) + col("__goffn"))
    runningSums.foldLeft(joined) { case (acc, (out, _)) =>
      acc.withColumn(out, col(out) + col(s"__goff_$out"))
        .drop(s"__goff_$out")
    }.drop("__gopid", "__goffn")
  }
}
