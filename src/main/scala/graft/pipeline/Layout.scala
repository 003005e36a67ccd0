package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for write-path file
  * organization.
  *
  * At 100 TB the dominant read cost is files scanned, not rows filtered: parquet
  * min/max pruning skips a file only when the predicate column is CLUSTERED within
  * it. A Z-order (Morton) key interleaves the bits of several columns so that
  * range-partitioning by the single key co-locates rows that are close in EVERY
  * dimension — after `repartitionByRange($"zkey")`, per-file min/max ranges stay
  * tight on each constituent column and predicates on ANY of them prune files
  * (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * The key computation itself is a pure, shuffle-free, codegen'd bit-expression —
  * `bitsPerDim`-bit unrolled shift/mask/or terms that constant-fold into one
  * whole-stage-codegen span.
  */
object Layout {

  /** Morton-interleave two non-negative dimension columns (low `bitsPerDim` bits
    * each): bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    */
  def mortonKey(x: Column, y: Column, bitsPerDim: Int = 20): Column = {
    val mask = (1L << bitsPerDim) - 1
    val xb = x.bitwiseAND(lit(mask))
    val yb = y.bitwiseAND(lit(mask))
    (0 until bitsPerDim).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order layout keys for the events table over (user_id, hour): `zkey` is the
    * Morton interleave, `bucket` its high bits = the target file/partition id, so
    * consecutive buckets tile the (user, time) plane in squares — point lookups by
    * user AND time-range scans both touch few buckets. `events.ts` is normalized to
    * epoch µs first ([[graft.EventTime.micros]] — the physical representation has
    * varied across testdata generations).
    */
  def zorderKeys(events: DataFrame, bitsPerDim: Int = 20, bucketShift: Int = 26): DataFrame =
    events
      .select(col("event_id"), col("user_id"), graft.EventTime.micros(events).as("tsu"))
      .select(
        col("event_id"),
        mortonKey(col("user_id"), expr("tsu DIV 3600000000"), bitsPerDim).as("zkey"))
      .withColumn("bucket", shiftright(col("zkey"), bucketShift))

  /** Hilbert-curve index of two non-negative dimension columns (low `bitsPerDim`
    * bits each) — strictly better locality than [[mortonKey]] at the same bit budget:
    * consecutive keys are always GRID NEIGHBORS (Manhattan distance 1), where the
    * Morton curve jumps across half the plane at quadrant boundaries, so per-file
    * min/max ranges after range-partitioning are tighter on both dimensions. The
    * curve walk carries per-level rotation state, so it is a custom codegen'd
    * expression ([[org.apache.spark.sql.graft.HilbertKey]]) rather than a flat
    * bit-interleave.
    */
  def hilbertKey(x: Column, y: Column, bitsPerDim: Int = 16): Column =
    org.apache.spark.sql.graft.HilbertKey.column(x.cast("long"), y.cast("long"), bitsPerDim)

  /** o02 — Hilbert layout keys for the events table over (user_id, hour): the
    * [[zorderKeys]] query with the Hilbert index in place of the Morton interleave
    * (16 bits/dim ⇒ 32-bit keys; bucket = high bits = target file id). Same
    * shuffle-free single-projection plan.
    */
  def hilbertKeys(events: DataFrame, bitsPerDim: Int = 16, bucketShift: Int = 26): DataFrame =
    events
      .select(col("event_id"), col("user_id"), graft.EventTime.micros(events).as("tsu"))
      .select(
        col("event_id"),
        hilbertKey(col("user_id"), expr("tsu DIV 3600000000"), bitsPerDim).as("hkey"))
      .withColumn("bucket", shiftright(col("hkey"), bucketShift))

  /** The write-path use: range-partition by the Z-order key so each output file
    * covers one tile of the key space (not oracle-checkable — partitioning is not
    * visible in row values — but this is the operator [[zorderKeys]] exists for).
    */
  def clusterByZ(df: DataFrame, keyed: DataFrame, nFiles: Int): DataFrame =
    df.join(keyed, "event_id").repartitionByRange(nFiles, col("zkey"))

  /** o03 — compaction plan over the Z-order bucket stats: pack CONSECUTIVE key-order
    * buckets into output groups of ≈`targetRows` rows. This is the small-file
    * compaction planner of a 100 TB table maintenance pass (Delta/Iceberg `OPTIMIZE`
    * bin-packing): o01 decides WHERE a row belongs on the curve; this decides which
    * adjacent tiles merge into one file so output sizes stay near the target without
    * breaking curve locality (groups are contiguous key ranges, so per-file min/max
    * stays prunable on both dimensions).
    *
    * Packing rule (deterministic, oracle-mirrorable): group id = exclusive running
    * row count DIV `targetRows` — the classic cumulative-sum bin assignment. A
    * bucket larger than the target gets its own group (it can only be split by
    * deepening the curve, not by the packer). Group sizes can overshoot by at most
    * one bucket — the accepted OPTIMIZE trade (splitting a bucket would break the
    * contiguous-range invariant that makes pruning work).
    *
    * Scale shape: per-bucket stats are one map-side-combinable hash-agg over the
    * keyed rows; the plan itself is a window over the |buckets|-sized stats relation
    * — bounded by key-space tiling (2^(2·bits − shift)), NOT by row count, so the
    * single-partition cumulative window is planner-sized work (the same bound that
    * makes t17's cumulated histogram safe).
    */
  def compactionPlan(
      events: DataFrame,
      targetRows: Long = 4096L,
      bitsPerDim: Int = 20,
      bucketShift: Int = 26
  ): DataFrame =
    compactionPlanFromKeys(zorderKeys(events, bitsPerDim, bucketShift), targetRows)

  /** The packing rule over a precomputed key relation — split out so
    * [[writeCompacted]] can feed its ONE checkpointed key projection to both the
    * plan and the write (reviewed r10: the fused form computed the zkeys twice).
    */
  private[pipeline] def compactionPlanFromKeys(
      keyed: DataFrame,
      targetRows: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = keyed
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stats
      .withColumn("cum_before", sum(col("n_rows")).over(w) - col("n_rows"))
      .select(
        col("bucket"),
        col("n_rows"),
        // exact integer floor-division (non-negative, so Spark DIV ≡ DuckDB //) —
        // a double `/` + cast would be ulp-fragile at large cumulative counts
        expr(s"cum_before DIV $targetRows").as("group_id"))
  }

  /** o04 — the PAYOFF measurement for the layout family: replay min/max file
    * skipping against the [[compactionPlan]]'s output groups for a pinned predicate
    * (`user_id BETWEEN lo AND hi`) and report, in one row, what a lakehouse reader
    * would actually do — how many planned files its stats pruning skips
    * (`prune_rate`), and how many rows it still scans per matching row
    * (`read_amp`). This is the metric that justifies (or indicts) o01–o03: a layout
    * whose prune rate is near zero wasted its write amplification.
    *
    * Scale shape: the group manifest (one row per planned file) is tile-bounded, so
    * it BROADCASTS onto the event stream for group assignment; per-group min/max +
    * match counts are one map-side-combinable hash agg; the final rollup sees only
    * the manifest-sized relation. All counts exact integers; rates micro-quantized.
    */
  def pruneStats(
      events: DataFrame,
      targetRows: Long = 4096L,
      bucketShift: Int = 26,
      userLo: Long = 4L,
      userHi: Long = 9L
  ): DataFrame = {
    val rows = events
      .select(col("event_id"), col("user_id"), graft.EventTime.micros(events).as("tsu"))
      .select(
        col("user_id"),
        mortonKey(col("user_id"), expr("tsu DIV 3600000000"), 20).as("zkey"))
      .withColumn("bucket", shiftright(col("zkey"), bucketShift))
    val groups = compactionPlan(events, targetRows, 20, bucketShift)
      .select(col("bucket"), col("group_id"))
    val perGroup = rows
      .join(broadcast(groups), "bucket")
      .groupBy(col("group_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("user_id")).as("min_u"),
        max(col("user_id")).as("max_u"),
        sum(when(col("user_id").between(userLo, userHi), 1L).otherwise(0L)).as("n_match"))
    val candidate = col("max_u") >= lit(userLo) && col("min_u") <= lit(userHi)
    perGroup.agg(
      count(lit(1)).as("n_groups"),
      sum(when(candidate, 0L).otherwise(1L)).as("n_pruned"),
      sum(col("n_rows")).as("rows_total"),
      sum(when(candidate, col("n_rows")).otherwise(0L)).as("rows_scanned"),
      sum(col("n_match")).as("rows_matching"))
      .select(
        col("n_groups"), col("n_pruned"), col("rows_total"), col("rows_scanned"),
        col("rows_matching"),
        floor(lit(1000000.0) * col("n_pruned").cast("double") /
          col("n_groups").cast("double") + lit(0.5)).cast("long").as("prune_rate_micro"),
        // rows read per matching row; 0 when the predicate matches nothing
        when(col("rows_matching") === 0L, lit(0L))
          .otherwise(floor(lit(1000000.0) * col("rows_scanned").cast("double") /
            col("rows_matching").cast("double") + lit(0.5)).cast("long"))
          .as("read_amp_micro"))
  }

  /** Materialize the [[compactionPlan]] — the write half o04 only simulates: rewrite
    * `events` as ONE parquet file per planned group (`group_id=N/` directory), rows
    * curve-sorted within the file. Each group hashes to exactly one task
    * (`repartition(group_id)`), so dynamic partitioning emits exactly one file per
    * group and the file's parquet footer min/max on every constituent dimension is
    * the tile bound the plan promised — a stats-pruning reader (Spark's own
    * row-group filter, or any lakehouse scan) now gets o04's predicted skipping on
    * REAL files (LayoutFilesSpec measures both and asserts they agree).
    *
    * Scale shape: one zkey projection (codegen'd), the tile-bounded group manifest
    * broadcast onto the stream, one shuffle on group_id (the write parallelism),
    * in-task sort. The group count is the file count — at 100 TB pick targetRows so
    * files land at 128–512 MB, exactly the [[compactionPlan]] contract.
    */
  def writeCompacted(
      events: DataFrame,
      path: String,
      targetRows: Long = 4096L,
      bitsPerDim: Int = 20,
      bucketShift: Int = 26
  ): Unit = {
    // one key projection, checkpointed, feeding BOTH the plan's bucket census and
    // the write-side join — the "one zkey projection" the docstring claims
    val keyed = zorderKeys(events, bitsPerDim, bucketShift).localCheckpoint(true)
    val groups = compactionPlanFromKeys(keyed, targetRows)
      .select(col("bucket"), col("group_id"))
    events
      .join(keyed.select(col("event_id"), col("zkey"), col("bucket")), "event_id")
      .join(broadcast(groups), "bucket")
      .repartition(col("group_id"))
      .sortWithinPartitions(col("group_id"), col("zkey"))
      .drop("zkey", "bucket")
      .write.mode(SaveMode.Overwrite).partitionBy("group_id").parquet(path)
  }

  /** Footer-stats audit: per (file, row group) min/max/rows of `column` straight
    * from the parquet metadata — what a stats-pruning reader actually consults.
    * Driver-side by design: the footer list is manifest-scale (one entry per row
    * group — planner work, like o03's window), never row-scale. Used by
    * LayoutFilesSpec to prove [[writeCompacted]]'s files and
    * [[graft.store.EdgeStorage.save]]'s in-file `(source_id, state, position)` sort
    * deliver the pruning their docstrings claim, and to cross-check o04's simulated
    * prune rate against the real file boundaries.
    */
  def parquetColumnStats(
      spark: SparkSession,
      path: String,
      column: String
  ): Seq[(String, Int, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) files += f.getPath
    }
    files.sortBy(_.toString).toSeq.flatMap { p =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        rd.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map { case (b, i) =>
          val c = b.getColumns.asScala.find(_.getPath.toDotString == column)
            .getOrElse(sys.error(s"column $column not found in $p"))
          val st = c.getStatistics
          (p.toString, i,
            st.genericGetMin.asInstanceOf[Number].longValue,
            st.genericGetMax.asInstanceOf[Number].longValue,
            b.getRowCount)
        }
      } finally rd.close()
    }
  }
}
