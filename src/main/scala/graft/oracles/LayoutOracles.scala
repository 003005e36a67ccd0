package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}

/** layout / file-skipping operators (o*): this family's slice of [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] — the driver contract is unchanged, SparkEntry
  * concatenates the families. Shared pinned parameters and SQL fragments come
  * from [[OracleFragments]].
  */
private[graft] object LayoutOracles extends OracleFragments {

  val queries: Map[String, Q] = Map[String, Q](
    "o01_zorder" -> ((s: SparkSession, dir: String) =>
      Layout.zorderKeys(s.read.parquet(s"$dir/events.parquet"))),
    "o02_hilbert" -> ((s: SparkSession, dir: String) =>
      Layout.hilbertKeys(s.read.parquet(s"$dir/events.parquet"))),
    "o03_compaction_plan" -> ((s: SparkSession, dir: String) =>
      Layout.compactionPlan(s.read.parquet(s"$dir/events.parquet"),
        targetRows = CompactionTargetRows, bucketShift = CompactionTileShift)),
    "o04_prune_stats" -> ((s: SparkSession, dir: String) =>
      Layout.pruneStats(s.read.parquet(s"$dir/events.parquet"),
        targetRows = PruneTargetRows, bucketShift = CompactionTileShift,
        userLo = PruneUserLo, userHi = PruneUserHi)),
  )

  val oracleSql: Map[String, String] = Map(

    // Z-order (Morton) layout keys over (user_id, hour): 20-bit interleave, bucket =
    // high bits of the key — mirror of Layout.zorderKeys
    "o01_zorder" -> {
      val terms = (0 until 20)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH xy AS (SELECT event_id, user_id & 1048575 AS x,
         |                   (epoch_us(ts) // 3600000000) & 1048575 AS y FROM events),
         |z AS (SELECT event_id, CAST($terms AS BIGINT) AS zkey FROM xy)
         |SELECT event_id, zkey, zkey >> 26 AS bucket FROM z""".stripMargin
    },

    // compaction plan: o01's per-bucket counts packed into ≈target-row groups by the
    // exclusive-cumulative-sum floor division — mirror of Layout.compactionPlan
    "o03_compaction_plan" -> {
      val terms = (0 until 20)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH xy AS (SELECT event_id, user_id & 1048575 AS x,
         |                   (epoch_us(ts) // 3600000000) & 1048575 AS y FROM events),
         |z AS (SELECT event_id, CAST($terms AS BIGINT) >> $CompactionTileShift AS bucket FROM xy),
         |st AS (SELECT bucket, COUNT(*) AS n_rows FROM z GROUP BY 1),
         |cum AS (SELECT bucket, n_rows,
         |          CAST(COALESCE(SUM(n_rows) OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |            AS cum_before
         |        FROM st)
         |SELECT bucket, n_rows, cum_before // $CompactionTargetRows AS group_id
         |FROM cum""".stripMargin
    },

    // min/max file-skipping replay over the o03 plan's groups for the pinned
    // user-band predicate: prune rate + read amplification — mirror of
    // Layout.pruneStats (same Morton-term builder as o03)
    "o04_prune_stats" -> {
      val terms = (0 until 20)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      val (lo, hi) = (PruneUserLo, PruneUserHi)
      s"""WITH xy AS (SELECT event_id, user_id, user_id & 1048575 AS x,
         |                   (epoch_us(ts) // 3600000000) & 1048575 AS y FROM events),
         |z AS (SELECT event_id, user_id,
         |        CAST($terms AS BIGINT) >> $CompactionTileShift AS bucket FROM xy),
         |st AS (SELECT bucket, COUNT(*) AS n_rows FROM z GROUP BY 1),
         |cum AS (SELECT bucket,
         |          CAST(COALESCE(SUM(n_rows) OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |            AS cum_before
         |        FROM st),
         |pl AS (SELECT bucket, cum_before // $PruneTargetRows AS group_id FROM cum),
         |pg AS (SELECT group_id, COUNT(*) AS n_rows, MIN(user_id) AS min_u,
         |         MAX(user_id) AS max_u,
         |         CAST(SUM(CASE WHEN user_id BETWEEN $lo AND $hi THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_match
         |       FROM z JOIN pl USING (bucket) GROUP BY 1),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         |          CAST(SUM(CASE WHEN max_u >= $lo AND min_u <= $hi THEN 0 ELSE 1 END)
         |            AS BIGINT) AS n_pruned,
         |          CAST(SUM(n_rows) AS BIGINT) AS rows_total,
         |          CAST(SUM(CASE WHEN max_u >= $lo AND min_u <= $hi THEN n_rows ELSE 0 END)
         |            AS BIGINT) AS rows_scanned,
         |          CAST(SUM(n_match) AS BIGINT) AS rows_matching
         |        FROM pg)
         |SELECT n_groups, n_pruned, rows_total, rows_scanned, rows_matching,
         |  CAST(floor(1000000.0 * n_pruned::DOUBLE / n_groups::DOUBLE + 0.5) AS BIGINT)
         |    AS prune_rate_micro,
         |  CASE WHEN rows_matching = 0 THEN CAST(0 AS BIGINT) ELSE
         |    CAST(floor(1000000.0 * rows_scanned::DOUBLE / rows_matching::DOUBLE + 0.5)
         |      AS BIGINT) END AS read_amp_micro
         |FROM agg""".stripMargin
    },

    // Hilbert index over (user_id & 0xFFFF, hour & 0xFFFF): one CTE per level of the
    // top-down quadrant walk (quadrant digit = (3*rx)^ry weighted s^2, then the
    // frame rotates/reflects for the next level) — mirror of Layout.hilbertKeys /
    // the graft_hilbert expression's loop, unrolled level-by-level
    "o02_hilbert" -> {
      val bits = 16
      def src(i: Int): String = if (i == bits - 1) "xy" else s"h${i + 1}"
      val chain = ((bits - 1) to 0 by -1).map { i =>
        val s = 1L << i
        s"h$i AS (SELECT event_id, " +
          s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END AS x, " +
          s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END AS y, " +
          s"d + ${s * s} * (CASE WHEN rx = 1 AND ry = 1 THEN 2 WHEN rx = 1 THEN 3 " +
          s"WHEN ry = 1 THEN 1 ELSE 0 END) AS d " +
          s"FROM (SELECT event_id, x, y, d, " +
          s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx, " +
          s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry FROM ${src(i)}))"
      }.mkString(",\n")
      "WITH xy AS (SELECT event_id, user_id & 65535 AS x, " +
        "(epoch_us(ts) // 3600000000) & 65535 AS y, CAST(0 AS BIGINT) AS d FROM events),\n" +
        chain + "\n" +
        "SELECT event_id, d AS hkey, d >> 26 AS bucket FROM h0"
    },
  )
}
