package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}

/** multimodal asset operators (m*): this family's slice of [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] — the driver contract is unchanged, SparkEntry
  * concatenates the families. Shared pinned parameters and SQL fragments come
  * from [[OracleFragments]].
  */
private[graft] object MultimodalOracles extends OracleFragments {

  val queries: Map[String, Q] = Map[String, Q](
    // --- multimodal: binary media column -> features (stubbed codec, real plumbing) ---
    "m01_media_features" -> ((s: SparkSession, dir: String) =>
      Multimodal.featurizeDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media")),
    "m02_media_resize" -> ((s: SparkSession, dir: String) =>
      Multimodal.resizeDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media", targetW = 641, targetH = 480)
        .select(col("asset_id"), col("media_type"), col("n_bytes"), md5(col("media")).as("media_md5"))),
    "m03_frame_sample" -> ((s: SparkSession, dir: String) =>
      Multimodal.frameSampleDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)
        .select(col("asset_id"), col("frame_index"), col("frame_offset"), md5(col("frame")).as("frame_md5"))),
    "m04_frame_dedup" -> ((s: SparkSession, dir: String) =>
      Multimodal.frameDedupDF(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)),
    "m06_clip_near_dup" -> ((s: SparkSession, dir: String) =>
      Multimodal.clipNearDup(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)),
    // LAION/DataComp-style size + aspect + brightness battery over the stub
    // decode's features: the rule arithmetic is real, the codec stays stubbed
    "m08_media_gate" -> ((s: SparkSession, dir: String) =>
      Multimodal.mediaQualityGate(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media")),
    // incremental media dedup: post-cut arrivals probe the archive's frame index
    "m07_frame_probe" -> ((s: SparkSession, dir: String) => {
      val assets = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      val index = Multimodal.frameIndex(
        assets.filter(col("doc_id") < SourceDriftCut), "doc_id", "media",
        frameBytes = 64, stride = 2)
      Multimodal.probeFrameIndex(
        assets.filter(col("doc_id") >= SourceDriftCut), "doc_id", "media", index,
        frameBytes = 64, stride = 2)
    }),
    "m05_media_text_align" -> ((s: SparkSession, dir: String) =>
      Multimodal.mediaTextAlignment(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "source", "media",
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        dims = AlignDims, thresholdMicro = AlignThresholdMicro)
        .withColumnRenamed("asset_id", "doc_id")),
    // perceptual-hash near-dup: the asset table plus a planted re-stamp wave
    // (the d37 convention — copies under fresh ids are what an image-dedup pass
    // actually catches); the stub hash is md5-derived (no locality), so the
    // oracle-checked pairs are the exact copies; the band/hamming kernel is
    // pinned on controlled hashes in RoundFifteenOpsSpec
    // scene segmentation over m03's frame grid: per-asset lag window on frame
    // phashes, cut on hamming ≥ 8, running scene ordinal (the keyframe index)
    "m10_scene_cuts" -> ((s: SparkSession, dir: String) =>
      Multimodal.sceneCuts(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
        "doc_id", "media", frameBytes = 64, stride = 2)),
    // asset-store dedup ROI over the re-stamped table (the planted copies are
    // the duplicate mass): one content-hash groupBy, per-type rollup
    "m11_media_savings" -> ((s: SparkSession, dir: String) => {
      val assets = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media"))
      Multimodal.mediaDedupSavings(
        assets.unionByName(assets
          .filter(col("doc_id") % BloomReingestMod === 0)
          .withColumn("doc_id", col("doc_id") + BloomReingestOffset)),
        "doc_id", "source", "media")
    }),
    "m09_phash_near_dup" -> ((s: SparkSession, dir: String) => {
      val assets = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media"))
      Multimodal.phashNearDup(
        assets.unionByName(assets
          .filter(col("doc_id") % BloomReingestMod === 0)
          .withColumn("doc_id", col("doc_id") + BloomReingestOffset)),
        "doc_id", "source", "media")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // 60-bit md5-prefix phash, 4×15-bit bands for candidates (pigeonhole-complete
    // for hamming ≤ 3), member-capped cells, exact bit_count verification —
    // mirror of Multimodal.phashNearDup over the re-stamped asset table
    "m09_phash_near_dup" ->
      s"""WITH a AS (SELECT doc_id AS asset_id,
         |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash FROM documents
         |  UNION ALL
         |  SELECT doc_id + $BloomReingestOffset,
         |    ('0x' || substr(md5(text), 1, 15))::BIGINT FROM documents
         |  WHERE doc_id % $BloomReingestMod = 0),
         |bk AS (SELECT asset_id, phash, band,
         |    (phash >> (band * 15)) & 32767 AS bval
         |  FROM (SELECT asset_id, phash, unnest(generate_series(0, 3)) AS band FROM a)),
         |ok AS (SELECT band, bval FROM bk GROUP BY 1, 2 HAVING count(*) <= 1000),
         |ad AS (SELECT bk.asset_id, bk.phash, bk.band, bk.bval
         |  FROM bk JOIN ok USING (band, bval))
         |SELECT DISTINCT l.asset_id AS id_a, r.asset_id AS id_b,
         |  CAST(bit_count(xor(l.phash, r.phash)) AS INTEGER) AS hamming
         |FROM ad l JOIN ad r ON l.band = r.band AND l.bval = r.bval
         |WHERE l.asset_id < r.asset_id
         |  AND bit_count(xor(l.phash, r.phash)) <= 3""".stripMargin,

    // per-asset lag window over frame phashes on the m03 grid; first frame and
    // hamming ≥ 8 jumps open scenes; running cut count is the scene ordinal —
    // mirror of Multimodal.sceneCuts(64, 2, 8)
    "m10_scene_cuts" ->
      s"""WITH f AS (SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_index,
         |    CAST(i * 64 AS BIGINT) AS frame_offset,
         |    ('0x' || substr(md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)), 1, 15))::BIGINT AS ph
         |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |        FROM documents)
         |  WHERE i % 2 = 0),
         |l AS (SELECT asset_id, frame_index, frame_offset, ph,
         |    lag(ph) OVER (PARTITION BY asset_id ORDER BY frame_index) AS pph
         |  FROM f),
         |c AS (SELECT asset_id, frame_index, frame_offset,
         |    CAST(CASE WHEN pph IS NULL THEN -1
         |         ELSE bit_count(xor(ph, pph)) END AS INTEGER) AS hamming_prev,
         |    CAST(CASE WHEN pph IS NULL OR bit_count(xor(ph, pph)) >= 8 THEN 1 ELSE 0 END
         |         AS INTEGER) AS is_cut
         |  FROM l)
         |SELECT asset_id, frame_index, frame_offset, hamming_prev, is_cut,
         |  CAST(SUM(is_cut) OVER (PARTITION BY asset_id ORDER BY frame_index
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_no
         |FROM c""".stripMargin,

    // per-type blob dedup ledger over the re-stamped asset table — mirror of
    // Multimodal.mediaDedupSavings
    "m11_media_savings" ->
      s"""WITH a AS (SELECT doc_id, source AS media_type, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $BloomReingestOffset, source, text FROM documents
         |  WHERE doc_id % $BloomReingestMod = 0),
         |pc AS (SELECT media_type, md5(text) AS content_h,
         |    CAST(count(*) AS BIGINT) AS n_copies,
         |    CAST(max(octet_length(encode(text))) AS BIGINT) AS n_bytes
         |  FROM a GROUP BY 1, 2)
         |SELECT media_type, CAST(sum(n_copies) AS BIGINT) AS n_assets,
         |  CAST(count(*) AS BIGINT) AS n_unique,
         |  CAST(sum(n_copies * n_bytes) AS BIGINT) AS bytes_raw,
         |  CAST(sum(n_bytes) AS BIGINT) AS bytes_dedup,
         |  CAST(floor(1000000.0
         |    * CAST(sum(n_copies * n_bytes) - sum(n_bytes) AS DOUBLE)
         |    / CAST(sum(n_copies * n_bytes) AS DOUBLE) + 0.5) AS BIGINT) AS savings_micro
         |FROM pc GROUP BY 1""".stripMargin,

    "m01_media_features" ->
      s"""SELECT doc_id AS asset_id, source AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST((octet_length(encode(text)) * 7) % 1920 + 1 AS INTEGER) AS width,
         |  CAST((octet_length(encode(text)) * 13) % 1080 + 1 AS INTEGER) AS height,
         |  round((octet_length(encode(text)) % 256) / 255.0, 6) AS brightness
         |FROM documents""".stripMargin,

    // size/aspect/brightness battery over the stub decode's (n*7)%1920+1 ×
    // (n*13)%1080+1 dimensions — mirror of Multimodal.mediaQualityGate defaults
    "m08_media_gate" -> {
      val m =
        """SELECT doc_id AS asset_id, source AS media_type,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  CAST((octet_length(encode(text)) * 7) % 1920 + 1 AS INTEGER) AS width,
          |  CAST((octet_length(encode(text)) * 13) % 1080 + 1 AS INTEGER) AS height,
          |  CAST(floor(1000000.0 * round((octet_length(encode(text)) % 256) / 255.0, 6)
          |       + 0.5) AS BIGINT) AS bright_micro
          |FROM documents""".stripMargin
      val reasons =
        """CASE WHEN n_bytes < 64 THEN 1 ELSE 0 END
          | + CASE WHEN width < 128 OR height < 128 THEN 2 ELSE 0 END
          | + CASE WHEN greatest(width, height) * 10 > least(width, height) * 30
          |        THEN 4 ELSE 0 END
          | + CASE WHEN bright_micro < 100000 OR bright_micro > 900000 THEN 8 ELSE 0 END"""
          .stripMargin
      s"""SELECT asset_id, media_type, n_bytes, width, height, bright_micro,
         |  CAST($reasons AS BIGINT) AS reasons,
         |  CAST(CASE WHEN ($reasons) = 0 THEN 1 ELSE 0 END AS INTEGER) AS kept
         |FROM ($m)""".stripMargin
    },

    // stub resize truncates to (641*480) % 4096 = 480 bytes (ASCII text: byte truncation
    // == substr); md5 compared instead of raw binary so the diff stays engine-neutral
    "m02_media_resize" ->
      s"""SELECT doc_id AS asset_id, source AS media_type,
         |  CAST(LEAST(length(text), 480) AS BIGINT) AS n_bytes,
         |  md5(substr(text, 1, 480)) AS media_md5
         |FROM documents""".stripMargin,

    // every 2nd 64-byte window of the byte stream is a "frame" (stub framing)
    "m03_frame_sample" ->
      s"""SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_index,
         |  CAST(i * 64 AS BIGINT) AS frame_offset,
         |  md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
         |FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |      FROM documents)
         |WHERE i % 2 = 0""".stripMargin,

    // clip-level near-dup: frame-set Jaccard over m03's sampled-frame hashes with
    // the doc-freq cap on hot frames — mirror of Multimodal.clipNearDup(64, 2)
    "m06_clip_near_dup" ->
      s"""WITH f AS (
         |  SELECT doc_id AS asset_id,
         |         md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS h
         |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |        FROM documents)
         |  WHERE i % 2 = 0),
         |fh AS (SELECT DISTINCT asset_id, h FROM f),
         |rare AS (SELECT h FROM fh GROUP BY h HAVING COUNT(*) <= 1000),
         |adm AS (SELECT asset_id, h FROM fh JOIN rare USING (h)),
         |sizes AS (SELECT asset_id, COUNT(*) AS n FROM adm GROUP BY 1),
         |pairs AS (SELECT a.asset_id AS id_a, b.asset_id AS id_b, COUNT(*) AS n_shared
         |          FROM adm a JOIN adm b ON a.h = b.h AND a.asset_id < b.asset_id
         |          GROUP BY 1, 2),
         |scored AS (SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
         |    CAST(floor(1000000.0 * n_shared::DOUBLE
         |      / (sa.n + sb.n - n_shared)::DOUBLE + 0.5) AS BIGINT) AS jaccard_micro
         |  FROM pairs
         |  JOIN sizes sa ON sa.asset_id = id_a
         |  JOIN sizes sb ON sb.asset_id = id_b)
         |SELECT id_a, id_b, n_shared, jaccard_micro
         |FROM scored WHERE jaccard_micro >= 300000""".stripMargin,

    // post-cut arrivals' sampled frames probed against the pre-cut archive's frame
    // index (occurrence-level hits, micro shared fraction, min colliding archive
    // asset) — mirror of Multimodal.probeFrameIndex(64, 2)
    "m07_frame_probe" ->
      s"""WITH f AS (
         |  SELECT doc_id AS asset_id,
         |         md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
         |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |        FROM documents)
         |  WHERE i % 2 = 0),
         |idx AS (SELECT frame_md5, MIN(asset_id) AS archive_asset
         |        FROM f WHERE asset_id < $SourceDriftCut GROUP BY 1),
         |arr AS (SELECT asset_id, frame_md5 FROM f WHERE asset_id >= $SourceDriftCut),
         |per AS (SELECT asset_id, COUNT(*) AS n_frames FROM arr GROUP BY 1),
         |hits AS (SELECT asset_id, COUNT(*) AS n_shared, MIN(archive_asset) AS dup_of
         |         FROM arr JOIN idx USING (frame_md5) GROUP BY 1)
         |SELECT asset_id, n_frames, n_shared,
         |  CAST(floor(1000000.0 * n_shared::DOUBLE / n_frames::DOUBLE + 0.5) AS BIGINT)
         |    AS shared_frac_micro,
         |  dup_of
         |FROM hits JOIN per USING (asset_id)""".stripMargin,

    // frames shared across >1 asset — mirror of Multimodal.frameDedupDF(64, 2);
    // keeper = lexicographic min (asset, frame index), via struct-min in both engines
    "m04_frame_dedup" ->
      s"""WITH f AS (
         |  SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_index,
         |         md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
         |  FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 64 - 1)) AS i
         |        FROM documents)
         |  WHERE i % 2 = 0)
         |SELECT frame_md5, CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets,
         |       COUNT(*) AS n_frames,
         |       (MIN({'a': asset_id, 'f': frame_index})).a AS keep_asset,
         |       (MIN({'a': asset_id, 'f': frame_index})).f AS keep_frame
         |FROM f GROUP BY frame_md5
         |HAVING COUNT(DISTINCT asset_id) > 1""".stripMargin,

    // media–text alignment screen: the stub media embedding is 8 dims of the payload
    // md5 (4 hex chars each, % 1000 / 1000), the text side is the document embedding's
    // leading 8 dims, alignment = rounded cosine, keep = threshold on the ROUNDED
    // value — mirror of Multimodal.mediaTextAlignment (media bytes = UTF-8 text, so
    // md5(media) = md5(text), the m02 equivalence)
    "m05_media_text_align" -> {
      val thr = AlignThresholdMicro.toDouble / 1000000.0
      s"""WITH med AS (SELECT doc_id, md5(text) AS h FROM documents),
         |me AS (SELECT doc_id, i,
         |         (('0x' || substr(h, (i - 1) * 4 + 1, 4))::BIGINT % 1000) / 1000.0 AS m
         |       FROM (SELECT doc_id, h, unnest(generate_series(1, $AlignDims)) AS i FROM med)),
         |mv AS (SELECT doc_id, list(m ORDER BY i) AS mv FROM me GROUP BY 1),
         |tv AS (SELECT vec_id AS doc_id, (embedding::DOUBLE[])[1:$AlignDims] AS tv FROM embeddings)
         |SELECT mv.doc_id, ${cosSql("mv", "tv")} AS align_cos,
         |  CASE WHEN ${cosSql("mv", "tv")} >= $thr THEN 1 ELSE 0 END AS aligned
         |FROM mv JOIN tv ON mv.doc_id = tv.doc_id""".stripMargin
    }
  )
}
