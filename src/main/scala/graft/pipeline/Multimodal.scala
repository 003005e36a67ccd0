package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video travel as opaque `binary` columns with typed
  * metadata. The Spark-side plumbing (schema, partition-parallel batch decode via
  * `mapPartitions`, feature schema) is real; the codec itself is a STUB — this container
  * has no image/audio libraries, so `decodeStub` derives deterministic pseudo-features
  * from the byte content. A real deployment swaps [[MediaDecoder.decode]] for libjpeg /
  * ffmpeg / etc. without touching the Spark plumbing.
  */
object Multimodal {

  case class MediaAsset(asset_id: Long, media_type: String, media: Array[Byte])

  case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      brightness: Double
  )

  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Double)
  }

  /** STUB — deterministic fake decode (`???`-equivalent, see module doc): pseudo
    * dimensions/brightness from byte length and content. Replace with a real codec.
    */
  object DecodeStub extends MediaDecoder {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Double) = {
      val n = bytes.length.toLong
      val width = ((n * 7) % 1920 + 1).toInt
      val height = ((n * 13) % 1080 + 1).toInt
      val brightness = math.round((n % 256) / 255.0 * 1e6) / 1e6
      (width, height, brightness)
    }
  }

  /** Batch feature extraction: one decoder instance per partition (the expensive codec
    * init is amortized across the partition's rows — the same shape a Pandas-UDF batch
    * decode has in PySpark). Binary payloads never hit the driver.
    */
  def featurize(assets: Dataset[MediaAsset], decoder: MediaDecoder = DecodeStub): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (w, h, b) = decoder.decode(a.media_type, a.media)
        MediaFeatures(a.asset_id, a.media_type, a.media.length.toLong, w, h, b)
      }
    }
  }

  /** Column-level wrapper: DataFrame with (idCol, typeCol, binCol) → features DataFrame. */
  def featurizeDF(df: DataFrame, idCol: String, typeCol: String, binCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df
      .select(col(idCol).as("asset_id"), col(typeCol).as("media_type"), col(binCol).as("media"))
      .as[MediaAsset]
    featurize(ds).toDF()
  }

  /** m08 — MEDIA QUALITY GATE: the size/aspect/brightness battery every
    * published image-corpus curation runs before anything expensive (LAION's
    * minimum-size and aspect-ratio cuts, DataComp's small-image filter; tiny
    * payloads are tracking pixels and icons, extreme aspect ratios are banners,
    * near-black/near-white frames are dead footage). Rules over the decoded
    * features ([[featurizeDF]] — the decode itself stays the documented STUB,
    * the rule arithmetic and plumbing are real):
    *
    *   - bit 0 — payload under `minBytes`
    *   - bit 1 — width or height under `minDim`
    *   - bit 2 — aspect ratio over `arMax10`/10 (max(w,h)·10 > min(w,h)·arMax10,
    *     division-free)
    *   - bit 3 — brightness outside [`brightLoMicro`, `brightHiMicro`]
    *     (micro-quantized from the decoder's rounded double)
    *
    * `kept` ⇔ all pass (the t05/t46 bitmask idiom). Scale shape: one decode
    * pass (per-partition codec amortization, binaries never leave executors) +
    * a map-side rule projection — no shuffle at all.
    */
  def mediaQualityGate(
      df: DataFrame,
      idCol: String,
      typeCol: String,
      binCol: String,
      minBytes: Long = 64L,
      minDim: Int = 128,
      arMax10: Long = 30L,
      brightLoMicro: Long = 100000L,
      brightHiMicro: Long = 900000L
  ): DataFrame = {
    val f = featurizeDF(df, idCol, typeCol, binCol)
      .select(col("asset_id"), col("media_type"), col("n_bytes"),
        col("width"), col("height"),
        floor(col("brightness") * 1000000.0 + lit(0.5)).cast("long").as("bright_micro"))
    val reasons =
      when(col("n_bytes") < minBytes, 1L).otherwise(0L) +
        when(col("width") < minDim || col("height") < minDim, 2L).otherwise(0L) +
        when(greatest(col("width"), col("height")).cast("long") * 10L >
          least(col("width"), col("height")).cast("long") * arMax10, 4L).otherwise(0L) +
        when(col("bright_micro") < brightLoMicro || col("bright_micro") > brightHiMicro,
          8L).otherwise(0L)
    f.withColumn("reasons", reasons)
      .withColumn("kept", (col("reasons") === 0L).cast("int"))
  }

  case class ResizedAsset(asset_id: Long, media_type: String, media: Array[Byte], n_bytes: Long)

  trait MediaResizer extends Serializable {
    def resize(mediaType: String, bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
  }

  /** STUB resize — a real deployment re-encodes through a codec; here the payload is
    * deterministically truncated/cycled to a size proportional to the target area so
    * the Spark plumbing (binary in → binary out, per-partition batches) is exercised
    * end-to-end and oracle-reproducible.
    */
  object ResizeStub extends MediaResizer {
    def resize(mediaType: String, bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val target = math.max(1, math.min(bytes.length, (targetW.toLong * targetH % 4096).toInt))
      java.util.Arrays.copyOf(bytes, target)
    }
  }

  /** Batch resize: binary → binary, one resizer per partition, payloads stay on the
    * executors (the distributed shape of an image-preprocessing stage).
    */
  def resizeDF(
      df: DataFrame, idCol: String, typeCol: String, binCol: String,
      targetW: Int, targetH: Int, resizer: MediaResizer = ResizeStub
  ): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("asset_id"), col(typeCol).as("media_type"), col(binCol).as("media"))
      .as[MediaAsset]
      .mapPartitions { it =>
        it.map { a =>
          val out = resizer.resize(a.media_type, a.media, targetW, targetH)
          ResizedAsset(a.asset_id, a.media_type, out, out.length.toLong)
        }
      }
      .toDF()
  }

  case class FrameSample(asset_id: Long, frame_index: Int, frame_offset: Long, frame: Array[Byte])

  /** Frame sampling for video-like payloads: every `stride`-th fixed-size window of the
    * byte stream becomes a "frame" (stub framing — a real deployment demuxes containers;
    * the fan-out shape, one row in → many frame rows out, is the real plumbing).
    */
  def frameSampleDF(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int
  ): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    import df.sparkSession.implicits._
    df.select(col(idCol).as("asset_id"), lit("video").as("media_type"), col(binCol).as("media"))
      .as[MediaAsset]
      .flatMap { a =>
        val nFrames = a.media.length / frameBytes
        (0 until nFrames by stride).map { i =>
          val off = i.toLong * frameBytes
          FrameSample(a.asset_id, i, off,
            java.util.Arrays.copyOfRange(a.media, off.toInt, off.toInt + frameBytes))
        }
      }
      .toDF()
  }

  /** m10 — SCENE CUTS / keyframe index: consecutive sampled frames are compared by
    * perceptual-hash hamming distance; a jump ≥ `cutHamming` opens a new scene (the
    * keyframe-selection step every video curation pipeline runs before the
    * expensive per-frame models — only scene-opening frames go to captioning/
    * embedding). Every frame is labeled with its scene ordinal, so downstream can
    * take `is_cut = 1` rows as the keyframe index or group by (asset, scene) for
    * per-scene budgets. With the md5 stub hash ANY content change clears the
    * threshold (no locality), so stub scenes = runs of byte-identical frames; a
    * real pHash ([[MediaHasher]]) makes the same plan detect gradual-vs-jump
    * transitions — the plumbing, windows, and arithmetic don't change.
    *
    * Scale shape: the only windows are per-asset ordered by frame index (lag +
    * running cut count) — state bounded by one asset's sampled frames, never
    * corpus-sized; frames never leave their asset's partition.
    */
  def sceneCuts(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int,
      cutHamming: Int = 8
  ): DataFrame =
    sceneCutsOf(
      frameSampleDF(df, idCol, binCol, frameBytes, stride)
        .select(col("asset_id"), col("frame_index"), col("frame_offset"),
          conv(substring(md5(col("frame")), 1, 15), 16, 10).cast("long").as("phash")),
      cutHamming)

  /** The windowed half of [[sceneCuts]] over an already-hashed (asset_id,
    * frame_index, frame_offset, phash) relation — separated so the unit suite
    * pins cut/scene semantics on controlled hashes.
    */
  private[graft] def sceneCutsOf(frames: DataFrame, cutHamming: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFrame = Window.partitionBy(col("asset_id")).orderBy(col("frame_index").asc)
    frames
      .withColumn("prev_ph", lag(col("phash"), 1).over(byFrame))
      .select(
        col("asset_id"), col("frame_index"), col("frame_offset"),
        when(col("prev_ph").isNull, lit(-1))
          .otherwise(expr("CAST(bit_count(phash ^ prev_ph) AS INT)")).as("hamming_prev"),
        when(col("prev_ph").isNull ||
          expr("bit_count(phash ^ prev_ph)") >= cutHamming, lit(1))
          .otherwise(lit(0)).as("is_cut"))
      .withColumn("scene_no",
        sum(col("is_cut")).over(byFrame.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
  }

  /** m11 — MEDIA DEDUP SAVINGS: the d29 ROI convention for the asset store.
    * Assets group by content hash (byte-identical payloads — the blob-store
    * dedup every object store runs); per media type: asset and unique counts,
    * raw byte mass, the deduplicated mass (each distinct payload stored once),
    * and the savings share in micro. One hash-groupBy over the binary column —
    * no pairs, no windows; the per-type rollup is catalog-sized.
    */
  def mediaDedupSavings(
      df: DataFrame, idCol: String, typeCol: String, binCol: String
  ): DataFrame = {
    val perContent = df
      .select(col(typeCol).as("media_type"),
        md5(col(binCol)).as("content_h"),
        length(col(binCol)).cast("long").as("n_bytes"))
      .groupBy(col("media_type"), col("content_h"))
      .agg(count(lit(1)).as("n_copies"), max(col("n_bytes")).as("n_bytes"))
    perContent
      .groupBy(col("media_type"))
      .agg(
        sum(col("n_copies")).as("n_assets"),
        count(lit(1)).as("n_unique"),
        sum(col("n_copies") * col("n_bytes")).as("bytes_raw"),
        sum(col("n_bytes")).as("bytes_dedup"))
      .select(
        col("media_type"), col("n_assets"), col("n_unique"),
        col("bytes_raw"), col("bytes_dedup"),
        floor(lit(1000000.0)
          * (col("bytes_raw") - col("bytes_dedup")).cast("double")
          / col("bytes_raw").cast("double") + lit(0.5)).cast("long")
          .as("savings_micro"))
  }

  /** Cross-asset frame dedup — the video-dedup primitive: sample frames from every
    * asset ([[frameSampleDF]]), hash the frame payloads, and report each frame content
    * seen in more than one asset (keeper = smallest (asset, index)). At corpus scale
    * this is how near-identical clips (re-uploads, watermarked copies sharing most
    * frames) are surfaced: a hash-groupBy over the frame stream, no pairwise compare.
    */
  def frameDedupDF(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int
  ): DataFrame = {
    frameSampleDF(df, idCol, binCol, frameBytes, stride)
      .select(col("asset_id"), col("frame_index"), md5(col("frame")).as("frame_md5"))
      .groupBy(col("frame_md5"))
      .agg(
        countDistinct(col("asset_id")).as("n_assets"),
        count(lit(1)).as("n_frames"),
        min(struct(col("asset_id"), col("frame_index"))).as("keep"))
      .filter(col("n_assets") > 1)
      .select(
        col("frame_md5"), col("n_assets"), col("n_frames"),
        col("keep.asset_id").as("keep_asset"),
        col("keep.frame_index").as("keep_frame"))
  }

  /** Build the persistable frame-hash index of an asset archive — (frame_md5,
    * archive_asset) with the minimum holding asset per distinct frame content (the
    * audit pointer). The d17/d19 build-once discipline applied to video frames:
    * the archive is hashed once, every ingest batch probes the artifact.
    */
  def frameIndex(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int
  ): DataFrame =
    frameSampleDF(df, idCol, binCol, frameBytes, stride)
      .select(md5(col("frame")).as("frame_md5"), col("asset_id"))
      .groupBy(col("frame_md5")).agg(min(col("asset_id")).as("archive_asset"))

  /** m07 — the probe half: arriving assets' sampled frames against the archive's
    * frame index. One row per FLAGGED arrival: its sampled-frame count, how many
    * of those frames exist anywhere in the archive (occurrence-level — a clip
    * looping an archived frame counts each occurrence), the shared fraction
    * (micro-quantized, m06's threshold discipline) and the smallest colliding
    * archive asset. The incremental form of m04: the archive is never re-paired
    * with itself, the probe cost is ingest-sized.
    *
    * Scale shape: the index is corpus-frame-sized — the probe is a plain hash
    * equi-join on frame_md5 (NOT a broadcast; AQE picks the build side), with the
    * arrivals' frame relation materialized once for its two consumers.
    */
  def probeFrameIndex(
      arrivals: DataFrame, idCol: String, binCol: String, index: DataFrame,
      frameBytes: Int, stride: Int
  ): DataFrame = {
    val frames = frameSampleDF(arrivals, idCol, binCol, frameBytes, stride)
      .select(col("asset_id"), md5(col("frame")).as("frame_md5"))
      .localCheckpoint(true)
    val perAsset = frames.groupBy(col("asset_id")).agg(count(lit(1)).as("n_frames"))
    val hits = frames.join(index, "frame_md5")
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_shared"), min(col("archive_asset")).as("dup_of"))
    hits.join(perAsset, "asset_id")
      .select(col("asset_id"), col("n_frames"), col("n_shared"),
        floor(lit(1000000.0) * col("n_shared").cast("double") / col("n_frames").cast("double")
          + lit(0.5)).cast("long").as("shared_frac_micro"),
        col("dup_of"))
  }

  /** Persist the frame index hash-clustered (the saveBenchIndex layout discipline)
    * and reload it for the ingest cadence.
    */
  def saveFrameIndex(index: DataFrame, path: String, files: Int = 16): Unit =
    index
      .repartitionByRange(math.max(files, 1), col("frame_md5"))
      .sortWithinPartitions(col("frame_md5"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)

  def loadFrameIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** m06 — clip-level NEAR-duplication: asset pairs whose sampled-frame hash sets
    * overlap above a Jaccard threshold — the re-upload/watermarked-copy detector
    * one level up from [[frameDedupDF]] (m04 reports shared FRAMES; this scores
    * which ASSETS are mostly the same clip). Candidates come from the shared-frame
    * equi-join, so only pairs that actually share a frame are ever scored — never
    * assets × assets.
    *
    * Skew guard (`maxAssetsPerFrame` — [[graft.pipeline.Dedup.sharedItemPairCounts]],
    * the ONE pairwise set-overlap kernel this shares with d04): a frame hash present
    * in more than the cap's assets (intros, black frames, silence) is dropped
    * before the pair join, and set SIZES are measured over the same capped relation
    * as the intersection — the internally-consistent rare-set Jaccard (reviewed
    * r10: sizes from the uncapped relation biased every hot-frame pair downward).
    * The default never binds at the bench scales, so the oracle mirror (same
    * HAVING guard, same capped sizes) stays equivalent to the uncapped form.
    *
    * Determinism: intersection/union counts are exact integers over DISTINCT
    * (asset, frame-hash) rows; the Jaccard micro-quantizes through one division
    * and the threshold compares the ROUNDED value, so a borderline pair cannot
    * flip between engines.
    */
  def clipNearDup(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameBytes: Int,
      stride: Int,
      jaccardMicroMin: Long = 300000L,
      maxAssetsPerFrame: Long = 1000L
  ): DataFrame = {
    val fh = frameSampleDF(df, idCol, binCol, frameBytes, stride)
      .select(col("asset_id"), md5(col("frame")).as("h"))
      .distinct()
    graft.pipeline.Dedup.sharedItemPairCounts(fh, "asset_id", maxAssetsPerFrame)
      .withColumn("jaccard_micro",
        floor(lit(1000000.0) * col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double") + lit(0.5)).cast("long"))
      .filter(col("jaccard_micro") >= jaccardMicroMin)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("jaccard_micro"))
  }

  case class MediaEmbedding(asset_id: Long, media_emb: Array[Double])

  trait MediaEmbedder extends Serializable {
    def embed(mediaType: String, bytes: Array[Byte]): Array[Double]
  }

  /** STUB embedder — a real deployment runs a vision/audio encoder; here each of the
    * `dims` components is a deterministic function of the payload's md5 (4 hex chars
    * per dim → [0, 1) in 1/1000ths), so the Spark plumbing (per-partition model init,
    * binary in → vector out) is exercised end-to-end and the oracle reproduces the
    * vector from the same md5 arithmetic.
    */
  class EmbedStub(dims: Int = 8) extends MediaEmbedder {
    require(dims * 4 <= 32, "md5 hex has 32 chars — at most 8 four-char dims")
    // one digest per task, reset between records — the "model handle" this stub
    // stands in for; a per-record getInstance() would pay the JCA provider lookup
    // on every row of the hot embed path
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def embed(mediaType: String, bytes: Array[Byte]): Array[Double] = {
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      Array.tabulate(dims) { d =>
        (java.lang.Long.parseLong(hex.substring(d * 4, d * 4 + 4), 16) % 1000L) / 1000.0
      }
    }
  }

  /** m05 — media–text alignment screen (the CLIP-filter shape of multimodal curation:
    * embed the media, embed the text, keep pairs whose embeddings agree). The media
    * side goes through the per-partition embedder ([[EmbedStub]] stands in for the
    * vision encoder); the text side is the document's embedding truncated to the media
    * embedding's dimensionality (the leading-prefix convention of matryoshka-style
    * embeddings). Alignment is cosine, rounded to 6; `aligned` is the keep decision.
    *
    * Scale shape: one map-side embed pass over the media partition, one equi-join on
    * the document id (both sides id-partitioned — no broadcast of the corpus), cosine
    * as the codegen'd dot kernel. No pairwise anything: alignment is per-document.
    */
  def mediaTextAlignment(
      media: DataFrame, idCol: String, typeCol: String, binCol: String,
      embeddings: DataFrame, vecIdCol: String, vecCol: String,
      dims: Int = 8, thresholdMicro: Long = 500000L,
      // None ⇒ a dims-sized stub (a same-list default could not reference `dims` and
      // a fixed-size one would silently desynchronize the two sides under dims ≠ 8)
      embedder: Option[MediaEmbedder] = None
  ): DataFrame = {
    import media.sparkSession.implicits._
    val emb = embedder.getOrElse(new EmbedStub(dims))
    val mediaEmb = media
      .select(col(idCol).as("asset_id"), col(typeCol).as("media_type"), col(binCol).as("media"))
      .as[MediaAsset]
      .mapPartitions { it => it.map(a => MediaEmbedding(a.asset_id, emb.embed(a.media_type, a.media))) }
      .toDF()
    val textEmb = embeddings.select(
      col(vecIdCol).as("asset_id"),
      slice(col(vecCol), 1, dims).cast("array<double>").as("text_emb"))
    // the keep decision compares the ROUNDED cosine (the engine-agreed value) — an
    // unrounded comparison could flip on last-ulp differences between engines
    val cos = round(graft.pipeline.Similarity.cosine(col("media_emb"), col("text_emb")), 6)
    mediaEmb
      .join(textEmb, "asset_id")
      .select(
        col("asset_id"),
        cos.as("align_cos"),
        (cos >= lit(thresholdMicro.toDouble / 1000000.0)).cast("int").as("aligned"))
  }

  case class PhashRow(asset_id: Long, phash: Long)

  /** Perceptual-hash interface: 60 bits (so the value is always a positive
    * BIGINT in both engines — the repo-wide 15-hex-char discipline). A real
    * deployment plugs a DCT pHash / aHash here; similar images then land within
    * a few bits of each other and [[phashNearDup]]'s banding finds them.
    */
  trait MediaHasher extends Serializable {
    def phash(mediaType: String, bytes: Array[Byte]): Long
  }

  /** STUB hasher — first 15 hex chars of md5(bytes) (deterministic, oracle-
    * reproducible; the [[DecodeStub]] discipline). It has NO locality, so with
    * this stub only EXACT payload copies collide — the banding/hamming kernel is
    * pinned on controlled hashes in the unit suite instead.
    */
  object PhashStub extends MediaHasher {
    // a singleton `object` deserializes to THE one JVM instance, so every task
    // thread shares it — the digest must be per-thread, not per-instance (the
    // EmbedStub form is safe only because each task deserializes its own class
    // instance)
    @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    def phash(mediaType: String, bytes: Array[Byte]): Long = {
      val d = md.get()
      d.reset()
      val hex = d.digest(bytes).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
  }

  /** Batch perceptual hashing: one hasher instance per partition (the
    * [[featurize]] shape — codec init amortized, binary never on the driver).
    */
  def phashDF(
      df: DataFrame, idCol: String, typeCol: String, binCol: String,
      hasher: MediaHasher = PhashStub
  ): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("asset_id"), col(typeCol).as("media_type"), col(binCol).as("media"))
      .as[MediaAsset]
      .mapPartitions(it => it.map(a => PhashRow(a.asset_id, hasher.phash(a.media_type, a.media))))
      .toDF()
  }

  /** m09 — PERCEPTUAL-HASH near-dup pairs: the published image-dedup kernel
    * (LAION/DataComp run exactly this shape over pHashes). Candidates come from
    * EXACT equality on one of `bands` disjoint bit-fields of the 60-bit hash —
    * pigeonhole-complete for hamming ≤ maxDist whenever maxDist < bands (≤ maxDist
    * differing bits can touch at most maxDist bands, so at least one band is
    * untouched) — then the exact `bit_count(xor)` verifies. The d12 simhash
    * banding applied to media, plus the hot-bucket member cap the image corpora
    * need (a solid-color/test-card hash bucket at web scale would otherwise fan
    * out quadratically; over-cap cells fall to exact passes by design, the d02
    * recall contract).
    *
    * Scale shape: band buckets shuffle-partition the work (never all-pairs); the
    * cap bounds every bucket's fan-out; output pairs deduplicate AFTER the
    * hamming filter so the distinct only carries survivors (the d12 ordering).
    */
  def phashNearDup(
      df: DataFrame, idCol: String, typeCol: String, binCol: String,
      bands: Int = 4,
      maxDist: Int = 3,
      maxAssetsPerBucket: Long = 1000L,
      hasher: MediaHasher = PhashStub
  ): DataFrame =
    phashNearDupOf(phashDF(df, idCol, typeCol, binCol, hasher), bands, maxDist, maxAssetsPerBucket)

  /** The banding kernel of [[phashNearDup]] over an already-hashed (asset_id,
    * phash) relation — separated so the unit suite pins hamming/band/cap
    * semantics on controlled hashes (the md5 stub has no locality to plant).
    */
  private[graft] def phashNearDupOf(
      hashes: DataFrame,
      bands: Int,
      maxDist: Int,
      maxAssetsPerBucket: Long
  ): DataFrame = {
    require(60 % bands == 0 && maxDist < bands,
      "banding finds all pairs only when maxDist < bands and bands divides 60")
    val bandBits = 60 / bands
    val mask = (1L << bandBits) - 1
    val banded = hashes
      .select(col("asset_id"), col("phash"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), b * bandBits).bitwiseAND(lit(mask)).as("bval"))): _*)).as("bk"))
      .select(col("asset_id"), col("phash"), col("bk.band"), col("bk.bval"))
      .localCheckpoint(true) // cell census + both sides of the band self-join
    val smallCells = banded.groupBy(col("band"), col("bval"))
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxAssetsPerBucket)
      .select(col("band"), col("bval"))
    val admitted = banded.join(smallCells, Seq("band", "bval"))
    val left = admitted.select(col("asset_id").as("id_a"), col("phash").as("ph_a"), col("band"), col("bval"))
    val right = admitted.select(col("asset_id").as("id_b"), col("phash").as("ph_b"), col("band"), col("bval"))
    left.join(right, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(ph_a ^ ph_b) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
