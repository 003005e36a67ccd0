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
}
