package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` with typed
  * metadata, decoded in batched per-partition passes.
  *
  * The actual codec is intentionally a STUB (`FakeCodec`): this
  * container has no image/audio libraries, so decode produces
  * deterministic fake features from the bytes. Everything around it —
  * schema, typed Dataset, partition batching, feature shape — is the
  * real plumbing a decode stage needs, and is what the specs exercise.
  * Swapping `FakeCodec.decode` for a JNI/javacpp codec is the only
  * change needed for real media.
  */
object MultimodalBatch {

  /** One media asset: opaque payload + envelope metadata. */
  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features (fake, deterministic from payload bytes). */
  case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness_milli: Long)

  val DecodeBatchSize = 64

  /** STUB codec: deterministic pseudo-decode from the raw bytes. A real
    * implementation decodes pixels/samples here; the call shape
    * (byte[] in, fixed-size features out, batch-at-a-time) is what a
    * native codec binding needs. */
  object FakeCodec {
    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val n = a.payload.length.toLong
      var acc = 0L
      var i = 0
      while (i < a.payload.length) { acc = (acc * 31 + (a.payload(i) & 0xff)) % 1000000007L; i += 1 }
      AssetFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        byte_len = n,
        width = (n % 64 + 16).toInt,
        height = (n * 7 % 64 + 16).toInt,
        n_frames = (n % 7 + 1).toInt,
        brightness_milli = acc % 1000)
    }
  }

  /** Documents -> assets: treat the text payload as opaque bytes (the
    * testdata carries no real media; the pipeline shape is identical). */
  def assetsFromDocuments(s: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import s.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      col("text").cast("binary").as("payload")).as[Asset]
  }

  /** Batched per-partition decode — the one place `mapPartitions` is
    * the right tool: amortizes codec init per batch, keeps memory
    * bounded by DecodeBatchSize, stays fully distributed. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => FakeCodec.decode(batch))
    }
  }

  /** One sampled frame of a (fake-)video asset. */
  case class Frame(
      asset_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      brightness_milli: Long)

  /** Frame sampling: every asset yields `min(k, n_frames)` frame rows —
    * the one→many row-explosion plumbing a video pipeline needs. Frames
    * are evenly spaced over the asset's frame count (index
    * `i * n_frames / k`, the standard uniform-stride sampler); the
    * per-frame decode is the same STUB (deterministic from the payload
    * bytes + frame index). Batched like decodeFeatures, still one pass. */
  def sampleFrames(assets: Dataset[Asset], k: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        FakeCodec.decode(batch).flatMap { f =>
          val take = math.min(k, f.n_frames)
          (0 until take).map { i =>
            val idx = i * f.n_frames / math.max(take, 1)
            Frame(f.asset_id, idx, f.width, f.height,
              (f.brightness_milli * 31 + idx * 131) % 1000)
          }
        }
      }
    }
  }

  /** Resize: pure column arithmetic over decoded features — the
    * aspect-preserving fit into a (maxW, maxH) box every image pipeline
    * ships. No UDF, no shuffle; stays in whole-stage codegen. */
  def resizeTo(features: Dataset[AssetFeatures], maxW: Int, maxH: Int): DataFrame = {
    val scaleNum = least(lit(maxW) * col("height"), lit(maxH) * col("width"))
    val scaleDen = col("width") * col("height")
    features.toDF()
      .withColumn("out_w", greatest(lit(1), (col("width") * scaleNum / scaleDen).cast("int")))
      .withColumn("out_h", greatest(lit(1), (col("height") * scaleNum / scaleDen).cast("int")))
  }
}
