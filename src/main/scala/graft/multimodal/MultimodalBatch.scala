package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` with typed
  * metadata, decoded in batched per-partition passes.
  *
  * The default codec is a STUB (`FakeCodec`): the testdata payloads
  * are not media, so decode produces deterministic fake features from
  * the bytes. Everything around it — schema, typed Dataset, partition
  * batching, feature shape — is the real plumbing a decode stage
  * needs, and is what the specs exercise. For still images the JVM's
  * built-in readers suffice with no new dependency: `ImageIoCodec`
  * decodes real PNG/BMP/GIF/JPEG pixels through the same batched
  * path (spec-pinned on an in-test PNG). Audio/video stay stubbed —
  * those codecs aren't in this container; a JNI/javacpp binding slots
  * into the same `Codec` trait.
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

  /** The codec contract: byte[] in, fixed-size features out,
    * batch-at-a-time (the call shape a native binding needs). Must be
    * serializable — it rides into the task closures. */
  trait Codec extends Serializable {
    def decode(batch: Seq[Asset]): Seq[AssetFeatures]
  }

  /** STUB codec: deterministic pseudo-decode from the raw bytes. A real
    * implementation decodes pixels/samples here. Stays the default —
    * the testdata payloads are not media. */
  object FakeCodec extends Codec {
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

  /** REAL still-image codec over the JVM's built-in `javax.imageio`
    * readers (PNG/BMP/GIF/JPEG — no external dependency): decodes
    * actual pixels, emits true width/height and the exact integer mean
    * luminance (`sum((r+g+b)/3) * 1000 / (255 * pixels)`, one division
    * — engine- and platform-exact since PNG/BMP decode is lossless and
    * deterministic). `n_frames = 1`: stills. A payload no reader
    * accepts falls back per-asset to [[FakeCodec]], so mixed batches
    * (real media next to opaque blobs) keep the pipeline total. */
  object ImageIoCodec extends Codec {
    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      // NonFatal, not just IOException: malformed/truncated headers can
      // throw unchecked exceptions from the JDK reader plugins
      // (ArrayIndexOutOfBounds, IllegalArgument) — any undecodable
      // payload must fall back per-asset, never fail the whole task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) FakeCodec.decode(Seq(a)).head
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var lum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        AssetFeatures(
          asset_id = a.asset_id,
          media_type = a.media_type,
          byte_len = a.payload.length.toLong,
          width = w,
          height = h,
          n_frames = 1,
          brightness_milli = lum * 1000L / (255L * w * h))
      }
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
    * bounded by DecodeBatchSize, stays fully distributed. Defaults to
    * the stub; pass [[ImageIoCodec]] for real still images. */
  def decodeFeatures(assets: Dataset[Asset],
      codec: Codec = FakeCodec): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => codec.decode(batch))
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
