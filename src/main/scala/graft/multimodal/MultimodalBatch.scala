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
  * needs, and is what the specs exercise. Where the JVM ships a real
  * decoder, the stub is replaced with no new dependency: `ImageIoCodec`
  * decodes real PNG/BMP/GIF/JPEG pixels, `WavCodec` real WAV/PCM
  * samples, and `AnimatedImageCodec` real multi-frame animated GIFs
  * (frame-indexed ImageReader) through the same batched path (all
  * spec-pinned on in-test-synthesized media). For video, `Mp4Codec`
  * parses the real MP4/ISO-BMFF container metadata (duration, track
  * count, dimensions — pure public-spec byte math), and for
  * compressed audio `Mp3Codec` (MPEG Layer III frame-header walk) and
  * `FlacCodec` (STREAMINFO) do the same for duration/rate/channels;
  * video frame DECODE (H.264 etc.) and MP3 sample decode stay
  * stubbed — no JVM builtin; a JNI/javacpp binding slots into the
  * same `Codec` trait.
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
    * luminance (`sum(r+g+b) * 1000 / (3 * 255 * pixels)` — the raw
    * channel sum accumulates and ONE division happens at the end, so
    * no per-pixel truncation; engine- and platform-exact since PNG/BMP
    * decode is lossless and deterministic). `n_frames = 1`: stills. A
    * payload no reader
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
        // raw r+g+b sum, no per-pixel /3: max 765 per pixel keeps a
        // Long exact past 10^16 pixels; the single division at the
        // end makes the result the true integer mean luminance
        var lum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
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
          brightness_milli = lum * 1000L / (3L * 255L * w * h))
      }
    }
  }

  /** REAL audio codec over the JVM's built-in `javax.sound.sampled`
    * WAV/AIFF/AU readers (no external dependency) — the audio analog
    * of [[ImageIoCodec]]: decodes actual PCM samples and emits exact
    * integer features through the SAME batched path.
    *
    * Feature mapping (the [[AssetFeatures]] envelope is shared across
    * modalities, so the audio quantities ride its fields):
    * `width` = sample rate in Hz, `height` = channel count,
    * `n_frames` = PCM sample frames, `brightness_milli` = mean
    * absolute amplitude in milli-full-scale
    * (`sum(|sample|) * 1000 / (n_samples * full_scale)`, one integer
    * division — engine-exact since PCM decode is lossless). Supports
    * 16-bit signed (either endianness) and 8-bit PCM; any payload the
    * reader rejects or an unsupported encoding falls back per-asset to
    * [[FakeCodec]], so mixed batches keep the pipeline total. */
  object WavCodec extends Codec {
    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val decoded =
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.payload))
          try {
            val fmt = ais.getFormat
            val bits = fmt.getSampleSizeInBits
            val pcmSigned = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val pcmUnsigned = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
            if (!((bits == 16 && pcmSigned) || (bits == 8 && (pcmSigned || pcmUnsigned))))
              None
            else {
              val bytes = ais.readAllBytes()
              var sumAbs = 0L
              var nSamples = 0L
              if (bits == 16) {
                val big = fmt.isBigEndian
                var i = 0
                while (i + 1 < bytes.length) {
                  val s =
                    if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                    else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                  sumAbs += math.abs(s.toLong)
                  nSamples += 1
                  i += 2
                }
              } else {
                var i = 0
                while (i < bytes.length) {
                  val s = if (pcmUnsigned) (bytes(i) & 0xff) - 128 else bytes(i).toInt
                  sumAbs += math.abs(s.toLong)
                  nSamples += 1
                  i += 1
                }
              }
              val fullScale = if (bits == 16) 32768L else 128L
              val frames =
                if (ais.getFrameLength >= 0) ais.getFrameLength
                else if (fmt.getChannels > 0) nSamples / fmt.getChannels
                else nSamples
              Some(AssetFeatures(
                asset_id = a.asset_id,
                media_type = a.media_type,
                byte_len = a.payload.length.toLong,
                width = math.round(fmt.getSampleRate),
                height = fmt.getChannels,
                // getFrameLength is a Long: >= 2^31 PCM frames must
                // clamp, not wrap to a negative frame count
                n_frames = math.min(frames, Int.MaxValue.toLong).toInt,
                brightness_milli =
                  if (nSamples == 0) 0L
                  else sumAbs * 1000L / (nSamples * fullScale)))
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      decoded.getOrElse(FakeCodec.decode(Seq(a)).head)
    }
  }

  /** REAL multi-frame image codec — the motion analog of
    * [[ImageIoCodec]] for the one animated format the JVM decodes
    * natively (animated GIF via `javax.imageio`'s frame-indexed
    * ImageReader; no external dependency). Decodes EVERY stored frame
    * and emits `n_frames` = the true frame count and
    * `brightness_milli` = exact integer mean luminance across all
    * decoded frames' pixels (one division at the end, engine-exact —
    * GIF decode is lossless). `width`/`height` are frame 0's. Frames
    * are the STORED images: an animated GIF with delta-disposal
    * frames reports each delta's own pixels, which is the decode
    * contract a frame-sampling stage (q97's plan) consumes. For a
    * still image this degrades to [[ImageIoCodec]]'s output. Real
    * video (H.264 etc.) remains stubbed — no JVM builtin; a
    * JNI/javacpp binding slots into the same per-frame loop. Any
    * unreadable payload falls back per-asset to [[FakeCodec]]. */
  object AnimatedImageCodec extends Codec {
    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val decoded =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(a.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); None }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              // allowSearch: the count needs a full scan for GIF; the
              // payload is an in-memory stream so the scan is cheap
              val n = reader.getNumImages(true)
              if (n <= 0) None
              else {
                var lum = 0L
                var px = 0L
                var w0 = 0
                var h0 = 0
                var i = 0
                while (i < n) {
                  val img = reader.read(i)
                  if (i == 0) { w0 = img.getWidth; h0 = img.getHeight }
                  val (w, h) = (img.getWidth, img.getHeight)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      // raw r+g+b sum like ImageIoCodec: the one
                      // division at the end keeps the mean exact
                      lum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                      x += 1
                    }
                    y += 1
                  }
                  px += w.toLong * h
                  i += 1
                }
                Some(AssetFeatures(
                  asset_id = a.asset_id,
                  media_type = a.media_type,
                  byte_len = a.payload.length.toLong,
                  width = w0,
                  height = h0,
                  n_frames = n,
                  brightness_milli = if (px == 0) 0L else lum * 1000L / (3L * 255L * px)))
              }
            } finally { reader.dispose(); iis.close() }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      decoded.getOrElse(FakeCodec.decode(Seq(a)).head)
    }
  }

  /** REAL video CONTAINER-METADATA codec: parses the MP4/ISO-BMFF box
    * structure (ISO/IEC 14496-12 — `ftyp`/`moov`/`mvhd`/`trak`/`tkhd`,
    * public spec, pure byte math) without decoding a single sample.
    * This is the metadata half of the video story: frame DECODE
    * (H.264 etc.) stays sanctioned-out (no JVM builtin — a JNI/javacpp
    * binding slots into the same Codec trait), but duration, track
    * count and visual dimensions are plain big-endian box fields and
    * are parsed for real, the way GIF/WAV decode is.
    *
    * Envelope mapping (the shared [[AssetFeatures]] shape, like
    * [[WavCodec]]'s): `width`/`height` = the first visual track's
    * `tkhd` dimensions (16.16 fixed-point, integer part),
    * `n_frames` = the TRACK count (no sample tables are walked),
    * `brightness_milli` = the presentation duration in MILLISECONDS
    * (`mvhd.duration * 1000 / mvhd.timescale`, one integer division).
    * A payload without a well-formed `ftyp` + `moov`/`mvhd` — or any
    * truncated/overflowing box — falls back per-asset to [[FakeCodec]],
    * so mixed batches keep the pipeline total. */
  object Mp4Codec extends Codec {
    private def u32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    private def u64(b: Array[Byte], p: Int): Long =
      (u32(b, p) << 32) | u32(b, p + 4)

    /** Child boxes of `[from, to)` as (type, payloadStart, payloadEnd).
      * Handles the three size forms (32-bit, 64-bit `size==1`,
      * to-end-of-enclosure `size==0`); any bound violation throws and
      * the per-asset NonFatal guard turns it into a fallback. */
    private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var p = from
      while (p + 8 <= to) {
        val size32 = u32(b, p)
        val tpe = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val (hdr, size) =
          if (size32 == 1L) { require(p + 16 <= to, "truncated largesize"); (16, u64(b, p + 8)) }
          else if (size32 == 0L) (8, (to - p).toLong)
          else (8, size32)
        require(size >= hdr && p + size <= to, s"box $tpe overflows its enclosure")
        out += ((tpe, p + hdr, (p + size).toInt))
        p = (p + size).toInt
      }
      out.result()
    }

    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val parsed =
        try {
          val b = a.payload
          val tops = boxes(b, 0, b.length)
          if (!tops.exists(_._1 == "ftyp")) None
          else tops.find(_._1 == "moov").flatMap { case (_, ms, me) =>
            val kids = boxes(b, ms, me)
            kids.find(_._1 == "mvhd").flatMap { case (_, ps, _) =>
              val v = b(ps) & 0xff
              val (timescale, duration) =
                if (v == 1) (u32(b, ps + 20), u64(b, ps + 24))
                else (u32(b, ps + 12), u32(b, ps + 16))
              if (timescale == 0L) None
              else {
                // first VISUAL track: tkhd width/height are zero for
                // audio/hint tracks by spec, nonzero 16.16 for video
                val dims = kids.filter(_._1 == "trak").iterator
                  .flatMap { case (_, ts, te) => boxes(b, ts, te).find(_._1 == "tkhd") }
                  .map { case (_, ks, _) =>
                    val off = if ((b(ks) & 0xff) == 1) 88 else 76
                    ((u32(b, ks + off) >> 16).toInt, (u32(b, ks + off + 4) >> 16).toInt)
                  }
                  .find { case (w, h) => w > 0 && h > 0 }
                val nTracks = kids.count(_._1 == "trak")
                Some(AssetFeatures(
                  asset_id = a.asset_id,
                  media_type = a.media_type,
                  byte_len = b.length.toLong,
                  width = dims.map(_._1).getOrElse(0),
                  height = dims.map(_._2).getOrElse(0),
                  n_frames = nTracks,
                  brightness_milli = duration * 1000L / timescale))
              }
            }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed.getOrElse(FakeCodec.decode(Seq(a)).head)
    }
  }

  /** REAL compressed-audio CONTAINER-METADATA codec for MP3 — the
    * audio sibling of [[Mp4Codec]]: parses MPEG audio Layer III frame
    * headers (ISO/IEC 11172-3 / 13818-3 — public spec, pure
    * big-endian byte math) without decoding a single sample. Walks
    * EVERY frame (so VBR streams report their true duration, not a
    * first-frame-bitrate estimate), skipping a leading ID3v2 tag
    * (syncsafe size) and a trailing 128-byte ID3v1 `TAG` block.
    *
    * Envelope mapping (the shared [[AssetFeatures]] shape):
    * `width` = sample rate in Hz, `height` = channel count (mono=1),
    * `n_frames` = MPEG frame count, `brightness_milli` = duration in
    * MILLISECONDS (`total_samples * 1000 / sample_rate`, one integer
    * division — the [[Mp4Codec]] duration convention, since no PCM is
    * decoded). Strict walk: the first frame must start exactly where
    * the audio stream starts and every frame boundary must carry a
    * valid Layer III header with an unchanged sample rate — anything
    * else (free-format/reserved fields, mid-stream garbage, truncated
    * tail) falls back per-asset to [[FakeCodec]], so mixed batches
    * keep the pipeline total. Sample DECODE (Huffman/MDCT) stays
    * sanctioned-out like H.264: no JVM builtin. */
  object Mp3Codec extends Codec {
    // Layer III bitrate (kbps) and sample-rate tables, by version
    private val BitrateV1 =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val BitrateV2 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    private val SampleRate = Map( // versionBits -> table
      3 -> Array(44100, 48000, 32000), // MPEG1
      2 -> Array(22050, 24000, 16000), // MPEG2
      0 -> Array(11025, 12000, 8000)) //  MPEG2.5

    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val parsed =
        try {
          val b = a.payload
          var p = 0
          // leading ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4);
          // the syncsafe size EXCLUDES the 10-byte header and, per the
          // ID3v2.4 spec §3.1, the optional 10-byte footer — flags bit 4
          // announces it, but ONLY in v2.4 (b(3) is the major version):
          // in v2.2/v2.3 that bit is undefined, and honoring a garbage
          // flag there would mis-skip 10 bytes and fail frame sync
          if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
            val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
              ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
            val footer = if (b(3) == 4 && (b(5) & 0x10) != 0) 10 else 0
            p = 10 + size + footer
          }
          var frames = 0L
          var samples = 0L
          var sr = -1
          var channels = 0
          var ok = b.length > p
          while (ok && p + 4 <= b.length) {
            if (b.length - p == 128 && b(p) == 'T' && b(p + 1) == 'A' && b(p + 2) == 'G') {
              p = b.length // trailing ID3v1 tag
            } else {
              val h1 = b(p + 1) & 0xff
              val h2 = b(p + 2) & 0xff
              val versionBits = (h1 >> 3) & 0x3
              val layerBits = (h1 >> 1) & 0x3
              val brIdx = (h2 >> 4) & 0xf
              val srIdx = (h2 >> 2) & 0x3
              if ((b(p) & 0xff) != 0xff || (h1 & 0xe0) != 0xe0 ||
                versionBits == 1 || layerBits != 1 || // Layer III only
                brIdx == 0 || brIdx == 15 || srIdx == 3) ok = false
              else {
                val mpeg1 = versionBits == 3
                val rate = SampleRate(versionBits)(srIdx)
                if (sr == -1) {
                  sr = rate
                  channels = if (((b(p + 3) >> 6) & 0x3) == 3) 1 else 2
                } else if (rate != sr) ok = false
                if (ok) {
                  val kbps = (if (mpeg1) BitrateV1 else BitrateV2)(brIdx)
                  val spf = if (mpeg1) 1152 else 576
                  val len = spf / 8 * kbps * 1000 / rate + ((h2 >> 1) & 1)
                  if (p + len > b.length) ok = false
                  else { frames += 1; samples += spf; p += len }
                }
              }
            }
          }
          if (!ok || frames == 0 || p != b.length) None
          else Some(AssetFeatures(
            asset_id = a.asset_id,
            media_type = a.media_type,
            byte_len = b.length.toLong,
            width = sr,
            height = channels,
            n_frames = math.min(frames, Int.MaxValue.toLong).toInt,
            brightness_milli = samples * 1000L / sr))
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed.getOrElse(FakeCodec.decode(Seq(a)).head)
    }
  }

  /** REAL lossless-audio CONTAINER-METADATA codec for FLAC: parses the
    * `fLaC` marker and the mandatory STREAMINFO metadata block (the
    * xiph FLAC format spec — public, pure byte math) without decoding
    * a sample. STREAMINFO carries the stream's exact geometry, so
    * unlike [[Mp3Codec]] no frame walk is needed.
    *
    * Envelope mapping: `width` = sample rate in Hz (20-bit field),
    * `height` = channel count, `n_frames` = total PCM sample frames
    * (36-bit field, clamped like [[WavCodec]]'s), `brightness_milli`
    * = duration in MILLISECONDS (`total_samples * 1000 /
    * sample_rate`, one integer division). A payload without the
    * marker, whose first block is not a 34-byte STREAMINFO, or with a
    * zero sample rate falls back per-asset to [[FakeCodec]]. */
  object FlacCodec extends Codec {
    def decode(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map { a =>
      val parsed =
        try {
          val b = a.payload
          // "fLaC" + block header (1 type byte + 3 length bytes) + 34
          if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
            None
          else {
            val blockType = b(4) & 0x7f // bit 7 = last-block flag
            val blockLen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
            if (blockType != 0 || blockLen != 34 || b.length < 8 + 34) None
            else {
              val s = 8 // STREAMINFO payload start
              // bytes 10-12: sample rate (20 bits), channels-1 (3), bps-1 (5)
              val sr = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) |
                ((b(s + 12) & 0xff) >> 4)
              val channels = ((b(s + 12) >> 1) & 0x7) + 1
              val total = ((b(s + 13) & 0x0fL) << 32) |
                ((b(s + 14) & 0xffL) << 24) | ((b(s + 15) & 0xffL) << 16) |
                ((b(s + 16) & 0xffL) << 8) | (b(s + 17) & 0xffL)
              if (sr == 0) None
              else Some(AssetFeatures(
                asset_id = a.asset_id,
                media_type = a.media_type,
                byte_len = b.length.toLong,
                width = sr,
                height = channels,
                n_frames = math.min(total, Int.MaxValue.toLong).toInt,
                brightness_milli = total * 1000L / sr))
            }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed.getOrElse(FakeCodec.decode(Seq(a)).head)
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
