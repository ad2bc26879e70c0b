package graft

import graft.multimodal.MultimodalBatch

class MultimodalSpec extends SparkSpec {

  test("asset pipeline decodes deterministic features via batched mapPartitions") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val assets = MultimodalBatch.assetsFromDocuments(spark, docs)
    val feats = MultimodalBatch.decodeFeatures(assets)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(f => f.width >= 16 && f.width < 80))
    assert(rows.forall(f => f.n_frames >= 1 && f.n_frames <= 7))
    // deterministic: same input -> same features
    val again = MultimodalBatch.decodeFeatures(assets).collect()
    assert(rows.sortBy(_.asset_id).toSeq == again.sortBy(_.asset_id).toSeq)
  }

  test("frame sampling emits min(k, n_frames) evenly-strided frames per asset") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val assets = MultimodalBatch.assetsFromDocuments(spark, docs)
    val feats = MultimodalBatch.decodeFeatures(assets).collect()
      .map(f => f.asset_id -> f.n_frames).toMap
    val frames = MultimodalBatch.sampleFrames(assets, 3).collect()
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.keySet == feats.keySet)
    byAsset.foreach { case (id, fs) =>
      assert(fs.length == math.min(3, feats(id)), s"asset $id")
      // strided indices are strictly increasing and inside the clip
      val idxs = fs.map(_.frame_idx).sorted.toSeq
      assert(idxs == fs.map(_.frame_idx).toSeq.sorted && idxs.distinct == idxs)
      assert(idxs.forall(i => i >= 0 && i < feats(id)))
    }
    // deterministic across runs
    val again = MultimodalBatch.sampleFrames(assets, 3).collect()
    assert(frames.sortBy(f => (f.asset_id, f.frame_idx)).toSeq ==
      again.sortBy(f => (f.asset_id, f.frame_idx)).toSeq)
  }

  test("resize fits features into the box, preserves aspect, stays codegen") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val feats = MultimodalBatch.decodeFeatures(MultimodalBatch.assetsFromDocuments(spark, docs))
    val resized = MultimodalBatch.resizeTo(feats, 32, 24)
    val rows = resized.select("width", "height", "out_w", "out_h").collect()
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow <= 32 && oh <= 24 && ow >= 1 && oh >= 1, s"($w,$h)->($ow,$oh)")
      // exact fit math: dims scaled by min(maxW/w, maxH/h), floored
      val num = math.min(32L * h, 24L * w).toDouble
      val den = (w.toLong * h).toDouble
      assert(ow == math.max(1, (w * num / den).toInt), s"($w,$h)->($ow,$oh)")
      assert(oh == math.max(1, (h * num / den).toInt), s"($w,$h)->($ow,$oh)")
    }
    // pure column math: no Generate / mapPartitions in the plan tail
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)
  }

  test("payload is genuine binary with byte-accurate length") {
    import spark.implicits._
    val df = Seq((1L, "héllo")).toDF("doc_id", "text")
      .withColumnRenamed("text", "text")
    val assets = MultimodalBatch.assetsFromDocuments(spark,
      df.withColumnRenamed("doc_id", "doc_id").withColumn("source", org.apache.spark.sql.functions.lit("s")))
    val f = MultimodalBatch.decodeFeatures(assets).collect().head
    assert(f.byte_len == 6) // é is 2 bytes in UTF-8
  }

  test("q155: every image lands in exactly one patch batch; padding math is consistent") {
    import org.apache.spark.sql.functions._
    val b = graft.queries.MultimodalQueries.patchBatches(spark, sfDir).cache()
    val nImgs = b.agg(sum(col("n_imgs"))).head().getLong(0)
    assert(nImgs === Tables.documents(spark, sfDir).count())
    assert(b.filter(col("n_imgs") > graft.queries.MultimodalQueries.PatchBatchSize).count() === 0)
    // dims are 16..79 at 16px patches: 1..5 per axis, <= 25 patches
    assert(b.filter(col("max_patches") < 1 || col("max_patches") > 25).count() === 0)
    assert(b.filter(col("sum_patches") > col("padded_patches")).count() === 0)
    assert(b.filter(col("pad_waste_e6") < 0 || col("pad_waste_e6") >= 1000000L).count() === 0)
    // the operator's claim: aspect+size-sorted batching wastes less
    // padding than arrival-order (doc_id) batching on the same shards
    val waste = b.agg(sum(col("padded_patches")), sum(col("sum_patches"))).head()
    val sortedUtil = waste.getLong(1).toDouble / waste.getLong(0).toDouble
    val base = Tables.documents(spark, sfDir)
      .withColumn("byte_len", length(col("text").cast("binary")).cast("long"))
      .select(col("doc_id"),
        (col("byte_len") % 64 + 16).as("width"),
        (col("byte_len") * 7 % 64 + 16).as("height"))
      .withColumn("n_patches",
        expr("((width + 15) div 16) * ((height + 15) div 16)"))
      .withColumn("shard",
        (graft.functions.Hashing.polyHash(concat(col("doc_id").cast("string"),
          lit(":pb1"))) % graft.queries.MultimodalQueries.PatchShards).cast("long"))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))).cast("long"))
      .withColumn("batch_idx", expr("(rk - 1) div 16"))
      .groupBy(col("shard"), col("batch_idx"))
      .agg(count(lit(1)).as("n"), max(col("n_patches")).as("mx"),
        sum(col("n_patches")).as("sm"))
      .agg(sum(col("mx") * col("n")), sum(col("sm"))).head()
    val arrivalUtil = base.getLong(1).toDouble / base.getLong(0).toDouble
    assert(sortedUtil > arrivalUtil,
      s"sorted $sortedUtil should beat arrival-order $arrivalUtil")
    b.unpersist()
  }

  test("q196 windowed-energy segmentation matches a driver-side transcription") {
    import org.apache.spark.sql.functions._
    import graft.queries.MultimodalQueries
    def foldText(t: String): String = {
      val hyphens = "-\u2010\u2011\u2012\u2013\u2014\u2015"
      val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
        .filterNot(_ == '\u00ad')
      java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "").toLowerCase
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> foldText(r.getString(1))).filter(_._2.nonEmpty)
    val W = MultimodalQueries.VadWindow.toInt
    val expected = docs.map { case (id, t) =>
      val energies = t.grouped(W).map(g =>
        g.map(c => { val d = c.toLong - MultimodalQueries.VadCenter; d * d }).sum).toSeq
      val active = energies.map(_ >= MultimodalQueries.VadEnergyThr)
      // runs of equal activity
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Int, Int)]
      active.zipWithIndex.foreach { case (a, w) =>
        if (runs.nonEmpty && runs.last._1 == a)
          runs(runs.length - 1) = (a, runs.last._2 + 1, runs.last._3)
        else runs += ((a, 1, w))
      }
      val act = runs.filter(_._1)
      val best = if (act.isEmpty) None
        else Some(act.minBy { case (_, l, st) => (-l, st) })
      id -> ((energies.length.toLong, active.count(identity).toLong,
        act.length.toLong, best.map(_._2.toLong).getOrElse(0L),
        best.map(_._3.toLong)))
    }.toMap
    val rows = MultimodalQueries.audioEnergy(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nw, na, ns, ls, lst) = expected(id)
      assert(r.getAs[Long]("n_windows") === nw)
      assert(r.getAs[Long]("n_active") === na, s"active of $id")
      assert(r.getAs[Long]("n_segments") === ns, s"segments of $id")
      assert(r.getAs[Long]("longest_seg") === ls, s"longest of $id")
      assert(Option(r.get(r.fieldIndex("longest_start")))
        .map(_.asInstanceOf[Long]) === lst)
      assert(r.getAs[Long]("active_e6") === na * 1000000L / nw)
    }
    // both verdicts must occur or the threshold is vacuous
    assert(rows.exists(_.getAs[Long]("n_active") > 0))
    assert(rows.exists(r => r.getAs[Long]("n_active") < r.getAs[Long]("n_windows")))
  }

  test("ImageIoCodec decodes a real PNG through the batched decode path") {
    import spark.implicits._
    import MultimodalBatch.{Asset, ImageIoCodec}
    // render a real 8x5 PNG in-test: left half black, right half white
    // -> known dimensions and an exactly computable mean luminance
    val (w, h) = (8, 5)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    // mixed batch: the PNG decodes for real, the opaque blob falls back
    val assets = Seq(
      Asset(1L, "media/png", png),
      Asset(2L, "media/blob", "not an image at all".getBytes("UTF-8")))
      .toDS()
    val feats = MultimodalBatch.decodeFeatures(assets, ImageIoCodec)
      .collect().map(f => f.asset_id -> f).toMap
    val real = feats(1L)
    assert(real.width === w)
    assert(real.height === h)
    assert(real.n_frames === 1)
    assert(real.byte_len === png.length.toLong)
    // half the pixels at luminance 0, half at 255 -> 20*255 total,
    // milli = 20*255*1000 / (255*40) = 500
    assert(real.brightness_milli === 500L)
    // the non-image asset took the stub path (its deterministic shape)
    val blob = feats(2L)
    val stub = MultimodalBatch.FakeCodec.decode(
      Seq(Asset(2L, "media/blob", "not an image at all".getBytes("UTF-8")))).head
    assert(blob === stub)
  }

  test("WavCodec decodes a real in-test WAV through the batched decode path") {
    import spark.implicits._
    import MultimodalBatch.{Asset, WavCodec}
    // synthesize a real 16-bit mono PCM WAV: a square wave alternating
    // +8192/-8192 -> every |sample| is exactly 8192, so the mean
    // amplitude is exactly 8192/32768 = 250 milli-full-scale
    val rate = 8000f
    val n = 400
    val samples = Array.tabulate[Short](n)(i => if (i % 2 == 0) 8192 else -8192)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) { // little-endian, matching the declared format
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    // mixed batch: the WAV decodes for real, the opaque blob falls back
    val assets = Seq(
      Asset(1L, "media/wav", wav),
      Asset(2L, "media/blob", "definitely not audio".getBytes("UTF-8")))
      .toDS()
    val feats = MultimodalBatch.decodeFeatures(assets, WavCodec)
      .collect().map(f => f.asset_id -> f).toMap
    val real = feats(1L)
    assert(real.width === 8000)       // sample rate Hz
    assert(real.height === 1)         // channels
    assert(real.n_frames === n)       // PCM frames
    assert(real.byte_len === wav.length.toLong)
    assert(real.brightness_milli === 250L) // 8192 * 1000 / 32768 exactly
    // the non-audio asset took the stub path (its deterministic shape)
    val blob = feats(2L)
    val stub = MultimodalBatch.FakeCodec.decode(
      Seq(Asset(2L, "media/blob", "definitely not audio".getBytes("UTF-8")))).head
    assert(blob === stub)
  }

  test("Mp4Codec parses real ISO-BMFF container metadata through the batched decode path") {
    import spark.implicits._
    import MultimodalBatch.{Asset, Mp4Codec}
    // synthesize a minimal spec-true MP4 in-test: ftyp + moov(mvhd +
    // video trak + audio trak) + an mdat in the 64-bit `size==1` form
    // (public ISO/IEC 14496-12 layouts, byte-exact)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    def box64(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + payload.length)
      b.putInt(1).put(tpe.getBytes("ISO-8859-1"))
        .putLong(16L + payload.length).put(payload)
      b.array()
    }
    // mvhd v0: timescale 600 ticks/s, duration 7200 ticks -> 12000 ms
    val mvhd = {
      val p = java.nio.ByteBuffer.allocate(100) // spec size of mvhd v0
      p.putInt(0).putInt(0).putInt(0).putInt(600).putInt(7200)
      box("mvhd", p.array())
    }
    // tkhd v0: width/height are 16.16 fixed at payload offsets 76/80
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(84)
      p.position(76)
      p.putInt(w << 16).putInt(h << 16)
      box("tkhd", p.array())
    }
    val videoTrak = box("trak", tkhd(320, 240))
    val audioTrak = box("trak", tkhd(0, 0)) // audio: zero dims by spec
    val moov = box("moov", mvhd ++ videoTrak ++ audioTrak)
    val ftyp = box("ftyp",
      "isom".getBytes ++ Array[Byte](0, 0, 0, 1) ++ "isom".getBytes)
    val mdat = box64("mdat", Array.fill[Byte](32)(7))
    val mp4 = ftyp ++ mdat ++ moov

    val assets = Seq(
      Asset(1L, "media/mp4", mp4),
      Asset(2L, "media/blob", "definitely not video".getBytes("UTF-8"))).toDS()
    val feats = MultimodalBatch.decodeFeatures(assets, Mp4Codec)
      .collect().map(f => f.asset_id -> f).toMap
    val real = feats(1L)
    assert(real.width === 320)  // first VISUAL track's dims
    assert(real.height === 240)
    assert(real.n_frames === 2) // TRACK count rides n_frames
    assert(real.byte_len === mp4.length.toLong)
    assert(real.brightness_milli === 12000L) // duration ms, one division
    // version-1 boxes take the 64-bit offsets: same numbers
    val mvhd1 = {
      val p = java.nio.ByteBuffer.allocate(112) // spec size of mvhd v1
      p.put(1.toByte).position(20)
      p.putInt(600).putLong(7200L)
      box("mvhd", p.array())
    }
    def tkhd1(w: Int, h: Int): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(96)
      p.put(1.toByte).position(88)
      p.putInt(w << 16).putInt(h << 16)
      box("tkhd", p.array())
    }
    val mp4v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1(320, 240)))
    val v1 = Mp4Codec.decode(Seq(Asset(3L, "media/mp4", mp4v1))).head
    assert((v1.width, v1.height, v1.n_frames, v1.brightness_milli) ===
      ((320, 240, 1, 12000L)))
    // a payload without ftyp/moov falls back per-asset (a real GIF is
    // valid media but NOT a BMFF container — it must not misparse)
    val blob = feats(2L)
    val stub = MultimodalBatch.FakeCodec.decode(
      Seq(Asset(2L, "media/blob", "definitely not video".getBytes("UTF-8")))).head
    assert(blob === stub)
    // a truncated container (moov cut mid-box) falls back, never throws
    val torn = mp4.take(mp4.length - 40)
    val tornOut = Mp4Codec.decode(Seq(Asset(4L, "media/mp4", torn))).head
    assert(tornOut === MultimodalBatch.FakeCodec.decode(
      Seq(Asset(4L, "media/mp4", torn))).head)
  }

  test("AnimatedImageCodec decodes a real multi-frame GIF through the batched decode path") {
    import spark.implicits._
    import MultimodalBatch.{Asset, AnimatedImageCodec}
    // write a real 3-frame animated GIF in-test via ImageIO's sequence
    // writer. Constant-gray frames (GIF's 256-color palette represents
    // a single gray exactly — no quantization error), levels 50/100/150
    // -> mean luminance across all frames' pixels is exactly 100
    val (w, h) = (6, 4)
    def grayFrame(level: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(50, 100, 150).foreach { lvl =>
      writer.writeToSequence(
        new javax.imageio.IIOImage(grayFrame(lvl), null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    val gif = buf.toByteArray

    val assets = Seq(
      Asset(1L, "media/gif", gif),
      Asset(2L, "media/blob", "not a gif".getBytes("UTF-8"))).toDS()
    val feats = MultimodalBatch.decodeFeatures(assets, AnimatedImageCodec)
      .collect().map(f => f.asset_id -> f).toMap
    val real = feats(1L)
    assert(real.width === w)
    assert(real.height === h)
    assert(real.n_frames === 3)       // the TRUE stored frame count
    assert(real.byte_len === gif.length.toLong)
    // (50+100+150)/3 = 100 mean luminance -> 100*1000/255 = 392 exactly
    assert(real.brightness_milli === 100L * 1000L / 255L)
    // a still PNG through the same codec degrades to n_frames = 1 with
    // ImageIoCodec's numbers
    val still = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) still.setRGB(x, y, 0xffffff)
    val pbuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(still, "png", pbuf)
    val sf = AnimatedImageCodec.decode(
      Seq(Asset(3L, "media/png", pbuf.toByteArray))).head
    val imgIo = MultimodalBatch.ImageIoCodec.decode(
      Seq(Asset(3L, "media/png", pbuf.toByteArray))).head
    assert(sf === imgIo)
    // the non-image asset took the stub path
    val blob = feats(2L)
    val stub = MultimodalBatch.FakeCodec.decode(
      Seq(Asset(2L, "media/blob", "not a gif".getBytes("UTF-8")))).head
    assert(blob === stub)
  }

  test("Mp3Codec walks real Layer III frame headers through the batched decode path") {
    import spark.implicits._
    import MultimodalBatch.{Asset, Mp3Codec}
    // synthesize a spec-true MPEG1 Layer III stream in-test: header
    // math per ISO/IEC 11172-3 — 128 kbps @ 44100 Hz, no padding ->
    // frame length 144 * 128000 / 44100 = 417 bytes (int division)
    def frame(brIdx: Int, srIdx: Int, pad: Int, len: Int): Array[Byte] = {
      val f = Array.fill[Byte](len)(0)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // sync + MPEG1 + Layer III + no CRC
      f(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      f(3) = 0x00.toByte // stereo
      f
    }
    val f128 = frame(9, 0, 0, 144 * 128000 / 44100) // 417 bytes
    val f160 = frame(10, 0, 0, 144 * 160000 / 44100) // VBR: 522 bytes
    // leading ID3v2 (syncsafe size 200) + 10 frames + trailing ID3v1
    val id3v2 = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0, 0, 0, (200 >> 7).toByte, (200 & 0x7f).toByte) ++
      Array.fill[Byte](200)(0)
    val id3v1 = "TAG".getBytes("ISO-8859-1") ++ Array.fill[Byte](125)(0)
    val mp3 = id3v2 ++ Array.fill(8)(f128).flatten ++ f160 ++ f128 ++ id3v1

    val assets = Seq(
      Asset(1L, "media/mp3", mp3),
      Asset(2L, "media/blob", "definitely not audio".getBytes("UTF-8"))).toDS()
    val feats = MultimodalBatch.decodeFeatures(assets, Mp3Codec)
      .collect().map(f => f.asset_id -> f).toMap
    val real = feats(1L)
    assert(real.width === 44100) // sample rate rides width
    assert(real.height === 2) // stereo
    assert(real.n_frames === 10) // MPEG frames, VBR mix included
    assert(real.byte_len === mp3.length.toLong)
    // 10 frames x 1152 samples @ 44100 Hz -> 261 ms (int division)
    assert(real.brightness_milli === 10L * 1152 * 1000 / 44100)
    // MPEG2 frames are 576-sample: 4 frames @ 22050 Hz -> 104 ms
    def frame2(len: Int): Array[Byte] = {
      val f = Array.fill[Byte](len)(0)
      f(0) = 0xff.toByte
      f(1) = 0xf3.toByte // sync + MPEG2 + Layer III + no CRC
      f(2) = ((4 << 4) | (0 << 2)).toByte // 32 kbps @ 22050, idx 0
      f(3) = 0xc0.toByte // mono
      f
    }
    val mp32 = Array.fill(4)(frame2(576 / 8 * 32000 / 22050)).flatten
    val v2 = Mp3Codec.decode(Seq(Asset(3L, "media/mp3", mp32))).head
    assert((v2.width, v2.height, v2.n_frames, v2.brightness_milli) ===
      ((22050, 1, 4, 4L * 576 * 1000 / 22050)))
    // non-audio payloads and torn streams (frame cut mid-body) fall back
    val blob = feats(2L)
    val stub = MultimodalBatch.FakeCodec.decode(
      Seq(Asset(2L, "media/blob", "definitely not audio".getBytes("UTF-8")))).head
    assert(blob === stub)
    val torn = mp3.take(mp3.length - 130) // cuts into the last frame
    val tornOut = Mp3Codec.decode(Seq(Asset(4L, "media/mp3", torn))).head
    assert(tornOut === MultimodalBatch.FakeCodec.decode(
      Seq(Asset(4L, "media/mp3", torn))).head)
    // ID3v2.4 FOOTER flag (bit 4): the syncsafe size excludes both the
    // header and the 10-byte footer — a footered tag must skip 10 more
    // or the first frame misaligns and the asset silently falls back
    val id3v24f = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0x10.toByte, 0, 0, (200 >> 7).toByte, (200 & 0x7f).toByte) ++
      Array.fill[Byte](200)(0) ++
      "3DI".getBytes("ISO-8859-1") ++ Array[Byte](4, 0, 0x10.toByte, 0, 0,
        (200 >> 7).toByte, (200 & 0x7f).toByte)
    val footered = id3v24f ++ Array.fill(3)(f128).flatten
    val fOut = Mp3Codec.decode(Seq(Asset(5L, "media/mp3", footered))).head
    assert((fOut.width, fOut.height, fOut.n_frames) === ((44100, 2, 3)))
    assert(fOut !== MultimodalBatch.FakeCodec.decode(
      Seq(Asset(5L, "media/mp3", footered))).head)
    // the footer flag is DEFINED only in v2.4 (id3v2.4 §3.1): a
    // malformed v2.3 tag with bit 4 set has NO footer, and honoring
    // the garbage bit would mis-skip 10 bytes and lose frame sync —
    // the major-version byte gates the skip
    val id3v23garbage = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](3, 0, 0x10.toByte, 0, 0, (200 >> 7).toByte, (200 & 0x7f).toByte) ++
      Array.fill[Byte](200)(0) // v2.3: nothing after the padding
    val v23 = id3v23garbage ++ Array.fill(3)(f128).flatten
    val v23Out = Mp3Codec.decode(Seq(Asset(6L, "media/mp3", v23))).head
    assert((v23Out.width, v23Out.height, v23Out.n_frames) === ((44100, 2, 3)))
  }

  test("FlacCodec parses real STREAMINFO metadata through the batched decode path") {
    import spark.implicits._
    import MultimodalBatch.{Asset, FlacCodec}
    // synthesize a spec-true FLAC header in-test (xiph format spec):
    // fLaC marker + last-flag STREAMINFO (34 bytes) — 22050 Hz,
    // 2 channels, 16 bps, 44100 total samples -> 2000 ms
    val si = Array.fill[Byte](34)(0)
    val sr = 22050; val channels = 2; val bps = 16; val total = 44100L
    si(10) = (sr >> 12).toByte
    si(11) = ((sr >> 4) & 0xff).toByte
    si(12) = (((sr & 0xf) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)).toByte
    si(13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf)).toInt.toByte
    si(14) = ((total >> 24) & 0xff).toByte
    si(15) = ((total >> 16) & 0xff).toByte
    si(16) = ((total >> 8) & 0xff).toByte
    si(17) = (total & 0xff).toByte
    val flac = "fLaC".getBytes("ISO-8859-1") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si ++ Array.fill[Byte](16)(9)

    val assets = Seq(
      Asset(1L, "media/flac", flac),
      Asset(2L, "media/blob", "not flac".getBytes("UTF-8"))).toDS()
    val feats = MultimodalBatch.decodeFeatures(assets, FlacCodec)
      .collect().map(f => f.asset_id -> f).toMap
    val real = feats(1L)
    assert(real.width === 22050)
    assert(real.height === 2)
    assert(real.n_frames === 44100) // total PCM frames, WavCodec's convention
    assert(real.brightness_milli === 2000L) // duration ms, one division
    assert(real.byte_len === flac.length.toLong)
    // non-FLAC payloads and a truncated STREAMINFO fall back per-asset
    val blob = feats(2L)
    val stub = MultimodalBatch.FakeCodec.decode(
      Seq(Asset(2L, "media/blob", "not flac".getBytes("UTF-8")))).head
    assert(blob === stub)
    val torn = flac.take(20)
    val tornOut = FlacCodec.decode(Seq(Asset(4L, "media/flac", torn))).head
    assert(tornOut === MultimodalBatch.FakeCodec.decode(
      Seq(Asset(4L, "media/flac", torn))).head)
  }
}
