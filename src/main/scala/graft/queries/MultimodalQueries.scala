package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Layer F of SURVEY.md §2 (oracle-checkable part): binary-column
  * metadata extraction. The text payload is cast to `binary` and all
  * metadata (byte length, digest, deterministic fake decode dims) is
  * computed from it with native expressions — the column-level side of
  * the multimodal plumbing (the batched mapPartitions decode stub is
  * spec-gated in graft.multimodal). */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q28: binary payload metadata + deterministic fake decode. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .select(
        col("doc_id"),
        col("byte_len"),
        md5(col("text")).as("content_md5"),
        (col("byte_len") % 64 + 16).as("width"),
        (col("byte_len") * 7 % 64 + 16).as("height"),
        (col("byte_len") % 7 + 1).as("n_frames"),
        when(col("byte_len") % 3 === 0, "png")
          .when(col("byte_len") % 3 === 1, "jpg")
          .otherwise("webp").as("fmt"))
      .orderBy(col("doc_id"))

  val binaryMetaSql: String =
    """WITH b AS (SELECT doc_id, text,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      |  FROM documents)
      |SELECT doc_id, byte_len,
      |  md5(text) AS content_md5,
      |  byte_len % 64 + 16 AS width,
      |  byte_len * 7 % 64 + 16 AS height,
      |  byte_len % 7 + 1 AS n_frames,
      |  CASE WHEN byte_len % 3 = 0 THEN 'png'
      |       WHEN byte_len % 3 = 1 THEN 'jpg'
      |       ELSE 'webp' END AS fmt
      |FROM b ORDER BY doc_id""".stripMargin

  val SampleK = 4
  val FitBox = 224

  /** q97: the video path as pure column math — every asset emits
    * `min(k, n_frames)` frame rows at the uniform stride
    * `floor(i * n_frames / take)` (MultimodalBatch.sampleFrames'
    * sampler), each with the aspect-preserving fit into a 224x224 box
    * (resizeTo's integer formula) and a deterministic per-frame
    * brightness stub. The one→many frame explosion stays map-side
    * (sequence + explode, no shuffle, no UDF) — at 100 TB the frame
    * stream is embarrassingly parallel off the asset scan. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .withColumn("byte_len", length(col("text").cast("binary")).cast("long"))
      .select(col("doc_id"), col("byte_len"),
        (col("byte_len") % 64 + 16).as("width"),
        (col("byte_len") * 7 % 64 + 16).as("height"),
        (col("byte_len") % 7 + 1).as("n_frames"))
      .withColumn("take", least(lit(SampleK.toLong), col("n_frames")))
    val scaleNum = least(lit(FitBox) * col("height"), lit(FitBox) * col("width"))
    val scaleDen = col("width") * col("height")
    base
      .withColumn("i", explode(sequence(lit(0L), col("take") - 1)))
      .select(col("doc_id"), col("n_frames"),
        floor(col("i") * col("n_frames") / col("take")).as("frame_idx"),
        greatest(lit(1L), floor(col("width") * scaleNum / scaleDen)).as("out_w"),
        greatest(lit(1L), floor(col("height") * scaleNum / scaleDen)).as("out_h"))
      .withColumn("brightness_milli",
        (col("doc_id") * 31 + col("frame_idx") * 131) % 1000)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val frameSampleSql: String =
    s"""WITH b AS (SELECT doc_id,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
       |  FROM documents),
       |meta AS (SELECT doc_id, byte_len,
       |    byte_len % 64 + 16 AS width,
       |    byte_len * 7 % 64 + 16 AS height,
       |    byte_len % 7 + 1 AS n_frames,
       |    LEAST($SampleK, byte_len % 7 + 1) AS take
       |  FROM b),
       |fr AS (SELECT doc_id, n_frames, width, height, take,
       |    unnest(range(0, take)) AS i
       |  FROM meta)
       |SELECT doc_id, n_frames,
       |  (i * n_frames) // take AS frame_idx,
       |  GREATEST(1, (width * LEAST($FitBox * height, $FitBox * width)) // (width * height)) AS out_w,
       |  GREATEST(1, (height * LEAST($FitBox * height, $FitBox * width)) // (width * height)) AS out_h,
       |  (doc_id * 31 + (i * n_frames) // take * 131) % 1000 AS brightness_milli
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q28_binary_meta" -> (binaryMeta _),
    "q97_frame_sample" -> (frameSample _))
  val oracles: Map[String, String] = Map(
    "q28_binary_meta" -> binaryMetaSql,
    "q97_frame_sample" -> frameSampleSql)
}
