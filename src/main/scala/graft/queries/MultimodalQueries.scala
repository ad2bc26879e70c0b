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

  val queries: Map[String, Q] = Map("q28_binary_meta" -> (binaryMeta _))
  val oracles: Map[String, String] = Map("q28_binary_meta" -> binaryMetaSql)
}
