package graft

import graft.operators.Dedup
import graft.queries.DedupQueries

/** The jaccard/containment core picks its physical shape by input
  * size (dictionary-encoded sid keys + staged size-join at scale,
  * string keys + lazy join below threshold). Both shapes must produce
  * IDENTICAL rows — this spec forces the at-scale shape via the conf
  * override and compares against the default small-corpus shape on
  * the real test tables. */
class DedupAdaptiveSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("at-scale shape (sid keys, staged joins) emits identical rows to the small shape") {
    for (q <- Seq("q22_ngram_jaccard", "q195_containment", "q67_dedup_clusters")) {
      val small = rows(q)
      spark.conf.set(Dedup.StageMinInputBytesConf, "0")
      try {
        val large = rows(q)
        assert(large === small, q)
      } finally spark.conf.unset(Dedup.StageMinInputBytesConf)
    }
  }

  test("the scale threshold routes the real corpora as designed") {
    // sf0.001/sf0.01/sf0.1 documents are all under the threshold (the
    // small shape is the measured win there); the threshold constant
    // sits between the x4 and x16 trajectory corpora
    val f = new java.io.File("/root/testdata/sf0.1/documents.parquet")
    val sf01 =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).sum
      else f.length
    assert(sf01 < Dedup.StageMinInputBytes)
    assert(DedupQueries.JaccardDfCap > 0) // anchor: cap still active in both shapes
  }
}
