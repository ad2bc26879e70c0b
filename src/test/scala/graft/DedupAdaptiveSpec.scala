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

  test("footprint probe survives a file vanishing between planning and the probe") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // two-part parquet input: plan it, then delete one part underneath
    // the planned scan — a concurrent compaction's shape. The probe
    // must count the vanished file as 0, not fail the dispatch.
    val dir = java.nio.file.Files.createTempDirectory("probe_fnf").toString
    (1L to 1000L).toDF("v").repartition(2).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("v") > 0)
    val files = df.inputFiles
    assert(files.length === 2)
    // threshold 1 byte: with both parts present the probe sees bytes
    spark.conf.set(Dedup.StageMinInputBytesConf, "1")
    try {
      assert(Dedup.atScale(df))
      // vanish one part under the SAME plan (inputFiles already listed)
      val victim = new java.io.File(new java.net.URI(files.head))
      assert(victim.delete())
      // still no throw; the surviving part's bytes still clear 1 byte
      assert(Dedup.atScale(df))
      // vanish the second part too: footprint 0 < 1 -> small shape,
      // still no throw (inputFiles stays non-empty in the cached plan)
      val victim2 = new java.io.File(new java.net.URI(files(1)))
      assert(victim2.delete())
      assert(!Dedup.atScale(df),
        "a fully vanished input must probe as 0 bytes, not throw")
    } finally spark.conf.unset(Dedup.StageMinInputBytesConf)
  }

  test("state layer resolves hadoopConf from the default session off-thread") {
    // listeners/cleanup threads have no ACTIVE (thread-local) session;
    // the state layer must fall back to the JVM-global default session
    // rather than a bare Configuration (which would drop spark.hadoop.*)
    import graft.streaming.StreamingState
    val root = java.nio.file.Files.createTempDirectory("ss_offthread").toString
    import spark.implicits._
    Seq(1L, 2L).toDF("v").write.mode("overwrite")
      .parquet(StreamingState.batchDir(root, 0L))
    @volatile var got: Seq[Long] = null
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try {
        org.apache.spark.sql.SparkSession.clearActiveSession()
        got = StreamingState.batchIds(s"file:$root")
      } catch { case e: Throwable => err = e }
    })
    t.start(); t.join()
    assert(err === null, s"off-thread batchIds failed: $err")
    assert(got === Seq(0L))
  }
}
