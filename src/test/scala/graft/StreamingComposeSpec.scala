package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Gazetteer
import graft.streaming.Streaming

/** Batch operators compose unchanged onto unbounded sources: the
  * gazetteer match stage (tokenize + broadcast join + aggregate) runs
  * identically under Structured Streaming — the property that makes
  * the engine's batch/streaming split a deployment choice, not two
  * code paths. */
class StreamingComposeSpec extends SparkSpec {

  test("gazetteer mention counting runs on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val mentions = Gazetteer.matches(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
    val q = mentions.writeStream.format("memory").queryName("gaz_stream")
      .outputMode("update").start()
    try {
      input.addData((1L, "the spark join runs fast"), (2L, "no keywords here at all"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, keyword, score_milli FROM gaz_stream ORDER BY doc_id, keyword")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // doc 1: 'fast' (chars [20,24)) is inside the +-48-char admin
      // window of both matches: join 900+400+600, spark 950+400+600
      assert(rows.toSeq == Seq((1L, "join", 1900L), (1L, "spark", 1950L)))
    } finally q.stop()
  }

  test("city-mention rollup aggregation runs on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // the q63 shape: matchDetails -> per-(doc, label) aggregation with
    // collect_set sources; update mode re-emits groups as they grow
    val m = Gazetteer.matchDetails(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
      .withColumn("method", when(col("n_toks") > 1, "pattern").otherwise("automaton"))
    val rollup = m.groupBy(col("doc_id"), col("keyword"))
      .agg(count(lit(1)).as("occurrences"),
        array_join(array_sort(collect_set(col("method"))), ",").as("sources"))
    val q = rollup.writeStream.format("memory").queryName("rollup_stream")
      .outputMode("update").start()
    try {
      input.addData((1L, "spark hash join on the spark table"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT keyword, occurrences, sources FROM rollup_stream ORDER BY keyword")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      // "hash join" matches the 2-token variant (pattern) AND its parts
      assert(rows.toSeq == Seq(
        ("hash", 1L, "automaton"),
        ("hash join", 1L, "pattern"),
        ("join", 1L, "automaton"),
        ("spark", 2L, "automaton"),
        ("table", 1L, "automaton")))
    } finally q.stop()
  }

  test("streaming packer matches the batch sequence-pack layout across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Streaming.PackDoc(1L, "s", 4L), Streaming.PackDoc(2L, "s", 7L),
      Streaming.PackDoc(3L, "s", 2L), Streaming.PackDoc(4L, "t", 3L),
      Streaming.PackDoc(5L, "s", 6L), Streaming.PackDoc(6L, "t", 9L))
    val input = MemoryStream[Streaming.PackDoc]
    val q = Streaming.packStream(input.toDS(), ctxLen = 8)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    try {
      input.addData(docs.take(4): _*) // ids 1-4
      q.processAllAvailable()
      input.addData(docs.drop(4): _*) // ids 5-6: state carries the offsets
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, seq_id, offset_in_seq, straddles FROM pack_stream ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
      val batchDf = docs.map(d => (d.doc_id, d.source, (1L to d.n_tokens).map(_ => "w").mkString(" ")))
        .toDF("doc_id", "source", "text")
      val batch = graft.operators.Curation.sequencePack(batchDf, "text", "doc_id", "source", 8)
        .orderBy(col("doc_id"))
        .select("doc_id", "seq_id", "offset_in_seq", "straddles")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
