package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.queries.CorpusOpsQueries

/** q255: the line-dedup minDf curve. Each arm is reconciled against
  * the SHIPPED operator run at that threshold — `Curation.lineDedup`
  * at minDf = d must report exactly the occurrences/chars the curve's
  * histogram arithmetic attributes to the arm, and the doc verdicts
  * (emptied / touched) must match the operator's per-doc accounting.
  * Plus the structural pins: every measure monotone non-increasing in
  * minDf, kept + removed chars invariant. */
class LineDfCurveSpec extends SparkSpec {

  test("every arm reconciles with Curation.lineDedup at that threshold") {
    val out = CorpusOpsQueries.lineDfCurve(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("min_df")).toSeq == CorpusOpsQueries.LineDfArms)
    val segs = split(regexp_replace(col("text"), " batch ", ". "), "\\. ")
    out.foreach { row =>
      val d = row.getAs[Long]("min_df")
      val led = Curation.lineDedup(Tables.documents(spark, sfDir),
        "doc_id", segs, ". ", minDf = d.toInt)
        .agg(sum(col("n_removed")).as("occ"),
          sum(col("chars_removed")).as("rem"),
          sum(col("kept_chars")).as("kept"),
          sum(when(col("kept_chars") === 0L, 1L).otherwise(0L)).as("emptied"),
          sum(when(col("n_removed") > 0L, 1L).otherwise(0L)).as("touched"))
        .head()
      assert(row.getAs[Long]("occ_removed") == led.getAs[Long]("occ"), s"occ @ $d")
      assert(row.getAs[Long]("chars_removed") == led.getAs[Long]("rem"), s"rem @ $d")
      assert(row.getAs[Long]("kept_chars") == led.getAs[Long]("kept"), s"kept @ $d")
      assert(row.getAs[Long]("docs_emptied") == led.getAs[Long]("emptied"), s"emptied @ $d")
      assert(row.getAs[Long]("docs_touched") == led.getAs[Long]("touched"), s"touched @ $d")
    }
    // monotone: raising the threshold only ever removes less
    out.sliding(2).foreach { case Array(a, b) =>
      Seq("n_boiler_segs", "occ_removed", "chars_removed",
        "docs_emptied", "docs_touched").foreach { c =>
        assert(a.getAs[Long](c) >= b.getAs[Long](c), c)
      }
      assert(a.getAs[Long]("kept_chars") + a.getAs[Long]("chars_removed") ==
        b.getAs[Long]("kept_chars") + b.getAs[Long]("chars_removed"))
    }
    // the curve moves at the gate corpus: df=2 actually removes text
    assert(out.head.getAs[Long]("chars_removed") > 0)
  }
}
