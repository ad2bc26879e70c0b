package graft

import org.apache.spark.sql.SparkSession

/** The one local-session recipe shared by the harness mains (Bench,
  * Verify, ScaleBench, CurationBench, ABBench).
  *
  * The bench must measure the same engine the oracle verifies and the
  * scale runner exercises: a conf that lives in only one main measures
  * a configuration the product path doesn't have (r16 shipped the AQE
  * shuffled-hash-join threshold in Bench alone; r17 hoists it here).
  * Callers layer their own sizing confs (shuffle partitions etc.) on
  * top of the returned builder — later `.config` calls win.
  */
object Sessions {
  /** Cores for local[] masters: the driver's scaling measurement sets
    * SPARK_GRAFT_CPUS (it re-runs the bench at a lower core count), so
    * a hard-coded master would ruin that measurement. */
  def cpus(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", default)

  def builder(defaultCpus: String = "4"): SparkSession.Builder = {
    val c = cpus(defaultCpus)
    SparkSession.builder()
      .master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", c)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE sort-merge -> shuffled-hash conversion (0 = off upstream):
      // fires only when every MEASURED post-shuffle build partition is
      // under the threshold, so a 100 TB build side keeps its
      // sort-merge plan; when it fires it removes both sides' sorts.
      // r16 ABBench (interleaved, min-of-3): 88.1 -> 85.8 s over the
      // 30 hottest queries; r17 full-sweep A/B at 32 cores, same box
      // back-to-back: 254.6 s (64m) vs 283.3 s (0) — the joins it
      // converts (q206/q207/q229/q233) account for most of the gap.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false")
  }
}
