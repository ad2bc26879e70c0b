package graft

import org.apache.spark.sql.SparkSession

/** Scale-trajectory bench: times a named query subset against a list
  * of scale directories (the ScaleUp outputs) and prints one JSON line
  * per directory — the raw numbers behind SURVEY §5's trajectory
  * table.
  *
  * Usage: runMain graft.ScaleBench <q1,q2,...> <dir1,dir2,...> [reps]
  * Timing = min over reps of a noop-sink materialization (same
  * convention as graft.Bench).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleBench <queries> <dirs> [reps]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dirs = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = Sessions.builder("32")
      // scale-correct shuffle sizing: let AQE pick per-stage
      // parallelism downward from a high initial count instead of
      // pinning 32 — at 64x data a fixed 32 makes every partition
      // sort/spill superlinearly (a real cluster sizes partitions to
      // the data, and AQE coalesces the small stages back to cheap)
      .config("spark.sql.shuffle.partitions", "512")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // local[32] wants finer post-coalesce grains than the 64 MB
      // cluster default: keeps window/sort stages at full parallelism
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // scale runs opt in to occupancy-driven SemDeDup cell refinement
    // (oracle-gate runs keep it off so a cap crossing fails loudly);
    // session-scoped conf, not a JVM-global property
    spark.conf.set(graft.operators.Similarity.AllowCellSplitConf, "true")
    // optional parquet staging (the production Dedup.stage form):
    // lets the ladder A/B localCheckpoint blocks vs on-disk staging
    sys.env.get("SPARK_GRAFT_STAGING_DIR").foreach { d =>
      spark.conf.set(graft.operators.Dedup.StagingDirConf, d)
    }
    // optional banded bounded-memory jaccard core (the x256 form:
    // sequential shingle bands trade wall-clock for bounded RAM)
    sys.env.get("SPARK_GRAFT_JACCARD_BANDS").foreach { n =>
      spark.conf.set(graft.operators.Dedup.JaccardBandsConf, n)
    }
    // optional candidate-generation override (on/off/auto) for the
    // prefix-filter A/B on flat vs Zipf rungs
    sys.env.get("SPARK_GRAFT_JACCARD_PREFIX").foreach { m =>
      spark.conf.set(graft.operators.Dedup.JaccardPrefixConf, m)
    }

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      t
    }

    dirs.foreach { dir =>
      val times = names.map { n =>
        val t = (1 to reps).map(_ => runOnce(n, dir)).min
        System.err.println(f"[scalebench] $dir $n: $t%.2f s")
        n -> t
      }
      val qs = times.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
      println(s"""{"dir":"$dir","queries":$qs,"total":${times.map(_._2).sum}}""")
    }
    spark.stop()
  }
}
