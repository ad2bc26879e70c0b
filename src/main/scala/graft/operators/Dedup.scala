package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.TextFunctions._

/** The deduplication family for LLM-training-data pipelines, all
  * expressed as shuffle-bounded joins/aggregations (never O(n^2) over
  * the corpus):
  *
  *  - exact: content-hash groupBy (the scalable form of the reference's
  *    unique (portal_name, url) ingest index, article_indexes.py:13)
  *  - n-gram Jaccard: shingle inverted-index self-join; candidate work
  *    is Sum(df(shingle)^2), bounded by a document-frequency cap that
  *    drops non-discriminative shingles (they cannot identify near-dups
  *    anyway) — the standard skew kill at 100 TB
  *  - MinHash+LSH: K portable seeded poly-hashes -> banded signatures
  *    -> bucket join; only bucket collisions are compared
  *  - SimHash: one portable hash per token, 16 bit-votes, banded bucket
  *    join + hamming filter via bit_count(xor)
  *
  * Pipelines should run `exact` first and near-dup detection on the
  * surviving representatives — that is how these operators are wired in
  * DedupQueries.
  */
object Dedup {

  /** Spark conf key: when set to a directory, self-join inputs are
    * staged as parquet there instead of localCheckpoint. */
  val StagingDirConf = "spark.graft.stagingDir"

  /** Materialization point for DataFrames feeding multiple consumers
    * (self-join sides + size aggregates): plan reuse does not fire
    * across joins, so without this the tokenize/explode pipeline runs
    * once per consumer.
    *
    *  - default: `localCheckpoint` — fast, executor-local, NOT
    *    fault-tolerant (a lost executor loses its partitions and fails
    *    the job at 1000-node scale);
    *  - with `spark.graft.stagingDir` set: a staging parquet write +
    *    read-back — the reliable production form (any executor can
    *    re-read lost partitions from shared storage). */
  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(StagingDirConf) match {
      case Some(dir) =>
        val path = s"$dir/stage_${java.util.UUID.randomUUID()}"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint(false)
    }
  }

  /** Exact dedup: keep the smallest id per content hash. Min-agg +
    * join-back rather than a min-over-window: WindowExec sorts every
    * partition by the key even with no ORDER BY, and that corpus-wide
    * sort is the spill driver at 64x scale — two hash shuffles on the
    * same key are strictly cheaper and AQE-skew-aware. Same rows. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("content_key", md5(col(textCol)))
    val keep = hashed.groupBy(col("content_key"))
      .agg(min(col(idCol)).as("keep_id"))
      .withColumnRenamed("content_key", "__ck")
    // null-SAFE key equality: md5(NULL text) is NULL, and a plain
    // equi-join would silently drop every NULL-text row — <=> groups
    // them into one content class (keep one row per id-min), matching
    // the min-over-window form this replaced. EqualNullSafe on the
    // sole key still plans as a hash join.
    hashed.join(keep, col("content_key") <=> col("__ck"))
      .filter(col(idCol) === col("keep_id"))
      .select(df.columns.map(col) :+ col("content_key"): _*)
  }

  /** Distinct (id, shingle) pairs of `n`-token shingles over folded
    * text. The shingle list is built BEFORE an OUTER explode (fewer-
    * than-n-token docs yield null, dropped by a filter on the
    * generated attribute), so no `isnotnull`/`size>0` predicate is
    * inferred on the fold chain and nothing expensive is pushed into
    * the scan filter (see q43's identical guard). */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol), tokens(fold(col(textCol))).as("toks"))
      // native one-pass shingle builder (the former transform/concat_ws
      // lambda was CodegenFallback — interpreted per row under every
      // dedup-family corpus scan); fewer-than-n-token docs yield an
      // empty array, whose outer explode emits one null row, dropped
      .select(col(idCol),
        explode_outer(graft.functions.GraftFunctions.tokenShingles(col("toks"), n)).as("shingle"))
      .filter(col("shingle").isNotNull)
      .distinct()

  /** Near-dup pairs by n-gram Jaccard via inverted-index join.
    * The >=0.5 threshold is the integer predicate 2*|A∩B| >= |A∪B| — no
    * float in the filter. `dfCap` drops shingles seen in more docs. */
  /** df-cap as hash-agg + inner join (NOT a count-over-window: the
    * window sorts the whole exploded shingle table by key, which is
    * the spill driver at 64x — see [[exact]]). At scale the surviving shingles
    * are simultaneously DICTIONARY-ENCODED to a dense long id
    * (`monotonically_increasing_id` on the df dim — no sort, so the
    * encode step stays corpus-scale-safe), so every downstream
    * shuffle/join/probe keys on 8-byte longs instead of ~26-byte
    * shingle strings; below [[StageMinInputBytes]] the encode join
    * costs more than it saves and a plain semi-join keeps the string
    * key. Bijective shingle↔sid, identical result rows either way. */
  private def dfCapped(sh: DataFrame, cap: Int, encode: Boolean,
      keepDf: Boolean = false): DataFrame = {
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap)
    val extra = if (keepDf) Seq(col("df")) else Seq.empty
    if (encode) {
      val dict = df.select((Seq(col("shingle"),
        monotonically_increasing_id().as("sid")) ++ extra): _*)
      sh.join(dict, Seq("shingle"))
        .select(sh.columns.filter(_ != "shingle").map(col) ++
          (col("sid") +: extra): _*)
    } else if (keepDf) sh.join(df, Seq("shingle"))
    else sh.join(df.select(col("shingle")), Seq("shingle"), "left_semi")
  }

  /** Staged (id, join-key, set_size) rows for the inverted-index
    * self-join: the shingle set is materialized once (it feeds the
    * size aggregate plus both join sides, and plan reuse does not fire
    * across joins), and per-doc set sizes are CARRIED THROUGH the join
    * rather than joined back afterwards — the candidate-pair aggregate
    * is ~30% of corpus² on a dense corpus and almost all of it dies on
    * the threshold filter, so re-shuffling it twice against a
    * corpus-sized `sizes` table (which is NOT broadcastable at real
    * scale) was the 64x spill driver. min(size) inside the aggregate
    * recovers the per-doc constant exactly. The size-carrying join is
    * itself corpus-sized, and BOTH self-join sides consume it — so it
    * is staged too (plan reuse does not fire across self-join sides;
    * unstaged, the x16 trajectory re-ran the whole doc_id shuffle join
    * twice and measured 2x slower than the shape it replaced) — but
    * only past [[StageMinInputBytes]] of scan input: materialization
    * has a fixed I/O cost that a small corpus never earns back (the
    * sf0.1 sweep measured 2.3x slower always-staged, the x16/x64
    * trajectory 2x slower never-staged; re-reading the small staged
    * `enc` twice is cheap, so the second stage is the only adaptive
    * one). The size probe reads the plan's parquet file footprint —
    * the same signal a cost-based optimizer keys broadcast decisions
    * on. */
  val StageMinInputBytes: Long = 8L << 20

  /** Spark conf key overriding [[StageMinInputBytes]] (0 forces the
    * at-scale shape everywhere — used by specs to gate both paths). */
  val StageMinInputBytesConf = "spark.graft.stageMinInputBytes"

  /** Scan-input footprint via the Hadoop FileSystem API resolved from
    * each file's own scheme — NOT `java.io.File`, which returns length
    * 0 for every `hdfs://`/`s3a://` URI and would dispatch a 100 TB
    * input to the small-corpus staging shape. */
  private def inputBytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val files = df.inputFiles.map(new org.apache.hadoop.fs.Path(_))
    // One listStatus per distinct parent dir instead of one
    // getFileStatus RPC per file — object-store listings are cheap and
    // batched where per-file HEADs are not. A file that vanished
    // between planning and the probe (concurrent compaction) counts as
    // 0, it must not fail the dispatch.
    files.groupBy(_.getParent).iterator.map { case (dir, children) =>
      val want = children.map(_.getName).toSet
      try {
        dir.getFileSystem(conf).listStatus(dir).iterator
          .filter(s => want(s.getPath.getName)).map(_.getLen).sum
      } catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
  }

  /** The footprint-keyed shape decision, exposed for call sites that
    * must make a staging choice of their own consistent with
    * [[sizedKeyed]]'s (e.g. whether to stage a shingle stream shared
    * across consumers: staging wins below the threshold where the
    * blocks are RAM-cheap, and loses past it where the checkpoint
    * blocks compete with the candidate-pair shuffle for memory —
    * q128 x16 measured 56s staged vs 33s recomputed). A scan-less
    * plan has an UNKNOWN footprint, not a zero one → at-scale. */
  def atScale(probe: DataFrame): Boolean = {
    val thr = probe.sparkSession.conf.getOption(StageMinInputBytesConf)
      .map(_.toLong).getOrElse(StageMinInputBytes)
    probe.inputFiles.isEmpty || inputBytes(probe) >= thr
  }

  /** Spread a SMALL scan across the cluster before per-row-EXPENSIVE
    * work (regex cascades, timestamp parsing, tokenization, codec
    * decode). A parquet scan parallelizes at ROW-GROUP granularity:
    * a table written as one file with one row group scans as ONE task
    * no matter how many cores the cluster has, so an expensive map
    * chain rooted directly on it serializes on one core while the
    * rest idle (measured fleet-wide by `graft.StageScan`: the
    * single-task scan stage is 90-100% of executor time for the
    * map-shaped queries at gate scale). One round-robin exchange of
    * the (projected — project BEFORE calling this) input unlocks full
    * parallelism.
    *
    * SCALE-ADAPTIVE, not a local-mode constant: the estimated scan
    * split count (bytes + per-file open cost over
    * `spark.sql.files.maxPartitionBytes` — the same arithmetic
    * FilePartition packing uses) is compared to the cluster's
    * default parallelism; an input that already yields >= cores
    * splits returns UNCHANGED, so at 100 TB (many multi-row-group
    * files) this is a no-op and no repartition of a big input can
    * ever be introduced by it. A scan-less input (staged/checkpointed
    * upstream) is already partitioned by its producing shuffle and
    * also returns unchanged. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // kill switch for in-JVM A/B measurement (ABBench interleaves arms
    // with this conf); shipped default is enabled
    if (!spark.conf.getOption("spark.graft.spread.enabled").forall(_.toBoolean))
      return df
    val files = df.inputFiles
    if (files.isEmpty) return df
    val cores = spark.sparkContext.defaultParallelism
    def bytesConf(key: String, dflt: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.getOption(key).getOrElse(dflt))
    val maxSplit = math.max(1L, bytesConf("spark.sql.files.maxPartitionBytes", "128m"))
    val openCost = bytesConf("spark.sql.files.openCostInBytes", "4m")
    val bytes = inputBytes(df)
    val splits = (bytes + openCost * files.length + maxSplit - 1) / maxSplit
    if (splits >= cores) df else df.repartition(cores)
  }

  private def sizedKeyed(sh: DataFrame, idCol: String, dfCap: Option[Int],
      probeFrom: Option[DataFrame] = None): (DataFrame, String) = {
    // `probeFrom`: the file-backed frame to read the footprint from
    // when `sh` itself is staged (a checkpointed plan exposes no input
    // files). Without a probe, a scan-less plan has an UNKNOWN
    // footprint, not a zero one — default to the at-scale shape (both
    // paths are spec-pinned row-identical; guessing small on a big
    // staged input cost 5x on the x16 ladder, see q128/q180)
    val large = atScale(probeFrom.getOrElse(sh))
    val (plan, key) = dfCap match {
      case Some(cap) => (dfCapped(sh, cap, encode = large), if (large) "sid" else "shingle")
      case None => (sh, "shingle")
    }
    val enc = stage(plan)
    val sizes = enc.groupBy(col(idCol)).agg(count(lit(1)).as("set_size"))
    val withSize = enc.join(sizes, Seq(idCol))
    (if (large) stage(withSize) else withSize, key)
  }

  /** Spark conf key: when set to an int > 1, [[jaccardPairs]] runs the
    * BANDED bounded-memory formulation with that many sequential
    * shingle bands (see [[jaccardPairsBanded]]). `auto` sizes the
    * band count from the measured post-cap join volume (Σdf² — the
    * same probe the prefix dispatch reads, one aggregate per (input,
    * cap) per JVM): corpora whose one-pass candidate shuffle would
    * exceed the effective per-pass budget ([[autoBandVolume]]: the
    * [[AutoBandVolumeConf]] override or the heap-derived default)
    * take ceil(vol / budget) bands, everything smaller keeps its
    * established one-pass shape. DEFAULT `auto` (the jaccardPrefix
    * precedent: measured dispatch over magic constants) — the probe
    * only runs at scale, so gate corpora keep their one-pass plan
    * without paying it; set 1 to force one-pass for an A/B.
    * ScaleBench exposes it via SPARK_GRAFT_JACCARD_BANDS for the
    * trajectory rungs where the one-pass candidate shuffle exceeds
    * single-box RAM. */
  val JaccardBandsConf = "spark.graft.jaccardBands"

  /** Measured shuffle+sort footprint of ONE candidate pair row through
    * the inverted-join/agg machinery, the constant behind the derived
    * per-pass budget: the r14 zipf-rung calibration (SURVEY §5) put the
    * comfortable per-pass budget at 1.5e8 candidates on a 100 GiB-heap
    * JVM — x64 (vol 1.34e8) ran one-pass in 45 s while x256 (8.89e8)
    * thrashed at 272.5 s and recovered banded at ~1.1e8/pass — i.e.
    * ~700 bytes of per-candidate working set. */
  val AutoBandBytesPerCandidate = 700L

  /** The measured r14 calibration constant (1.5e8 comfortable
    * candidates per pass on the 100 GiB-heap calibration JVM) — the
    * CLUSTER-mode floor of the derived budget: outside local mode
    * `Runtime.maxMemory` is the DRIVER heap, which says nothing about
    * executor-side shuffle room, and a default ~1 GiB driver would
    * derive a ~1.5e6 budget that silently flips at-scale corpora into
    * the sequential banded path. */
  val ClusterBudgetFloor = 150_000_000L

  /** Per-pass candidate-volume budget of the `auto` banding dispatch
    * (post-cap Σdf², an upper bound on candidate pair rows entering
    * one join pass), overridable via [[AutoBandVolumeConf]]. The
    * default DERIVES from this JVM's heap (maxMemory /
    * [[AutoBandBytesPerCandidate]]) — the budget is per-PASS shuffle
    * volume, so it scales with the memory actually available to hold
    * a pass, which is the knob's documented contract (a real cluster
    * with more aggregate shuffle room raises it proportionally, and a
    * smaller box bands sooner). On the calibration box (100 GiB-heap
    * scale JVMs) the derivation lands at ~1.53e8 — within 2% of the
    * hand constant it replaces, so every measured rung verdict is
    * unchanged: zipf x64 (vol 1.34e8) stays one-pass, zipf x256
    * (8.89e8) stays 6 bands, flat x64 (3.54e9) stays at the cap.
    *
    * The heap derivation is a SINGLE-BOX calibration (in local mode
    * driver heap == executor heap). Outside local mode it is floored
    * at [[ClusterBudgetFloor]] — see [[autoBandVolumeFor]] — and a
    * real deployment should set [[AutoBandVolumeConf]] from its
    * aggregate executor shuffle memory. */
  def autoBandVolumeDefault: Long = {
    val heapDerived =
      math.max(1_000_000L, Runtime.getRuntime.maxMemory() / AutoBandBytesPerCandidate)
    val isLocal = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .forall(_.sparkContext.isLocal)
    autoBandVolumeFor(isLocal, heapDerived)
  }

  /** The mode-keyed default (pure, spec-pinned): local mode trusts the
    * heap derivation (driver == executor); cluster mode floors it at
    * the measured [[ClusterBudgetFloor]] so a small driver heap cannot
    * under-budget executor-side passes. */
  private[graft] def autoBandVolumeFor(isLocal: Boolean, heapDerived: Long): Long =
    if (isLocal) heapDerived else math.max(ClusterBudgetFloor, heapDerived)

  val AutoBandVolumeConf = "spark.graft.jaccardAutoBandVolume"

  /** The effective budget: the conf override (validated — 0 or a
    * negative count would divide-by-zero or nonsense the band sizing)
    * or the heap-derived default. */
  def autoBandVolume(conf: org.apache.spark.sql.RuntimeConfig): Long = {
    val b = conf.getOption(AutoBandVolumeConf).map { s =>
      val v = try s.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$AutoBandVolumeConf='$s' — must be a positive candidate count")
      }
      require(v > 0, s"$AutoBandVolumeConf must be a positive candidate count, got $v")
      v
    }.getOrElse(autoBandVolumeDefault)
    b
  }

  /** Band-count ceiling for `auto` — MEASURED, not cosmetic (flat
    * x256, SURVEY §5 r15): phase-1 partials hold one row per
    * candidate pair PER BAND it co-occurs in, i.e. min(shared
    * shingles, N) rows per pair, so on heavy-overlap corpora the
    * staged partial footprint grows ~linearly with N — at the r15
    * rung bands=16 completes (1597.8 s) while bands=32 and the
    * cap-lifted ceil(vol/budget)=94 both exhausted a 66 GB scratch
    * disk mid-phase-1 (the 94-band run staged 65 GB of partials
    * before dying). A corpus needing more than 16 bands at the
    * derived budget needs more AGGREGATE memory and disk — raise the
    * budget with real cluster shuffle room (the documented contract),
    * don't stack passes on one box. */
  val MaxAutoBands = 16

  /** Spark conf key selecting the candidate-generation strategy:
    * "auto" (default — df-shape-keyed dispatch at scale), "on"
    * (force the prefix-filtered path), "off" (force the plain
    * inverted join). See [[jaccardPairsPrefix]]. A forced mode is an
    * A/B guarantee: it bypasses the auto banding dispatch (explicit
    * [[JaccardBandsConf]] values still win — they return before the
    * prefix choice is read) and skips the df-shape probe, so a forced
    * run pays no corpus-wide aggregate it never reads. */
  val JaccardPrefixConf = "spark.graft.jaccardPrefix"

  /** The df-shape dispatch signal (see [[jaccardPairs]]): the prefix
    * path wins when the join volume is NOT concentrated in
    * high-df shingles — on the Zipf x16 rung shingles with df >
    * [[HeavyDf]] carry <1% of Σdf² and the prefix filter cut
    * candidates 2700x; on the flat rung they carry ~100% and
    * verification expansion dwarfs the savings (both measured,
    * SURVEY §5). */
  val HeavyDf = 64

  /** Memo for the auto-dispatch df-shape probe: the probe is an eager
    * corpus-wide aggregation over the shingle stream, and callers like
    * CurationPipeline invoke [[jaccardPairs]] more than once per job
    * on the SAME logical input — keyed by (analyzed-plan semantic
    * hash, cap) so each (input, cap) pays the probe once per JVM.
    * The cached value is the raw (Σdf² join volume, heavy-df share)
    * pair, shared by BOTH auto dispatches (banding and prefix).
    * Cleared wholesale past a small bound (the key space is one entry
    * per distinct corpus plan — a handful in any real job). */
  private val dispatchCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), (Long, Long)]()

  // test hooks: the probe-skip contract for forced modes is only
  // observable through the memo (the probe is otherwise side-effect-free)
  private[graft] def clearDispatchCache(): Unit = dispatchCache.clear()
  private[graft] def dispatchCacheSize: Int = dispatchCache.size

  /** The memoized df-shape probe behind the auto dispatches: post-cap
    * Σdf² (an upper bound on one-pass candidate pair rows) and the
    * share of it carried by heavy (df > [[HeavyDf]]) shingles.
    * The probe runs OUTSIDE the map (get → run → putIfAbsent):
    * a Spark action inside computeIfAbsent would hold the bin
    * lock for the whole query, blocking unrelated probes that
    * hash into it. Two threads racing the same key at most run
    * the probe twice — same numbers, no lock convoy. Staleness:
    * the key is the ANALYZED plan's semantic hash, so a path
    * re-read after an append reuses the old numbers for the
    * rest of the JVM — acceptable for a shape heuristic whose
    * every outcome is row-identical. */
  private def dfShapeProbe(sh: DataFrame, cap: Int): (Long, Long) = {
    if (dispatchCache.size > 64) dispatchCache.clear()
    val key = (sh.queryExecution.analyzed.semanticHash(), cap)
    Option(dispatchCache.get(key)).getOrElse {
      val r = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap)
        .agg(sum(col("df") * col("df")).as("vol"),
          sum(when(col("df") > HeavyDf, col("df") * col("df"))
            .otherwise(0L)).as("heavy")).first()
      val probed = if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
      dispatchCache.putIfAbsent(key, probed)
      probed
    }
  }

  /** The default Jaccard gate (t = 0.5) as an e6-scaled integer — the
    * threshold every call site used before `thrE6` was a parameter. */
  val JaccardThrE6Default = 500000L

  /** Integer threshold predicate J >= t: 1e6·inter >= thrE6·union —
    * exact (no float), and at the 500000 default identical to the
    * historical `2·inter >= union`. */
  private def jaccardGate(thrE6: Long) =
    col("intersect_n") * 1000000L >= col("union_n") * thrE6

  /** Jaccard LENGTH bound for threshold t: J >= t and |A∩B| <= min
    * imply min >= t·max (t = 0.5 ⟹ the historical 2·min >= max) —
    * the prefix-filter lemma's size bound, sound for any t in (0,1]. */
  private def lengthGate(thrE6: Long, sizeA: Column, sizeB: Column) =
    least(sizeA, sizeB) * 1000000L >= greatest(sizeA, sizeB) * thrE6

  private def requireThr(thrE6: Long): Unit =
    require(thrE6 > 0L && thrE6 <= 1000000L,
      s"jaccard thrE6 must be in (0, 1000000], got $thrE6")

  def jaccardPairs(sh: DataFrame, idCol: String, dfCap: Option[Int] = None,
      probeFrom: Option[DataFrame] = None,
      thrE6: Long = JaccardThrE6Default): DataFrame = {
    requireThr(thrE6)
    val conf = sh.sparkSession.conf
    val bandsMode = conf.getOption(JaccardBandsConf).getOrElse("auto")
    // parse once, loudly: anything but `auto` or a positive int is a
    // configuration error, not a NumberFormatException from a guard
    val explicitBands: Option[Int] = bandsMode match {
      case "auto" => None
      case s =>
        val n = try s.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$JaccardBandsConf='$s' — legal values: 'auto' or a positive band count")
        }
        require(n >= 1,
          s"$JaccardBandsConf must be 'auto' or a positive band count, got $n")
        Some(n)
    }
    explicitBands match {
      case Some(n) if n > 1 =>
        return jaccardPairsBanded(sh, idCol, dfCap, n, probeFrom, thrE6)
      case _ =>
    }
    val prefixMode = conf.getOption(JaccardPrefixConf).getOrElse("auto")
    require(prefixMode == "auto" || prefixMode == "on" || prefixMode == "off",
      s"$JaccardPrefixConf='$prefixMode' — legal values: auto | on | off")
    // A/B-forcing contract: a FORCED prefix mode (on/off) guarantees
    // that candidate-generation path — auto banding steps aside and
    // the df-shape probe (an eager corpus-wide aggregate the forced
    // run never reads) is skipped entirely. Likewise bands=1 forces
    // one-pass; only the prefix on/off choice may still need the probe.
    val prefixForced = prefixMode != "auto"
    // auto dispatches: only pay the df-shape probe at scale (below the
    // staging threshold the whole query is sub-second in every shape,
    // and the gate corpora keep their established plan); the probe
    // reads the df dim the cap computes anyway, and its numbers are
    // memoized per (input plan, cap) and shared by both verdicts
    val probe: Option[(Long, Long)] =
      if (!prefixForced && dfCap.isDefined && atScale(probeFrom.getOrElse(sh)))
        Some(dfShapeProbe(sh, dfCap.get))
      else None
    if (explicitBands.isEmpty && !prefixForced) {
      // banding preempts the prefix dispatch: at the rung where the
      // one-pass candidate volume exceeds the budget, bands beat BOTH
      // one-pass shapes on wall-clock AND scratch (zipf x256: 181.7 s
      // banded vs 272.5 s one-pass — SURVEY §5 r14), while below it
      // the ~N-pass cost never pays back
      val budget = autoBandVolume(conf)
      probe match {
        case Some((vol, _)) if vol > budget =>
          val n = math.min(MaxAutoBands.toLong,
            (vol + budget - 1) / budget).toInt
          return jaccardPairsBanded(sh, idCol, dfCap, math.max(2, n), probeFrom, thrE6)
        case _ =>
      }
    }
    val usePrefix = prefixMode match {
      case "on" => true
      case "off" => false
      case _ =>
        // prefix wins when the join volume is NOT concentrated in
        // heavy shingles (see HeavyDf)
        probe.exists { case (vol, heavy) => vol > 0L && heavy * 2 < vol }
    }
    if (usePrefix) return jaccardPairsPrefix(sh, idCol, dfCap, probeFrom, thrE6)
    val (withSize, key) = sizedKeyed(sh, idCol, dfCap, probeFrom)
    val a = withSize.select(col(idCol).as("doc_a"), col(key), col("set_size").as("size_a"))
    val b = withSize.select(col(idCol).as("doc_b"), col(key), col("set_size").as("size_b"))
    a.join(b, Seq(key))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("intersect_n"),
        min(col("size_a")).as("size_a"), min(col("size_b")).as("size_b"))
      .withColumn("union_n", col("size_a") + col("size_b") - col("intersect_n"))
      .filter(jaccardGate(thrE6))
      .withColumn("jaccard_e6",
        round(lit(1000000.0) *
          (col("intersect_n").cast("double") / col("union_n").cast("double"))).cast("long"))
  }

  /** PPJoin-style PREFIX-FILTERED exact Jaccard (Bayardo et al. WWW'07,
    * Xiao et al. WWW'08) — the candidate-generation upgrade for
    * natural-Zipf corpora: order each document's shingles RAREST-FIRST
    * (df asc, key asc — a per-doc window, bounded by document length)
    * and join only the first ⌊|A|/2⌋+1 of each set. Soundness for
    * t = 0.5 is the prefix-filter lemma: J ≥ 0.5 ⟹ |A∩B| ≥ ⌈|A|/2⌉,
    * and two sets intersecting that much must share an element inside
    * both (|X| − α + 1)-prefixes; the 2·min ≥ max length filter is the
    * same bound on sizes. Surviving candidates are verified EXACTLY:
    * the pair list joins back to both full shingle sets and the true
    * |A∩B| is recounted — so the output is row-identical to
    * [[jaccardPairs]] (spec-pinned).
    *
    * When it wins and when it loses (both measured on x16 rungs,
    * SURVEY §5): on a Zipfian corpus the rare-first prefixes almost
    * never collide — candidates fell 5.8M → 2.1k and the verification
    * expansion is trivial; on the FLAT template corpus every shingle
    * is common, prefixes still collide ~63M times and verification
    * re-expands 12B rows — worse than the plain inverted join. Hence
    * the df-shape dispatch in [[jaccardPairs]] rather than an
    * unconditional switch. */
  def jaccardPairsPrefix(sh: DataFrame, idCol: String, dfCap: Option[Int] = None,
      probeFrom: Option[DataFrame] = None,
      thrE6: Long = JaccardThrE6Default): DataFrame = {
    requireThr(thrE6)
    val large = atScale(probeFrom.getOrElse(sh))
    val cap = dfCap.getOrElse(Int.MaxValue)
    val key = if (large) "sid" else "shingle"
    val enc = stage(dfCapped(sh, cap, encode = large, keepDf = true))
    val sizes = enc.groupBy(col(idCol)).agg(count(lit(1)).as("set_size"))
    val withSize0 = enc.join(sizes, Seq(idCol))
    val withSize = if (large) stage(withSize0) else withSize0
    val w = Window.partitionBy(col(idCol)).orderBy(col("df"), col(key))
    // Bayardo prefix length at threshold t: |x| - ceil(t·|x|) + 1
    // (t = 0.5 ⟹ the historical `set_size div 2 + 1`); ceil of the
    // e6-scaled product as exact integer arithmetic
    val pref = withSize.withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        expr(s"set_size - ((set_size * $thrE6 + 999999) div 1000000) + 1"))
      .select(col(idCol), col(key), col("set_size"))
    val a = pref.select(col(idCol).as("doc_a"), col(key), col("set_size").as("size_a"))
    val b = pref.select(col(idCol).as("doc_b"), col(key), col("set_size").as("size_b"))
    val cand = a.join(b, Seq(key))
      .filter(col("doc_a") < col("doc_b") &&
        lengthGate(thrE6, col("size_a"), col("size_b")))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("size_a")).as("size_a"), min(col("size_b")).as("size_b"))
    val candS = stage(cand)
    val fullA = withSize.select(col(idCol).as("doc_a"), col(key))
    val fullB = withSize.select(col(idCol).as("doc_b"), col(key))
    candS.join(fullA, Seq("doc_a"))
      .join(fullB, Seq("doc_b", key))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("intersect_n"),
        min(col("size_a")).as("size_a"), min(col("size_b")).as("size_b"))
      .withColumn("union_n", col("size_a") + col("size_b") - col("intersect_n"))
      .filter(jaccardGate(thrE6))
      .withColumn("jaccard_e6",
        round(lit(1000000.0) *
          (col("intersect_n").cast("double") / col("union_n").cast("double"))).cast("long"))
  }

  /** Spark conf key: the UNMERGED phase-1 partial-byte threshold that
    * triggers an incremental band-merge fold in [[jaccardPairsBanded]]
    * (`off` disables the merge — the pre-r16 accumulate-all-bands
    * behavior; `0` folds after every band — the spec mode). The fold
    * rewrites the running accumulator once per trigger, so the
    * threshold trades fold I/O (each fold re-reads + re-writes
    * O(distinct pairs)) against peak scratch (acc + threshold + one
    * band): corpora whose total partial volume never reaches it (the
    * zipf rungs) pay ZERO folds.
    *
    * DEFAULT: free scratch at the staging root / 6, floored at 1 GiB
    * ([[JaccardMergeBytesFallback]] when free is unknowable) — fold
    * only as hard as the disk actually demands. Measured at flat x256
    * /16 bands: a fixed 4 GiB threshold folded ~13 times and paid
    * 1.5x wall (2232.9 s vs the 1261.8 s no-merge min) for a 34 GB
    * peak; the disk-derived ~11 GB threshold folds ~4 times — most
    * of the disk win at a fraction of the fold I/O. A box with
    * plentiful scratch correctly folds never. */
  val JaccardMergeBytesConf = "spark.graft.jaccardMergeBytes"

  /** Fallback fold threshold when free scratch is unknowable (a
    * non-local staging scheme with no [[JaccardScratchBytesConf]]
    * override): 4 GiB — conservative, folds early. */
  val JaccardMergeBytesFallback = 4L << 30

  /** Free-scratch divisor of the derived default: peak scratch is
    * ~2 x accumulator + threshold + one band + live shuffle, so the
    * threshold takes 1/6 of free and leaves the rest for the terms
    * the operator cannot bound a priori. */
  val JaccardMergeFreeDivisor = 6L

  /** Free scratch at `root`: the conf override (also the knob for
    * schemes whose capacity the driver cannot stat), else
    * `getUsableSpace` for local paths, else -1 (unknown). */
  def scratchBytes(conf: org.apache.spark.sql.RuntimeConfig,
      root: String): Long =
    conf.getOption(JaccardScratchBytesConf).map(_.trim.toLong).getOrElse {
      val uri = new org.apache.hadoop.fs.Path(root).toUri
      if (uri.getScheme == null || uri.getScheme == "file")
        new java.io.File(uri.getPath).getUsableSpace
      else -1L
    }

  /** The effective fold threshold: conf override ('off' | bytes >= 0),
    * else the disk-derived default (free/6 floored at 1 GiB), else
    * the 4 GiB fallback when free is unknowable. */
  def jaccardMergeBytes(conf: org.apache.spark.sql.RuntimeConfig,
      root: String): Long =
    conf.getOption(JaccardMergeBytesConf) match {
      case Some("off") => Long.MaxValue
      case Some(s) =>
        val v = try s.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$JaccardMergeBytesConf='$s' — must be 'off' or a byte count >= 0")
        }
        require(v >= 0,
          s"$JaccardMergeBytesConf must be 'off' or a byte count >= 0, got $v")
        v
      case None =>
        val free = scratchBytes(conf, root)
        if (free >= 0) math.max(1L << 30, free / JaccardMergeFreeDivisor)
        else JaccardMergeBytesFallback
    }

  /** Spark conf keys for the banded pre-flight DISK guard: `warn`
    * (default — print the estimate, proceed), `refuse` (throw a typed
    * error with remediation when the estimate exceeds free scratch),
    * `off` (skip the estimate entirely, including its probe).
    * [[JaccardScratchBytesConf]] overrides the free-scratch probe for
    * schemes whose capacity the driver cannot stat (s3a/hdfs) and for
    * specs. */
  val JaccardDiskGuardConf = "spark.graft.jaccardDiskGuard"
  val JaccardScratchBytesConf = "spark.graft.jaccardScratchBytes"

  /** Calibrated partial-table ceiling per unit of post-cap Σdf²: pair
    * slots across all bands ≤ Σ C(df,2) ≈ vol/2, ≈ 16 B per parquet
    * (long,long,long) row ⟹ ~8 B/vol-unit. Against the measured rungs
    * (SURVEY §5): flat x256 vol 1.414e10 ⟹ 113 GB ceiling vs 55.3 GB
    * realized at 16 bands (2.0x conservative — min(s, 16) caps what
    * the ceiling doesn't) and ≥65 GB staged at the 94-band death;
    * zipf x256 vol 8.89e8 ⟹ 7.1 GB vs 2.9-4.0 GB realized. */
  val PartialBytesPerVolUnit = 8L

  /** Pre-flight disk estimate for a banded run (SURVEY §5: the r15
    * 94-band run died of disk 20+ minutes into phase 1 with no
    * warning). Prints one JSON line with the un-merged partial
    * ceiling (vol × [[PartialBytesPerVolUnit]]), the merge-capped
    * working estimate, and free scratch; `refuse` mode throws with
    * remediation instead of letting phase 1 die mid-flight. Free
    * scratch: the conf override, else `getUsableSpace` for local
    * paths, else unknown (-1, never refused on). */
  private def preflightDiskGuard(spark: org.apache.spark.sql.SparkSession,
      sh: DataFrame, dfCap: Option[Int], nBands: Int, root: String,
      mergeBytes: Long): Unit = {
    val conf = spark.conf
    val mode = conf.getOption(JaccardDiskGuardConf).getOrElse("warn")
    require(mode == "off" || mode == "warn" || mode == "refuse",
      s"$JaccardDiskGuardConf='$mode' — legal values: off | warn | refuse")
    if (mode == "off" || dfCap.isEmpty) return
    val (vol, _) = dfShapeProbe(sh, dfCap.get)
    val ceiling = vol * PartialBytesPerVolUnit
    // with the incremental merge, realized peak is acc + unmerged
    // (≤ threshold + one band) + the fold's rewrite copy; the acc is
    // O(distinct pairs) and not probeable a priori, so the working
    // estimate prices the fold machinery (4x threshold) plus two
    // bands' worth of the ceiling — bounded by the no-merge ceiling
    val est =
      if (mergeBytes == Long.MaxValue) ceiling
      else math.min(ceiling, 4L * mergeBytes + 2L * ceiling / nBands)
    val free = scratchBytes(conf, root)
    println(s"""{"jaccard_disk_guard":{"vol":$vol,"bands":$nBands,""" +
      s""""merge_bytes":${if (mergeBytes == Long.MaxValue) -1 else mergeBytes},""" +
      s""""partial_ceiling_bytes":$ceiling,"est_peak_bytes":$est,""" +
      s""""free_scratch_bytes":$free,"root":"$root"}}""")
    if (mode == "refuse" && free >= 0 && est > free)
      throw new IllegalStateException(
        s"banded jaccard pre-flight: estimated peak scratch $est B exceeds " +
          s"free scratch $free B at $root (vol=$vol, bands=$nBands). " +
          s"Remediation: lower $JaccardMergeBytesConf (folds partials sooner), " +
          s"point $StagingDirConf at a larger volume, raise $AutoBandVolumeConf " +
          s"with real cluster shuffle memory (fewer bands), or set " +
          s"$JaccardDiskGuardConf=warn to proceed anyway.")
  }

  /** BOUNDED-MEMORY-AND-DISK exact Jaccard: the inverted-index
    * self-join split into `nBands` SEQUENTIAL shingle bands (band =
    * portable hash of the join key mod nBands). Each shared shingle
    * lands in exactly one band, so per-band co-occurrence counts SUM
    * to the true |A∩B|.
    *
    * Two sequential phases, both bounded:
    *  1. per BAND: the 1/nBands inverted join runs alone, its pair
    *     partials (doc_a, doc_b, cnt — sizes deliberately NOT carried:
    *     they rejoin once at the end, which halves the partial
    *     footprint) aggregate and land on disk partitioned by a
    *     pair-hash SLICE. Whenever the UNMERGED partial footprint
    *     crosses [[jaccardMergeBytes]], an incremental FOLD re-sums
    *     the unmerged bands into a running per-slice (pair, cnt)
    *     accumulator (read + union + re-agg + overwrite per slice —
    *     the epoch-overwrite pattern) and deletes them — so peak
    *     scratch is O(distinct pairs) + the threshold + one band,
    *     not O(pairs × bands);
    *  2. per SLICE: each pair-hash slice reads its fragment from the
    *     accumulator plus any still-unmerged band dirs, sums to true
    *     intersections, joins the broadcast per-doc size dim, applies
    *     the threshold, and appends only the SURVIVORS (tiny at
    *     t = 0.5) to the result dir — so the giant pre-threshold pair
    *     set is never shuffled in one piece and never lives on disk
    *     beyond the partials, which are DELETED before returning.
    *
    * Peak memory = one band's join. Peak disk pre-r16 was the whole
    * partial table — the BAND-COUNT trade's hidden axis: a pair
    * sharing s shingles lands in min(s, nBands) band partials, so on
    * heavy-overlap corpora (the flat template shape) partial volume
    * grows ~linearly with nBands — measured at flat x256 (SURVEY §5
    * r15): 16 bands complete at 55.3 GB of partials within a 66 GB
    * scratch disk, 32 and 94 bands exhaust it mid-phase-1. The
    * incremental fold collapses that axis to O(distinct pairs): each
    * fold pays one accumulator rewrite, and corpora whose partials
    * never reach the threshold (the zipf rungs, ≤ 4 GB total) pay
    * zero. The size dim broadcast here (|docs| rows) is a single-box
    * economy, not a 100 TB claim — a real cluster keeps the one-pass
    * shape (its candidate shuffle spreads over executors).
    * Row-identical to [[jaccardPairs]] (spec-pinned at the gate SFs,
    * fold-every-band forced). */
  def jaccardPairsBanded(sh: DataFrame, idCol: String, dfCap: Option[Int],
      nBands: Int, probeFrom: Option[DataFrame] = None,
      thrE6: Long = JaccardThrE6Default): DataFrame = {
    require(nBands >= 2, s"nBands $nBands: use jaccardPairs below 2")
    requireThr(thrE6)
    val spark = sh.sparkSession
    val root = spark.conf.getOption(StagingDirConf)
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val mergeBytes = jaccardMergeBytes(spark.conf, root)
    preflightDiskGuard(spark, sh, dfCap, nBands, root, mergeBytes)
    val (withSize0, key) = sizedKeyed(sh, idCol, dfCap, probeFrom)
    val withSize = withSize0.withColumn("__band", pmod(hash(col(key)), lit(nBands)))
    val sizes = withSize.select(col(idCol), col("set_size")).distinct()
      .localCheckpoint()
    val dir = s"$root/jacc_bands_${java.util.UUID.randomUUID()}"
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    def delete(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
      ()
    }
    def dirBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      if (!fs.exists(hp)) 0L
      else fs.getContentSummary(hp).getLength
    }
    val sizeA = broadcast(sizes.select(col(idCol).as("doc_a"), col("set_size").as("size_a")))
    val sizeB = broadcast(sizes.select(col(idCol).as("doc_b"), col("set_size").as("size_b")))
    // phase 1: sequential per-band partials, sliced by pair hash.
    // Before anything is WRITTEN, the Jaccard length filter prunes
    // pairs that can never qualify (min·1e6 >= max·thrE6 — the
    // jaccardPairsPrefix lemma) — per-pair deterministic, so a pair
    // is dropped in EVERY band or kept in every band and phase-2
    // partial sums stay exact. This is the first disk-wall
    // mitigation the r15 flat-x256 campaign motivated; the
    // incremental fold below is the second (and structural) one. The
    // size columns themselves are still NOT carried into the
    // partials (they rejoin once in phase 2).
    var accDir: Option[String] = None
    var epoch = 0
    val unmerged = scala.collection.mutable.ArrayBuffer[Int]()
    var unmergedBytes = 0L
    // slice fragments of the running accumulator plus the
    // still-unmerged band dirs — the input set of both a fold and
    // the final phase-2 pass
    def sliceParts(sl: Int): Seq[String] =
      (accDir.map(a => s"$a/__slice=$sl").toSeq ++
        unmerged.map(bnd => s"$dir/band=$bnd/__slice=$sl")).filter(exists)
    def fold(): Unit = if (unmerged.nonEmpty) {
      val next = s"$dir/acc_${epoch + 1}"
      (0 until nBands).foreach { sl =>
        val paths = sliceParts(sl)
        if (paths.nonEmpty)
          spark.read.parquet(paths: _*)
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(sum(col("cnt")).as("cnt"))
            .write.mode("overwrite").parquet(s"$next/__slice=$sl")
      }
      accDir.foreach(delete)
      unmerged.foreach(bnd => delete(s"$dir/band=$bnd"))
      accDir = Some(next)
      epoch += 1
      unmerged.clear()
      unmergedBytes = 0L
    }
    (0 until nBands).foreach { bnd =>
      val part = withSize.filter(col("__band") === bnd)
      val a = part.select(col(idCol).as("doc_a"), col(key))
      val b = part.select(col(idCol).as("doc_b"), col(key))
      a.join(b, Seq(key))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("cnt"))
        .join(sizeA, Seq("doc_a")).join(sizeB, Seq("doc_b"))
        .filter(lengthGate(thrE6, col("size_a"), col("size_b")))
        .select(col("doc_a"), col("doc_b"), col("cnt"))
        .withColumn("__slice", pmod(hash(col("doc_a"), col("doc_b")), lit(nBands)))
        .write.partitionBy("__slice").mode("overwrite").parquet(s"$dir/band=$bnd")
      unmerged += bnd
      unmergedBytes += dirBytes(s"$dir/band=$bnd")
      if (unmergedBytes >= mergeBytes) fold()
    }
    // phase 2: sequential per-slice exact totals -> threshold ->
    // survivors, reading the accumulator + any unmerged tail directly
    // (their per-slice union re-sums in the same aggregate — a final
    // fold would be a pure extra rewrite)
    val survDir = s"$dir/surv"
    (0 until nBands).foreach { sl =>
      val paths = sliceParts(sl)
      if (paths.nonEmpty) {
        spark.read.parquet(paths: _*)
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(sum(col("cnt")).as("intersect_n"))
          .join(sizeA, Seq("doc_a")).join(sizeB, Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("intersect_n"),
            col("size_a"), col("size_b"))
          .withColumn("union_n", col("size_a") + col("size_b") - col("intersect_n"))
          .filter(jaccardGate(thrE6))
          .withColumn("jaccard_e6",
            round(lit(1000000.0) *
              (col("intersect_n").cast("double") / col("union_n").cast("double"))).cast("long"))
          .write.mode("overwrite").parquet(s"$survDir/slice=$sl")
      }
    }
    // the pre-threshold partials are dead weight now — reclaim before
    // the caller materializes anything else
    unmerged.foreach(bnd => delete(s"$dir/band=$bnd"))
    accDir.foreach(delete)
    // the SURVIVOR dir backs the returned DataFrame, so it must
    // outlive this call — retention is JVM-lifetime: registered for
    // deletion at shutdown so repeated scale runs in one process
    // don't accumulate orphaned parquet (consumers that need the
    // result past the JVM should write it somewhere owned)
    registerShutdownCleanup(dir, hconf)
    val survPaths = (0 until nBands).map(sl => s"$survDir/slice=$sl")
      .filter(exists)
    if (survPaths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_a", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_b", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("intersect_n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("size_a", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("size_b", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("union_n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("jaccard_e6", org.apache.spark.sql.types.LongType))))
    else spark.read.parquet(survPaths: _*)
  }

  /** One shutdown hook sweeping every banded-run staging dir created
    * by this JVM (band partials are deleted eagerly above; this
    * reclaims the surv dirs whose files back returned DataFrames). */
  private val cleanupDirs = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, org.apache.hadoop.conf.Configuration)]()
  // Registered through Hadoop's ShutdownHookManager ABOVE the
  // FileSystem ClientFinalizer priority: a raw Runtime hook races the
  // FS cache close, so the sweep could land on an already-closed
  // filesystem and silently leak the staging parquet.
  private lazy val cleanupHook: Unit = {
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      () => cleanupDirs.forEach { case (d, conf) =>
        try {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).delete(p, true)
          ()
        } catch { case _: Throwable => () }
      },
      org.apache.hadoop.fs.FileSystem.SHUTDOWN_HOOK_PRIORITY + 10)
  }
  private def registerShutdownCleanup(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    cleanupHook
    cleanupDirs.add((dir, conf))
    ()
  }

  /** CONTAINMENT pairs — |A∩B| / min(|A|,|B|) >= `thrE6/1e6` via the
    * same df-capped inverted-index join as [[jaccardPairs]]. The
    * asymmetric complement of Jaccard: a short document fully embedded
    * in a long one (a quote, an aggregator page) has containment ~ 1
    * while Jaccard is diluted by the big union — exactly the pairs the
    * LSH-Ensemble line of work exists for. The threshold predicate is
    * exact integer (`1e6·inter >= thrE6·min`); the reported ratios are
    * single IEEE divisions rounded to e6. `asym` marks the pairs
    * symmetric Jaccard would have missed at its own 0.5 gate. */
  def containmentPairs(sh: DataFrame, idCol: String, thrE6: Long,
      dfCap: Option[Int] = None, probeFrom: Option[DataFrame] = None): DataFrame = {
    val (withSize, key) = sizedKeyed(sh, idCol, dfCap, probeFrom)
    val a = withSize.select(col(idCol).as("doc_a"), col(key), col("set_size").as("size_a"))
    val b = withSize.select(col(idCol).as("doc_b"), col(key), col("set_size").as("size_b"))
    a.join(b, Seq(key))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("intersect_n"),
        min(col("size_a")).as("size_a"), min(col("size_b")).as("size_b"))
      .withColumn("min_size", least(col("size_a"), col("size_b")))
      .filter(col("intersect_n") * 1000000L >= col("min_size") * thrE6)
      .withColumn("containment_e6",
        round(lit(1000000.0) *
          (col("intersect_n").cast("double") / col("min_size").cast("double"))).cast("long"))
      .withColumn("jaccard_e6",
        round(lit(1000000.0) * (col("intersect_n").cast("double") /
          (col("size_a") + col("size_b") - col("intersect_n")).cast("double"))).cast("long"))
      .withColumn("asym", col("intersect_n") * 2 < col("size_a") + col("size_b") - col("intersect_n"))
  }

  val MinhashK = 8

  /** Compile-time default for [[MinhashBands]]. */
  val MinhashBandsDefault = 4 // 2 rows per band

  /** Spark conf key overriding the MinHash band count (q180 measures
    * the geometry's recall/precision curve; this applies its verdict
    * without a recompile). Must divide [[MinhashK]]. */
  val MinhashBandsConf = "spark.graft.minhashBands"

  /** Session-conf-tunable sketch geometry: read from the active (or
    * default) session so an operator and the oracle SQL built in the
    * same session always agree; compile-time default when no session
    * is up (e.g. doc tooling). Read ONCE per operator call — call
    * sites capture the value locally so one plan never mixes two
    * geometries mid-build. */
  private def intConf(key: String, default: Int): Int =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(key)).map(_.toInt).getOrElse(default)

  /** MinHash band count (bands x K/bands rows; conf-tunable). */
  def MinhashBands: Int = intConf(MinhashBandsConf, MinhashBandsDefault)

  /** K min-hash values per doc: ONE string fold per shingle, K affine
    * family members derived arithmetically. */
  def minhashSignatures(sh: DataFrame, idCol: String): DataFrame = {
    val mins = (0 until MinhashK).map(k =>
      min(Hashing.affine(col("h_base"), k)).as(s"h$k"))
    sh.withColumn("h_base", Hashing.polyHash(col("shingle")))
      .groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** (id, band_id, band_val) — banded LSH signature rows. */
  def minhashBands(sig: DataFrame, idCol: String): DataFrame = {
    val nBands = MinhashBands
    require(MinhashK % nBands == 0,
      s"$MinhashBandsConf=$nBands must divide K=$MinhashK")
    minhashBandsConfig(sig, idCol, nBands, MinhashK / nBands)
  }

  /** `minhashBands` at an explicit (bands × rows-per-band) geometry
    * over the same K-value signature — the knob the q180 sweep turns:
    * more rows per band → higher precision, fewer misses per band →
    * higher recall. Requires bands·rows ≤ K. */
  def minhashBandsConfig(sig: DataFrame, idCol: String, nBands: Int,
      rowsPerBand: Int): DataFrame = {
    require(nBands * rowsPerBand <= MinhashK,
      s"band geometry $nBands x $rowsPerBand exceeds K=$MinhashK")
    val bands = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band_id"), concat_ws("_", cols: _*).as("band_val"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_val"))
  }

  /** Candidate pairs sharing >=1 LSH band, with the band-agreement count. */
  def minhashCandidates(sig: DataFrame, idCol: String): DataFrame = {
    val bands = stage(minhashBands(sig, idCol))
    val a = bands.select(col(idCol).as("doc_a"), col("band_id"), col("band_val"))
    val b = bands.select(col(idCol).as("doc_b"), col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("band_id")).as("n_bands"))
  }

  /** Compile-time defaults for [[SimhashBits]]/[[SimhashBandCount]]. */
  val SimhashBitsDefault = 24
  val SimhashBandsDefault = 3 // 8-bit bands

  /** Spark conf keys overriding the SimHash geometry (q251 measures
    * the radius operating curve of exactly these knobs; the confs
    * apply its verdict without a recompile). Bands must divide bits;
    * bits must stay within the portable hash's 30-bit range. */
  val SimhashBitsConf = "spark.graft.simhashBits"
  val SimhashBandsConf = "spark.graft.simhashBands"

  /** SimHash width in bits (conf-tunable, default 24). */
  def SimhashBits: Int = intConf(SimhashBitsConf, SimhashBitsDefault)

  /** SimHash band count (conf-tunable, default 3). By pigeonhole,
    * B contiguous bands guarantee full recall at hamming <= B-1. */
  def SimhashBandCount: Int = intConf(SimhashBandsConf, SimhashBandsDefault)

  /** Band width in bits for the current geometry; bands must tile the
    * sketch exactly or two values differing only inside the dropped
    * remainder bits would silently always collide. */
  private def simhashBandWidth(bits: Int, nBands: Int): Int = {
    require(nBands >= 1 && bits % nBands == 0,
      s"$SimhashBandsConf=$nBands must divide $SimhashBitsConf=$bits")
    bits / nBands
  }

  /** 24-bit SimHash per doc: one portable hash per distinct token, bit
    * votes from the hash's binary digits. 24 bits keeps random-pair
    * hamming collisions (<=3) around 1e-4 while staying inside the
    * portable hash's 30-bit range. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val nBits = SimhashBits
    require(nBits >= 1 && nBits <= 30,
      s"$SimhashBitsConf=$nBits outside the portable hash's 30-bit range")
    val toks = df
      .select(col(idCol), explode(tokens(fold(col(textCol)))).as("tok"))
      .distinct()
      .withColumn("h", Hashing.polyHash(col("tok")))
    val votes = (0 until nBits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j"))
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bits = (0 until nBits).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    agg.select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** Near-dup SimHash-value pairs: shared 8-bit band then hamming <=
    * maxHamming.
    *
    * The band join runs over DISTINCT simhash VALUES, not documents:
    * similar corpora concentrate many docs on few simhash values, and a
    * doc-level band join goes quadratic in those clusters (measured 10x
    * slowdown on the synthetic corpus). Each value row carries its doc
    * count and min doc id, so cluster membership stays linear — the
    * dictionary-encode-before-quadratic-work rule that holds at 100 TB. */
  def simhashPairs(sims: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val (nBits, nBands) = (SimhashBits, SimhashBandCount)
    val width = simhashBandWidth(nBits, nBands)
    val values = sims.groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc"))
    val bandStructs = (0 until nBands).map(b =>
      struct(lit(b).as("band_id"),
        shiftright(col("simhash"), width * b)
          .bitwiseAND(lit((1L << width) - 1)).as("band_val")))
    val banded = stage(values.select(col("simhash"), col("n_docs"), col("min_doc"),
      explode(array(bandStructs: _*)).as("band"))
      .select(col("simhash"), col("n_docs"), col("min_doc"), col("band.band_id"), col("band.band_val")))
    val a = banded.select(col("simhash").as("sim_a"), col("n_docs").as("n_docs_a"),
      col("min_doc").as("min_doc_a"), col("band_id"), col("band_val"))
    val b = banded.select(col("simhash").as("sim_b"), col("n_docs").as("n_docs_b"),
      col("min_doc").as("min_doc_b"), col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("sim_a") < col("sim_b"))
      .select(col("sim_a"), col("sim_b"), col("n_docs_a"), col("n_docs_b"),
        col("min_doc_a"), col("min_doc_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The RADIUS operating curve of the simhash band index — the knob a
    * dedup team tunes for [[simhashPairs]] the way q180 tunes MinHash
    * band geometry and q201 the jaccard threshold: per hamming radius
    * r in 1..`maxRadius`, the TRUE number of distinct-simhash-value
    * pairs within r against the pairs the banded join surfaces at that
    * radius, plus the candidate volume the bands examine (the cost
    * axis, radius-independent). By pigeonhole, `SimhashBandCount`
    * bands of contiguous bits guarantee a shared band for any pair
    * with hamming < bands — so recall at r <= bands-1 must be 1.0
    * (the curve's anchor, spec-pinned) and the first possibly-lossy
    * radius is r = bands.
    *
    * The exact truth does NOT all-pairs the value dictionary: a
    * 24-bit hamming ball of radius 3 holds only C(24,1)+C(24,2)+
    * C(24,3) = 2,324 masks, so truth is an EXPANSION equi-join —
    * values x broadcast masks -> XOR neighbor -> self equi-join —
    * linear in |values| with a 2,324x fan-out, never quadratic. Each
    * unordered pair surfaces exactly once: the connecting mask is
    * unique (m = a XOR b) and the `a < b` filter keeps one side. The
    * same device IS the production alternative to banding when exact
    * radius-r recall is required (multi-index hamming search, as in
    * Manku et al. 2007's simhash dedup at Google scale — the curve
    * quantifies what banding trades away against it). */
  def simhashRadiusCurve(sims: DataFrame, idCol: String,
      maxRadius: Int = 3): DataFrame = {
    val nBits = SimhashBits
    require(maxRadius >= 1 && maxRadius < nBits,
      s"bad radius $maxRadius")
    val s = sims.sparkSession
    val values = stage(sims.groupBy(col("simhash")).agg(count(lit(1)).as("n_docs")))
    // the bounded mask model: every bit pattern with 1..maxRadius set
    // bits over the simhash width (2,324 rows at 24/3)
    val masks = (1 to maxRadius).flatMap { r =>
      (0 until nBits).combinations(r)
        .map(c => (c.map(1L << _).sum, r.toLong))
    }
    import s.implicits._
    val masksDf = masks.toDF("mask", "r")
    val truth = values.select(col("simhash"))
      .crossJoin(broadcast(masksDf))
      .select(col("simhash").bitwiseXOR(col("mask")).as("nb"),
        col("simhash"), col("r"))
      .join(values.select(col("simhash").as("nb")), Seq("nb"))
      .filter(col("simhash") < col("nb"))
      .select(col("r"))
    val cands = simhashPairs(sims, idCol, maxHamming = nBits)
      .select(col("hamming"))
    // coalesce: sum(when(...)) over an EMPTY truth/candidate set is
    // NULL where the oracle's COUNT(*) subqueries read 0 — a
    // degenerate corpus (no pairs at all) must agree with the oracle
    val t = truth.agg(
      coalesce(sum(when(col("r") <= 1, 1L).otherwise(0L)), lit(0L)).as("t1"),
      (2 to maxRadius).map(R =>
        coalesce(sum(when(col("r") <= R, 1L).otherwise(0L)), lit(0L)).as(s"t$R")): _*)
    val f = cands.agg(
      count(lit(1)).as("n_candidates"),
      (1 to maxRadius).map(R =>
        coalesce(sum(when(col("hamming") <= R, 1L).otherwise(0L)), lit(0L)).as(s"f$R")): _*)
    val nv = values.agg(count(lit(1)).as("n_values"))
    val stacked = (1 to maxRadius)
      .map(R => s"CAST($R AS BIGINT), t$R, f$R").mkString(", ")
    t.crossJoin(broadcast(f)).crossJoin(broadcast(nv))
      .select(expr(s"stack($maxRadius, $stacked) AS (radius, n_true, n_found)"),
        col("n_values"), col("n_candidates"))
      .select(col("radius"), col("n_values"), col("n_true"), col("n_found"),
        when(col("n_true") === 0, lit(1000000L))
          .otherwise(graft.functions.VectorFunctions.e6(
            col("n_found").cast("double") / col("n_true"))).as("recall_e6"),
        col("n_candidates"))
      .orderBy(col("radius"))
  }

  /** Connected components over near-dup pairs: every doc in a pair gets
    * the MINIMUM doc id of its component as `cluster_id` — how a
    * training-data pipeline turns pairwise near-dup hits into dedup
    * groups with one kept representative per group.
    *
    * Iterative min-label propagation: each round every node takes the
    * min of its own label and its neighbors' labels; converges in
    * O(component diameter) rounds (near-dup clusters are shallow).
    * Each round is fully distributed (one join + one aggregate);
    * `localCheckpoint` truncates the growing lineage — the standard
    * Spark iterative-algorithm pattern — and the driver only evaluates
    * a scalar convergence count, never row data. `maxIter` bounds the
    * worst case (a path graph).
    *
    * Shuffle shape (r16): the static edge list is hash-partitioned by
    * `dst` ONCE before the loop (checkpoint preserves the
    * partitioning), and the loop-carried label frame keeps the `node`
    * partitioning its producing join already has — so each round's
    * edge⨝label probe and the label⨝nbrMin merge are both
    * exchange-free, leaving ONE exchange per round (the `src`
    * aggregate) where the naive form re-shuffled the full edge list
    * every round. Each round also probes only the FRONTIER — the
    * labels that changed last round — not the whole label frame: a
    * label can only improve through a neighbor whose label improved
    * (min-propagation is monotone), so round k's probe input is the
    * distance-(k-1) wavefront, which on shallow near-dup clusters
    * collapses after 1-2 rounds instead of re-joining every node's
    * unchanged label until global convergence. Same rows, same round
    * count; strictly less data moved per round. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    // A/B switch for the r15 3-exchange-per-round loop (ABBench arms);
    // shipped default is the frontier form below
    if (pairs.sparkSession.conf.getOption("spark.graft.cc.frontier")
        .exists(v => !v.toBoolean))
      return connectedComponentsSimple(pairs, aCol, bCol, maxIter)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    // round 1's frontier is every node (initial labels all "changed")
    var frontier = labels
    var iter = 0
    while (iter < maxIter && !frontier.isEmpty) {
      val nbrMin = edges.join(frontier, edges("dst") === frontier("node"))
        .groupBy(col("src")).agg(min(col("lab")).as("nbr_lab"))
      val updated = labels
        .join(nbrMin, labels("node") === nbrMin("src"), "left")
        .select(col("node"), col("lab"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("new_lab"))
        .localCheckpoint()
      // both views below read the checkpointed blocks — no recompute
      frontier = updated.filter(col("new_lab") < col("lab"))
        .select(col("node"), col("new_lab").as("lab"))
      labels = updated.select(col("node"), col("new_lab").as("lab"))
      iter += 1
    }
    labels
  }

  /** The r15 loop shape (kept for in-JVM A/B): full label frame joined
    * every round, no pre-partitioned edges — 3 exchanges per round. */
  private def connectedComponentsSimple(pairs: DataFrame, aCol: String,
      bCol: String, maxIter: Int): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("lab")).as("nbr_lab"))
      val updated = labels
        .join(nbrMin, labels("node") === nbrMin("src"), "left")
        .select(col("node"), col("lab"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("new_lab"))
        .localCheckpoint()
      converged = updated.filter(col("new_lab") < col("lab")).isEmpty
      labels = updated.select(col("node"), col("new_lab").as("lab"))
      iter += 1
    }
    labels
  }
}
