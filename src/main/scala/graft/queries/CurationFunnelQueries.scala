package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{CurationPipeline, Tables}
import graft.functions.Hashing
import graft.functions.TextFunctions.{sentenceSegs, sentenceSegsSql}
import graft.operators.Dedup

/** The COMPOSED curation pipeline as a correctness gate (SURVEY.md §2
  * D′): every stage of [[CurationPipeline.curateExtendedStages]] is
  * individually oracle-gated (q21 exact dedup, q126 line dedup, q71/
  * q127 quality+LM, q73 decontamination, q22/q67 near-dup clustering,
  * q91 dup-grams, q130 DSIR, q74 sampling, q131 shuffle, q75 packing)
  * — this gates the COMPOSITION those stages form: each stage's
  * SURVIVOR SET feeds the next stage's signal computation, so a subtle
  * wiring bug (a filter applied to the wrong frame, a stage reading
  * pre-rewrite text, an off-by-one threshold) changes downstream
  * counts even when every stage is individually correct.
  *
  * Output: one row per pipeline stage — (stage_ord, stage, n_docs,
  * id_sum, payload_sum). `id_sum` (Σ doc_id of survivors) pins WHICH
  * documents survive, not just how many; `payload_sum` pins the stage
  * payload itself: Σ length(text) for the text stages (the line-dedup
  * REWRITE changes it), Σ cum_tokens for the final packed layout (pins
  * shard assignment, shuffle order and token budget all at once).
  *
  * The oracle is ONE chained-CTE DuckDB statement composing the same
  * per-stage SQL the individual gates use, each stage's CTE reading
  * the previous stage's survivor CTE — the whole pipeline re-derived
  * independently end to end.
  *
  * Scale shape: identical to curateExtended (each stage is the audited
  * operator; the funnel adds only 8 scalar aggregates). At gate scale
  * the flow is one fused DAG; past [[graft.operators.Dedup.StageMinInputBytes]]
  * the multi-consumer staging materializes each survivor chain once
  * (the zipf x64 CurationBench datum in SURVEY §5).
  */
object CurationFunnelQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Gate parameters: eval set/segmentation/DSIR target reuse the
    * conventions of the stage-level gates (q73's mod-97 eval set,
    * q126's sentence segmentation, q130's lang='en' target); the rest
    * are [[CurationPipeline.Config]] defaults. */
  val EvalMod = 97
  val Seed = "ep1"
  val NShards = 8
  val TailMilli = 5200L
  val TailPct = 95
  val LineMinDf = 2
  private val cfg = CurationPipeline.Config()

  /** The funnel over [[CurationPipeline.curateExtendedStages]] with
    * either LM-tail mode (`tailPct = None` -> the fixed `TailMilli`
    * cut of q253; `Some(p)` -> q256's corpus-relative percentile cut).
    *
    * Gate-scale staging: the funnel forces EVERY stage thunk, and
    * each of the 8 scalar aggregates consumes the full stage prefix —
    * unstaged (the gate corpora sit below `StageMinInputBytes`) stage
    * k's plan re-runs every upstream stage once per consumer, and the
    * near-dup stage's label-propagation rounds re-derive the whole
    * prefix once per round (the 27.7 s q253 price in the r13 sweep).
    * Forcing the multi-consumer staging ON for the funnel's
    * construction makes each stage materialize exactly once and every
    * consumer (aggregate rows, component rounds, downstream stages)
    * read the checkpoint — row-identical by the staging contract
    * (CurationPipelineSpec pins both shapes), ~3x cheaper at gate
    * scale. The conf is restored on exit; the localCheckpoint plan
    * nodes already built keep their staged shape regardless. */
  /** The two funnel gates share their tail-rule-invariant prefix
    * BYTE-IDENTICALLY (exact dedup, line dedup, surprisal, quality
    * ids — the rules only diverge at stage 3), so whichever gate runs
    * first builds the prefix ONCE as PARQUET-backed staged frames and
    * this memo hands the other gate the already-materialized
    * [[graft.CurationPipeline.SharedPrefix]], keyed by (session, dir).
    * Parquet (a temp dir, same pattern as `Dedup.stage`'s stagingDir
    * branch) rather than localCheckpoint because the gate harness
    * (Verify/Bench) unpersists every session RDD between queries —
    * checkpoint blocks would be gone by the second gate, parquet
    * survives.
    *
    * Staleness + lifecycle (r16):
    *  - each entry carries an INPUT FINGERPRINT (file names, lengths,
    *    modification times of the docs scan) — a corpus regenerated
    *    under the same dir within one JVM (a harness rewriting test
    *    data between rounds) misses the memo and rebuilds instead of
    *    silently reading the stale staged prefix;
    *  - entries whose SparkSession has stopped are evicted on every
    *    lookup AND by [[close]], and their staged parquet dirs are
    *    deleted (a stopped session can hold no live plan over them);
    *  - dirs of LIVE-session entries displaced by a fingerprint
    *    mismatch or the size bound are NOT deleted — a caller may
    *    still hold a DataFrame reading them (the caller-holds-plan
    *    hazard) — they fall to JVM tmpdir cleanup, the established
    *    staging convention.
    * Bounded: one entry per (session, dir) pair a JVM ever gates —
    * cleared wholesale past a small size. */
  private case class PrefixEntry(session: SparkSession, fingerprint: Long,
    root: String, pre: CurationPipeline.SharedPrefix)

  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), PrefixEntry]()

  def clearPrefixCache(): Unit = {
    evictStale(s => s.sparkContext.isStopped)
    prefixCache.clear()
  }

  /** Deletes the staged prefix dirs of every STOPPED-session entry and
    * drops those entries; live-session entries stay (their dirs may
    * back plans a caller still holds). Call when a harness retires a
    * session. */
  def close(): Unit = evictStale(s => s.sparkContext.isStopped)

  // test hooks: the lifecycle (eviction + fingerprint invalidation)
  // is only observable through the private map
  private[graft] def stagePrefixEntryForTest(s: SparkSession, dir: String,
      root: String): Unit =
    prefixCache.put((System.identityHashCode(s), dir),
      PrefixEntry(s, 0L, root, null))
  private[graft] def prefixCacheSize: Int = prefixCache.size
  private[graft] def prefixEntryRoot(s: SparkSession, dir: String): Option[String] =
    Option(prefixCache.get((System.identityHashCode(s), dir))).map(_.root)

  /** Eviction core, predicate-injected so specs can pin the lifecycle
    * without stopping the shared test session. */
  private[graft] def evictStale(isStopped: SparkSession => Boolean): Unit = {
    val it = prefixCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (isStopped(e.getValue.session)) {
        deleteRoot(e.getValue.root)
        it.remove()
      }
    }
  }

  /** Staged-dir delete via the Hadoop FS resolved from the path's own
    * scheme (the dir may live on the shared stagingDir of a cluster
    * run, not the local tmpdir). Best-effort: the JVM tmp sweep is
    * the backstop. */
  private def deleteRoot(root: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      ()
    } catch { case _: java.io.IOException => () }

  /** Driver-side metadata fingerprint of the docs scan: file names,
    * lengths and modification times, one batched listing per parent
    * dir (the `Dedup.inputBytes` RPC pattern — object-store-polite).
    * A vanished file counts as a change, never a failure. */
  private def inputFingerprint(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val files = df.inputFiles.sorted
    var h = 1125899906842597L
    def mix(x: Long): Unit = h = h * 31 + x
    files.map(new org.apache.hadoop.fs.Path(_)).groupBy(_.getParent)
      .toSeq.sortBy(_._1.toString).foreach { case (parent, children) =>
        val want = children.map(_.getName).toSet
        try
          parent.getFileSystem(conf).listStatus(parent)
            .filter(s => want(s.getPath.getName))
            .sortBy(_.getPath.getName)
            .foreach { s =>
              mix(s.getPath.getName.hashCode.toLong)
              mix(s.getLen)
              mix(s.getModificationTime)
            }
        catch { case _: java.io.FileNotFoundException => mix(0L) }
      }
    mix(files.length.toLong)
    h
  }

  /** Construction lock: the funnel temporarily forces the
    * multi-consumer staging conf on the SHARED session (restored on
    * exit) — two funnels constructed concurrently on one session
    * would race the restore and leak the forced shape to unrelated
    * concurrent plans. The gate harness (Verify/Bench) is
    * single-threaded; this lock pins that assumption for any other
    * caller. Only CONSTRUCTION serializes — the returned plan
    * executes whenever the caller runs it. */
  private val constructionLock = new Object

  private def funnel(s: SparkSession, dir: String,
      tailPct: Option[Int]): DataFrame = constructionLock.synchronized {
    val docs = Tables.documents(s, dir)
    val segs = sentenceSegs(col("text"))
    val prev = s.conf.getOption(Dedup.StageMinInputBytesConf)
    s.conf.set(Dedup.StageMinInputBytesConf, "0")
    try {
      evictStale(sess => sess.sparkContext.isStopped)
      if (prefixCache.size > 8) clearPrefixCache()
      val cacheKey = (System.identityHashCode(s), dir)
      val fp = inputFingerprint(docs)
      val shared = Option(prefixCache.get(cacheKey)).collect {
        // the session must be the SAME live object (identityHashCode
        // can collide after GC) with its context still running, AND
        // the corpus under `dir` must be byte-for-byte the one the
        // prefix was staged from (fingerprint: names/lengths/mtimes)
        case PrefixEntry(sess, f, _, pre)
          if (sess eq s) && !s.sparkContext.isStopped && f == fp => pre
      }
      val pre = shared.getOrElse {
        // parquet-backed staging: write each prefix frame once under
        // a temp dir and hand every consumer (this funnel AND the
        // sibling gate) the scan — eager at construction, like the
        // label-propagation rounds the funnel already runs here.
        // Root: the shared stagingDir when configured (a multi-node
        // cluster needs executor-visible storage — the Dedup.stage
        // contract), else the driver-local tmpdir (the single-box
        // gate harness)
        val root = s.conf.getOption(Dedup.StagingDirConf) match {
          case Some(d) => s"$d/graft_funnel_prefix_${java.util.UUID.randomUUID()}"
          case None => java.nio.file.Files
            .createTempDirectory("graft_funnel_prefix").toString
        }
        var k = 0
        def pq(df: DataFrame): DataFrame = {
          k += 1
          val path = s"$root/f$k"
          df.write.mode("overwrite").parquet(path)
          s.read.parquet(path)
        }
        val built = CurationPipeline.buildSharedPrefix(
          docs, segs, LineMinDf, cfg, pq)
        prefixCache.put(cacheKey, PrefixEntry(s, fp, root, built))
        built
      }
      val stages = CurationPipeline.curateExtendedStages(
        docs, col("doc_id") % EvalMod === 0, segs,
        dsirTarget = Some(col("lang") === "en"),
        seed = Seed, nShards = NShards,
        surprisalTailMilli = TailMilli, lineMinDf = LineMinDf,
        surprisalTailPct = tailPct, cfg = cfg,
        sharedPrefix = Some(pre))
      val rows = stages.zipWithIndex.map { case ((name, thunk), i) =>
        val df = thunk()
        // text stages: Σ length(text) pins the (possibly rewritten)
        // payload; the packed stage: Σ cum_tokens pins layout + order
        val payload =
          if (name == "shuffle_pack") col("cum_tokens")
          else length(col("text")).cast("long")
        df.agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"),
          coalesce(sum(payload), lit(0L)).as("payload_sum"))
          .select(lit((i + 1).toLong).as("stage_ord"), lit(name).as("stage"),
            col("n_docs"), col("id_sum"), col("payload_sum"))
      }
      rows.reduce(_.union(_)).orderBy(col("stage_ord"))
    } finally {
      prev match {
        case Some(v) => s.conf.set(Dedup.StageMinInputBytesConf, v)
        case None => s.conf.unset(Dedup.StageMinInputBytesConf)
      }
    }
  }

  def curationFunnel(s: SparkSession, dir: String): DataFrame =
    funnel(s, dir, None)

  /** q256: the funnel with the CORPUS-RELATIVE LM-tail rule — the
    * threshold is the corpus's own exact `TailPct`-th percentile of
    * milli-bits/token ([[CurationPipeline.surprisalTailThreshold]]),
    * not a fixed constant. Gates the self-tuning mode the zipf
    * campaign showed is necessary (a fixed cut sized to one corpus
    * empties another — SURVEY §5 r13); the oracle re-derives the same
    * percentile in SQL over the same surprisal frame, so the
    * derivation AND its wiring into the quality gate are both
    * hash-pinned. */
  def curationPctFunnel(s: SparkSession, dir: String): DataFrame =
    funnel(s, dir, Some(TailPct))

  // ---- oracle: the whole pipeline as one chained-CTE statement ----

  private val FoldSql =
    "lower(strip_accents(translate(text, '-‐‑‒–—―­', '       ')))"
  private val ToksSql = s"string_split_regex(trim($FoldSql), '\\s+')"

  private def stageRow(ord: Int, name: String, cte: String,
      payload: String = "length(text)"): String =
    s"""SELECT CAST($ord AS BIGINT) AS stage_ord, '$name' AS stage,
       |  COUNT(*) AS n_docs,
       |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS id_sum,
       |  CAST(COALESCE(SUM($payload), 0) AS BIGINT) AS payload_sum
       |FROM $cte""".stripMargin

  /** The chained-CTE oracle, parameterized on the LM-tail rule:
    * `lmTailCtes` adds the threshold-derivation CTEs (pct mode) after
    * `sdoc`, and `lmTailSelect` is the doc_id set the quality CTE
    * excludes. */
  private def funnelSql(lmTailCtes: String, lmTailSelect: String): String = {
    val shuffleHash = Hashing.polyHashSql(s"CAST(doc_id AS VARCHAR) || ':$Seed'")
    val dupE6 =
      "CAST(ROUND((CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens) * 1000000.0) AS BIGINT)"
    val g5 = (0 until cfg.dupGramN).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH RECURSIVE
       |reps AS MATERIALIZED (SELECT doc_id, text, lang, source FROM (
       |    SELECT doc_id, text, lang, source,
       |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
       |    FROM documents) WHERE doc_id = keep),
       |lp AS MATERIALIZED (SELECT doc_id,
       |    ${sentenceSegsSql("text")} AS segs
       |  FROM reps),
       |lpos AS MATERIALIZED (SELECT doc_id, trim(seg) AS seg, i FROM (
       |    SELECT doc_id, unnest(segs) AS seg, generate_subscripts(segs, 1) AS i FROM lp)
       |  WHERE trim(seg) <> ''),
       |ldf AS MATERIALIZED (SELECT seg, COUNT(DISTINCT doc_id) AS seg_df FROM lpos GROUP BY seg),
       |rw0 AS MATERIALIZED (SELECT doc_id,
       |    COALESCE(string_agg(seg, '. ' ORDER BY i) FILTER (WHERE seg_df < $LineMinDf), '') AS text
       |  FROM lpos JOIN ldf USING (seg) GROUP BY doc_id),
       |rw AS MATERIALIZED (SELECT r.doc_id, w.text, r.lang, r.source
       |  FROM reps r JOIN rw0 w ON r.doc_id = w.doc_id WHERE length(w.text) > 0),
       |qtoks AS MATERIALIZED (SELECT doc_id, $ToksSql AS t FROM rw),
       |qpos AS MATERIALIZED (SELECT doc_id, t, unnest(t) AS tok, generate_subscripts(t, 1) AS i FROM qtoks),
       |qtokc AS MATERIALIZED (SELECT doc_id, tok, COUNT(*) AS cnt FROM qpos GROUP BY doc_id, tok),
       |qstat AS MATERIALIZED (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       |    COUNT(*) AS n_distinct FROM qtokc GROUP BY doc_id),
       |scnt AS MATERIALIZED (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS cnt FROM qtokc GROUP BY tok),
       |stot AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM scnt),
       |sbits AS MATERIALIZED (SELECT tok, CAST(length(bin(n_total)) - length(bin(cnt)) AS BIGINT) AS bits
       |  FROM scnt CROSS JOIN stot),
       |sdoc AS MATERIALIZED (SELECT c.doc_id, CAST(SUM(c.cnt) AS BIGINT) AS n_tokens,
       |    CAST(SUM(c.cnt * b.bits) AS BIGINT) AS total_bits
       |  FROM qtokc c JOIN sbits b USING (tok) GROUP BY c.doc_id),
       |$lmTailCtes
       |qualified AS MATERIALIZED (SELECT rw.doc_id, rw.text, rw.lang, rw.source FROM rw
       |  JOIN qstat USING (doc_id)
       |  WHERE qstat.n_tokens >= ${cfg.minTokens} AND $dupE6 < ${cfg.maxDupE6}
       |    AND doc_id NOT IN ($lmTailSelect)),
       |csh AS MATERIALIZED (SELECT DISTINCT q.doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
       |  FROM qualified q JOIN qpos p ON q.doc_id = p.doc_id WHERE i + 2 <= len(t)),
       |cev AS MATERIALIZED (SELECT DISTINCT shingle FROM csh WHERE doc_id % $EvalMod = 0),
       |ccon AS MATERIALIZED (SELECT doc_id FROM (
       |    SELECT c.doc_id, COUNT(*) AS n_sh,
       |      SUM(CASE WHEN e.shingle IS NULL THEN 0 ELSE 1 END) AS n_hit
       |    FROM csh c LEFT JOIN cev e ON c.shingle = e.shingle
       |    WHERE c.doc_id % $EvalMod <> 0 GROUP BY c.doc_id)
       |  WHERE n_hit * 100 >= n_sh * ${cfg.contaminationPct}),
       |clean AS MATERIALIZED (SELECT * FROM qualified WHERE doc_id % $EvalMod <> 0
       |  AND doc_id NOT IN (SELECT doc_id FROM ccon)),
       |dsh AS MATERIALIZED (SELECT doc_id, shingle FROM (
       |    SELECT c.doc_id, c.shingle, COUNT(*) OVER (PARTITION BY c.shingle) AS df
       |    FROM csh c JOIN clean cl ON c.doc_id = cl.doc_id)
       |  WHERE df <= ${cfg.jaccardDfCap}),
       |dsz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM dsh GROUP BY doc_id),
       |dcand AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inx
       |  FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |dnear AS MATERIALIZED (SELECT da, db FROM dcand
       |  JOIN dsz sa ON da = sa.doc_id JOIN dsz sb ON db = sb.doc_id
       |  WHERE inx * 2 >= sa.sz + sb.sz - inx),
       |dedges AS MATERIALIZED (SELECT da AS src, db AS dst FROM dnear
       |  UNION SELECT db AS src, da AS dst FROM dnear),
       |dreach(src, dst) AS (SELECT src, dst FROM dedges
       |  UNION SELECT r.src, e.dst FROM dreach r JOIN dedges e ON r.dst = e.src),
       |dnonrep AS MATERIALIZED (SELECT src AS doc_id FROM dreach GROUP BY src
       |  HAVING LEAST(src, MIN(dst)) <> src),
       |clustered AS MATERIALIZED (SELECT * FROM clean
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dnonrep)),
       |g5 AS MATERIALIZED (SELECT DISTINCT c.doc_id, $g5 AS g
       |  FROM clustered c JOIN qpos p ON c.doc_id = p.doc_id
       |  WHERE i + ${cfg.dupGramN - 1} <= len(t)),
       |gdf AS MATERIALIZED (SELECT g, COUNT(*) AS gdf FROM g5 GROUP BY g),
       |gdrop AS MATERIALIZED (SELECT doc_id FROM (
       |    SELECT g5.doc_id, COUNT(*) AS n_g,
       |      SUM(CASE WHEN gdf.gdf > 1 THEN 1 ELSE 0 END) AS n_d
       |    FROM g5 JOIN gdf USING (g) GROUP BY g5.doc_id)
       |  WHERE n_d * 100 >= n_g * ${cfg.dupSharePct}),
       |uniq AS MATERIALIZED (SELECT * FROM clustered
       |  WHERE doc_id NOT IN (SELECT doc_id FROM gdrop)),
       |ddt AS MATERIALIZED (SELECT c.doc_id, u.lang = 'en' AS is_target, c.tok, c.cnt AS dc
       |  FROM qtokc c JOIN uniq u ON c.doc_id = u.doc_id),
       |dlm AS MATERIALIZED (SELECT tok, CAST(SUM(dc) AS BIGINT) AS cnt_raw,
       |    CAST(SUM(CASE WHEN is_target THEN dc ELSE 0 END) AS BIGINT) AS cnt_tgt
       |  FROM ddt GROUP BY tok),
       |dnorm AS MATERIALIZED (SELECT CAST(SUM(cnt_raw) AS BIGINT) AS n_raw,
       |    CAST(SUM(cnt_tgt) AS BIGINT) AS n_tgt, COUNT(*) AS vocab_n FROM dlm),
       |ddev AS MATERIALIZED (SELECT tok,
       |    CAST(ROUND(1000000.0 *
       |      (CAST(cnt_tgt + 1 AS DOUBLE) * CAST(n_raw AS DOUBLE)) /
       |      (CAST(n_tgt + vocab_n AS DOUBLE) * CAST(cnt_raw AS DOUBLE))) AS BIGINT)
       |      - 1000000 AS dev_e6
       |  FROM dlm CROSS JOIN dnorm),
       |dwt AS MATERIALIZED (SELECT doc_id, CAST(SUM(dc * dev_e6) AS BIGINT) AS weight_e6
       |  FROM ddt JOIN ddev USING (tok) GROUP BY doc_id),
       |sel AS MATERIALIZED (SELECT * FROM uniq
       |  WHERE doc_id IN (SELECT doc_id FROM dwt WHERE weight_e6 > 0)),
       |samp AS MATERIALIZED (SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
       |      COUNT(*) OVER (PARTITION BY source) AS sn
       |    FROM sel) WHERE rk <= (sn + ${cfg.sampleDenom - 1}) // ${cfg.sampleDenom}),
       |shuf AS MATERIALIZED (SELECT doc_id, text, shuffle_key, shuffle_key % $NShards AS shard FROM (
       |    SELECT doc_id, text, $shuffleHash AS shuffle_key FROM samp)),
       |spos AS MATERIALIZED (SELECT doc_id, text, shard,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS pos
       |  FROM shuf),
       |pk AS MATERIALIZED (SELECT doc_id, shard, pos,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM spos),
       |packed AS MATERIALIZED (SELECT doc_id, shard, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_tokens
       |  FROM pk)
       |SELECT * FROM (
       |  ${stageRow(1, "exact_dedup", "reps")}
       |  UNION ALL ${stageRow(2, "line_dedup", "rw")}
       |  UNION ALL ${stageRow(3, "quality_lm_gate", "qualified")}
       |  UNION ALL ${stageRow(4, "decontaminate", "clean")}
       |  UNION ALL ${stageRow(5, "neardup_cluster", "clustered")}
       |  UNION ALL ${stageRow(6, "dupgram_filter", "uniq")}
       |  UNION ALL ${stageRow(7, "dsir_select", "sel")}
       |  UNION ALL ${stageRow(8, "shuffle_pack", "packed", "cum_tokens")}
       |) ORDER BY stage_ord""".stripMargin
  }

  val curationFunnelSql: String = funnelSql("",
    s"SELECT doc_id FROM sdoc WHERE (1000 * total_bits) // n_tokens >= $TailMilli")

  /** q256's oracle derivation of the percentile threshold — the same
    * histogram + cumulative-count integer-rank rule the engine uses
    * (PERCENTILE_DISC: smallest milli-bits value whose cumulative doc
    * count reaches TailPct% of the rewritten corpus). */
  private val PctTailCtes =
    s"""mbs AS MATERIALIZED (SELECT doc_id, (1000 * total_bits) // n_tokens AS mb FROM sdoc),
       |mhist AS MATERIALIZED (SELECT mb, COUNT(*) AS cnt FROM mbs GROUP BY mb),
       |mthr AS MATERIALIZED (SELECT MIN(mb) AS thr FROM (
       |    SELECT mb, SUM(cnt) OVER (ORDER BY mb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      (SELECT CAST(SUM(cnt) AS BIGINT) FROM mhist) AS n FROM mhist)
       |  WHERE cum * 100 >= n * $TailPct),""".stripMargin

  val curationPctFunnelSql: String = funnelSql(PctTailCtes,
    "SELECT doc_id FROM mbs CROSS JOIN mthr WHERE mb >= thr")

  val queries: Map[String, Q] = Map(
    "q253_curation_funnel" -> (curationFunnel _),
    "q256_curation_pfunnel" -> (curationPctFunnel _))

  val oracles: Map[String, String] = Map(
    "q253_curation_funnel" -> curationFunnelSql,
    "q256_curation_pfunnel" -> curationPctFunnelSql)
}
