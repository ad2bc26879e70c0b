package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.{Curation, Dedup}

/** The LLM training-data flow composed end-to-end from graft
  * operators — raw documents in, packed training sequences out:
  *
  *   docs(doc_id, source, text)
  *     -> exact dedup (content hash, keep lowest id)
  *     -> quality filter (repetition signals + min length)
  *     -> eval-set decontamination (shingle overlap vs held-out docs)
  *     -> near-dup clustering (Jaccard pairs -> components, keep rep)
  *     -> per-source stratified downsample
  *     -> context-window sequence packing
  *
  * Each stage is one of the independently-tested operators; this
  * object only wires them. Every stage is a declarative plan — the
  * whole flow is one DAG Catalyst optimizes together, and each
  * survivor set is just a column filter, so nothing materializes
  * until the packed layout is written.
  */
object CurationPipeline {

  case class Config(
      minTokens: Long = 20L,
      maxDupE6: Long = 650000L,
      contaminationPct: Int = 50,
      sampleDenom: Int = 5,
      ctxLen: Int = 4096,
      jaccardDfCap: Int = 1000,
      dupGramN: Int = 5,
      dupSharePct: Int = 50,
      splitTrainPct: Int = 80,
      splitValidPct: Int = 87)

  /** `evalPred` marks held-out docs (they are removed from the output
    * and define the contamination set). Returns the packed layout of
    * the surviving corpus: (doc_id, source, n_tokens, cum_tokens,
    * seq_id, offset_in_seq, straddles). */
  def curate(docs: DataFrame, evalPred: Column,
      cfg: Config = Config()): DataFrame = {
    // 1. exact dedup: cheapest first, everything downstream shrinks
    val reps = Dedup.exact(docs, "text", "doc_id")

    // 2. quality gate: integer repetition thresholds
    val quality = Curation.repetitionStats(reps, "text", "doc_id")
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("dup_token_e6") < cfg.maxDupE6)
      .select(col("doc_id"))
    val qualified = reps.join(quality, Seq("doc_id"), "left_semi")

    // 3. decontamination: drop training docs overlapping the eval set
    val contaminated = Curation.contamination(qualified, "text", "doc_id", evalPred)
      .filter(col("n_contaminated") * 100 >= col("n_shingles") * cfg.contaminationPct)
      .select(col("doc_id"))
    val clean = qualified.filter(!evalPred)
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 4a. near-dup clustering: keep one representative per cluster
    val pairs = Dedup.jaccardPairs(
      Dedup.shingles(clean, "text", "doc_id"), "doc_id",
      dfCap = Some(cfg.jaccardDfCap))
      .select(col("doc_a"), col("doc_b"))
    val dupes = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("node") =!= col("lab")) // non-representatives
      .select(col("node").as("doc_id"))
    val clustered = clean.join(dupes, Seq("doc_id"), "left_anti")

    // 4b. exact-substring signal AFTER clustering (Lee et al. 2022):
    // catches docs mostly built of n-grams duplicated across OTHER
    // surviving docs (boilerplate below the Jaccard threshold).
    // Running it after rep-keeping means duplicated content keeps its
    // one representative instead of losing every copy.
    val gramDups = Curation.dupNgrams(clustered, "text", "doc_id", cfg.dupGramN)
      .filter(col("n_dup_grams") * 100 >= col("n_grams") * cfg.dupSharePct)
      .select(col("doc_id"))
    val unique = clustered.join(gramDups, Seq("doc_id"), "left_anti")

    // 5. per-source quota downsample, then 6. pack into context windows
    val sampled = Curation.stratifiedSample(unique, "source", "doc_id", cfg.sampleDenom)
      .select(col("doc_id"), col("source"), col("text"))
    Curation.sequencePack(sampled, "text", "doc_id", "source", cfg.ctxLen)
  }

  /** The packed layout tagged with its leakage-aware split: the q99
    * domain-hashed train/valid/test assignment applied AFTER curation,
    * so every packed sequence carries the split of its source domain
    * (near-dup documents of one site can never straddle splits). */
  def curateWithSplit(docs: DataFrame, evalPred: Column,
      cfg: Config = Config()): DataFrame = {
    import graft.functions.Hashing
    val bucket = Hashing.polyHash(concat(col("source"), lit(":split"))) % 100
    curate(docs, evalPred, cfg)
      .withColumn("domain_bucket", bucket)
      .withColumn("split",
        when(col("domain_bucket") < cfg.splitTrainPct, "train")
          .when(col("domain_bucket") < cfg.splitValidPct, "valid")
          .otherwise("test"))
  }
}
