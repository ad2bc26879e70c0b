package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{PolyHashUtil, StripAccentsUtil}
import graft.functions.Hashing

/** Generator-driven invariant tests for the codegen'd expression
  * kernels (seeded RNG, no framework bridge needed) — these run on
  * every executor at 100 TB, so their invariants get broad coverage,
  * not just example cases. */
class PropertiesSpec extends SparkSpec {

  private val rng = new scala.util.Random(42)
  private def randomAscii(): String =
    (0 until rng.nextInt(80)).map(_ => (32 + rng.nextInt(95)).toChar).mkString

  test("polyHash is deterministic, bounded, and equals the spec fold") {
    (1 to 500).foreach { _ =>
      val s = randomAscii()
      val h = PolyHashUtil.hash(UTF8String.fromString(s))
      val spec = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      assert(h == spec, s"mismatch for '$s'")
      assert(h >= 0L && h < 1000000007L)
    }
  }

  test("foldWithOffsets invariants hold on random mixed-unicode text") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions.{fold, foldWithOffsets}
    import spark.implicits._
    val palette = "abc XY9 çéÃü-‐‑–—―­"
    def randomMixed(): String =
      (0 until rng.nextInt(40)).map(_ => palette(rng.nextInt(palette.length))).mkString
    val samples = (1L to 200L).map(i => (i, randomMixed()))
    val rows = samples.toDF("id", "s")
      .select(col("id"), fold(col("s")).as("whole"), foldWithOffsets(col("s")).as("fo"))
      .collect()
      .map(r => (r.getString(1), r.getStruct(2).getString(0), r.getStruct(2).getSeq[Int](1)))
    rows.foreach { case (whole, folded, offsets) =>
      // per-char fold composes to the whole-string fold
      assert(folded == whole, s"'$folded' != '$whole'")
      // one offset per folded char, each a valid source index,
      // weakly increasing (deleted chars skip indices, never reorder)
      assert(offsets.length == folded.length)
      assert(offsets.forall(_ >= 0))
      assert(offsets.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("stripAccents is a no-op on ascii and idempotent on accented text") {
    (1 to 500).foreach { _ =>
      val s = randomAscii()
      assert(StripAccentsUtil.strip(UTF8String.fromString(s)).toString == s)
    }
    Seq("São João", "Ångström", "crédito", "ação über naïve").foreach { s =>
      val once = StripAccentsUtil.strip(UTF8String.fromString(s)).toString
      val twice = StripAccentsUtil.strip(UTF8String.fromString(once)).toString
      assert(once == twice, s"not idempotent for '$s'")
    }
  }

  test("affine minhash family members are bounded; constants pairwise distinct") {
    (1 to 500).foreach { _ =>
      val base = math.abs(rng.nextLong()) % Hashing.Mod
      (0 until 8).foreach { k =>
        val m = (Hashing.hashA(k) * base + Hashing.hashB(k)) % Hashing.Mod
        assert(m >= 0 && m < Hashing.Mod)
      }
    }
    assert((0 until 8).map(k => (Hashing.hashA(k), Hashing.hashB(k))).distinct.size == 8)
  }

  test("sequencePack invariants hold on random corpora") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (1L to 300L).map { i =>
      val n = 1 + rng.nextInt(40)
      (i, s"src${rng.nextInt(5)}", (1 to n).map(_ => "w").mkString(" "))
    }
    val ctx = 64
    val rows = graft.operators.Curation
      .sequencePack(docs.toDF("doc_id", "source", "text"), "text", "doc_id", "source", ctx)
      .orderBy(col("source"), col("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("offset_in_seq"),
        r.getAs[Boolean]("straddles")))
    assert(rows.length == docs.length) // every doc is placed exactly once
    rows.groupBy(_._1).values.foreach { shard =>
      // within a shard: offsets chain exactly (cum = prev cum + prev n)
      shard.sliding(2).foreach {
        case Array((_, _, n0, c0, _, _, _), (_, _, _, c1, _, _, _)) => assert(c1 == c0 + n0)
        case _ =>
      }
      assert(shard.head._4 == 0L) // each shard starts at offset 0
      shard.foreach { case (_, _, n, cum, seq, off, straddles) =>
        assert(seq == cum / ctx && off == cum % ctx) // layout is pure div/mod
        assert(straddles == (off + n > ctx))
      }
    }
  }

  test("stratifiedSample quota is exact and keeps a deterministic subset") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"s${rng.nextInt(7)}"))
    val df = docs.toDF("doc_id", "source")
    val strata = docs.groupBy(_._2).view.mapValues(_.size).toMap
    for (denom <- Seq(2, 5, 9)) {
      val kept = graft.operators.Curation.stratifiedSample(df, "source", "doc_id", denom)
        .select(col("source"), col("doc_id")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val bySrc = kept.groupBy(_._1).view.mapValues(_.length).toMap
      strata.foreach { case (s, n) =>
        assert(bySrc(s) == (n + denom - 1) / denom, s"stratum $s denom $denom")
      }
    }
  }
}
