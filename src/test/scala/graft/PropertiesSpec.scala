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
}
