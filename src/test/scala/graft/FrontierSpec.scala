package graft

import graft.queries.FrontierQueries

/** q245/q246/q247: each pinned against an exhaustive in-memory ground
  * truth on sf0.001 (dominance scan, naive phrase scan, linear ring
  * walk), plus the structural guarantees the operators advertise. */
class FrontierSpec extends SparkSpec {

  private def foldedToks(text: String): Array[String] = {
    val hy = "-‐‑‒–—―"
    val folded = text.map(c => if (hy.contains(c)) ' ' else c)
      .filterNot(_ == '­')
    val norm = java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "").toLowerCase
    norm.trim.split("\\s+")
  }

  test("q245 skyline equals the exhaustive dominance scan") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(2), foldedToks(r.getString(1)).distinct.length.toLong))
    val expected = docs.filter { case (_, xi, yi) =>
      !docs.exists { case (_, xj, yj) =>
        xj >= xi && yj >= yi && (xj > xi || yj > yi)
      }
    }.map(t => (t._1, t._2, t._3)).sortBy(_._1)
    val got = FrontierQueries.paretoSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
  }

  test("q246 phrase hits equal a naive consecutive-token scan") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), foldedToks(r.getString(1))))
    val expected = (for {
      (pid, phrase) <- FrontierQueries.Phrases
      terms = phrase.split(" ")
      (docId, toks) <- docs
      starts = toks.indices.filter(i =>
        i + terms.length <= toks.length &&
          terms.indices.forall(o => toks(i + o) == terms(o)))
      if starts.nonEmpty
    } yield (pid.toLong, docId, starts.length.toLong, starts.head.toLong))
      .sortBy(t => (t._1, t._2))
    val got = FrontierQueries.phraseQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
  }

  test("q247 assignments match a linear ring walk and only the removed shard moves") {
    val ring = FrontierQueries.ringEntries(None)
    val ringAfter = FrontierQueries.ringEntries(Some(FrontierQueries.RemovedShard))
    def walk(h: Long, r: Seq[(Long, String)]): String =
      r.find(_._1 >= h).map(_._2).getOrElse(r.head._2)
    val docs = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
    val mod = graft.functions.Hashing.Mod
    val expected = docs
      .map { id =>
        val h = (graft.functions.Hashing.hashA(9) * id + graft.functions.Hashing.hashB(9)) % mod
        (walk(h, ring), walk(h, ringAfter))
      }
      .groupBy(identity).map { case ((a, b), v) => (a, b, v.length.toLong, a != b) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = FrontierQueries.hashringShards(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === expected)
    // the consistent-hashing guarantee: only the removed shard's docs move
    got.foreach { case (shard, after, _, moved) =>
      assert(moved === (shard == FrontierQueries.RemovedShard))
      assert(after != FrontierQueries.RemovedShard)
      if (!moved) assert(shard === after)
    }
    assert(got.exists(_._1 == FrontierQueries.RemovedShard), "removal audit exercised")
  }
}
