package graft

import org.apache.spark.sql.functions._

import graft.queries.IntegritySimQueries

/** q232/q233: Merkle manifest and sparse tf-idf cosine — driver
  * transcriptions plus the tamper-evidence property. */
class IntegritySimSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def buildTree(leaves: Seq[String]): Seq[Seq[String]] = {
    var lvl = leaves
    val out = Seq.newBuilder[Seq[String]]
    out += lvl
    while (lvl.size > 1) {
      lvl = lvl.grouped(2).map(g => md5hex(g.mkString("|"))).toSeq
      out += lvl
    }
    out.result()
  }

  test("q232 levels match a driver Merkle build and the root detects tampering") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val leaves = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val chk = ds.map { case (_, t) =>
        java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16) % 1000000007L
      }.sum
      md5hex(s"$src:${ds.size}:$chk")
    }
    val tree = buildTree(leaves)
    val rows = IntegritySimQueries.merkleManifest(spark, sfDir).collect()
    assert(rows.length === tree.map(_.size).sum)
    rows.foreach { r =>
      val (lvl, idx) = (r.getAs[Long]("level").toInt, r.getAs[Long]("idx").toInt)
      assert(r.getAs[String]("digest") === tree(lvl)(idx), s"level $lvl idx $idx")
    }
    assert(tree.last.size === 1)
    // tamper evidence: flipping one leaf changes the root
    val tampered = buildTree(leaves.updated(0, md5hex("tampered")))
    assert(tampered.last.head !== tree.last.head)
  }

  test("q233 pairs match a driver tf-idf shingle cosine over capped candidates") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def foldToks(t: String): Seq[String] = {
      val hyphens = "-‐‑‒–—―"
      val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
        .filterNot(_ == '­')
      java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "").toLowerCase.trim.split("\\s+").toSeq
        .filter(_.nonEmpty)
    }
    val vecs = docs.map { case (id, t) =>
      val toks = foldToks(t)
      val sh = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      id -> sh.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val dfm = vecs.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = vecs.count(_._2.nonEmpty).toLong
    def w(tf: Long, df: Long) = tf * ((n - df + 1) * 1000000L / n)
    val wv = vecs.view.mapValues(_.map { case (t, tf) => t -> w(tf, dfm(t)) }.toMap).toMap
    val cand = (for {
      (t, df) <- dfm.toSeq if df <= IntegritySimQueries.SpDfCap
      ids = vecs.collect { case (id, v) if v.contains(t) => id }.toSeq.sorted
      a <- ids; b <- ids if a < b
    } yield (a, b)).groupBy(identity).toSeq.collect {
      case (pair, occ) if occ.size >= IntegritySimQueries.SpMinRareShared => pair
    }
    val expect = cand.flatMap { case (a, b) =>
      val (va, vb) = (wv(a), wv(b))
      val shared = va.keySet.intersect(vb.keySet)
      val dot = shared.toSeq.map(t => va(t) * vb(t)).sum
      val na = va.values.map(x => x * x).sum
      val nb = vb.values.map(x => x * x).sum
      val cos = math.round(1000000.0 * dot.toDouble /
        (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
      if (cos >= IntegritySimQueries.SpCosThreshold)
        Some((a, b) -> ((shared.size.toLong, cos)))
      else None
    }.toMap
    val got = IntegritySimQueries.sparseCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("cos_e6")))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
