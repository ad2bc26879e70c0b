package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{RepairSelectorUtil, StreamSignalsUtil, TextGeometryUtil, VectorPrimitivesUtil}

/** Generator-driven invariant tests for the round-7 native expression
  * kernels, against independent spec implementations (seeded RNG, no
  * framework bridge — these are the per-row loops that run on every
  * executor at 100 TB). */
class NativeKernelPropertiesSpec extends SparkSpec {

  private val rng = new scala.util.Random(7)

  private def toks(words: Seq[String]): GenericArrayData =
    new GenericArrayData(words.map(w => UTF8String.fromString(w)).toArray[Any])

  private def randomWord(): String = {
    val palette = "abcdefgç"
    (0 until (1 + rng.nextInt(6))).map(_ => palette(rng.nextInt(palette.length))).mkString
  }
  private def randomWords(): Seq[String] =
    (0 until rng.nextInt(30)).map(_ => randomWord())

  test("shingles equals the sliding-window spec") {
    (1 to 300).foreach { _ =>
      val ws = randomWords()
      val n = 1 + rng.nextInt(3)
      val got = TextGeometryUtil.shingles(toks(ws), n)
      val want = if (ws.length < n) Seq.empty
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      assert(got.numElements() == want.length)
      want.zipWithIndex.foreach { case (s, i) =>
        assert(got.getUTF8String(i).toString == s)
      }
    }
  }

  test("prefixStarts equals the scanLeft spec") {
    (1 to 300).foreach { _ =>
      val ws = randomWords()
      val got = TextGeometryUtil.prefixStarts(toks(ws))
      val want = ws.scanLeft(0L)((acc, w) => acc + w.length + 1)
      assert((0 to ws.length).forall(i => got.getLong(i) == want(i)))
    }
  }

  test("countMembers equals the count spec") {
    val stops = Set("a", "abc", "çç")
    val jset = new java.util.HashSet[UTF8String]()
    stops.foreach(s => jset.add(UTF8String.fromString(s)))
    (1 to 300).foreach { _ =>
      val ws = randomWords()
      assert(TextGeometryUtil.countMembers(toks(ws), jset) ==
        ws.count(stops.contains).toLong)
    }
  }

  /** Literal transcription of scraper.py:522-554's state machine. */
  private def repairSpec(q: String): String = {
    val sb = new StringBuilder
    var bal = 0
    var quote: Option[Char] = None
    q.foreach { c =>
      if (c == '\'' || c == '"') {
        if (quote.isEmpty) quote = Some(c)
        else if (quote.contains(c)) quote = None
      }
      if (c == '[' && quote.isEmpty) bal += 1
      else if (c == ']' && bal > 0) bal -= 1
      if (c == ']' && quote.nonEmpty) { sb.append(quote.get); sb.append(c) }
      else sb.append(c)
      if (c == ']') quote = None
    }
    quote.foreach(sb.append)
    sb.append("]" * math.min(math.max(bal, 0), 16))
    sb.toString
  }

  test("RepairSelector equals an independent transcription of the reference fold") {
    val palette = "ab['\"] ="
    (1 to 1000).foreach { _ =>
      val q = (0 until rng.nextInt(24)).map(_ => palette(rng.nextInt(palette.length))).mkString
      val got = RepairSelectorUtil.repair(UTF8String.fromString(q)).toString
      assert(got == repairSpec(q), s"for input '$q'")
    }
  }

  test("vector primitives equal their fold specs, including rounding edges") {
    (1 to 300).foreach { _ =>
      val n = 1 + rng.nextInt(64)
      val fa = Array.fill(n)((rng.nextFloat() - 0.5f) * 2f)
      val fArr = new GenericArrayData(fa.map(x => x: Any))
      val m = VectorPrimitivesUtil.microVec(fArr)
      val want = fa.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      assert((0 until n).forall(i => m.getLong(i) == want(i)))
      val a = Array.fill(n)(rng.nextLong() % 2000000L)
      val b = Array.fill(n)(rng.nextLong() % 2000000L)
      val aArr = new GenericArrayData(a.map(x => x: Any))
      val bArr = new GenericArrayData(b.map(x => x: Any))
      assert(VectorPrimitivesUtil.sqDist(aArr, bArr) ==
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(VectorPrimitivesUtil.longDot(aArr, bArr) ==
        a.zip(b).map { case (x, y) => x * y }.sum)
      assert(VectorPrimitivesUtil.sumSq(aArr) == a.map(x => x * x).sum)
      val sub = VectorPrimitivesUtil.subVec(aArr, bArr)
      assert((0 until n).forall(i => sub.getLong(i) == a(i) - b(i)))
    }
    // exact-half inputs are unrepresentable as floats (x * 1e6 is never
    // a true .5 after float rounding), so HALF_UP-vs-Spark parity is
    // pinned differentially in VectorPrimitivesSpec against Spark's
    // own round(), not with a hand-picked literal here
  }

  test("StreamSignals invariants: prefixes, sentence ids, admin pointer, ctx minimum") {
    val break = UTF8String.fromString("batch")
    val admin = new java.util.HashSet[UTF8String]()
    Seq("fast", "slow").foreach(w => admin.add(UTF8String.fromString(w)))
    val states = new java.util.HashMap[UTF8String, UTF8String]()
    Seq("data" -> "DT", "key" -> "KY").foreach { case (w, u) =>
      states.put(UTF8String.fromString(w), UTF8String.fromString(u))
    }
    val palette = Seq("fast", "slow", "batch", "data", "key", "abc", "dd", "e")
    (1 to 200).foreach { _ =>
      val ws = (0 until rng.nextInt(25)).map(_ => palette(rng.nextInt(palette.length)))
      val sig = StreamSignalsUtil.signals(toks(ws), break, admin, states, 48L, 3, emitSentence = true)
      assert(sig.numElements() == ws.length)
      val starts = ws.scanLeft(0L)((acc, w) => acc + w.length + 1)
      var breaks = 0
      ws.zipWithIndex.foreach { case (w, i) =>
        val r = sig.getStruct(i, 7)
        assert(r.getLong(0) == breaks.toLong) // sent_id counts PRECEDING breaks
        assert(r.getLong(1) == starts(i))
        // fa = first admin occurrence with start >= tok_start - 48
        val occs = ws.zipWithIndex.filter(p => Set("fast", "slow")(p._1))
          .map(p => (starts(p._2), starts(p._2) + p._1.length))
        val fa = occs.find(_._1 >= starts(i) - 48L)
        fa match {
          case Some((s, e)) => assert(r.getLong(2) == s && r.getLong(3) == e)
          case None => assert(r.isNullAt(2) && r.isNullAt(3))
        }
        // ctx_uf = min UF among this sentence's state words
        val mySentIdx = ws.indices.filter(j =>
          ws.take(j).count(_ == "batch") == breaks)
        val ufs = mySentIdx.map(ws).flatMap(w =>
          Map("data" -> "DT", "key" -> "KY").get(w))
        if (ufs.isEmpty) assert(r.isNullAt(4))
        else assert(r.getUTF8String(4).toString == ufs.min)
        // grams: 1..3 tokens anchored here, null off the end
        val grams = r.getArray(5)
        (1 to 3).foreach { k =>
          if (i + k <= ws.length)
            assert(grams.getUTF8String(k - 1).toString == ws.slice(i, i + k).mkString(" "))
          else assert(grams.isNullAt(k - 1))
        }
        // sentence text = the space-joined tokens of this sentence
        assert(r.getUTF8String(6).toString == mySentIdx.map(ws).mkString(" "))
        if (w == "batch") breaks += 1
      }
    }
  }

  test("GramMatrix aggregate equals the posexplode self-join Gram bit-for-bit") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val m = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.microVec(col("embedding")).as("m"))
    val cells = m.agg(Similarity.gramCells(col("m"), 64))
      .head().getSeq[Long](0)
    assert(cells.length == 64 * 64 + 1)
    assert(cells(0) == m.count())
    val e = m.select(col("vec_id"), posexplode(col("m")).as(Seq("i", "mi")))
    val joined = e
      .join(e.select(col("vec_id"), col("i").as("j"), col("mi").as("mj")),
        Seq("vec_id"))
      .groupBy(col("i"), col("j")).agg(sum(col("mi") * col("mj")).as("raw"))
      .collect()
    assert(joined.length == 64 * 64)
    joined.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == cells(1 + i * 64 + j), s"cell ($i,$j)")
    }
  }
}
