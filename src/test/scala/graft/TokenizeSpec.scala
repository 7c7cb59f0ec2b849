package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenize

/** BPE merge learning (q177): the distributed trainer must equal a naive
  * sequential Sennrich-style reference — pair counts over all adjacent
  * positions (overlapping runs included), argmax with the (count desc,
  * lhs, rhs) tie-break, greedy left-to-right non-overlapping merge
  * application. Fixtures stay ASCII so the reference's String ordering
  * (UTF-16 code units) cannot diverge from the engine's UTF-8 binary
  * collation; cross-engine unicode parity is the DuckDB oracle's job. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive sequential reference -----------------------------------

  private def naiveApply(v: Vector[String], l: String,
                         r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < v.length) {
      if (i + 1 < v.length && v(i) == l && v(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += v(i); i += 1 }
    }
    b.result()
  }

  /** (merge table, final segmentations) from a word-frequency map. */
  private def naiveBpe(wordFreq: Map[String, Long], merges: Int,
                       minCount: Long)
      : (Seq[(Int, String, String, String, Long)], Map[String, Vector[String]]) = {
    var segs = wordFreq.map { case (w, f) =>
      w -> (w.map(_.toString).toVector, f)
    }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var it = 1
    var stop = false
    while (it <= merges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.values.foreach { case (v, f) =>
        v.indices.dropRight(1).foreach { i =>
          val k = (v(i), v(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) stop = true
      else {
        val ((l, r), c) = eligible.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((it, l, r, l + r, c))
        segs = segs.map { case (w, (v, f)) => w -> (naiveApply(v, l, r), f) }
        it += 1
      }
    }
    (out.result(), segs.map { case (w, (v, _)) => w -> v })
  }

  private def learn(corpus: Seq[String], merges: Int, minCount: Long = 1L) =
    Tokenize.bpeMerges(corpus.toDF("text"), "text", merges, minCount)
      .orderBy("merge_idx")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .toSeq

  private def learnLocal(corpus: Seq[String], merges: Int,
                         minCount: Long = 1L, topV: Int = 1 << 16) =
    Tokenize.bpeMergesLocal(corpus.toDF("text"), "text", merges, minCount,
        topV)
      .orderBy("merge_idx")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .toSeq

  private def wordFreq(corpus: Seq[String]): Map[String, Long] =
    corpus.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  // ---- gates ---------------------------------------------------------

  test("bpeMerges matches the hand-computed Sennrich example") {
    // the paper's running example: {low:5, lower:2, newest:6, widest:3}
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val got = learn(corpus.map(w => w), merges = 4)
    // e+s (9) → es+t (9) → lo (7) → low (7); ties broken lexicographically
    assert(got.map(m => (m._2, m._3, m._5)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    assert(got.map(_._4) == Seq("es", "est", "lo", "low"))
  }

  test("bpeMerges equals the naive reference on a seeded random corpus") {
    val rnd = new scala.util.Random(177)
    val letters = "abcdefgh"
    def word() =
      (0 until (2 + rnd.nextInt(6))).map(_ => letters(rnd.nextInt(letters.length))).mkString
    val corpus = (0 until 120).map(_ =>
      (0 until (1 + rnd.nextInt(5))).map(_ => word()).mkString(" "))
    val (expect, _) = naiveBpe(wordFreq(corpus), merges = 12, minCount = 2L)
    assert(learn(corpus, merges = 12, minCount = 2L) == expect)
  }

  test("repeated-symbol runs merge greedily left-to-right (boundary pin)") {
    // 'aaaaa' under merge (a,a): greedy non-overlapping → [aa, aa, a].
    // This is exactly what the double-space replace encoding must
    // preserve — a single-space join would under-merge the run.
    val corpus = Seq("aaaaa aaaaa b")
    val (expect, expectSegs) = naiveBpe(wordFreq(corpus), 3, 1L)
    assert(learn(corpus, merges = 3, minCount = 1L) == expect)
    val merges = expect.map(m => (m._2, m._3))
    val got = Seq("aaaaa").toDF("w")
      .select(Tokenize.bpeSegment(col("w"), merges).as("s"))
      .collect()(0).getSeq[String](0).toVector
    assert(got == expectSegs("aaaaa"))
  }

  test("bpeSegment with the learned table reproduces the trainer's " +
      "final segmentation for every corpus word") {
    val rnd = new scala.util.Random(771)
    val letters = "abcde"
    def word() =
      (0 until (2 + rnd.nextInt(5))).map(_ => letters(rnd.nextInt(letters.length))).mkString
    val corpus = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(4))).map(_ => word()).mkString(" "))
    val freq = wordFreq(corpus)
    val (table, finalSegs) = naiveBpe(freq, merges = 10, minCount = 1L)
    assert(learn(corpus, merges = 10, minCount = 1L) == table)
    val merges = table.map(m => (m._2, m._3))
    val got = freq.keys.toSeq.toDF("w")
      .select(col("w"), Tokenize.bpeSegment(col("w"), merges).as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got == finalSegs)
    // empty/NULL words segment to the empty array
    val edge = Seq[(java.lang.Long, String)]((1L, ""), (2L, null))
      .toDF("id", "w")
      .select(Tokenize.bpeSegment(col("w"), merges).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(edge.forall(_.isEmpty))
  }

  test("bpeMergesLocal equals bpeMerges and the naive reference at full " +
      "vocab, across seeds and early stops") {
    // the production driver-side learner must be an EXACT drop-in for
    // the distributed per-merge loop when topV covers the vocabulary —
    // same counts, same tie-breaks, same early stop
    for (seed <- Seq(18, 181, 1818)) {
      val rnd = new scala.util.Random(seed)
      val letters = "abcdefgh"
      def word() = (0 until (2 + rnd.nextInt(6)))
        .map(_ => letters(rnd.nextInt(letters.length))).mkString
      val corpus = (0 until 120).map(_ =>
        (0 until (1 + rnd.nextInt(5))).map(_ => word()).mkString(" "))
      val (expect, _) = naiveBpe(wordFreq(corpus), merges = 24, minCount = 2L)
      assert(learnLocal(corpus, merges = 24, minCount = 2L) == expect,
        s"seed $seed")
      // incremental pair maintenance must also survive the long tail:
      // learn far past the 24 above until exhaustion and recheck
      val (deep, _) = naiveBpe(wordFreq(corpus), merges = 200, minCount = 2L)
      assert(learnLocal(corpus, merges = 200, minCount = 2L) == deep,
        s"seed $seed deep")
    }
    // the Sennrich worked example, via the local learner
    val sennrich = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    assert(learnLocal(sennrich, merges = 4).map(m => (m._2, m._3, m._5)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("bpeMergesLocal topV cap learns over exactly the capped vocabulary") {
    // cap = 2 keeps the two most frequent words (freq desc, word):
    // 'newest' (6) and 'low' (5); merges must equal the naive learner
    // run over just those — 'wider'/'lower' pair mass is gone
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val capped = Map("newest" -> 6L, "low" -> 5L)
    val (expect, _) = naiveBpe(capped, merges = 6, minCount = 2L)
    assert(learnLocal(corpus, merges = 6, minCount = 2L, topV = 2) == expect)
  }

  test("bpeEncode (native loop) equals bpeSegment (chained literals) " +
      "and the trainer's final segmentation; null/empty edges match") {
    val rnd = new scala.util.Random(8118)
    val letters = "abcde"
    def word() = (0 until (2 + rnd.nextInt(5)))
      .map(_ => letters(rnd.nextInt(letters.length))).mkString
    val corpus = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(4))).map(_ => word()).mkString(" "))
    val freq = wordFreq(corpus)
    val (table, finalSegs) = naiveBpe(freq, merges = 16, minCount = 1L)
    val merges = table.map(m => (m._2, m._3))
    val rows = freq.keys.toSeq.toDF("w")
      .select(col("w"),
        Tokenize.bpeSegment(col("w"), merges).as("chained"),
        Tokenize.bpeEncode(col("w"), merges).as("native"))
      .collect()
    rows.foreach { r =>
      val w = r.getString(0)
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"word $w")
      assert(r.getSeq[String](2).toVector == finalSegs(w), s"word $w")
    }
    // multi-char repeated runs through the native loop (the boundary pin)
    val runSeg = Seq("aaaaa").toDF("w")
      .select(Tokenize.bpeEncode(col("w"), Seq(("a", "a"))).as("s"))
      .collect()(0).getSeq[String](0).toVector
    assert(runSeg == Vector("aa", "aa", "a"))
    val edge = Seq[(java.lang.Long, String)]((1L, ""), (2L, null))
      .toDF("id", "w")
      .select(Tokenize.bpeEncode(col("w"), merges).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(edge.forall(_.isEmpty))
  }

  test("bpeFit reports per-group fertility from the learned table, " +
      "matching the naive reference's final segmentation arithmetic") {
    val rnd = new scala.util.Random(182)
    val letters = "abcdef"
    def word() =
      (0 until (2 + rnd.nextInt(5))).map(_ => letters(rnd.nextInt(letters.length))).mkString
    val rows = (0 until 80).map { i =>
      (if (i % 3 == 0) "g1" else "g2",
        (0 until (1 + rnd.nextInt(4))).map(_ => word()).mkString(" "))
    }
    val (_, finalSegs) = naiveBpe(wordFreq(rows.map(_._2)), 6, 1L)
    // expected ratios from the naive segmentation, exact integer sums
    val expect = rows
      .flatMap { case (g, t) =>
        t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).map(w => (g, w)) }
      .groupBy(identity).map { case ((g, w), occ) => (g, w, occ.size.toLong) }
      .groupBy(_._1).map { case (g, ws) =>
        val nTok = ws.map(_._3).sum
        val nSym = ws.map { case (_, w, f) => f * finalSegs(w).size }.sum
        val nChr = ws.map { case (_, w, f) => f * w.length }.sum
        def r4(x: Double) = BigDecimal(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        g -> ((nTok, ws.map(_._2).toSet.size.toLong,
          r4(nSym.toDouble / nTok), r4(nChr.toDouble / nSym)))
      }
    val got = Tokenize.bpeFit(rows.toDF("grp", "text"), "text", "grp",
        merges = 6, minPairCount = 1L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expect, s"$got vs $expect")
    // fertility is bounded by [1, chars-per-word]: at least one symbol
    // per word, never more symbols than characters
    got.values.foreach { case (_, _, spw, cps) =>
      assert(spw >= 1.0 && cps >= 1.0, got.toString)
    }
  }

  test("spanCorrupt: sentinel round-trip reconstructs the original text; " +
      "the mask rate is exactly spanLen per full window; edges hold") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(183)
    val docs = (0L until 40L).map { i =>
      // lengths straddle every window edge: 0, 1, 2 (sub-span), 3, 19,
      // 20, 21, 22, 23 and longer multi-window docs
      val n = Seq(0, 1, 2, 3, 19, 20, 21, 22, 23, 45, 60, 61)(
        (i % 12).toInt)
      (i, (0 until n).map(j => s"w${i}x$j").mkString(" "))
    }
    val out = Tokenize.spanCorrupt(docs.toDF("id", "text"), "text", "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    val sent = "<extra_id_(\\d+)>".r
    docs.foreach { case (id, text) =>
      val (nTok, nSpans, nInp, input, target) = out(id)
      val orig = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(nTok == orig.size, s"doc $id")
      // masked token count is exactly spanLen per masked window
      assert(nTok - (nInp - nSpans) == 3 * nSpans, s"doc $id")
      // parse the target into sentinel → span map; final sentinel closes
      val tToks = target.split(" ").toSeq
      assert(tToks.last == s"<extra_id_$nSpans>", s"doc $id: $target")
      val spans = scala.collection.mutable.Map.empty[Int, Seq[String]]
      var cur = -1
      tToks.dropRight(1).foreach {
        case sent(k) => cur = k.toInt; spans(cur) = Nil
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.values.forall(_.size == 3), s"doc $id: $spans")
      // the round-trip invariant: substituting each sentinel with its
      // span rebuilds the original token stream exactly
      val rebuilt = (if (input.isEmpty) Seq.empty[String]
        else input.split(" ").toSeq).flatMap {
        case sent(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      assert(rebuilt == orig, s"doc $id: $rebuilt vs $orig")
      // sub-span docs (n < 3) mask nothing
      if (orig.size < 3) assert(nSpans == 0, s"doc $id")
    }
    // empty doc: empty input, bare closing sentinel
    assert(out(0L)._4 == "" && out(0L)._5 == "<extra_id_0>")
    // salt redraws the offsets; same rows, different masks somewhere
    val salted = Tokenize.spanCorrupt(docs.toDF("id", "text"), "text", "id",
        salt = "s").collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(docs.exists { case (id, _) => salted(id) != out(id)._4 })
    // partition-order-free
    val rep = Tokenize.spanCorrupt(docs.toDF("id", "text").repartition(7),
        "text", "id").collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(rep == out.map { case (k, v) => k -> v._4 })
  }

  test("minPairCount stops learning early; result is partition-order-free") {
    val corpus = Seq("ab ab ab", "cd cd", "ef")
    // pairs: (a,b)=3, (c,d)=2, (e,f)=1 → at minCount 2 only two merges
    // exist no matter how many were asked for
    val got = learn(corpus, merges = 8, minCount = 2L)
    assert(got.map(m => (m._2, m._3, m._5)) ==
      Seq(("a", "b", 3L), ("c", "d", 2L)))
    // same table from a differently-partitioned input
    val repart = Tokenize.bpeMerges(
        corpus.toDF("text").repartition(5), "text", 8, 2L)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(repart == got.map(m => (m._2, m._3, m._5)))
  }
}
