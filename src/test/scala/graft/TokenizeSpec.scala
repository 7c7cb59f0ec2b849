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

  // ---- unigram-LM trainer (Kudo 2018, q191) --------------------------

  /** Independent enumerative reference for the unigram trainer: same
    * documented seed/prune/rank rules, but the E-step ENUMERATES every
    * segmentation of every word and weights by the product of piece
    * probabilities — no lattice, no log-sum-exp — so the trainer's
    * forward-backward is checked by a genuinely different algorithm.
    * ASCII fixtures keep String ordering ≡ UTF-8 code-point ordering. */
  private def naiveUnigram(corpus: Seq[String], vocabSize: Int,
                           maxPieceLen: Int, seedSize: Int, emIters: Int,
                           shrink: Double): Seq[(String, Double)] = {
    import scala.collection.mutable
    val words = wordFreq(corpus).toSeq.sortBy { case (w, f) => (-f, w) }
    val subCount = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i))
      subCount(w.substring(i, i + l)) += f
    val singles = subCount.keys.filter(_.length == 1).toSeq.sorted
    val multis = subCount.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - singles.size)).map(_._1)
    var pieces = (singles ++ multis).sorted
    var logp = {
      val tot = pieces.map(subCount(_).toDouble).sum
      pieces.map(p => p -> math.log(subCount(p) / tot)).toMap
    }
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxPieceLen, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        if (logp.contains(h)) segs(w.substring(l)).map(h +: _)
        else Seq.empty
      }
    var lastCounts = Map.empty[String, Double]
    def em(): Unit = {
      val counts = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((w, f) <- words) {
        val ss = segs(w).map(s => s -> math.exp(s.map(logp).sum))
        val z = ss.map(_._2).sum
        if (z > 0)
          for ((s, pr) <- ss; x <- s) counts(x) += f * pr / z
      }
      lastCounts = counts.toMap
      val tot = pieces.map(counts(_)).sum
      val denom = tot + 0.1 * pieces.size // the trainer's add-alpha floor
      logp = pieces.map(p => p -> math.log((counts(p) + 0.1) / denom)).toMap
    }
    (1 to emIters).foreach(_ => em())
    var nMulti = pieces.count(_.length > 1)
    val nSingles = pieces.size - nMulti
    while (pieces.size > math.max(vocabSize, nSingles)) {
      val surplus = pieces.size - math.max(vocabSize, nSingles)
      val drop = math.max(1, math.min(surplus, (nMulti * shrink).toInt))
      val victims = pieces.filter(_.length > 1)
        .sortBy(p => (lastCounts.getOrElse(p, 0.0), p)).take(drop).toSet
      pieces = pieces.filterNot(victims)
      nMulti -= victims.size
      (1 to emIters).foreach(_ => em())
    }
    pieces.map(p => p -> logp(p))
      .sortBy { case (p, l) => (-l, p) }
  }

  test("unigramFit equals the enumerative EM reference across seeds; " +
      "prob mass sums to one; singles survive pruning; deterministic") {
    for (seed <- Seq(19, 191)) {
      val rnd = new scala.util.Random(seed)
      val letters = "abcd"
      def word() = (0 until (2 + rnd.nextInt(4)))
        .map(_ => letters(rnd.nextInt(letters.length))).mkString
      val corpus = (0 until 80).map(_ =>
        (0 until (1 + rnd.nextInt(4))).map(_ => word()).mkString(" "))
      val expect = naiveUnigram(corpus, vocabSize = 12, maxPieceLen = 4,
        seedSize = 64, emIters = 2, shrink = 0.25)
      val got = Tokenize.unigramFit(corpus.toDF("text"), "text",
          vocabSize = 12, maxPieceLen = 4, seedSize = 64, emIters = 2,
          shrinkFactor = 0.25)
        .orderBy("piece_rank").collect()
        .map(r => (r.getString(1), r.getDouble(3))).toSeq
      assert(got.map(_._1) == expect.map(_._1),
        s"seed $seed: ${got.map(_._1)} vs ${expect.map(_._1)}")
      got.zip(expect).foreach { case ((p, lg), (_, le)) =>
        assert(math.abs(lg - le) < 1e-6, s"seed $seed piece $p: $lg vs $le")
      }
      // probability mass: the learned model is a distribution
      val mass = got.map { case (_, l) => math.exp(l) }.sum
      assert(math.abs(mass - 1.0) < 1e-6, s"seed $seed mass $mass")
      // every single code point of the corpus survives
      val haveSingles = got.map(_._1).filter(_.length == 1).toSet
      val wantSingles = corpus.flatMap(_.toLowerCase.replaceAll("\\s", ""))
        .map(_.toString).toSet
      assert(haveSingles == wantSingles, s"seed $seed")
      // deterministic across partitionings
      val rep = Tokenize.unigramFit(corpus.toDF("text").repartition(7),
          "text", vocabSize = 12, maxPieceLen = 4, seedSize = 64,
          emIters = 2, shrinkFactor = 0.25)
        .orderBy("piece_rank").collect()
        .map(r => (r.getString(1), r.getDouble(3))).toSeq
      assert(rep == got, s"seed $seed")
    }
  }

  test("unigramSegment: Viterbi equals exhaustive argmax; " +
      "reconstruction holds; unknown singles fall back; edges") {
    val rnd = new scala.util.Random(1911)
    val letters = "abc"
    def word() = (0 until (2 + rnd.nextInt(5)))
      .map(_ => letters(rnd.nextInt(letters.length))).mkString
    val corpus = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(3))).map(_ => word()).mkString(" "))
    val table = Tokenize.unigramFit(corpus.toDF("text"), "text",
        vocabSize = 10, maxPieceLen = 4, seedSize = 48)
      .orderBy("piece_rank").collect()
      .map(r => (r.getString(1), r.getDouble(3))).toSeq
    val lp = table.toMap
    def segsOf(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { l =>
        val h = w.substring(0, l)
        if (lp.contains(h)) segsOf(w.substring(l)).map(h +: _)
        else Seq.empty
      }
    val probe = (0 until 40).map(_ => word()).distinct
    val got = probe.toDF("w")
      .select(col("w"), Tokenize.unigramSegment(col("w"), table).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    probe.foreach { w =>
      val s = got(w)
      assert(s.mkString == w, s"reconstruction of $w: $s")
      val all = segsOf(w)
      if (all.nonEmpty) {
        val best = all.map(_.map(lp).sum).max
        val mine = s.map(lp).sum
        assert(math.abs(mine - best) < 1e-9,
          s"$w: viterbi $mine vs exhaustive $best ($s)")
      }
    }
    // unknown code point: emitted as a single, neighbors still optimal
    val unk = Seq("azb").toDF("w")
      .select(Tokenize.unigramSegment(col("w"),
        Seq(("a", -0.5), ("b", -0.7))).as("s"))
      .collect()(0).getSeq[String](0)
    assert(unk == Seq("a", "z", "b"), unk.toString)
    // null/empty → empty array
    val edge = Seq[(java.lang.Long, String)]((1L, ""), (2L, null))
      .toDF("id", "w")
      .select(Tokenize.unigramSegment(col("w"), table).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(edge.forall(_.isEmpty))
  }
}
