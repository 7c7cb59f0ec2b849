package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokens: lowercases, splits on runs of whitespace, empty-safe") {
    val df = Seq("  Hello   WORLD\tfoo ", "", "one").toDF("text")
    val out = df.select(tokens($"text").as("t")).as[Seq[String]].collect()
    assert(out(0) == Seq("hello", "world", "foo"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("one"))
  }

  test("tokenCount and wordOccurrences") {
    assert(one[Int](tokenCount($"text"), "a b  c") == 3)
    assert(one[Int](tokenCount($"text"), "") == 0)
    assert(one[Int](wordOccurrences($"text", "python"),
      "I love Python and python scripts") == 2)
  }

  test("bpeTokenCount segments letters/digits/punct separately") {
    // "hello world 123, it's" → hello|world|123|,|it|'s = 6
    assert(one[Int](bpeTokenCount($"text"), "hello world 123, it's") == 6)
    assert(one[Int](bpeTokenCount($"text"), "") == 0)
  }

  test("langId picks the language with most stopword hits") {
    val cases = Seq(
      "the cat sat on the mat and it was happy" -> "en",
      "der hund und die katze sind nicht mit ihm" -> "de",
      "le chat est dans la maison avec les enfants" -> "fr",
      "el perro y los gatos son para este niño" -> "es",
      "xyzzy qwerty asdf" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one[String](langId($"text"), text) == expected, s"for: $text")
    }
  }

  test("quality components are in [0,1] and score rewards clean prose") {
    val good = "the quick brown fox jumps over the lazy dog and it was good"
    val junk = "@@@ ### !!! $$$ %%% ^^^ &&&"
    val gq = one[Double](qualityScore($"text"), good)
    val jq = one[Double](qualityScore($"text"), junk)
    assert(gq > jq)
    assert(gq >= 0.0 && gq <= 1.0 && jq >= 0.0 && jq <= 1.0)
    assert(one[Double](punctRatio($"text"), "a,b.") == 0.5)
    assert(one[Double](alphaRatio($"text"), "ab12") == 0.5)
  }

  test("fingerprint is whitespace/case-normalized; fingerprint64 matches") {
    val df = Seq(("Hello  World", "hello world"), ("a b", "a c")).toDF("t1", "t2")
    val rows = df.select(
      (fingerprint($"t1") === fingerprint($"t2")).as("md5eq"),
      (fingerprint64($"t1") === fingerprint64($"t2")).as("xxeq")).collect()
    assert(rows(0).getBoolean(0) && rows(0).getBoolean(1))
    assert(!rows(1).getBoolean(0) && !rows(1).getBoolean(1))
  }

  test("shingles: sliding windows, whole-text fallback when short") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(shingles($"text", 3).as("s")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b")) // shorter than k → single whole-text shingle
  }

  test("winnowing: shared run of >= w+k-1 tokens guarantees a shared fingerprint") {
    val k = 3; val w = 4
    // two docs sharing a (w+k-1)=6-token run inside different surroundings
    val shared = "one two three four five six"
    val df = Seq(
      (1, s"alpha beta $shared gamma delta"),
      (2, s"zz yy xx ww $shared vv uu"),
      (3, "completely different words entirely here now")).toDF("id", "text")
    val fps = df
      .select($"id", transform(shingles($"text", k), g => md5(g)).as("gh"))
      .select($"id", winnowFromGramHashes($"gh", w).as("fps"))
      .as[(Int, Seq[String])].collect().toMap
    assert((fps(1).toSet & fps(2).toSet).nonEmpty,
      "docs sharing a w+k-1 run must share a winnowed fingerprint")
    assert((fps(1).toSet & fps(3).toSet).isEmpty)
    // selection is a subset of the gram hashes, never larger than gram count
    val nGrams = df.filter($"id" === 1)
      .select(size(shingles($"text", k))).as[Int].head()
    assert(fps(1).size <= nGrams)
  }

  test("repetition scores flag repeated n-grams (Gopher-style fractions)") {
    val df = Seq(
      (1L, "a a a b"),        // 2-grams: "a a","a a","a b" -> dup 2/3, top 2/3
      (2L, "x y z w"),        // all distinct -> dup 0, top 1/3
      (3L, "spam spam spam spam"), // "spam spam" x3 -> dup 1, top 1
      (4L, "solo")            // short doc -> single whole-text gram
    ).toDF("doc_id", "text")
    val out = graft.operators.TextProfile
      .repetitionScores(df, "text", "doc_id", n = 2)
      .select($"doc_id", $"dup_2gram_frac", $"top_2gram_frac")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 0.6667, 0.6667),
      (2L, 0.0, 0.3333),
      (3L, 1.0, 1.0),
      (4L, 0.0, 1.0)))
  }

  test("repetitionStats matches hand-computed Gopher fractions; blank " +
    "and short docs are all-zero; keep rule applies the A1 thresholds") {
    import graft.functions.TextFunctions.{repetitionStats, gopherRepetitionKeep}
    // "a b a b a\nx y\nx y": 17 chars, 3 lines (1 duplicate pair),
    // 9 words, bigram counts {a b:2, b a:2, x y:2, a x:1, y x:1},
    // all five 5-grams unique
    val df = Seq(
      (1L, "a b a b a\nx y\nx y"),
      (2L, ""),                 // blank: all zeros, 1 empty line
      (3L, "one two"),          // no 5-grams, unique bigram
      (4L, "w w w w w w w w"))  // degenerate: one repeated word
      .toDF("id", "text")
    val out = df.select($"id", repetitionStats($"text").as("r"),
        gopherRepetitionKeep($"text").as("keep"))
      .select($"id", $"r.n_lines", $"r.dup_line_frac",
        $"r.dup_line_char_frac", $"r.top_bigram_char_frac",
        $"r.dup_5gram_char_frac", $"keep")
      .as[(Long, Int, Double, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: dup_line 1/3; after-first chars of "x y" = 3/17; top bigram
    // mc=2, longest tied gram len 3 → 6/17; no duplicate 5-grams
    assert(out(1L) == ((1L, 3, 0.3333, 0.1765, 0.3529, 0.0, false)),
      out(1L).toString) // dup_line_frac 0.3333 > 0.30 → filtered
    assert(out(2L) == ((2L, 1, 0.0, 0.0, 0.0, 0.0, true)), out(2L).toString)
    // doc 3: single bigram "one two" (7 chars) count 1 → 7/7 = 1.0 > 0.2
    assert(out(3L) == ((3L, 1, 0.0, 0.0, 1.0, 0.0, false)), out(3L).toString)
    // doc 4: 15 chars; "w w" count 7, len 3 → 21/15 > 1 (overlaps) —
    // unclamped by design for the top gram; 5-grams "w w w w w" count 4,
    // len 9 → 36/15 clamped to 1.0 → filtered on both gram rules
    assert(out(4L) == ((4L, 1, 0.0, 0.0, 1.4, 1.0, false)), out(4L).toString)
  }

  test("contamination report counts distinct shared n-grams per train doc") {
    val eval = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "he saw the quick brown fox run far away"), // shares 2 distinct 3-grams
      (2L, "completely unrelated words everywhere here now"), // clean
      (3L, "quick brown fox jumps high quick brown fox jumps") // 2, deduped
    ).toDF("doc_id", "text")
    val out = graft.operators.TextProfile
      .contaminationReport(train, eval, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    // doc 1: "the quick brown","quick brown fox"; doc 3: "quick brown fox",
    // "brown fox jumps" (each once despite repetition); doc 2 absent
    assert(out.toSeq == Seq((1L, 2L), (3L, 2L)))
  }
}
