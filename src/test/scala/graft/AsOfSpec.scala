package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest right row at-or-before each left time") {
    val trades = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "B", 5L), (4L, "C", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0),
      ("B", 9L, 9.9)).toDF("sym", "qt", "px")
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select($"trade_id", $"asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(2.0)) // tie at t=10 is inclusive
    assert(out(2L).contains(3.0)) // latest <= 25 is qt=20
    assert(out(3L).isEmpty)       // B's only quote is at 9 > 5 → null
    assert(out(4L).isEmpty)       // C has no quotes
  }

  test("as-of join emits each left row exactly once") {
    val trades = Seq((1L, "A", 10L), (2L, "A", 10L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 1L, 1.0), ("A", 2L, 2.0)).toDF("sym", "qt", "px")
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
    assert(out.count() == 2)
    assert(out.select($"asof_px").as[Double].collect().toSeq == Seq(2.0, 2.0))
  }

  test("as-of attaches the matched row's NULL, never a stale older value") {
    // latest quote at-or-before t=30 is (qt=20, px=NULL): the join must
    // surface that NULL, not resurrect px=5.0 from qt=10
    val trades = Seq((1L, "A", 30L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 10L, Some(5.0)), ("A", 20L, None))
      .toDF("sym", "qt", "px")
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select($"asof_px").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None),
      s"stale value resurrected across a NULL: ${out.toSeq}")
  }

  test("as-of never mixes columns of different right rows") {
    // latest row is (qt=20, a=3, b=NULL); per-column carry would emit the
    // chimera (a=3, b=2) — a row that never existed
    val trades = Seq((1L, "A", 30L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 10L, Some(1), Some(2)), ("A", 20L, Some(3), None))
      .toDF("sym", "qt", "a", "b")
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", Seq("a", "b"))
      .select($"asof_a", $"asof_b").as[(Option[Int], Option[Int])].collect()
    assert(out.toSeq == Seq((Some(3), None)),
      s"chimera row assembled from two right rows: ${out.toSeq}")
  }

  test("as-of tie among equal-time right rows is deterministic") {
    val trades = Seq((1L, "A", 10L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 10L, 1.0), ("A", 10L, 2.0)).toDF("sym", "qt", "px")
    val picks = (1 to 5).map { i =>
      AsOf.join(trades, quotes.repartition(i), Seq("sym"), "t", "qt", Seq("px"))
        .select($"asof_px").as[Double].head()
    }
    assert(picks.distinct.size == 1,
      s"winner depends on partition layout: $picks")
  }

  test("a NULL rightTime row can never be the as-of match") {
    // NULL sorts first ascending: unfiltered, the null-time quote would
    // become the "latest at-or-before" for trades earlier than every real
    // quote — violating rightTime <= leftTime
    val trades = Seq((1L, "A", 5L), (2L, "A", 20L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", Some(10L), 1.0), ("A", None, 9.99))
      .toDF("sym", "qt", "px")
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select($"trade_id", $"asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).isEmpty, s"null-time quote matched: ${out(1L)}")
    assert(out(2L).contains(1.0))
  }

  test("as-of rejects unorderable right-value types with a clear error") {
    // the carried struct enters the window ORDER BY (equal-time tiebreak),
    // so a MapType right value must fail up front, not at analysis time
    val trades = Seq((1L, "A", 10L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 5L, Map("k" -> 1.0))).toDF("sym", "qt", "props")
    val err = intercept[IllegalArgumentException] {
      AsOf.join(trades, quotes, Seq("sym"), "t", "qt", Seq("props"))
    }
    assert(err.getMessage.contains("orderable") &&
      err.getMessage.contains("props"), err.getMessage)
    // the documented workaround keeps the payload joinable
    val fixed = AsOf.join(trades,
      quotes.withColumn("props", map_entries($"props")),
      Seq("sym"), "t", "qt", Seq("props"))
    assert(fixed.count() == 1)
  }

  test("approx_count_distinct within HLL++ error of exact") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val row = li.agg(
      approx_count_distinct($"l_partkey").as("a"),
      countDistinct($"l_partkey").as("e")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1, s"approx=$a exact=$e")
  }
}
