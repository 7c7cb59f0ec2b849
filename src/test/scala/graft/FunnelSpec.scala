package graft

import graft.operators.Funnel

/** Ordered-funnel semantics against hand-traced users: sequential
  * first-match, strict ordering, stalls, and out-of-order events. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: strict in-order first-match, stalls keep nulls") {
    val ev = Seq(
      // user 1 completes in order
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:01:00")),
      (1L, "purchase", ts("2024-01-01 00:02:00")),
      // user 2: purchase BEFORE the first view-then-click chain → stalls at 2
      (2L, "purchase", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 00:01:00")),
      (2L, "click", ts("2024-01-01 00:02:00")),
      // user 3: click precedes view → the early click must not count
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "view", ts("2024-01-01 00:01:00")),
      // user 4: no funnel event at all → stage 0, still reported
      (4L, "error", ts("2024-01-01 00:00:00")),
      // user 5: ties are NOT progress (strict >)
      (5L, "view", ts("2024-01-01 00:00:00")),
      (5L, "click", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy($"user_id")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 1),
      got.toString)
    // stage-1 time is the first view even when later events exist
    val u1 = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .filter($"user_id" === 1L).collect().head
    assert(u1.getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(u1.getTimestamp(3) == ts("2024-01-01 00:02:00"))
    intercept[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", "event_type", "ts", Nil))
    intercept[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("view", "view")))
  }

  test("conversion: hand-traced counts, rates, and exact median gaps") {
    val ev = Seq(
      // user 1: full funnel, view→click 60 s, click→purchase 60 s
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:01:00")),
      (1L, "purchase", ts("2024-01-01 00:02:00")),
      // user 2: view→click 180 s, stalls there
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 00:03:00")),
      // user 3: view only
      (3L, "view", ts("2024-01-01 00:00:00")),
      // user 4: no funnel event → counts toward n_total only
      (4L, "error", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    // exact mode: this test pins the interpolated-median semantics the
    // DuckDB oracle shares (the default is the approx sketch, q128-gated)
    val got = Funnel.conversion(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), approxMedian = false)
      .orderBy($"stage_idx").collect()
    assert(got.length == 3)
    val view = got(0); val click = got(1); val purchase = got(2)
    assert(view.getLong(2) == 3 && click.getLong(2) == 2 &&
      purchase.getLong(2) == 1)
    assert(view.getDouble(3) == 0.75)     // 3 of 4 users saw a view
    assert(click.getDouble(3) == 0.666667) // 2 of 3 viewers clicked
    assert(purchase.getDouble(3) == 0.5)   // 1 of 2 clickers purchased
    assert(view.isNullAt(4), "stage 1 has no predecessor gap")
    // median of {60, 180} interpolates to 120; purchase gap is the lone 60
    assert(click.getDouble(4) == 120.0)
    assert(purchase.getDouble(4) == 60.0)
  }
}
