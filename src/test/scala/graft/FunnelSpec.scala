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
}
