package graft

import graft.core._
import graft.observe.Signals

class SignalsSpec extends SparkSpec {
  import spark.implicits._

  test("flow runner fires before/after/finished signals in order") {
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val l = new Signals.FlowListener {
      override def beforeStep(s: String): Unit = events += s"before:$s"
      override def afterStep(s: String): Unit = events += s"after:$s"
      override def flowFinished(t: Set[String]): Unit =
        events += s"finished:${t.toSeq.sorted.mkString(",")}"
    }
    Signals.addListener(l)
    try {
      val app = new App(spark)
      val s2 = app.step("sig2", identity)
      val s1 = app.step("sig1", identity, next = Some(s2))
      app.run(s1, Seq(1).toDF("x"))
      assert(events.toSeq == Seq(
        "before:sig1", "after:sig1", "before:sig2", "after:sig2",
        "finished:sig2"))
    } finally Signals.removeListener(l)
  }

  test("StepStats reports per-step execution counts and a windowed rate") {
    val stats = graft.observe.StepStats.attach()
    try {
      val app = new App(spark)
      val t2 = app.step("ss_b", identity)
      val t1 = app.step("ss_a", identity, next = Some(t2))
      app.run(t1, Seq(1).toDF("x"))
      app.run(t1, Seq(2).toDF("x"))
      app.run(t1, Seq(3).toDF("x"))
      assert(stats.count("ss_a") == 3 && stats.count("ss_b") == 3)
      assert(stats.snapshot.filter(_._1.startsWith("ss_")) ==
        Map("ss_a" -> 3L, "ss_b" -> 3L))
      assert(stats.ratePerSec("ss_a", windowMs = 60000L) > 0.0)
      assert(stats.ratePerSec("ss_never_ran") == 0.0)
    } finally Signals.removeListener(stats)
  }

  test("ExecutionStats listener counts actions on the session") {
    val stats = graft.observe.ExecutionStats.attach(spark)
    Seq(1, 2, 3).toDF("x").count()
    // listener bus is async; give it a beat
    val deadline = System.currentTimeMillis() + 10000
    while (stats.snapshot("actions") < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(stats.snapshot("actions") >= 1)
    assert(stats.snapshot("failures") == 0)
  }
}
