package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.core._

/**
 * Core dataflow algebra tests, including the README-derived golden flows
 * (reference: /root/reference/README.markdown:48-205).
 */
class FlowSpec extends SparkSpec {
  import spark.implicits._

  /** README example 1 (README.markdown:48-64): step1 computes a+b and a−b,
    * step2 multiplies → (5+5)*(5−5) = 0. */
  test("golden arith chain: (a+b)*(a-b) from {a:5,b:5}") {
    val app = new App(spark)
    val step2 = app.step("step2", df =>
      df.select(($"sum" * $"diff").as("result")))
    val step1 = app.step("step1", df =>
      df.select(($"a" + $"b").as("sum"), ($"a" - $"b").as("diff")),
      next = Some(step2))
    val in = Seq((5, 5)).toDF("a", "b")
    val out = app.run(step1, in)("step2").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0))
  }

  test("StopFlowFlag semantics: filter stage drops records") {
    val app = new App(spark)
    val sink = app.step("sink", identity)
    val filt = app.step("filt", df => df.filter($"x" % 2 === 0), next = Some(sink))
    val out = app.run(filt, (1 to 10).toDF("x"))("sink").as[Int].collect().sorted
    assert(out.toSeq == Seq(2, 4, 6, 8, 10))
  }

  test("arg projection: declared inputCols prune extras, missing col fails") {
    val app = new App(spark)
    val s = app.step("proj", identity, inputCols = Seq("a", "b"))
    val out = app.run(s, Seq((1, 2, 3)).toDF("a", "b", "c"))("proj")
    assert(out.columns.toSeq == Seq("a", "b")) // extra col silently dropped

    val app2 = new App(spark)
    val s2 = app2.step("proj2", identity, inputCols = Seq("a", "missing"))
    intercept[Exception] { // ≙ TypeError on missing kwarg
      app2.run(s2, Seq((1, 2)).toDF("a", "b"))("proj2").collect()
    }
  }

  test("duplicate step name raises (register_step uniqueness)") {
    val app = new App(spark)
    app.step("dup", identity)
    intercept[DuplicateStepException] { app.step("dup", identity) }
  }

  test("factory step: 1-to-N expansion via explode") {
    val app = new App(spark)
    val count = app.step("cnt", df => df.groupBy($"item").count())
    val fac = app.factoryStep("expand", df =>
      df.select(explode(split($"csv", ",")).as("item")), next = Some(count))
    val out = app.run(fac, Seq("a,b", "a,c").toDF("csv"))("cnt")
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("hub fan-out: both branches see all rows, results merged by name") {
    val app = new App(spark)
    val double = app.step("double", df => df.select(($"x" * 2).as("y")))
    val square = app.step("square", df => df.select(($"x" * $"x").as("y")))
    val res = app.run(
      app.step("src", identity, next = Some(Hub(double, square))),
      Seq(1, 2, 3).toDF("x"))
    assert(res.names == Set("double", "square"))
    assert(res("double").as[Int].collect().sorted.toSeq == Seq(2, 4, 6))
    assert(res("square").as[Int].collect().sorted.toSeq == Seq(1, 4, 9))
  }

  test("hub zip variant routes one input per branch (next_step.py:34-39)") {
    val app = new App(spark)
    val hub = Hub(
      app.step("z1", df => df.select(($"x" * 10).as("y"))),
      app.step("z2", df => df.select(($"x" + 1).as("y"))))
    val res = app.runZip(hub, Seq(Seq(1, 2).toDF("x"), Seq(7).toDF("x")))
    assert(res("z1").as[Int].collect().sorted.toSeq == Seq(10, 20))
    assert(res("z2").as[Int].collect().toSeq == Seq(8))
  }

  test("hub zip variant: wrong arity fails at plan build (next_step.py:34-36)") {
    val app = new App(spark)
    val hub = Hub(app.step("b1", identity), app.step("b2", identity))
    intercept[HubArityException] {
      app.runZip(hub, Seq(Seq(1).toDF("x")))
    }
  }

  test("hub+reducer: count-complete fan-in joins branch results per record") {
    // ≙ README.markdown:159-205 — two branches compute per-record metrics;
    // the reducer sees job_list of size 2 per hub job.
    val app = new App(spark)
    val red = app.reducerStep("red", g => g.select(
      (element_at($"job_list", 1).getField("v") +
        element_at($"job_list", 2).getField("v")).as("total")))
    val b1 = app.step("b1", df => df.withColumn("v", $"x" * 10), next = Some(red))
    val b2 = app.step("b2", df => df.withColumn("v", $"x" + 1), next = Some(red))
    val out = app.run(
      app.step("src0", identity, next = Some(Hub(b1, b2))),
      Seq(1, 2).toDF("x"))("red").as[Int].collect().sorted
    // per record: 10x + (x+1) → 12, 23
    assert(out.toSeq == Seq(12, 23))
  }

  test("reducer drops incomplete hub groups (count-complete trigger)") {
    val app = new App(spark)
    val red = app.reducerStep("red2", g => g.select(size($"job_list").as("n")))
    // branch b2 filters out odd x AFTER the hub → those hub jobs stay
    // incomplete and must not be emitted (≙ reducer TTL expiry of
    // incomplete groups, reducer_engine.py:40-43)
    val b1 = app.step("b1x", df => df.withColumn("v", lit(1)), next = Some(red))
    val b2 = app.step("b2x", df => df.filter($"x" % 2 === 0)
      .withColumn("v", lit(2)), next = Some(red))
    val out = app.run(
      app.step("src1", identity, next = Some(Hub(b1, b2))),
      Seq(1, 2, 3, 4).toDF("x"))("red2").as[Int].collect()
    assert(out.length == 2) // only x=2 and x=4 complete both branches
    assert(out.forall(_ == 2))
  }

  test("save_result captures mid-flow output (step.py:100-104)") {
    val app = new App(spark)
    val last = app.step("last", df => df.select(($"m" * 2).as("f")))
    val mid = app.step("mid", df => df.select(($"x" + 1).as("m")),
      next = Some(last), saveResult = true)
    val res = app.run(mid, Seq(1).toDF("x"))
    assert(res.names == Set("mid", "last"))
    assert(res("mid").as[Int].collect().toSeq == Seq(2))
    assert(res("last").as[Int].collect().toSeq == Seq(4))
  }

  test("meta columns are hidden from user-visible results") {
    val app = new App(spark)
    val leaf = app.step("leaf", identity)
    val res = app.run(
      app.step("s", identity, next = Some(Hub(leaf))), Seq(1).toDF("x"))
    assert(res("leaf").columns.toSeq == Seq("x")) // no __hub_* columns
  }

  test("meta columns are hidden from reducer results too") {
    val app = new App(spark)
    // a handler that keeps its grouped input as-is would previously leak
    // __hub_job_id into the FlowResult — terminal steps never do
    val red = app.reducerStep("leaky_red", identity)
    val b1 = app.step("lr_b1", df => df.withColumn("v", lit(1)), next = Some(red))
    val b2 = app.step("lr_b2", df => df.withColumn("v", lit(2)), next = Some(red))
    val res = app.run(
      app.step("lr_src", identity, next = Some(Hub(b1, b2))), Seq(1).toDF("x"))
    assert(!res("leaky_red").columns.exists(_.startsWith("__hub_")),
      s"meta leaked: ${res("leaky_red").columns.toSeq}")
  }

  test("nested Hub under an unreduced Hub is rejected, not silently wrong") {
    val app = new App(spark)
    val inner = Hub(app.step("nh_i1", identity), app.step("nh_i2", identity))
    val outer = Hub(app.step("nh_o1", identity, next = Some(inner)),
      app.step("nh_o2", identity))
    intercept[UnsupportedOperationException] {
      app.run(app.step("nh_src", identity, next = Some(outer)), Seq(1).toDF("x"))
    }
  }

  test("FactoryStep expansion feeding a reducer is rejected at build time") {
    val app = new App(spark)
    val red = app.reducerStep("ff_red", identity)
    val expand = app.factoryStep("ff_expand",
      df => df.select(explode(array(lit(1), lit(2))).as("e")), next = Some(red))
    val hub = Hub(app.step("ff_b1", identity, next = Some(expand)),
      app.step("ff_b2", identity, next = Some(red)))
    val ex = intercept[IllegalArgumentException] {
      app.run(app.step("ff_src", identity, next = Some(hub)), Seq(1).toDF("x"))
    }
    assert(ex.getMessage.contains("FactoryStep"), ex.getMessage)
  }

  test("hub job ids survive recomputation of the tagged frame") {
    // uuid() would regenerate different ids when the persisted tag frame
    // is evicted and re-evaluated, silently emptying the reducer output;
    // the deterministic id must reproduce exactly
    val app = new App(spark)
    val red = app.reducerStep("rc_red", g => g.select(
      (element_at($"job_list", 1).getField("v") +
        element_at($"job_list", 2).getField("v")).as("s")))
    val b1 = app.step("rc_b1", df => df.withColumn("v", $"x"), next = Some(red))
    val b2 = app.step("rc_b2", df => df.withColumn("v", $"x" * 10), next = Some(red))
    val res = app.run(
      app.step("rc_src", identity, next = Some(Hub(b1, b2))),
      Seq(1, 2, 3).toDF("x"))
    app.cleanup() // evict the persisted tag frame BEFORE the action runs
    val out = res("rc_red").as[Int].collect().sorted
    assert(out.toSeq == Seq(11, 22, 33),
      s"job ids diverged across recomputation: ${out.toSeq}")
  }
}
