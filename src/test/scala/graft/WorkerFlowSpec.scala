package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core._
import graft.streaming.{ParquetBoundary, StreamingReducer}

/**
 * End-to-end async-worker parity (SURVEY §3.2–3.3): the reference's
 * `as_worker=True` pushes hub-tagged jobs through a Redis queue to worker
 * processes that feed the reducer engine. Here the producer flow writes the
 * hub-tagged branch outputs to a durable stage boundary; a separate
 * streaming "worker" job drains it (AvailableNow ≙ die_when_empty) through
 * the stateful count-complete reducer. The async path must produce exactly
 * the rows of the in-process batch reducer.
 */
class WorkerFlowSpec extends SparkSpec {
  import spark.implicits._

  test("hub -> boundary -> streaming worker reducer == batch reducer") {
    val input = Seq(1, 2, 3, 4, 5).toDF("x")

    // ---- batch path: hub + in-plan reducer ----
    val appB = new App(spark)
    val redB = appB.reducerStep("wf_red", g => g.select(
      (element_at($"job_list", 1).getField("v") *
        element_at($"job_list", 2).getField("v")).as("prod")))
    val b1 = appB.step("wf_b1", df => df.withColumn("v", $"x" + 10), next = Some(redB))
    val b2 = appB.step("wf_b2", df => df.withColumn("v", $"x" * 2), next = Some(redB))
    val batchOut = appB.run(
      appB.step("wf_src", identity, next = Some(Hub(b1, b2))), input)("wf_red")
      .as[Int].collect().sorted

    // ---- async path: same branch stages, but each branch's output goes
    // through a durable boundary instead of an in-plan union ----
    val dir = java.nio.file.Files.createTempDirectory("worker_flow").toString
    val boundary = new ParquetBoundary(s"$dir/stage")
    val appS = new App(spark)
    // branch terminal steps write to the boundary (≙ Step.add_job enqueue)
    val s1 = appS.step("wfs_b1", df => {
      boundary.write(df.withColumn("v", $"x" + 10)); df
    })
    val s2 = appS.step("wfs_b2", df => {
      boundary.write(df.withColumn("v", $"x" * 2)); df
    })
    appS.run(appS.step("wfs_src", identity, next = Some(Hub(s1, s2))), input)

    // worker side: stream the boundary, drain everything, reduce
    val arrivals = StreamingReducer.toArrivals(boundary.readStream(spark))
    val completed = StreamingReducer.reduce(arrivals, ttlMs = 0L)
    val q = completed.writeStream.format("memory").queryName("wf_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamOut = spark.sql("SELECT * FROM wf_out")
      .select(explode(array($"jobList")).as("jl"))
      .select(
        (get_json_object($"jl"(0), "$.v").cast("int") *
          get_json_object($"jl"(1), "$.v").cast("int")).as("prod"))
      .as[Int].collect().sorted

    assert(streamOut.toSeq == batchOut.toSeq,
      s"async worker path diverged: ${streamOut.toSeq} vs ${batchOut.toSeq}")
    // expected: (x+10)*(2x) for x=1..5
    assert(batchOut.toSeq == Seq(1, 2, 3, 4, 5).map(x => (x + 10) * 2 * x).sorted)
  }
}
