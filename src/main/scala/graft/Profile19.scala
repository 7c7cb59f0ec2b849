package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-19 scratch profiler (not part of the driver contract): runs the
  * named queries once warm + once timed under a job listener, printing a
  * per-Spark-job time breakdown (jobId, start offset, seconds, call site)
  * so the time inside multi-action verdict gates can be attributed, and
  * dumps each query's `explain("formatted")` to
  * `$SPARK_GRAFT_PLANS_DIR/<name>_<tag>.txt`.
  *
  * Usage: runMain graft.Profile19 <tag> <query...>
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (local core
  * count — the bench's own knob, so profiles match the bench's session
  * shape), SPARK_GRAFT_PLANS_DIR (plan-dump dir, default plans/r19
  * under the cwd). Replaces Profile18, whose hardcoded /root paths,
  * pinned local[32] master and fixed-sleep listener drain were the r18
  * advice items; the drain below polls the listener queue until it has
  * been quiet for 200 ms instead of hoping 500 ms was enough.
  */
object Profile19 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: Profile19 <tag> <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
      java.nio.file.Paths.get("plans", "r19").toAbsolutePath.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile19")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Double, String)]()
    val lastEvent = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        lastEvent.set(System.nanoTime())
        // attribute the job to the first graft frame in any stage's
        // submission stack (the `details` field carries the user stack)
        val site = js.stageInfos.iterator
          .flatMap(_.details.linesIterator)
          .map(_.trim)
          .find(l => l.contains("graft.") && !l.contains("Profile19"))
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        lastEvent.set(System.nanoTime())
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, t0, (je.time - t0) / 1e3, site))
        }
      }
    })
    // drain: poll until the listener has been quiet for 200 ms (bounded
    // at 5 s) — a fixed sleep either wastes time or races the bus
    def drain(): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      lastEvent.set(System.nanoTime())
      while (System.nanoTime() < deadline &&
          (System.nanoTime() - lastEvent.get()) < 200L * 1000 * 1000)
        Thread.sleep(20)
    }

    names.foreach { name =>
      // warm pass (codegen + JIT + footer caches), breakdown discarded
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.operators.OpCache.release()
      done.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val tTotal = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"[p19] ===== $name%s total=$tTotal%.2f s (build=$tBuild%.2f s)")
      import scala.jdk.CollectionConverters._
      val byJob = done.asScala.toSeq.sortBy(_._2)
      val base = byJob.headOption.map(_._2).getOrElse(0L)
      byJob.foreach { case (id, t0j, sec, site) =>
        println(f"[p19]   job $id%4d  +${(t0j - base) / 1e3}%7.2f  $sec%7.3f s  $site%s")
      }
      println(f"[p19]   jobs=${byJob.size}%d sumJobs=${byJob.map(_._3).sum}%.2f s")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val dir = java.nio.file.Paths.get(plansDir)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$tag.txt"), plan)
      graft.operators.OpCache.release()
    }
    spark.stop()
  }
}
