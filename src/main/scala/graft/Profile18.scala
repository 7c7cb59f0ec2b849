package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-18 scratch profiler (not part of the driver contract): runs the
  * named queries once warm + once timed under a job listener, printing a
  * per-Spark-job time breakdown (jobId, seconds, call site) so the time
  * inside multi-action verdict gates can be attributed, and dumps each
  * query's `explain("formatted")` to `plans/r18/<name>_<tag>.txt`.
  *
  * Usage: runMain graft.Profile18 <tag> <query...>
  * (tag = "before" / "after"; env SPARK_GRAFT_SF_DIR picks the data dir).
  */
object Profile18 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: Profile18 <tag> <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile18")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // attribute the job to the first graft frame in any stage's
        // submission stack (the `details` field carries the user stack)
        val site = js.stageInfos.iterator
          .flatMap(_.details.linesIterator)
          .map(_.trim)
          .find(l => l.contains("graft.") && !l.contains("Profile18"))
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, t0, (je.time - t0) / 1e3, site))
        }
      }
    })

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
      // drain listener events before reading the breakdown
      Thread.sleep(500)
      println(f"[p18] ===== $name%s total=$tTotal%.2f s (build=$tBuild%.2f s)")
      import scala.jdk.CollectionConverters._
      val byJob = done.asScala.toSeq.sortBy(_._2)
      val base = byJob.headOption.map(_._2).getOrElse(0L)
      byJob.foreach { case (id, t0j, sec, site) =>
        println(f"[p18]   job $id%4d  +${(t0j - base) / 1e3}%7.2f  $sec%7.3f s  $site%s")
      }
      println(f"[p18]   jobs=${byJob.size}%d sumJobs=${byJob.map(_._3).sum}%.2f s")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val dir = java.nio.file.Paths.get("/root/repo/plans/r18")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$tag.txt"), plan)
      graft.operators.OpCache.release()
    }
    spark.stop()
  }
}
