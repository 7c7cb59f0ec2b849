package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch per-query profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def run(name: String): Unit = time(name) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup")(docs.count())
    println(s"[profile] docs rows=${docs.count()} " +
      s"avg text len=${docs.select(avg(length(col("text")))).head.getDouble(0)}")

    // stage breakdown of q26
    val par = docs.repartition(32)
    time("q26a tokenize only")(
      par.select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .write.format("noop").mode("overwrite").save())
    time("q26b tokenize+groupBy")(
      par.select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 50)
        .write.format("noop").mode("overwrite").save())

    args.headOption match {
      case Some("all") =>
        Seq("q16_json", "q26_flow_factory", "q29_token_stats",
          "q31_quality_score", "q32_minhash_neardup", "q05_star_join",
          "q23_events_window").foreach(run)
      case _ =>
        Seq("q26_flow_factory", "q31_quality_score", "q32_minhash_neardup")
          .foreach { n => run(n); run(n) } // second run = warm
    }
    spark.stop()
  }
}
