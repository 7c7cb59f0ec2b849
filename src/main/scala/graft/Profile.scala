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

    run("q01_agg") // warmup
    (1 to 5).foreach(i => run(s"q26_flow_factory"))
    // stage breakdown without the flow engine
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val par = docs.repartition(32)
    (1 to 3).foreach { i =>
      time(s"q26 raw (no App) #$i")(
        par.select(explode(TextFunctions.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 50).orderBy(col("token"))
          .write.format("noop").mode("overwrite").save())
    }
    (1 to 3).foreach { i =>
      time(s"q26 no repartition #$i")(
        docs.select(explode(TextFunctions.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 50).orderBy(col("token"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
