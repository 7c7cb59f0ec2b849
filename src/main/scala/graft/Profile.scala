package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    time("warmup")(docs.count())

    // candidate count inside the real implementation (position-filtered)
    val t = 0.6
    val sets = docs.select(col("doc_id").as("id"),
        sort_array(TextFunctions.shingleHashes(col("text"), 3)).as("sh"))
      .withColumn("len", size(col("sh")))
      .persist()
    sets.count()
    val p = (col("len") - ceil(col("len") * t - 1e-9) + 1).cast("int")
    val prefix = sets.select(col("id"), col("len"),
      posexplode(slice(col("sh"), lit(1), p)).as(Seq("pos", "h")))
    val alpha = ceil((col("a.len") + col("b.len")) * (t / (1 + t)) - 1e-9)
    val cands = prefix.alias("a").join(prefix.alias("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
        least(col("a.len"), col("b.len")).cast("double") >=
          greatest(col("a.len"), col("b.len")) * t - 1e-9 &&
        least(col("a.len") - col("a.pos"), col("b.len") - col("b.pos"))
          .cast("double") >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("pos-filtered candidates")(
      println(s"[profile] candidates = ${cands.count()}"))

    (1 to 3).foreach { i =>
      time(s"full q50 #$i")(SparkEntry.queries("q50_ngram_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
