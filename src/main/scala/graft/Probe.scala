package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Scratch profiler for operator stages (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000)
    time("warmup count")(docs.count())
    time("tokens")(docs.select(tokens(col("text"))).write.format("noop").mode("overwrite").save())
    time("shingleHashes")(docs.select(shingleHashes(col("text"), 3)).write.format("noop").mode("overwrite").save())
    val sig = Dedup.minhashSignature(col("text"), 3, 64)
    time("signature64")(docs.select(sig).write.format("noop").mode("overwrite").save())
    val lsh = Dedup.minhashLsh(docs, "text", "doc_id", 3, 64, 16, 0.5)
    time("full lsh")(lsh.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
