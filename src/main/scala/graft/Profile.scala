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

    val t = 0.6
    val sets = docs.select(col("doc_id").as("id"),
        sort_array(TextFunctions.shingleHashes(col("text"), 3)).as("sh"))
      .withColumn("len", size(col("sh")))
      .persist()
    time("sets materialize")(sets.count())
    println(s"[profile] avg shingles/doc = " +
      sets.select(avg(col("len"))).head.getDouble(0))
    val p = (col("len") - ceil(col("len") * t - 1e-9) + 1).cast("int")
    val prefix = sets.select(col("id"), col("len"),
      explode(slice(col("sh"), lit(1), p)).as("h"))
    time("prefix rows")(println(s"[profile] prefix rows = ${prefix.count()}"))
    val cands = prefix.alias("a").join(prefix.alias("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
        least(col("a.len"), col("b.len")).cast("double") >=
          greatest(col("a.len"), col("b.len")) * t - 1e-9)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .persist()
    time("candidates")(println(s"[profile] candidates = ${cands.count()}"))
    val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val verified = cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= t)
    time("verify")(println(s"[profile] pairs = ${verified.count()}"))
    time("full q50")(SparkEntry.queries("q50_ngram_jaccard")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("full q50 again")(SparkEntry.queries("q50_ngram_jaccard")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
