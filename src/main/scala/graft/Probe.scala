package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, OpCache}

/** Scratch profiler for operator stages (not part of the driver contract).
  * Current focus: shuffle-byte comparison of the minhashLsh banding shapes
  * — signature carried through the band explode (old) vs bare (id, band,
  * bucket) triples with per-pair signature attach (current). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // at 100 TB no self-join side fits in memory: force the shuffle path
      // so the byte comparison reflects the sort-merge shape
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleWrite = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleWrite.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def measure(name: String)(df: => DataFrame): Unit = {
      shuffleWrite.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let the listener bus drain task-end events
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"shuffle write ${shuffleWrite.sum() / 1048576.0}%.1f MiB")
      OpCache.release()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs: ${docs.count()}")

    /** The pre-round-4 shape: signature rides through the explode and both
      * self-join sides. Kept here only as the measurement baseline. */
    def oldShape(numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7): DataFrame = {
      val rows = numHashes / bands
      val sigs = docs.select(col("doc_id").as("id"),
        Dedup.minhashSignatureFromHashes(
          shingleHashes(col("text"), 3), numHashes).as("sig"))
      val banded = sigs.select(col("id"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
        }: _*)).as("bb"))
        .select(col("id"), col("sig"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val pairs = banded.alias("l").join(banded.alias("r"),
          col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
      val est = size(filter(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
        b => b)).cast("double") / lit(numHashes)
      pairs.select(col("id_a"), col("id_b"), round(est, 4).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
    }

    measure("warmup (current)")(Dedup.minhashLsh(docs, "text", "doc_id"))
    measure("old: sig through explode")(oldShape())
    measure("new: bare triples + pair attach")(
      Dedup.minhashLsh(docs, "text", "doc_id"))
    measure("old: sig through explode (2)")(oldShape())
    measure("new: bare triples + pair attach (2)")(
      Dedup.minhashLsh(docs, "text", "doc_id"))
    spark.stop()
  }
}
