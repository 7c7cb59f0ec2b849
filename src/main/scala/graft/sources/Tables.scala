package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Canonical fixture-table loaders (TESTDATA.md): one parquet per table under
 * a scale-factor directory. Centralizes the one genuinely quirky read — the
 * events table's TIMESTAMP(NANOS) physical type, which Spark's parquet
 * reader rejects unless read as raw nanos and converted (the fixture's real
 * precision is microseconds).
 */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) — read nanos as long, convert
    * to a proper µs timestamp column. Integral `div`, NOT `/`: nanos
    * (~1.7e18) exceed double's exact range (2^53), so float division is off
    * by up to ~256 ns → a ±1 µs error against an engine that truncates. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
