package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Canonical fixture-table loaders (TESTDATA.md): one parquet per table under
 * a scale-factor directory. Centralizes the one genuinely quirky read — the
 * events table's timestamp column, whose physical type has drifted across
 * fixture generations (TIMESTAMP(NANOS) → timestamp[us]/NTZ). The reference
 * ingests schemaless JSON records (stepist/app.py:20,26;
 * libs/simple_queue.py:49-51 — any serializable dict is accepted), so a
 * benign upstream type change must not break the engine: we sniff the
 * scanned schema and convert only what needs converting.
 */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events frame's `ts` column to session-zoned TIMESTAMP
    * regardless of how the fixture stored it. Works on batch AND streaming
    * frames (only inspects the schema). Three shapes seen in the wild:
    *
    *  - `LongType`: legacy TIMESTAMP(NANOS) read as raw nanos via the
    *    nanosAsLong conf. Integral `DIV`, NOT `/`: nanos (~1.7e18) exceed
    *    double's exact range (2^53), so float division is off by up to
    *    ~256 ns → a ±1 µs error against an engine that truncates.
    *  - `TimestampNTZType`: current fixtures store timestamp[us] without
    *    isAdjustedToUTC, which Spark infers as NTZ. The session runs in UTC
    *    (Verify/Bench/specs all pin spark.sql.session.timeZone=UTC), so the
    *    cast to TIMESTAMP re-labels the same wall-clock values as UTC
    *    instants — bit-identical micros to the legacy path, and identical to
    *    what the DuckDB oracle (naive timestamps) computes.
    *  - `TimestampType`: already session-zoned; pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType           => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType      => df
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other; expected long nanos, " +
        "timestamp_ntz, or timestamp")
  }

  /** Schema-adaptive events loader; see [[normalizeTs]]. The nanosAsLong
    * conf stays set so legacy TIMESTAMP(NANOS) fixtures still scan (as
    * long — then converted); it is a no-op for µs fixtures. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }
}
