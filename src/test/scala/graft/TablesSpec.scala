package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.sources.Tables

/**
 * Schema-adaptive events ingestion (Tables.normalizeTs). The fixture's `ts`
 * physical type has drifted across driver generations (TIMESTAMP(NANOS)
 * read as raw long → timestamp[us]/NTZ); the loader must land every shape
 * on the SAME UTC instants — the reference ingests schemaless JSON
 * (stepist/app.py:20,26) and survives benign upstream type changes, so must
 * we. See FIXTURES.md for the NTZ-semantics decision.
 */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeTs lands long-nanos, µs-NTZ, and timestamp shapes on identical instants") {
    val base = Tables.events(spark, sfDir)
    assert(base.schema("ts").dataType == TimestampType)
    val want = base.select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    // legacy shape: raw nanos long (what nanosAsLong produced for NANOS)
    val asNanos = base.withColumn("ts", unix_micros($"ts") * 1000L)
    assert(asNanos.schema("ts").dataType == LongType)
    assert(Tables.normalizeTs(asNanos).select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().toSet == want)
    // current fixture shape: wall-clock micros without zone (NTZ); the UTC
    // session makes the round-trip cast instant-preserving
    val asNtz = base.withColumn("ts", $"ts".cast(TimestampNTZType))
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    assert(Tables.normalizeTs(asNtz).select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().toSet == want)
    // already session-zoned: passthrough, no double conversion
    assert(Tables.normalizeTs(base).schema("ts").dataType == TimestampType)
  }

  test("normalizeTs fails loud on an unsupported ts type") {
    val bad = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("unsupported"))
  }

  test("events loader reads the on-disk fixture as session-zoned timestamps") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }
}
