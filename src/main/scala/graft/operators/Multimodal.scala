package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with a typed metadata struct, plus decode / feature-extract /
 * resize / frame-sample stages. North-star operators (BASELINE.json);
 * absent from the reference (JSON-scalar records only,
 * `stepist/app.py:20,26`).
 *
 * The container has no image/audio codec libraries, so the codec itself is
 * STUBBED behind [[fakeDecode]] — a deterministic, content-derived fake that
 * exercises the real Spark-side contract: schema shape, binary handling,
 * partition-parallel per-row extraction, and batch-friendly signatures. The
 * real pipeline swaps `fakeDecode` for a JNI/Pandas-UDF codec with the SAME
 * column contract; nothing else changes.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),  // image|audio|video|text
    StructField("mime", StringType, nullable = true),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false))) // hex md5 of payload

  /**
   * Wrap a binary payload column into the canonical (payload, meta) pair.
   * `meta.checksum` doubles as the exact-dedup key for media — dedup on it,
   * not on the payload bytes, so the shuffle moves 32-byte digests, never
   * blobs.
   */
  def packMedia(df: DataFrame, payloadCol: String, modality: String,
                mime: String = null): DataFrame =
    df.withColumn("media_meta", struct(
      lit(modality).as("modality"),
      lit(mime).cast(StringType).as("mime"),
      coalesce(length(col(payloadCol)).cast(LongType), lit(0L)).as("byte_len"),
      md5(coalesce(col(payloadCol), lit(Array.emptyByteArray))).as("checksum")))

  /**
   * Deterministic fake "decode" of a binary payload: derives stable
   * pseudo-features (width/height/duration proxies) from content hashes.
   * STUB — replace with a real codec; the surrounding plan is production
   * shape: pure column expressions, codegen'd, partition-parallel.
   */
  def fakeDecode(payload: Column): Column = {
    val h = xxhash64(payload)
    struct(
      (pmod(h, lit(1920L)) + 1L).as("width"),
      (pmod(shiftright(h, 16), lit(1080L)) + 1L).as("height"),
      (pmod(shiftright(h, 32), lit(600L)).cast(DoubleType) / 10.0).as("duration_s"))
  }

  /**
   * Feature-extraction stage: payload → fixed-width float feature vector.
   * The fake derives `dim` deterministic values from content hashes — the
   * real version plugs an encoder model at the same signature
   * (binary → array<float>), batched per partition.
   */
  def fakeFeatures(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(payload, i), lit(2000L)).cast(DoubleType) / 1000.0 - 1.0)
        .cast(FloatType))

  /**
   * Partition-batched decode — the Scala shape of a batched decode UDF
   * (Python's `mapInPandas` contract): rows stream through `mapPartitions`,
   * are buffered into fixed-size batches, the (stub) codec is invoked once
   * per BATCH, and decoded structs are emitted alongside the original
   * columns. This is the plumbing a real JNI/native codec needs — batch
   * amortizes per-call overhead (model load, FFI crossing) and bounds peak
   * memory to `batchSize` payloads per task. The stub decodes to the same
   * content-derived pseudo-features as [[fakeDecode]] (pinned in
   * MultimodalSpec), so swapping in a real codec changes ONE function.
   */
  def decodeBatched(df: DataFrame, payloadCol: String,
                    batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", LongType, nullable = false),
        StructField("height", LongType, nullable = false),
        StructField("duration_s", DoubleType, nullable = false)))))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec call per batch — the stub loops, a real codec would
        // hand the whole Array[Array[Byte]] to native code at once
        val decoded = Multimodal.stubCodecBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)).toArray)
        batch.iterator.zip(decoded.iterator).map { case (r, d) =>
          Row.fromSeq(r.toSeq :+ Row(d._1, d._2, d._3))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Stub batch codec: same content-derived pseudo-features as
    * [[fakeDecode]] (xxhash64 with Spark's seed 42), computed JVM-side. */
  private[operators] def stubCodecBatch(
      payloads: Array[Array[Byte]]): Array[(Long, Long, Double)] =
    payloads.map { raw =>
      // NULL payloads are in-contract for the media pipeline (packMedia
      // coalesces them to empty); decode must not NPE on one bad blob
      val bytes = if (raw == null) Array.emptyByteArray else raw
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }
      (pmod(h, 1920L) + 1L,
        pmod(h >> 16, 1080L) + 1L,
        pmod(h >> 32, 600L).toDouble / 10.0)
    }

  /**
   * Frame-sampling stage for video-like payloads: emits `n` (frame_idx,
   * frame_payload) rows per input via posexplode — the 1→N shape a real
   * frame sampler has. Fake frames are content-derived slices.
   */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int): DataFrame =
    df.select(col("*"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
          md5(concat(md5(col(payloadCol)).cast(BinaryType),
            i.cast(StringType).cast(BinaryType)))))
          .as(Seq("frame_idx", "frame_fingerprint")))

  /**
   * "Resize" stage contract: payload in, payload out with updated meta.
   * Fake: truncates the checksum-space (keeps bytes; rewrites meta dims).
   */
  def fakeResize(decoded: Column, maxW: Int, maxH: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scale = least(lit(1.0), lit(maxW) / w.cast(DoubleType),
      lit(maxH) / h.cast(DoubleType))
    struct(
      floor(w * scale).cast(LongType).as("width"),
      floor(h * scale).cast(LongType).as("height"),
      decoded.getField("duration_s").as("duration_s"))
  }

  /**
   * Build a multimodal record set from the fixture tables: documents joined
   * to embeddings on id, text payload packed as binary media with fake
   * decode + features. Demonstrates the full column contract end-to-end.
   */
  def multimodalRecords(documents: DataFrame, embeddings: DataFrame): DataFrame = {
    val docs = documents
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val packed = packMedia(docs, "payload", "text", "text/plain")
    packed.join(embeddings, packed("doc_id") === embeddings("vec_id"), "inner")
      .withColumn("decoded", fakeDecode(col("payload")))
      .withColumn("features", fakeFeatures(col("payload")))
      .select(col("doc_id"), col("media_meta"), col("decoded"),
        col("features"), col("embedding"), col("label"))
  }
}
