package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("packMedia: byte_len and checksum derive from payload bytes") {
    val df = Seq("hello").toDF("text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val meta = Multimodal.packMedia(df, "payload", "text", "text/plain")
      .select($"media_meta.*").head()
    assert(meta.getAs[String]("modality") == "text")
    assert(meta.getAs[Long]("byte_len") == 5L)
    // md5("hello")
    assert(meta.getAs[String]("checksum") == "5d41402abc4b2a76b9719d911017c592")
  }

  test("fakeDecode is deterministic and within bounds") {
    val df = Seq("payload-a", "payload-a", "payload-b").toDF("text")
      .withColumn("payload", encode($"text", "UTF-8"))
      .select(Multimodal.fakeDecode($"payload").as("d"))
    val rows = df.select($"d.width", $"d.height", $"d.duration_s").collect()
    assert(rows(0) == rows(1)) // same payload → same decode
    assert(rows(0) != rows(2))
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 1920)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 1080)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 60.0)
    }
  }

  test("fakeFeatures yields fixed-width float vectors in [-1,1)") {
    val feats = Seq("x").toDF("text")
      .withColumn("payload", encode($"text", "UTF-8"))
      .select(Multimodal.fakeFeatures($"payload", 8).as("f"))
      .as[Seq[Float]].head()
    assert(feats.length == 8)
    assert(feats.forall(v => v >= -1.0f && v < 1.0f))
  }

  test("sampleFrames emits n frames per row with ordinal index") {
    val df = Seq("vid1", "vid2").toDF("text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val frames = Multimodal.sampleFrames(df, "payload", 4)
    assert(frames.count() == 8)
    val idx = frames.groupBy($"text").agg(collect_set($"frame_idx").as("s"))
      .select($"s").as[Seq[Int]].collect()
    idx.foreach(s => assert(s.sorted == Seq(0, 1, 2, 3)))
  }

  test("fakeResize preserves aspect ratio bound and never upscales") {
    val df = Seq("a", "b", "c").toDF("text")
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("d", Multimodal.fakeDecode($"payload"))
      .withColumn("r", Multimodal.fakeResize($"d", 640, 480))
    df.select($"d.width", $"d.height", $"r.width", $"r.height").collect()
      .foreach { row =>
        val (w, h, rw, rh) = (row.getLong(0), row.getLong(1),
          row.getLong(2), row.getLong(3))
        assert(rw <= 640 && rh <= 480)
        assert(rw <= w && rh <= h) // never upscale
      }
  }

  test("batched decode (mapPartitions codec contract) equals the expression fake") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 100)
      .withColumn("payload", encode($"text", "UTF-8"))
    val batched = Multimodal.decodeBatched(docs, "payload", batchSize = 16)
      .select($"doc_id", $"decoded")
    val expr = docs
      .select($"doc_id", Multimodal.fakeDecode($"payload").as("decoded"))
    assert(batched.exceptAll(expr).isEmpty && expr.exceptAll(batched).isEmpty,
      "batched stub codec must produce the same features as the expression fake")
    // schema contract: original columns survive, decoded struct appended last
    assert(Multimodal.decodeBatched(docs, "payload").columns.last == "decoded")
  }

  test("decodeBatched really decodes PNG/JPEG payloads via javax.imageio") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 97 + y * 31) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val rows = Seq(
      1 -> imageBytes(2, 2, "png"),
      2 -> imageBytes(7, 3, "png"),
      3 -> imageBytes(5, 4, "jpg"),
      4 -> "definitely not an image".getBytes("UTF-8"))
    val df = rows.toDF("id", "payload")
    val out = Multimodal.decodeBatched(df, "payload", batchSize = 2)
      .select($"id", $"decoded.width", $"decoded.height", $"decoded.duration_s")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // real decode: actual pixel dimensions, no time axis
    assert(out(1) == ((2L, 2L, 0.0)), s"2x2 png decoded to ${out(1)}")
    assert(out(2) == ((7L, 3L, 0.0)), s"7x3 png decoded to ${out(2)}")
    assert(out(3) == ((5L, 4L, 0.0)), s"5x4 jpeg decoded to ${out(3)}")
    // a non-image payload falls back to the deterministic stub = fakeDecode
    val stub = df.filter($"id" === 4)
      .select(Multimodal.fakeDecode($"payload").as("d"))
      .select($"d.width", $"d.height", $"d.duration_s").head()
    assert(out(4) == ((stub.getLong(0), stub.getLong(1), stub.getDouble(2))))
    // a corrupt payload with a valid magic number degrades to the stub
    // instead of failing the task
    val corrupt = imageBytes(2, 2, "png").take(10)
    val corruptOut = Multimodal.decodeBatched(
      Seq(9 -> corrupt).toDF("id", "payload"), "payload")
      .select($"decoded.width").head().getLong(0)
    assert(corruptOut >= 1L && corruptOut <= 1920L)
  }

  test("resizeBatched really rescales images; pass-through and bomb " +
    "guard honor the degradation contract") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 97 + y * 31) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val small = imageBytes(10, 6, "png")
    val rows = Seq(
      1 -> imageBytes(100, 40, "png"), // downscale: fit 32x32 -> 32x12
      2 -> imageBytes(30, 80, "jpg"),  // downscale: fit 32x32 -> 12x32
      3 -> small,                       // already fits: byte-identical
      4 -> "definitely not an image".getBytes("UTF-8"))
    val out = Multimodal.resizeBatched(
        rows.toDF("id", "payload"), "payload", maxW = 32, maxH = 32,
        batchSize = 2)
      .select($"id", $"resized.payload", $"resized.width",
        $"resized.height", $"resized.applied")
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getAs[Array[Byte]](1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))))
      .toMap
    assert(out(1)._2 == 32L && out(1)._3 == 12L && out(1)._4)
    assert(out(2)._2 == 12L && out(2)._3 == 32L && out(2)._4)
    // the resized payload is a REAL image with the claimed dimensions
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1)._1))
    assert(re.getWidth == 32 && re.getHeight == 12,
      s"re-decoded resized payload is ${re.getWidth}x${re.getHeight}")
    // in-bounds image: byte-identical, no decode-re-encode churn
    assert(out(3)._1.toSeq == small.toSeq && out(3)._4)
    // non-image passes through unchanged, applied = false
    assert(out(4)._1.toSeq == rows(3)._2.toSeq && !out(4)._4)
    // bomb guard: header dims over the pixel budget are never decoded
    val guarded = Multimodal.resizeBatched(
        Seq(9 -> imageBytes(100, 40, "png")).toDF("id", "payload"),
        "payload", maxW = 32, maxH = 32, batchSize = 2, maxPixels = 50L)
      .select($"resized.payload", $"resized.applied").head()
    assert(!guarded.getBoolean(1), "bomb-guarded image was decoded")
    assert(guarded.getAs[Array[Byte]](0).nonEmpty, "payload dropped")
  }

  test("multimodalRecords joins docs to embeddings with full contract") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val recs = Multimodal.multimodalRecords(docs, emb)
    assert(recs.columns.toSeq == Seq("doc_id", "media_meta", "decoded",
      "features", "embedding", "label"))
    assert(recs.count() == 500)
  }
}
