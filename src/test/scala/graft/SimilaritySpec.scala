package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine/dot/norm column functions compute correct values") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Norm($"a").as("n"),
      VectorFunctions.cosine($"a", $"b").as("c")).head()
    assert(row.getDouble(0) == 24.0)
    assert(row.getDouble(1) == 5.0)
    assert(math.abs(row.getDouble(2) - 24.0 / 25.0) < 1e-12)
  }

  test("zero-norm vectors get cosine 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine($"a", $"b")).as[Double].head()
    assert(c == 0.0)
  }

  test("brute-force top-k returns exact nearest neighbors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 1L)
    val top = Similarity.bruteForceTopK(df, q, "embedding", "vec_id", k = 2)
      .orderBy($"rank").select($"corpus_id").as[Long].collect()
    assert(top.toSeq == Seq(2L, 3L)) // 2 closest, then orthogonal 3, never -x
  }

  test("LSH top-k achieves high recall vs brute force on fixture embeddings") {
    val queries = emb.filter(pmod($"vec_id", lit(50)) === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 5)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "embedding", "vec_id", 5, nBits = 4)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // The fixture vectors are near-random (max pairwise cos ~0.48), the
    // hardest case for hyperplane LSH; with 4 bits + 1-bit multiprobe the
    // probed fraction is ~30% of the corpus, so recall must clearly beat
    // both that baseline and random top-k chance (1%).
    assert(recall >= 0.4, f"LSH recall $recall%.2f too low")
  }

  test("ivfTopK finds neighbors within probed cells and beats chance recall") {
    val queries = emb.filter(pmod($"vec_id", lit(50)) === 0)
    val centroids = emb.filter(pmod($"vec_id", lit(97)) === 3)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 5)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, centroids,
        "embedding", "vec_id", k = 5, nProbe = 3)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    // every query must get a full top-k from its probed cells
    val nQ = queries.count()
    assert(approx.size == 5 * nQ, s"expected ${5 * nQ} rows, got ${approx.size}")
    val recall = (exact & approx).size.toDouble / exact.size
    // near-random fixture vectors + sampled (non-k-means) centroids is the
    // IVF worst case; probing 3 of ~5 cells must still clearly beat the
    // random-top-k baseline (~1%) and roughly track the probed fraction.
    assert(recall >= 0.3, f"IVF recall $recall%.2f too low")
  }

  test("trained IVF centroids match or beat a raw sample on recall") {
    val queries = emb.filter(pmod($"vec_id", lit(50)) === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 5)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val approx = Similarity.ivfTopK(emb, queries, centroids,
          "embedding", "vec_id", k = 5, nProbe = 3)
        .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val sampled = emb.filter(pmod($"vec_id", lit(97)) === 3)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val nSampled = sampled.count().toInt
    val trained = Similarity.trainCentroids(emb, "embedding", "vec_id",
      k = nSampled)
    assert(trained.count() <= nSampled) // Lloyd may only drop empty cells
    val (rSampled, rTrained) = (recall(sampled), recall(trained))
    graft.operators.OpCache.release()
    // same centroid count, same probe budget: training must not hurt
    assert(rTrained >= rSampled,
      f"trained recall $rTrained%.3f < sampled recall $rSampled%.3f")
  }

  test("VectorMean aggregator equals the posexplode lane-average formulation") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val vmean = udaf(graft.functions.Aggregators.VectorMean,
      ExpressionEncoder[Seq[Float]]())
    val viaAgg = emb.groupBy($"label")
      .agg(vmean($"embedding").as("m"))
      .select($"label", posexplode($"m").as(Seq("dim", "v")))
      .select($"label", $"dim", round($"v", 9).as("v"))
    val viaExplode = emb
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      .agg(round(avg($"v".cast("double")), 9).as("v"))
      .select($"label", $"dim", $"v")
    // same lanes, same means (both sum float values in double, then divide;
    // round(9) absorbs partial-merge association differences)
    assert(viaAgg.exceptAll(viaExplode).isEmpty &&
      viaExplode.exceptAll(viaAgg).isEmpty)
    // empty group contract
    val empty = spark.emptyDataFrame.sparkSession
      .createDataFrame(Seq((1, Seq.empty[Float]))).toDF("g", "embedding")
      .groupBy($"g").agg(vmean($"embedding").as("m"))
      .select(size($"m")).head().getInt(0)
    assert(empty == 0)
  }

  test("VectorMean is partition-order independent with empty/ragged input") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val vmean = udaf(graft.functions.Aggregators.VectorMean,
      ExpressionEncoder[Seq[Float]]())
    // empty vectors are ignored (not counted in the divisor); ragged
    // vectors zero-pad — the answer must not depend on shuffle layout
    val rows = Seq(
      ("g", Seq.empty[Float]), ("g", Seq(1.0f, 2.0f)),
      ("g", Seq(3.0f)), ("g", Seq.empty[Float]))
    val results = (1 to 4).map { p =>
      spark.createDataFrame(rows).toDF("g", "v").repartition(p)
        .groupBy($"g").agg(vmean($"v").as("m"))
        .select($"m").as[Seq[Double]].head()
    }
    assert(results.distinct.size == 1,
      s"partition-dependent means: $results")
    assert(results.head == Seq(2.0, 1.0), // (1+3)/2, (2+0)/2
      s"empty vectors leaked into the divisor: ${results.head}")
  }

  test("ivfAssign routes each vector to its nearest centroid") {
    val cents = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "embedding")
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfAssign(vecs, cents, "embedding", "vec_id")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 0L, 11L -> 1L))
  }

  test("marginMine discounts hubs: the mutual argmax-margin pair beats a " +
    "higher-cosine hub pair; sub-tau sources mine nothing") {
    // target 20 is a HUB (close to everything): raw cosine pairs source 2
    // with it (cos .99 vs .80 for target 30) — the failure mode margin
    // scoring exists to fix. The hub's own k-NN average is high, so its
    // margins deflate and source 2's true partner wins.
    val src = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.6f, 0.8f)))
      .toDF("src_id", "sv")
    val tgt = Seq((10L, Seq(1f, 0f)), (20L, Seq(0.7071f, 0.7071f)),
      (30L, Seq(0f, 1f))).toDF("tgt_id", "tv")
    val scored = src.join(tgt).select($"src_id", $"tgt_id",
      VectorFunctions.cosine($"sv", $"tv").as("cos"))
    // premise: raw-cosine argmax for source 2 IS the hub
    val rawBest = scored.filter($"src_id" === 2L)
      .orderBy($"cos".desc).select($"tgt_id").as[Long].head()
    assert(rawBest == 20L, s"fixture premise broken: $rawBest")
    val mined = Similarity.marginMine(scored, "src_id", "tgt_id", "cos",
        k = 2, tau = 1.15)
      .select($"src_id", $"tgt_id").as[(Long, Long)].collect().toSet
    assert(mined == Set((1L, 10L), (2L, 30L)), mined.toString)
    // a tau above every natural margin mines nothing — no silent floor
    assert(Similarity.marginMine(scored, "src_id", "tgt_id", "cos",
      k = 2, tau = 3.0).count() == 0)
  }
}
