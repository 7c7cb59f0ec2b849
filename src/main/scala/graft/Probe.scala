package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Layout, OpCache, TextProfile}

/** Scratch profiler for operator stages (not part of the driver contract).
  *
  * Modes:
  *  - (no args) — shuffle-byte comparison of the minhashLsh banding shapes:
  *    signature carried through the band explode (old) vs bare (id, band,
  *    bucket) triples with per-pair signature attach (current).
  *  - `scale [<docs.parquet>] [lsh-only]` — dedup-tier scaling run
  *    (q32/q50/q86/q87 shapes) over an arbitrary documents table: wall
  *    time, shuffle bytes, BLOCKING-stage candidate counts (both 64/16
  *    and 64/8 bandings) and output rows. `lsh-only` skips the exact
  *    ppjoin shapes for corpus sizes where their measured ~n² prefix
  *    collisions make them infeasible. Run on /root/testdata/sf0.1 (5k),
  *    the 50k and 500k fixtures from tools/gen_scale_docs.py for the
  *    decade-over-decade growth evidence recorded in SURVEY §6.
  *  - `incr [<docs.parquet>]` — incremental-dedup tier: ad-hoc vs
  *    stored-fingerprint/prebuilt-Bloom forms of `dedupAgainst` (shuffle
  *    cut of the Bloom route) plus the q100 span-dedup shape.
  *  - `sem [n...]` — SemDeDup-tier scaling over synthetic embeddings
  *    (default decades 2k/20k/200k), hard vs soft assignment; candidate
  *    counts are the (n/k)² control recorded in SURVEY §6.
  *  - `ppl [<docs.parquet>]` — perplexity scoring-join key width:
  *    string keys vs xxhash64 lanes vs broadcastModel (SURVEY §6).
  *  - `pqstore [n]` — IVF-PQ code-store static pruning: files/bytes
  *    scanned by the pruned serving path vs a full scan (SURVEY §6).
  *  - `substr [docs.parquet...]` — offset-robust substring-dedup
  *    scaling (q121 shape vs the aligned q100 shape) across fixture
  *    decades (SURVEY §6).
  *  - `bm25idx [docs.parquet...]` — BM25 scan path (re-tokenize per
  *    query) vs materialized term-bucketed index path across fixture
  *    decades (SURVEY §6).
  *  - `semstore [n]` — SemDeDup in-plan assignment path vs the
  *    cell-bucketed assigned-corpus store (SURVEY §6).
  *  - `mg [<docs.parquet>]` — heavy-ngram pricing (q145): exact
  *    full-vocabulary groupBy vs the Misra–Gries summary, and the r12
  *    immutable-Map MG buffer vs the shipped mutable in-place buffer
  *    (SURVEY §6).
  *  - `splits [<docs.parquet>]` — split/decontamination tier (q152/
  *    q154): decontaminateSplits' window-hash semi-join and
  *    clusterSafeSplits' star-contraction + id-keyed joins priced
  *    across the 50k/500k decade (SURVEY §6).
  *  - `csingest [n]` — versioned code-store ingest (q158): clustered
  *    vs scattered batch append vs one-shot rebuild (SURVEY §6).
  *  - `csbloom [n]` — the ARBITRARY-BINDING idempotence check (q163):
  *    legacy whole-store fullIdCheck vs the Bloom-screened sidecar
  *    form, per-batch input read at two store sizes (SURVEY §6).
  *  - `repfilter [<docs.parquet>...]` — the repetition FILTER vs
  *    PROFILE split (q162 vs q88): per-row fold columns vs the
  *    (id, gram) exchange, wall + shuffle across the 50k/500k decade
  *    (SURVEY §6).
  */
object Probe {

  private val shuffleWrite = new LongAdder
  private val inputRead = new LongAdder

  private def session(): SparkSession = {
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          shuffleWrite.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          inputRead.add(t.taskMetrics.inputMetrics.bytesRead)
        }
    })
    spark
  }

  private def measure(name: String)(df: => DataFrame): Unit = {
    shuffleWrite.reset()
    inputRead.reset()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    Thread.sleep(500) // let the listener bus drain task-end events
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      f"shuffle write ${shuffleWrite.sum() / 1048576.0}%.1f MiB, " +
      f"input read ${inputRead.sum() / 1048576.0}%.1f MiB")
    OpCache.release()
  }

  def main(args: Array[String]): Unit = {
    // flags and the optional docs path may come in any order
    def pathArg = args.drop(1).filterNot(_ == "lsh-only").headOption
      .getOrElse("/tmp/graft_scale/documents_sf1.parquet")
    args.headOption match {
      case Some("scale") => scaleRun(pathArg, lshOnly = args.contains("lsh-only"))
      case Some("dford") => dfOrderRun(pathArg)
      case Some("ppsplit") => ppSplitRun(pathArg)
      case Some("incr") => incrRun(pathArg)
      case Some("ingest") => ingestRun(args.drop(1).headOption
        .getOrElse("/tmp/graft_scale/documents_500k.parquet"))
      case Some("ppl") => pplRun(args.drop(1).headOption
        .getOrElse("/tmp/graft_scale/documents_50k_bigvocab.parquet"))
      case Some("pqstore") => pqStoreRun(args.drop(1).headOption
        .map(_.toLong).getOrElse(100000L))
      case Some("substr") => substrRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k.parquet",
          "/tmp/graft_scale/documents_500k.parquet"))
      case Some("semstore") => semStoreRun(args.drop(1).headOption
        .map(_.toLong).getOrElse(50000L))
      case Some("bm25idx") => bm25IdxRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k.parquet",
          "/tmp/graft_scale/documents_500k.parquet"))
      case Some("sem") =>
        semRun(if (args.length > 1) args.drop(1).map(_.toLong).toSeq
          else Seq(2000L, 20000L, 200000L))
      case Some("mg") => mgRun(args.drop(1).headOption
        .getOrElse("/tmp/graft_scale/documents_500k.parquet"))
      case Some("splits") => splitsRun(args.drop(1).headOption
        .getOrElse("/tmp/graft_scale/documents_500k.parquet"))
      case Some("csingest") => csIngestRun(args.drop(1).headOption
        .map(_.toLong).getOrElse(100000L))
      case Some("csbloom") => csBloomRun(args.drop(1).headOption
        .map(_.toLong).getOrElse(100000L))
      case Some("repfilter") => repFilterRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k.parquet",
          "/tmp/graft_scale/documents_500k.parquet"))
      case Some("segdedup") => segDedupRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k.parquet",
          "/tmp/graft_scale/documents_500k.parquet"))
      case Some("cscadence") => csCadenceRun(
        args.drop(1).headOption.map(_.toLong).getOrElse(100000L),
        args.drop(2).headOption.map(_.toInt).getOrElse(12))
      case Some("protoprune") =>
        protoPruneRun(if (args.length > 1) args.drop(1).map(_.toLong).toSeq
          else Seq(50000L, 500000L))
      case Some("bpe") => bpeRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k_bigvocab.parquet",
          "/tmp/graft_scale/documents_500k_bigvocab.parquet"))
      case Some("bpelocal") => bpeLocalRun(args.drop(1).headOption
        .getOrElse("/tmp/graft_scale/documents_500k_bigvocab.parquet"))
      case Some("unilocal") => uniLocalRun(args.drop(1).headOption
        .getOrElse("/tmp/graft_scale/documents_500k_bigvocab.parquet"))
      case Some("kcenter") =>
        kCenterRun(if (args.length > 1) args.drop(1).map(_.toLong).toSeq
          else Seq(50000L, 500000L))
      case Some("knppl") => knPplRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k_bigvocab.parquet",
          "/tmp/graft_scale/documents_500k_bigvocab.parquet"))
      case Some("centrality") =>
        centralityRun(if (args.length > 1) args.drop(1).map(_.toLong).toSeq
          else Seq(50000L, 500000L))
      case Some("cdc") => cdcRun(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/tmp/graft_scale/documents_50k.parquet",
          "/tmp/graft_scale/documents_500k.parquet"))
      case Some("semdecon") =>
        semDeconRun(if (args.length > 1) args.drop(1).map(_.toLong).toSeq
          else Seq(50000L, 500000L))
      case Some("retrain") => retrainRun(args.drop(1).headOption
        .map(_.toLong).getOrElse(50000L))
      case Some("retract") => retractRun(
        args.drop(1).headOption.map(_.toLong).getOrElse(100000L),
        args.drop(2).headOption
          .getOrElse("/tmp/graft_scale/documents_500k.parquet"))
      case _ => bandingRun()
    }
  }

  /** Split/decontamination tier pricing (round 14, q152/q154 were
    * fixture-gated only): [[graft.operators.Curate.decontaminateSplits]]
    * (q122's 128-bit window-hash semi-join — document text never
    * shuffles) and [[graft.operators.Curate.clusterSafeSplits]]
    * (star-contraction over bare id pairs + two id-keyed joins) across
    * the 50k/500k decade, broadcast off. Near-dup pairs are
    * PRE-MATERIALIZED outside the measurement (production serves them
    * off the LSH ingest store — [[graft.operators.Dedup.minhashLshPairsFromStore]],
    * exchange-free-gated), so the numbers isolate the split operators
    * themselves, not pair generation. */
  private def splitsRun(docsPath: String): Unit = {
    val spark = session()
    val all = spark.read.parquet(docsPath).repartition(32)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val tmp = java.nio.file.Files.createTempDirectory("splits").toString
    Seq(50000L, 500000L).foreach { n =>
      val docs = all.filter(col("doc_id") < n)
      println(s"[probe] splits tier at n=$n (${docs.count()} docs)")
      measure(s"warmup leakageSafeSplits n=$n")(
        graft.operators.Curate.leakageSafeSplits(docs, "text", splits))
      measure(s"decontaminateSplits n=$n (minTokens=20)")(
        graft.operators.Curate.decontaminateSplits(
          docs, "text", "doc_id", splits, minTokens = 20))
      val pairs = Dedup.minhashLsh(docs, "text", "doc_id",
        shingleK = 3, numHashes = 64, bands = 16, threshold = 0.7)
        .select(col("id_a"), col("id_b"))
      pairs.write.mode("overwrite").parquet(s"$tmp/pairs_$n")
      OpCache.release()
      val p = spark.read.parquet(s"$tmp/pairs_$n")
      println(s"[probe] near-dup pairs at n=$n: ${p.count()}")
      // shuffle form (broadcastLabels = false): the degrade path for an
      // adversarially duplicate-heavy corpus — one id-keyed corpus join
      measure(s"clusterSafeSplits n=$n (shuffle form)")(
        graft.operators.Curate.clusterSafeSplits(
          docs, "text", "doc_id", p, splits, broadcastLabels = false))
      // production default: the CLUSTER-bounded label frame broadcasts
      // (explicit hint — its resolveClusters lineage has opaque stats),
      // so the corpus never enters a keyed exchange (PlanSpec-gated);
      // only the star-contraction pays shuffles
      measure(s"clusterSafeSplits n=$n (broadcast labels — production)")(
        graft.operators.Curate.clusterSafeSplits(
          docs, "text", "doc_id", p, splits))
    }
  }

  private def timed(label: String)(work: => Unit): Unit = {
    val t0 = System.nanoTime()
    work
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    OpCache.release()
  }

  /** Run `body` with the production broadcast thresholds (10 MB).
    * [[session]] pins broadcast OFF for the shuffle-shape probes; the
    * store-serving probes want the production broadcast path instead —
    * this saves and RESTORES the two conf values so a later subcommand
    * in the same JVM isn't silently skewed (one helper, every
    * broadcast-wanting run goes through it). */
  private def withProductionBroadcast(spark: SparkSession)
                                     (body: => Unit): Unit = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "10MB"))
    try body
    finally saved.foreach {
      case (k, Some(prev)) => spark.conf.set(k, prev)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Retraction pricing (round 13, q148/q149): what does a takedown cost
    * against each serving store, vs the rebuild it replaces?
    *  - IVF-PQ code store ([[graft.operators.Quantize.removeFromCodeStore]]):
    *    a SCATTERED 1% takedown (id-mod — hits nearly every cell, the
    *    worst case for a per-partition rewrite) vs a CLUSTERED takedown
    *    (every id of two cells — the O(affected cells) claim isolated)
    *    vs `writeCodeStore` over the remaining corpus (the rebuild).
    *  - BM25 index ([[graft.operators.Rank.removeFromIndex]]): the
    *    O(index) bucket-preserving rewrite + exact stats decrement vs
    *    `writeIndex` over the remaining corpus — the rewrite never
    *    re-tokenizes, which is the whole delta. */
  /** Code-store INGEST pricing (round 14, q158): what an append costs on
    * the versioned store vs the rebuild it replaces, in the two shapes
    * that bound it — a CLUSTERED batch (new vectors near one region of
    * the space: few cells touched, the O(touched cells) claim isolated)
    * and a SCATTERED batch (uniform over the space: touches most cells —
    * the worst case, approaching a rebuild). Models are the STORED ones
    * throughout (ingest never retrains). */
  private def csIngestRun(n: Long): Unit = {
    val spark = session()
    withProductionBroadcast(spark)(csIngestBody(spark, n))
  }

  private def csIngestBody(spark: SparkSession, n: Long): Unit = {
    val dim = 64
    val (m, subDim) = (16, 4)
    val cells = math.max(16, (n / 1000).toInt)
    def vecs(ids: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)),
        i => sin(ids * i).cast("float")).as("embedding")
    val all = spark.range(n).select(col("id").as("vec_id"), vecs(col("id")))
      .repartition(32)
    val isBatch = pmod(col("vec_id"), lit(10)) === 0 // scattered 10%
    val seed = all.filter(!isBatch)
    val tmp = java.nio.file.Files.createTempDirectory("csingest").toString
    graft.operators.Similarity.trainCentroids(
        seed, "embedding", "vec_id", cells)
      .write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    graft.operators.Quantize.trainCodebook(
        seed, "embedding", "vec_id", dim, m, 16)
      .write.mode("overwrite").parquet(s"$tmp/cb")
    OpCache.release()
    val cents = spark.read.parquet(s"$tmp/cents")
    val cb = spark.read.parquet(s"$tmp/cb")
    timed(s"seed store build (90% of n=$n, cells=$cells)")(
      graft.operators.Quantize.writeCodeStore(seed, cents, cb, "embedding",
        "vec_id", m, subDim, s"$tmp/sA", versioned = true))
    // per-ingest input-byte accounting: the r15 bounded idempotence check
    // must read only the batch's ASSIGNED cells' files, so input read per
    // ingest scales with cells touched (≈ batch spread), never store size
    def measuredIngest(label: String, batch: org.apache.spark.sql.DataFrame)
        : Unit = {
      inputRead.reset()
      val t0 = System.nanoTime()
      val ing = graft.operators.Quantize.ingestBatchCodeStore(spark,
        s"$tmp/sA", batch, cents, cb, "embedding", "vec_id", m, subDim)
      val c = ing.select(col("cell")).distinct().count()
      Thread.sleep(500) // let the listener bus drain task-end events
      println(f"[probe] ingest $label ($c of $cells cells touched): " +
        f"${(System.nanoTime - t0) / 1e9}%.2f s, " +
        f"input read ${inputRead.sum() / 1048576.0}%.1f MiB")
      OpCache.release()
    }
    // FIXED 1000-id clustered batch: its input read must stay flat as the
    // store decade grows (run the probe at two n's and compare this line)
    measuredIngest("FIXED 1k clustered batch", spark.range(10 * n, 10 * n + 1000)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => (sin(lit(7) * i) + sin(col("id") * i) * 0.001f)
            .cast("float")).as("embedding")))
    // CLUSTERED batch: new ids, vectors perturbed around ONE seed vector
    val clustered = spark.range(n, n + n / 10)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => (sin(lit(7) * i) + sin(col("id") * i) * 0.01f)
            .cast("float")).as("embedding"))
    measuredIngest("CLUSTERED 10% batch", clustered)
    measuredIngest("SCATTERED 10% batch", all.filter(isBatch))
    // replay of the scattered batch: the idempotence check alone (no
    // rewrite) — its read must also be assigned-cells-bounded
    measuredIngest("REPLAY scattered batch", all.filter(isBatch))
    timed(s"one-shot rebuild over the full corpus (the alternative)")(
      graft.operators.Quantize.writeCodeStore(
        all.unionByName(clustered), cents, cb, "embedding",
        "vec_id", m, subDim, s"$tmp/sB", versioned = true))
  }

  /** FILTER-vs-PROFILE pricing for the repetition family — the claim at
    * `TextFunctions.scala` ("the keep/drop decision costs a map stage
    * where the profiling twin shuffles (id, gram) pairs") measured
    * across a corpus decade instead of asserted from plan shape. The
    * FILTER face computes the FULL Gopher A1 stats struct (13 fractions,
    * q162) plus the keep verdict as per-row fold columns — zero
    * exchange; the PROFILE face is q88's `repetitionScores` (explode →
    * two groupBys), whose (id, gram) exchange is the right shape when
    * the SCORES themselves are the product. Expect both linear in corpus
    * bytes, with the FILTER's shuffle at 0 and the PROFILE's growing
    * with token count. */
  private def repFilterRun(paths: Seq[String]): Unit = {
    val spark = session()
    paths.foreach { p =>
      // single-file fixture = ONE scan partition; repartition + persist
      // OUTSIDE the measured window (untracked, so measure()'s release
      // doesn't drop it between faces) so both faces run 32-wide on
      // cached rows and the shuffle column shows only the operator's own
      val docs = spark.read.parquet(p).repartition(32).persist()
      docs.count()
      val name = p.split("/").last
      measure(s"FILTER repetitionStats + keep ($name)")(
        docs.select(col("doc_id"),
            graft.functions.TextFunctions.repetitionStats(col("text"))
              .as("r"))
          .select(col("doc_id"),
            graft.functions.TextFunctions.gopherKeepFromStats(col("r"))
              .as("keep")))
      measure(s"PROFILE repetitionScores n=2 ($name)")(
        graft.operators.TextProfile.repetitionScores(
          docs, "text", "doc_id", n = 2))
      // the A1 QUALITY half (q165) — the r16 verdict's pre-wiring gate:
      // measure the stats' cost on the decade BEFORE a flagship gates on
      // them (the q162 lesson: interpreted HOF folds priced fine at one
      // query and 17× once they rode into four flagships)
      measure(s"QUALITY gopherQualityStats + keep ($name)")(
        docs.select(col("doc_id"),
            graft.functions.TextFunctions.gopherQualityStats(col("text"))
              .as("g"))
          .select(col("doc_id"),
            graft.functions.TextFunctions.gopherQualityKeepFromStats(col("g"))
              .as("keep")))
      docs.unpersist(blocking = false)
    }
  }

  /** Corpus-wide segment (line) dedup pricing (q168,
    * [[graft.operators.Dedup.removeDuplicateSegments]]) across the
    * fixture decade, against its fixed-grid span twin (q100's
    * `removeDuplicateSpans`, `substr`-probe-priced when it landed):
    * same keep-first tail, so the expected picture is both linear in
    * corpus bytes with the SEGMENT form shuffling less (one key triple
    * per line instead of one per 4-token window). Boilerplate lines are
    * planted on half the docs so the removal path (per-affected-doc
    * index sets + indexed rebuild) is actually exercised, not skipped
    * by an all-unique corpus. */
  private def segDedupRun(paths: Seq[String]): Unit = {
    val spark = session()
    paths.foreach { p =>
      val docs = spark.read.parquet(p).repartition(32)
        .select(col("doc_id"),
          concat(coalesce(col("text"), lit("")),
            when(pmod(col("doc_id"), lit(2)) === 0,
              lit("\nsubscribe to our newsletter for updates"))
              .otherwise(lit(""))).as("text"))
        .persist()
      docs.count()
      val name = p.split("/").last
      measure(s"SEGMENT line dedup ($name)")(
        graft.operators.Dedup.removeDuplicateSegments(
          docs, "text", "doc_id"))
      measure(s"SPAN 4-token dedup ($name)")(
        graft.operators.Dedup.removeDuplicateSpans(
          docs, "text", "doc_id", window = 4))
      docs.unpersist(blocking = false)
    }
  }

  /** Bloom-sidecar pricing for the ARBITRARY-BINDING idempotence check
    * (q163): `fullIdCheck = true` pre-sidecar reads every cell's id
    * column per batch (O(store ids)), so its per-batch input read grows
    * with the store; with [[graft.operators.Quantize.enableCodeStoreIdBloom]]
    * recorded, a genuinely-new batch is screened to ZERO store reads and
    * only Bloom positives pay the exact anti-join. Run at two n's
    * (100k/400k) and compare the fixed-batch lines: LEGACY must grow
    * with n, SCREENED must stay flat; the all-positives REPLAY line is
    * the honest worst case (≈ legacy — every id routes to the join). */
  private def csBloomRun(n: Long): Unit = {
    val spark = session()
    withProductionBroadcast(spark)(csBloomBody(spark, n))
  }

  private def csBloomBody(spark: SparkSession, n: Long): Unit = {
    val dim = 64
    val (m, subDim) = (16, 4)
    val cells = math.max(16, (n / 1000).toInt)
    def vecs(ids: org.apache.spark.sql.Column, base: Int, eps: Double) =
      transform(sequence(lit(1), lit(dim)),
        i => (sin(lit(base) * i) + sin(ids * i) * eps)
          .cast("float")).as("embedding")
    val all = spark.range(n)
      .select(col("id").as("vec_id"), vecs(col("id"), 1, 1.0))
      .repartition(32)
    val tmp = java.nio.file.Files.createTempDirectory("csbloom").toString
    graft.operators.Similarity.trainCentroids(all, "embedding", "vec_id",
      cells).write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    graft.operators.Quantize.trainCodebook(all, "embedding", "vec_id",
      dim, m, 16).write.mode("overwrite").parquet(s"$tmp/cb")
    OpCache.release()
    val cents = spark.read.parquet(s"$tmp/cents")
    val cb = spark.read.parquet(s"$tmp/cb")
    timed(s"seed store build (n=$n, cells=$cells)")(
      graft.operators.Quantize.writeCodeStore(all, cents, cb, "embedding",
        "vec_id", m, subDim, s"$tmp/s", versioned = true))
    def freshBatch(lo: Long) = spark.range(lo, lo + 1000)
      .select(col("id").as("vec_id"), vecs(col("id"), 7, 0.001))
    def measuredIngest(label: String,
                       batch: org.apache.spark.sql.DataFrame): Unit = {
      inputRead.reset()
      val t0 = System.nanoTime()
      graft.operators.Quantize.ingestBatchCodeStore(spark, s"$tmp/s",
        batch, cents, cb, "embedding", "vec_id", m, subDim,
        fullIdCheck = true).count()
      Thread.sleep(500) // let the listener bus drain task-end events
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.2f s, " +
        f"input read ${inputRead.sum() / 1048576.0}%.1f MiB")
      OpCache.release()
    }
    measuredIngest("LEGACY fullIdCheck, FIXED 1k new ids",
      freshBatch(10 * n))
    timed("enableCodeStoreIdBloom (one O(store) pass)")(
      graft.operators.Quantize.enableCodeStoreIdBloom(spark, s"$tmp/s",
        "vec_id", math.max(4 * n, 1000000L)))
    measuredIngest("SCREENED fullIdCheck, FIXED 1k new ids",
      freshBatch(20 * n))
    measuredIngest("SCREENED REPLAY (all positives, exact fallback)",
      freshBatch(20 * n))
  }

  /** Streaming code-store ingest at CADENCE (r15): drive
    * [[graft.streaming.StreamingFlows.streamingIngestCodeStore]] for
    * `batches` micro-batches of 1k new vectors each against an n-vector
    * seed store and measure, after EVERY tick, the claims the store's
    * scaladoc makes about cadence: manifests stay exactly current+grace
    * (GC reclaims the chain as it grows), every cell stays ONE file
    * (self-compacting ingest — probe-time file counts never grow with
    * cadence), and no staging debris accumulates. A claim that only
    * holds for two hand-run ingests (q158's shape) is not a claim about
    * a 30 s cadence — this is the N-tick evidence. */
  private def csCadenceRun(n: Long, batches: Int): Unit = {
    val spark = session()
    import spark.implicits._
    val dim = 64
    val (m, subDim) = (16, 4)
    val cells = math.max(16, (n / 1000).toInt)
    def vecs(ids: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)),
        i => sin(ids * i).cast("float")).as("embedding")
    val seed = spark.range(n).select(col("id").as("vec_id"), vecs(col("id")))
      .repartition(32)
    val tmp = java.nio.file.Files.createTempDirectory("cscadence").toString
    graft.operators.Similarity.trainCentroids(seed, "embedding", "vec_id",
      cells).write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    graft.operators.Quantize.trainCodebook(seed, "embedding", "vec_id",
      dim, m, 16).write.mode("overwrite").parquet(s"$tmp/cb")
    OpCache.release()
    val cents = spark.read.parquet(s"$tmp/cents")
    val cb = spark.read.parquet(s"$tmp/cb")
    val store = s"$tmp/store"
    timed(s"seed store build (n=$n, cells=$cells)")(
      graft.operators.Quantize.writeCodeStore(seed, cents, cb, "embedding",
        "vec_id", m, subDim, store, versioned = true))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    val q = graft.streaming.StreamingFlows.streamingIngestCodeStore(
        in.toDF().select(col("value").as("vec_id"), vecs(col("value"))),
        store, cents, cb, "embedding", "vec_id", m, subDim,
        s"$tmp/ckpt")
      .start()
    try (1 to batches).foreach { tick =>
      val t0 = System.nanoTime()
      in.addData((n + (tick - 1) * 1000L) until (n + tick * 1000L))
      q.processAllAvailable()
      val names = new java.io.File(store).list().toSeq
      val committed = names.filter(x =>
        x.startsWith("_graft_manifest-v") && !x.contains(".tmp"))
      val tmps = names.count(_.contains(".tmp"))
      val gens = names.count(_.startsWith("gen-"))
      val sdf = graft.operators.Quantize.readCodeStore(spark, store)
      val files = sdf.inputFiles.length
      val cellsNow = sdf.select(col("cell")).distinct().count()
      OpCache.release()
      println(f"[probe] tick $tick%2d: ${(System.nanoTime - t0) / 1e9}%5.2f s" +
        f" | manifests ${committed.size} (${committed.minBy(identity)}.." +
        f"${committed.maxBy(identity)}) tmp $tmps gen-dirs $gens" +
        f" | files $files for $cellsNow cells" +
        (if (files == cellsNow) " (ONE file/cell)" else " FRAGMENTED"))
    } finally q.stop()
    val bytes = {
      def du(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(du).sum else f.length()
      du(new java.io.File(store))
    }
    println(f"[probe] store after $batches ticks: ${bytes / 1048576.0}%.1f MiB" +
      f" (${n + batches * 1000L} vectors)")
  }

  /** Model drift → retrain recall study (r15,
    * [[graft.operators.Quantize.retrainCodeStore]]): a store's centroids
    * and codebook are trained on corpus A; a DRIFTED corpus B (a vector
    * family the A-models never saw) is ingested with the stale models —
    * the contractually correct move, ingest never retrains — and
    * recall@10 against exact brute-force cosine is measured for drifted
    * queries BEFORE and AFTER `retrainCodeStore` over A∪B. The delta is
    * the number the migration leg exists to buy back; q160 gates the
    * migration's correctness, this prices its value. */
  private def retrainRun(n: Long): Unit = {
    val spark = session()
    withProductionBroadcast(spark)(retrainBody(spark, n))
  }

  private def retrainBody(spark: SparkSession, n: Long): Unit = {
    val dim = 64
    val (m, subDim) = (16, 4)
    val cells = math.max(16, (n / 1000).toInt)
    val a = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => sin(col("id") * i).cast("float")).as("embedding"))
      .repartition(32)
    // drift: a NEW TIGHT DOMAIN (all B vectors cluster around one point
    // the A-models never saw — a fresh data source arriving, the
    // realistic drift shape): the stale coarse quantizer funnels the
    // whole domain into its one or two nearest cells, and the stale
    // codebook has no codewords for the domain's fine structure
    val b = spark.range(n, n + n / 2).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => (sin(lit(7) * i) + sin(col("id") * i) * 0.2)
            .cast("float")).as("embedding"))
      .repartition(32)
    val tmp = java.nio.file.Files.createTempDirectory("retrain").toString
    graft.operators.Similarity.trainCentroids(a, "embedding", "vec_id",
      cells).write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    graft.operators.Quantize.trainCodebook(a, "embedding", "vec_id",
      dim, m, 16).write.mode("overwrite").parquet(s"$tmp/cb")
    OpCache.release()
    val cents0 = spark.read.parquet(s"$tmp/cents")
    val cb0 = spark.read.parquet(s"$tmp/cb")
    val store = s"$tmp/store"
    timed(s"store build over A (n=$n, cells=$cells)")(
      graft.operators.Quantize.writeCodeStore(a, cents0, cb0, "embedding",
        "vec_id", m, subDim, store, versioned = true))
    // drift METRIC tie-in (q164's codeStoreDriftStats): the retrain
    // trigger must read CALM on an in-distribution sample and LOUD on
    // the very batch whose stale-model recall collapses below — this is
    // the thresholding evidence SURVEY §6 records (err_ratio ↔ recall)
    def driftStat(label: String,
                  batch: org.apache.spark.sql.DataFrame): Unit = {
      val r = graft.operators.Quantize.codeStoreDriftStats(spark, store,
        batch, "embedding", "vec_id").collect()(0)
      println(f"[probe] driftStats $label: " +
        f"err_ratio=${r.getAs[Double]("err_ratio")}%.2f " +
        f"fill_skew=${r.getAs[Double]("fill_skew")}%.2f")
      OpCache.release()
    }
    driftStat("CONTROL (A sample)",
      a.filter(pmod(col("vec_id"), lit(17)) === 0))
    driftStat("DRIFTED B (pre-ingest)", b)
    timed(s"ingest DRIFTED B (${n / 2} vectors, stale models)")(
      graft.operators.Quantize.ingestBatchCodeStore(spark, store, b,
        cents0, cb0, "embedding", "vec_id", m, subDim).count())
    OpCache.release()
    val corpus = a.unionByName(b)
    val queries = b.filter(pmod(col("vec_id"), lit(997)) === 0)
    val k = 10
    val exact = OpCache.materialize(graft.operators.Similarity
      .bruteForceTopK(corpus, queries, "embedding", "vec_id", k)
      .select(col("query_id"), col("corpus_id")))
    def recall(cents: org.apache.spark.sql.DataFrame,
               cb: org.apache.spark.sql.DataFrame): Double = {
      val ann = graft.operators.Quantize.ivfPqTopKFromStore(spark, store,
          queries, cents, cb, "embedding", "vec_id", m, subDim, k,
          nProbe = 4)
        .select(col("query_id"), col("corpus_id"))
      val hit = ann.join(exact, Seq("query_id", "corpus_id"), "left_semi")
        .count()
      val nq = queries.count()
      val r = hit.toDouble / (nq * k)
      OpCache.release()
      r
    }
    // the SERVING-COST face of drift: ADC scores every code inside the
    // probed cells (no shortlist cap), so recall survives stale models —
    // what degrades is PRUNING POWER: drifted vectors pile into the few
    // stale cells nearest their region, and every drifted query then
    // scans those swollen cells. Candidates-per-query and max cell size
    // are the drift tax; retrain re-tiles the space and takes it back.
    def pruneStats(cents: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val cand = graft.operators.Quantize.prunedCodeStore(spark, store,
        queries, cents, "embedding", "vec_id", nProbe = 4).count()
      val maxCell = graft.operators.Quantize.readCodeStore(spark, store)
        .groupBy(col("cell")).count().agg(max(col("count")))
        .collect()(0).getLong(0)
      OpCache.release()
      (cand, maxCell)
    }
    val stale = recall(cents0, cb0)
    val (candStale, maxCellStale) = pruneStats(cents0)
    println(f"[probe] STALE models: recall@$k $stale%.3f, " +
      f"$candStale codes scanned for the query batch, " +
      f"max cell $maxCellStale rows")
    timed(s"retrainCodeStore over A∪B (${n + n / 2} vectors)")(
      graft.operators.Quantize.retrainCodeStore(spark, store, corpus,
        "embedding", "vec_id", dim, m, 16, cells))
    OpCache.release()
    val (cents1, cb1) = graft.operators.Quantize.storedModels(spark, store)
      .getOrElse(throw new IllegalStateException("no stored models"))
    val fresh = recall(cents1, cb1)
    val (candFresh, maxCellFresh) = pruneStats(cents1)
    println(f"[probe] RETRAINED models: recall@$k $fresh%.3f " +
      f"(stale $stale%.3f), $candFresh codes scanned " +
      f"(stale $candStale, ${candStale.toDouble / candFresh}%.1fx), " +
      f"max cell $maxCellFresh rows (stale $maxCellStale)")
  }

  private def retractRun(n: Long, docsPath: String): Unit = {
    val spark = session()
    withProductionBroadcast(spark)(retractBody(spark, n, docsPath))
  }

  private def retractBody(spark: SparkSession, n: Long,
                          docsPath: String): Unit = {
    val dim = 64
    val (m, subDim) = (16, 4)
    val cells = math.max(16, (n / 1000).toInt)
    val e = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => sin(col("id") * i).cast("float")).as("embedding"))
      .repartition(32)
    val tmp = java.nio.file.Files.createTempDirectory("retract").toString
    graft.operators.Similarity.trainCentroids(e, "embedding", "vec_id", cells)
      .write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    graft.operators.Quantize.trainCodebook(e, "embedding", "vec_id", dim, m, 16)
      .write.mode("overwrite").parquet(s"$tmp/cb")
    OpCache.release()
    val cents = spark.read.parquet(s"$tmp/cents")
    val cb = spark.read.parquet(s"$tmp/cb")
    def buildStore(path: String): Unit = {
      graft.operators.Quantize.writeCodeStore(e, cents, cb, "embedding",
        "vec_id", m, subDim, path)
      OpCache.release()
    }
    timed(s"code store build (n=$n cells=$cells) — the rebuild unit")(
      buildStore(s"$tmp/sA"))
    buildStore(s"$tmp/sB")
    val scattered = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id"))
    val store = graft.operators.Quantize.readCodeStore(spark, s"$tmp/sA")
    val hit = store.join(scattered, Seq("vec_id"), "left_semi")
      .select(col("cell")).distinct().count()
    timed(f"removeFromCodeStore SCATTERED 1%% ($hit of $cells cells hit)")(
      graft.operators.Quantize.removeFromCodeStore(spark, s"$tmp/sA",
        scattered, "vec_id"))
    val sB = graft.operators.Quantize.readCodeStore(spark, s"$tmp/sB")
    // the 2 most populous cells (literal cell ids can be empty — Lloyd
    // cells are not uniformly occupied on synthetic vectors)
    val topCells = sB.groupBy(col("cell")).count()
      .orderBy(col("count").desc).limit(2)
      .collect().map(_.get(0)).toSeq
    val twoCells = sB.filter(col("cell").isInCollection(topCells))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    timed(s"removeFromCodeStore CLUSTERED (all ${twoCells.size} ids of 2 cells)")(
      graft.operators.Quantize.removeFromCodeStore(spark, s"$tmp/sB",
        spark.createDataFrame(Seq(twoCells: _*).map(Tuple1(_)))
          .toDF("vec_id"), "vec_id"))
    timed("code store FULL REBUILD over remaining corpus")(
      graft.operators.Quantize.writeCodeStore(
        e.join(scattered, Seq("vec_id"), "left_anti"), cents, cb,
        "embedding", "vec_id", m, subDim, s"$tmp/sC"))
    OpCache.release()
    // --- BM25 index ---
    val docs = spark.read.parquet(docsPath)
      .filter(length(trim(col("text"))) > 0).repartition(32)
    val tbl = s"probe_idx_${System.nanoTime()}"
    timed(s"index build over $docsPath — the rebuild unit")(
      graft.operators.Rank.writeIndex(docs, "text", "doc_id", tbl,
        buckets = 32))
    val removedDocs = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id"))
    timed("removeFromIndex 1% takedown (rewrite, no re-tokenize)")(
      graft.operators.Rank.removeFromIndex(spark, tbl, removedDocs,
        "doc_id"))
    timed("index FULL REBUILD over remaining corpus")(
      graft.operators.Rank.writeIndex(
        docs.join(removedDocs, Seq("doc_id"), "left_anti"),
        "text", "doc_id", s"${tbl}_rb", buckets = 32))
    Seq(tbl, s"${tbl}_stats", s"${tbl}_rb", s"${tbl}_rb_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }

  /** The r12 MisraGries shape — immutable Map rebuilt per reduce item —
    * kept ONLY as the measurement baseline for the `mg` study (the
    * shipped mutable form is [[graft.functions.Aggregators.MisraGries]]). */
  private final case class ImmutableMG(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], g: String): Map[String, Long] =
      b.get(g) match {
        case Some(c) => b.updated(g, c + 1L)
        case None if b.size < capacity => b.updated(g, 1L)
        case None =>
          b.iterator.foldLeft(Map.newBuilder[String, Long]) {
            case (out, (k, c)) => if (c > 1L) out += (k -> (c - 1L)); out
          }.result()
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val combined = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (combined.size <= capacity) combined
      else {
        val thresh = combined.valuesIterator.toArray
          .sorted(Ordering[Long].reverse)(capacity)
        combined.iterator.foldLeft(Map.newBuilder[String, Long]) {
          case (out, (k, c)) => if (c > thresh) out += (k -> (c - thresh)); out
        }.result()
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy-ngram pricing (q145 / r13 advice #5): (a) the exact
    * full-vocabulary `groupBy(gram).count` + top-k, (b) the shipped
    * mutable-buffer Misra–Gries, (c) the r12 immutable-Map MG. The
    * interesting numbers: exact shuffles the whole (gram, count)
    * vocabulary; MG shuffles one ≤capacity-entry map per partition; and
    * (b) vs (c) prices the per-item immutable rebuild on the reduce
    * path. */
  private def mgRun(docsPath: String): Unit = {
    val spark = session()
    import spark.implicits._
    // persist OUTSIDE OpCache: measure() releases the OpCache after every
    // query, and a released docs cache makes every later query re-pay the
    // parquet read + repartition shuffle (79.7 MiB here), polluting the
    // per-query attribution (observed before this fix)
    val docs = spark.read.parquet(docsPath).repartition(32).persist()
    println(s"[probe] mg over ${docs.count()} docs ($docsPath)")
    val cap = 256
    def grams = docs.select(
      explode(shingles(col("text"), 3)).as("g"))
    println("[probe] MG physical plan:\n" +
      TextProfile.heavyNgrams(docs, "text", 3, cap).queryExecution
        .executedPlan.toString.linesIterator
        .map(_.take(140)).take(18).mkString("\n"))
    for (round <- 1 to 2) { // round 1 = warmup (JIT, page cache)
      if (round == 2) println("[probe] --- timed round ---")
      measure("control: explode + global count (no per-gram state)")(
        grams.agg(count(lit(1)).as("n")))
      measure(s"exact groupBy top-$cap")(
        grams.groupBy($"g").agg(count(lit(1)).as("c"))
          .orderBy($"c".desc, $"g").limit(cap))
      measure("MG mutable buffer (shipped)")(
        TextProfile.heavyNgrams(docs, "text", 3, cap))
      measure("MG immutable buffer (r12 shape)")(
        grams.as[String].select(ImmutableMG(cap).toColumn.name("mg"))
          .select(explode($"mg").as(Seq("gram", "est_count"))))
    }
  }

  /** Ingest-fragmentation study (q137/q138): how much does a store
    * fragmented by N sequential [[Dedup.ingestBatch]] appends cost on the
    * serving anti-join, and what does [[Layout.compactBucketed]] buy
    * back? Each bucketBy append writes one file per (writing task ×
    * touched bucket), so fragmentation compounds fast — this measures the
    * REAL layout after a production append cadence, not a synthetic one. */
  private def ingestRun(docsPath: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(docsPath).repartition(32)
    val n = docs.count()
    println(s"[probe] ingest-fragmentation run over $docsPath: $n docs")
    val slice = pmod(col("doc_id"), lit(50))
    val tbl = "probe_ingest_fp"
    Seq(tbl, s"${tbl}__graft_compact")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Dedup.writeFingerprintStore(docs.filter(slice >= 20), "text", tbl,
      buckets = 8)
    println(s"[probe] seed store files: " +
      s"${spark.table(tbl).select(input_file_name()).distinct().count()}")
    val t0 = System.nanoTime()
    (0 until 20).foreach { i =>
      Dedup.ingestBatch(spark, docs.filter(slice === i), "text", "doc_id",
        tbl)
      OpCache.release()
    }
    println(f"[probe] 20 sequential ingests: ${(System.nanoTime - t0) / 1e9}%.1f s")
    val fragFiles = spark.table(tbl).select(input_file_name()).distinct().count()
    println(s"[probe] store files after 20 ingests: $fragFiles")
    // probe batch whose content the store already holds (worst-case join)
    val probeBatch = docs.filter(slice === 25)
    measure("warmup fragmented")(
      Dedup.dedupAgainstStore(spark, probeBatch, "text", tbl))
    measure("anti-join off FRAGMENTED store")(
      Dedup.dedupAgainstStore(spark, probeBatch, "text", tbl))
    val tc = System.nanoTime()
    Layout.compactBucketed(spark, tbl)
    println(f"[probe] compaction: ${(System.nanoTime - tc) / 1e9}%.1f s")
    println(s"[probe] store files after compaction: " +
      s"${spark.table(tbl).select(input_file_name()).distinct().count()}")
    measure("warmup compacted")(
      Dedup.dedupAgainstStore(spark, probeBatch, "text", tbl))
    measure("anti-join off COMPACTED store")(
      Dedup.dedupAgainstStore(spark, probeBatch, "text", tbl))
  }

  /** Incremental-tier scaling: the Bloom route's shuffle cut on
    * [[Dedup.dedupAgainst]] (the broadcast threshold is forced off, so the
    * anti-join is the sort-merge shape it takes at 100 TB where neither
    * side broadcasts), plus the q100 span-dedup shape — the two newest
    * operators' entries in the SURVEY §6 measured-decades table. */
  private def incrRun(docsPath: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(docsPath).repartition(32)
    val n = docs.count()
    println(s"[probe] incremental run over $docsPath: $n docs")
    val isBatch = pmod(col("doc_id"), lit(10)) === 0
    val corpus = docs.filter(!isBatch)
    val batch = docs.filter(isBatch)
    // ad-hoc form: corpus fingerprinted + bloom rebuilt inside every call
    def adhoc(bloomItems: Long) =
      Dedup.dedupAgainst(batch, corpus, "text", "doc_id", bloomItems)
    println(s"[probe] kept (no bloom) = ${adhoc(0L).count()}, " +
      s"kept (bloom) = ${adhoc(n).count()}") // must agree — bloom only routes
    measure("warmup adhoc")(adhoc(0L))
    measure("adhoc dedupAgainst no-bloom")(adhoc(0L))
    measure("adhoc dedupAgainst bloom rebuilt per call")(adhoc(n))
    // production form: the snapshot's fingerprint STORE is materialized at
    // ingest and its Bloom built once; each batch pays only its own path
    val store = java.nio.file.Files.createTempDirectory("fps").toString
    corpus.select(fingerprint(col("text")).as("fp")).distinct()
      .write.mode("overwrite").parquet(store)
    val storedFps = spark.read.parquet(store)
    val bloom = Dedup.corpusBloom(corpus, "text", n)
    def stored(b: Option[org.apache.spark.util.sketch.BloomFilter]) =
      Dedup.dedupAgainstFingerprints(batch, "text", storedFps, b)
    measure("warmup stored")(stored(None))
    measure("stored-fps anti-join, no bloom")(stored(None))
    measure("stored-fps anti-join + prebuilt bloom")(stored(Some(bloom)))
    measure("stored-fps anti-join, no bloom (2)")(stored(None))
    measure("stored-fps anti-join + prebuilt bloom (2)")(stored(Some(bloom)))
    // ingest-store form (r12): the fp-BUCKETED store — the anti-join's
    // store side reads co-located buckets, so the residual shuffle the
    // flat store still pays (both sides hash on fp) drops to the batch
    // side alone
    val pid = java.lang.Long.toHexString(ProcessHandle.current().pid())
    val fpTbl = s"probe_incr_fp_$pid"
    spark.sql(s"DROP TABLE IF EXISTS $fpTbl")
    Dedup.writeFingerprintStore(corpus, "text", fpTbl, buckets = 32)
    def bucketed(b: Option[org.apache.spark.util.sketch.BloomFilter]) =
      Dedup.dedupAgainstStore(spark, batch, "text", fpTbl, b)
    measure("warmup fp-bucketed store")(bucketed(None))
    measure("fp-bucketed store anti-join, no bloom")(bucketed(None))
    measure("fp-bucketed store anti-join + prebuilt bloom")(bucketed(Some(bloom)))
    measure("fp-bucketed store anti-join, no bloom (2)")(bucketed(None))
    // LSH tier (r12): in-plan bipartite (corpus re-shingled per call) vs
    // the writeLshStore ingest store (bucketed band + signature scans)
    val lshTbl = s"probe_incr_lsh_$pid"
    Seq(s"${lshTbl}_bands", s"${lshTbl}_sigs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    def lshAdhoc() = Dedup.minhashLshAgainst(batch, corpus, "text",
      "doc_id", threshold = 0.5)
    measure("warmup lsh adhoc")(lshAdhoc())
    measure("adhoc minhashLshAgainst")(lshAdhoc())
    measure("adhoc minhashLshAgainst (2)")(lshAdhoc())
    val tW0 = System.nanoTime()
    Dedup.writeLshStore(corpus, "text", "doc_id", lshTbl, buckets = 32)
    println(f"[probe] lsh store write (once at ingest): " +
      f"${(System.nanoTime() - tW0) / 1e9}%.2f s")
    def lshStored() = Dedup.minhashLshAgainstStore(spark, batch, "text",
      "doc_id", lshTbl, threshold = 0.5)
    measure("warmup lsh store")(lshStored())
    measure("lsh-store bipartite")(lshStored())
    measure("lsh-store bipartite (2)")(lshStored())
    def spans() =
      Dedup.removeDuplicateSpans(docs, "text", "doc_id", window = 4)
    measure("warmup span dedup")(spans())
    measure("q100-shape span dedup")(spans())
    measure("q100-shape span dedup (2)")(spans())
    spark.stop()
  }

  /** SemDeDup-tier scaling: [[Dedup.semDedupPairs]] over synthetic
    * deterministic embeddings at decade-over-decade corpus sizes, hard
    * (probes=1) vs soft (probes=2) assignment. Embeddings are generated
    * in-plan from id hashes (64 dims, near-orthogonal in expectation), with
    * ~1% planted exact copies (id % 97 == 0 copies id−1) so tau=0.9 has a
    * known positive set of ~n/97 pairs. Reports wall, shuffle bytes, the
    * BLOCKING-stage candidate count (the (n/k)² control — the number that
    * must NOT grow quadratically in n at fixed cell size), and found
    * pairs. k scales as n/256 (fixed ~256-vector mean cell), the knob that
    * holds per-cell work constant as the corpus grows. */
  /** Deterministic 64-dim synthetic embedding from a seed column — the
    * shared fixture generator of the embedding-tier probes (protoprune /
    * semdecon / sem). */
  private def hashVec64(seed: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(63)), j =>
      ((pmod(xxhash64(seed * 64 + j), lit(2001)) - 1000) / lit(1000.0))
        .cast("float"))

  /** Prototype-pruning decade pricing (round 17; q171's oracle gate runs
    * at 500 fixture rows): [[graft.operators.Curate.prototypePrune]] over
    * synthetic 64-dim embeddings in 256 hash clusters across the
    * 50k/500k decade — isolates the two shuffles the operator owns: the
    * partial-aggregated dim-explode centroid pass (|clusters|·dim rows
    * after map-side combine) and the cluster-key rank window. Linear
    * decade scaling here is the 100 TB claim: per-cluster sort cost grows
    * with cluster size, everything else is a scan. */
  /** BPE merge-learning decade pricing (round 17; q177's oracle gate runs
    * at fixture scale): [[graft.operators.Tokenize.bpeMerges]] over the
    * 50k/500k big-vocab (8k-word) corpora. The 100 TB claim under test:
    * document text is touched ONCE (the word-frequency collapse — the
    * only corpus-scale stage), after which all 8 iterations run on the
    * vocab-bounded segmentation table, so the decade should move the
    * scan-dominated total far less than 10× and the per-iteration tail
    * not at all. The word-collapse is also measured alone to split the
    * two phases. */
  /** Production-merge-count BPE pricing (round 18, q189): the
    * driver-side learner [[graft.operators.Tokenize.bpeMergesLocal]] at
    * 1k/8k/32k merges — the scale the 256-capped one-job-per-merge
    * [[graft.operators.Tokenize.bpeMerges]] loop cannot reach (32k
    * sequential Spark jobs ≈ days at even 100 ms/job). The merges=1
    * line isolates the distributed word-collapse + top-V cap (the only
    * corpus-sized work — identical for every merge count); the deltas
    * above it are pure driver learn. The encode line prices applying
    * the learned 32k table to every DISTINCT word with the native
    * [[graft.functions.expressions.BpeEncodeExpr]] loop (the bpeFit
    * join-back shape — vocab-bounded, never corpus-bounded). */
  private def bpeLocalRun(path: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(path)
    import graft.operators.Tokenize
    timed(s"bpelocal collapse only (merges=1) $path") {
      Tokenize.bpeMergesLocal(docs, "text", merges = 1).count()
    }
    for (m <- Seq(1024, 8192, 32768)) {
      timed(s"bpelocal learn $m merges $path") {
        val got = Tokenize.bpeMergesLocal(docs, "text", merges = m).count()
        println(s"[probe]   learned $got merges (exhaustion-capped)")
      }
    }
    val table = Tokenize.bpeMergesLocal(docs, "text", merges = 32768)
      .orderBy(col("merge_idx")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    timed(s"bpelocal native encode ${table.size} merges x vocab $path") {
      val n = docs.select(explode(tokens(col("text"))).as("w"))
        .filter(col("w") =!= "").distinct()
        .select(sum(size(Tokenize.bpeEncode(col("w"), table))).as("s"))
        .collect()(0).getLong(0)
      println(s"[probe]   $n symbols emitted")
    }
    spark.stop()
  }

  /** Unigram-LM trainer pricing (round 18, q191): the q189 posture for
    * the OTHER induction algorithm — distributed collapse + driver EM;
    * the vocab=target lines price the full seed→EM→prune→EM descent,
    * the encode line the native Viterbi over every distinct word. */
  private def uniLocalRun(path: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(path)
    import graft.operators.Tokenize
    for (v <- Seq(1024, 4096)) {
      timed(s"unilocal learn vocab=$v $path") {
        val n = Tokenize.unigramFit(docs, "text", vocabSize = v,
          maxPieceLen = 8, seedSize = 4 * v).count()
        println(s"[probe]   $n pieces")
      }
    }
    val table = Tokenize.unigramFit(docs, "text", vocabSize = 4096,
        maxPieceLen = 8, seedSize = 16384)
      .orderBy(col("piece_rank")).collect()
      .map(r => (r.getString(1), r.getDouble(3))).toSeq
    timed(s"unilocal viterbi encode ${table.size} pieces x vocab $path") {
      val n = docs.select(explode(tokens(col("text"))).as("w"))
        .filter(col("w") =!= "").distinct()
        .select(sum(size(Tokenize.unigramSegment(col("w"), table))).as("s"))
        .collect()(0).getLong(0)
      println(s"[probe]   $n symbols emitted")
    }
    spark.stop()
  }

  private def bpeRun(paths: Seq[String]): Unit = {
    val spark = session()
    for (p <- paths) {
      val docs = spark.read.parquet(p)
      measure(s"warmup bpe $p")(
        graft.operators.Tokenize.bpeMerges(docs, "text", merges = 2))
      measure(s"bpe word-collapse only $p")(
        docs.select(explode(tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("w")).agg(count(lit(1)).as("freq")))
      measure(s"bpe 8 merges $p")(
        graft.operators.Tokenize.bpeMerges(docs, "text", merges = 8))
      OpCache.release()
    }
    spark.stop()
  }

  /** k-center greedy decade pricing (round 17; q179's oracle gate runs at
    * 500 fixture rows): [[graft.operators.Curate.kCenterGreedy]] k=8 over
    * synthetic 64-dim embeddings across the 50k/500k decade. The 100 TB
    * claim: each round is one cached scan against a single literal
    * center plus a TakeOrdered top-1 — no shuffle at any size — so the
    * decade should scale ~linearly in scan cost with zero shuffle
    * growth. */
  private def kCenterRun(sizes: Seq[Long]): Unit = {
    val spark = session()
    val tmp = java.nio.file.Files.createTempDirectory("kcenter").toString
    for (n <- sizes) {
      spark.range(n).select(col("id"), hashVec64(col("id")).as("embedding"))
        .repartition(32).write.mode("overwrite").parquet(s"$tmp/emb_$n")
      val emb = spark.read.parquet(s"$tmp/emb_$n")
      measure(s"warmup kcenter n=$n")(
        graft.operators.Curate.kCenterGreedy(emb, "embedding", "id", 4))
      measure(s"kcenter n=$n (k=8)")(
        graft.operators.Curate.kCenterGreedy(emb, "embedding", "id", 8))
      OpCache.release()
    }
    spark.stop()
  }

  /** Kneser–Ney vs add-one perplexity decade pricing (round 17; q180's
    * oracle gate runs at fixture scale): both smoothers over the
    * 50k/500k big-vocab corpora against the en reference slice,
    * broadcast off (the model joins take their sort-merge shape). The
    * claim: KN's two extra vocab-bounded model tables (context totals +
    * distinct continuations, distinct contexts) and one extra scoring
    * join price at a constant factor over q103's add-one shape, both
    * linear across the decade — text never shuffles in either. */
  private def knPplRun(paths: Seq[String]): Unit = {
    val spark = session()
    for (p <- paths) {
      val docs = spark.read.parquet(p).repartition(32)
      val ref = docs.filter(col("lang") === "en")
      measure(s"warmup ppl $p")(
        TextProfile.bigramPerplexity(docs, ref, "text", "doc_id"))
      measure(s"add-one bigram ppl $p")(
        TextProfile.bigramPerplexity(docs, ref, "text", "doc_id"))
      measure(s"kneser-ney bigram ppl $p")(
        TextProfile.knBigramPerplexity(docs, ref, "text", "doc_id"))
      OpCache.release()
    }
    spark.stop()
  }

  /** Graph-centrality decade pricing (round 17; q181's oracle gate runs
    * at 500/2000 fixture nodes): [[graft.operators.Rank.graphRank]] over
    * synthetic graphs with ~8 hash-derived neighbors per node at
    * 50k/500k nodes, broadcast off. The claim: each of the 5 rounds is
    * one id-keyed equi-join of the normalized edge frame with the n-row
    * rank frame plus one neighbor-ordered window — cost linear in |E|,
    * no payload beyond (id, id, double) anywhere. */
  private def centralityRun(sizes: Seq[Long]): Unit = {
    val spark = session()
    val tmp = java.nio.file.Files.createTempDirectory("centrality").toString
    for (n <- sizes) {
      val deg = 8
      spark.range(n).select(col("id"),
          explode(sequence(lit(0), lit(deg - 1))).as("j"))
        .select(col("id").as("a"),
          pmod(xxhash64(col("id"), col("j")), lit(n)).as("b"),
          round((pmod(xxhash64(col("j"), col("id")), lit(1000)) + 1) /
            lit(1000.0), 6).as("w"))
        .filter(col("a") =!= col("b"))
        .repartition(32).write.mode("overwrite").parquet(s"$tmp/edges_$n")
      val edges = spark.read.parquet(s"$tmp/edges_$n")
      val nodes = spark.range(n).select(col("id").as("nid"))
      measure(s"warmup centrality n=$n")(
        graft.operators.Rank.graphRank(nodes, "nid", edges,
          "a", "b", "w", iters = 2))
      measure(s"centrality n=$n (deg ~$deg, 5 iters)")(
        graft.operators.Rank.graphRank(nodes, "nid", edges,
          "a", "b", "w", iters = 5))
      OpCache.release()
    }
    spark.stop()
  }

  /** Content-defined-chunking decade pricing (round 17; q185's oracle
    * gate runs at fixture scale): [[graft.operators.Dedup
    * .cdcDuplicateChunks]] over the 50k/500k corpora. The claim: chunk
    * text dies at the scan — the one shuffle moves (fp, id, len)
    * triples, ~1 per 64 chars, so bytes grow linearly with corpus TEXT
    * and sit ~5-10× below q168's per-LINE keys and far below q121's
    * per-position stride-1 spans. The md5-per-position window hash is
    * the scan-stage cost to watch (the production swap is the native
    * rolling hash). */
  private def cdcRun(paths: Seq[String]): Unit = {
    val spark = session()
    for (p <- paths) {
      val docs = spark.read.parquet(p)
      measure(s"warmup cdc $p")(
        Dedup.cdcDuplicateChunks(docs, "text", "doc_id", nativeHash = true))
      measure(s"cdc md5-window face $p")(
        Dedup.cdcDuplicateChunks(docs, "text", "doc_id"))
      measure(s"cdc native rolling face $p")(
        Dedup.cdcDuplicateChunks(docs, "text", "doc_id", nativeHash = true))
      OpCache.release()
    }
    spark.stop()
  }

  private def protoPruneRun(sizes: Seq[Long]): Unit = {
    val spark = session()
    val tmp = java.nio.file.Files.createTempDirectory("protoprune").toString
    for (n <- sizes) {
      // materialize the synthetic input: the measurement prices the
      // OPERATOR's shuffles, not the fixture generator's repartition
      spark.range(n).select(col("id"),
          pmod(col("id"), lit(256)).cast("int").as("cluster"),
          hashVec64(col("id")).as("embedding"))
        .repartition(32).write.mode("overwrite").parquet(s"$tmp/emb_$n")
      val emb = spark.read.parquet(s"$tmp/emb_$n")
      measure(s"warmup protoPrune n=$n")(
        graft.operators.Curate.prototypePrune(
          emb, "embedding", "cluster", "id", 0.25))
      measure(s"protoPrune n=$n (256 clusters, drop 0.25)")(
        graft.operators.Curate.prototypePrune(
          emb, "embedding", "cluster", "id", 0.25))
      OpCache.release()
    }
    spark.stop()
  }

  /** Semantic-decontamination decade pricing (round 17; q169's gate runs
    * at 500/2000 fixture rows): [[graft.operators.Dedup.semanticDecontaminate]]
    * with a 1k-row eval set against 50k/500k synthetic corpora — the
    * 100 TB shape claim is that the CORPUS takes one hard IVF assignment
    * (its vectors never exchange: centroids broadcast, comparisons run
    * inside the shared-cell join) while only the catalog-sized EVAL side
    * multi-probes, so cost tracks corpus × (eval density per cell), not
    * corpus². Eval = 500 re-keyed exact corpus copies (planted verbatim
    * leaks) + 500 fresh vectors; the dropped count is printed so the run
    * also sanity-checks that every planted leak's source is caught. */
  private def semDeconRun(sizes: Seq[Long]): Unit = {
    val spark = session()
    val tmp = java.nio.file.Files.createTempDirectory("semdecon").toString
    for (n <- sizes) {
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(32L, n / 1000L).toString)
      val k = math.max(8, (n / 256).toInt)
      spark.range(n).select(col("id"), hashVec64(col("id")).as("embedding"))
        .repartition(32).write.mode("overwrite").parquet(s"$tmp/corpus_$n")
      val corpus = spark.read.parquet(s"$tmp/corpus_$n")
      // 500 exact leaks (same vector, re-keyed id) + 500 fresh vectors
      val evalDf = corpus.filter(pmod(col("id"), lit(n / 500)) === 0)
        .limit(500).select((col("id") + 10000000L).as("id"), col("embedding"))
        .unionByName(spark.range(20000000L, 20000500L)
          .select(col("id"), hashVec64(col("id")).as("embedding")))
      val kept = Dedup.semanticDecontaminate(corpus, evalDf,
        "embedding", "id", k = k, tau = 0.9)
      val dropped = n - kept.count(); OpCache.release()
      measure(f"semanticDecontaminate n=$n k=$k (dropped=$dropped)")(
        Dedup.semanticDecontaminate(corpus, evalDf, "embedding", "id",
          k = k, tau = 0.9))
    }
    spark.stop()
  }

  private def semRun(sizes: Seq[Long]): Unit = {
    val spark = session()
    for (n <- sizes) {
      val k = math.max(8, (n / 256).toInt)
      // partition count must scale with the candidate volume (~2n²/k
      // pairs × ~300 B of attached vectors): at a fixed 32 partitions the
      // 200k decade is ~1 GB of join-sort buffer per task and 32
      // concurrent tasks OOM a default heap — exactly the knob a real
      // cluster run sizes first (SURVEY §6)
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(32L, n / 1000L).toString)
      val emb = spark.range(n).select(col("id"),
        when(pmod(col("id"), lit(97)) === 0 && col("id") > 0,
          hashVec64(col("id") - 1)).otherwise(hashVec64(col("id"))).as("embedding"))
        .repartition(32)
      val planted = (n - 1) / 97 // ids 97, 194, … pair with id−1
      def pairs(probes: Int) = Dedup.semDedupPairs(emb, "embedding", "id",
        k = k, tau = 0.9, probes = probes)
      // candidate count at the blocking stage: same assignment, no verify
      val cents = graft.operators.Similarity
        .trainCentroids(emb, "embedding", "id", k)
      val assigned = graft.operators.Similarity
        .ivfAssignMulti(emb, cents, "embedding", "id", probes = 2)
        .select(col("id"), col("cell"))
      val cands = assigned.alias("l").join(assigned.alias("r"),
          col("l.cell") === col("r.cell") && col("l.id") < col("r.id"))
        .select(col("l.id"), col("r.id")).distinct().count()
      OpCache.release()
      println(f"[probe] sem n=$n k=$k planted=$planted " +
        f"candidates=$cands (n²=${n * n}, ratio=${cands.toDouble / n / n}%.2e)")
      for (p <- Seq(1, 2)) {
        val found = pairs(p).count(); OpCache.release()
        measure(f"semdedup n=$n probes=$p (found=$found)")(pairs(p))
      }
    }
    spark.stop()
  }

  /** Split the exact-Jaccard self-join (q50/q86/q87's shared dominant cost)
    * into its stages: set construction, prefix-join blocking, and the
    * per-candidate verify — so optimization effort lands on the stage that
    * actually dominates at a given corpus size. */
  private def ppSplitRun(docsPath: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(docsPath).repartition(32)
    println(s"[probe] ppjoin stage split over $docsPath: ${docs.count()} docs")
    for (round <- Seq("warmup", "timed")) {
      measure(s"$round sets only") {
        val (sets, _) = Dedup.jaccardCandidates(docs, "text", "doc_id", 3, 0.6)
        sets
      }
      measure(s"$round sets+candidates") {
        val (_, cands) = Dedup.jaccardCandidates(docs, "text", "doc_id", 3, 0.6)
        cands
      }
      measure(s"$round full ppjoin")(
        Dedup.jaccardSelfJoin(docs, "text", "doc_id", 3, 0.6))
      // the pre-round-8 verify (array_intersect + array_union per pair),
      // kept as the measurement baseline for the merge-scan kernel
      measure(s"$round full ppjoin (intersect/union verify)") {
        val (sets, cands) =
          Dedup.jaccardCandidates(docs, "text", "doc_id", 3, 0.6)
        val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
        val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
        cands.join(a, "id_a").join(b, "id_b")
          .select(col("id_a"), col("id_b"),
            (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
          .filter(col("jaccard") >= 0.6)
      }
    }
    spark.stop()
  }

  /** Re-measure the Bayardo df-ascending canonical order against the
    * hash order at a given corpus size. Round 7 measured df-order
    * net-slower at sf0.1 (5k docs: halves candidates, but the two extra
    * full-token-stream shuffles dominate); the round-8 scaling run showed
    * hash-order prefix candidates growing ~n² on the near-uniform
    * vocabulary, so the tradeoff may flip a decade up — this mode is the
    * measurement. */
  private def dfOrderRun(docsPath: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(docsPath).repartition(32)
    println(s"[probe] df-order experiment over $docsPath: ${docs.count()} docs")
    val threshold = 0.6

    // Bayardo et al. WWW'07 order: rarest shingles first, so prefixes
    // collide only on genuinely shared rare shingles. Costs one global df
    // aggregation + one per-doc reorder of the (id, h) token stream.
    def dfOrderedStage(): (DataFrame, DataFrame) = {
      val tok = docs.select(col("doc_id").as("id"),
        explode(shingleHashes(col("text"), 3)).as("h"))
      val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
      val sets = OpCache.track(tok.join(dfreq, "h")
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("p"))
        .select(col("id"),
          transform(col("p"), x => x.getField("h")).as("sh"))
        .withColumn("len", size(col("sh")))
        .persist())
      val p = (col("len") - ceil(col("len") * threshold - 1e-9) + 1).cast("int")
      val prefix = sets.select(col("id"), col("len"),
        posexplode(slice(col("sh"), lit(1), p)).as(Seq("pos", "h")))
      val alpha = ceil((col("a.len") + col("b.len")) *
        (threshold / (1 + threshold)) - 1e-9)
      val cands = prefix.alias("a").join(prefix.alias("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          least(col("a.len"), col("b.len")).cast("double") >=
            greatest(col("a.len"), col("b.len")) * threshold - 1e-9 &&
          least(col("a.len") - col("a.pos"), col("b.len") - col("b.pos"))
            .cast("double") >= alpha)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      (sets, cands)
    }

    def dfJoin(): DataFrame = {
      val (sets, cands) = dfOrderedStage()
      val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
      cands.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }

    val (_, hashCands) =
      Dedup.jaccardCandidates(docs, "text", "doc_id", 3, threshold)
    println(s"[probe] hash-order candidates: ${hashCands.count()}")
    OpCache.release()
    val (_, dfCands) = dfOrderedStage()
    println(s"[probe] df-order candidates: ${dfCands.count()}")
    OpCache.release()
    println(s"[probe] df-order result pairs: ${dfJoin().count()}")
    OpCache.release()
    // BOTH orders verify with array_intersect/array_union here: the
    // df-ordered arrays violate the merge-scan kernel's sorted-ascending
    // precondition, and timing hash-order with the faster kernel would
    // conflate canonical-order cost with verify-kernel cost — this mode
    // isolates ORDERING only
    def hashJoin() = {
      val (sets, cands) =
        Dedup.jaccardCandidates(docs, "text", "doc_id", 3, threshold)
      val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
      cands.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    measure("warmup hash-order ppjoin")(hashJoin())
    measure("hash-order ppjoin")(hashJoin())
    measure("warmup df-order ppjoin")(dfJoin())
    measure("df-order ppjoin")(dfJoin())
    spark.stop()
  }

  /** Dedup-tier scaling measurement (see object doc). `lshOnly` skips the
    * exact-ppjoin shapes — at corpus sizes where the measured ~n² prefix
    * collisions make them infeasible (SURVEY §6), the LSH tier is the one
    * whose continued linearity is worth another decade of evidence. */
  private def scaleRun(docsPath: String, lshOnly: Boolean = false): Unit = {
    val spark = session()
    // the fixture is one unsplittable parquet file: spread it like the
    // queries' parallelize() does so CPU-bound stages use every core
    val docs = spark.read.parquet(docsPath).repartition(32)
    println(s"[probe] scale run over $docsPath: ${docs.count()} docs")

    // blocking-stage candidate counts (the scaling evidence): counted on
    // exactly the frames the operators verify, via the private stages.
    // Both band widths: chance collisions per pair are constant for a
    // FIXED banding, so they grow ~n² — widening rows-per-band (16 bands
    // of 4 → 8 bands of 8) is the S-curve knob that crushes them while
    // keeping near-dup (j≈0.95) recall ≈ 1 - (1 - 0.95^8)^8 ≈ 0.999.
    for (bands <- Seq(16, 8)) {
      val (_, mhCands) =
        Dedup.minhashCandidates(docs, "text", "doc_id", 3, 64, bands)
      println(s"[probe] minhash band-join candidates (64/$bands): " +
        mhCands.count())
      OpCache.release()
    }
    if (!lshOnly) {
      val (_, ppCands) = Dedup.jaccardCandidates(docs, "text", "doc_id", 3, 0.6)
      println(s"[probe] ppjoin prefix candidates: ${ppCands.count()}")
      OpCache.release()
    }

    // output cardinalities
    val lshOut = Dedup.minhashLsh(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.5)
    println(s"[probe] q32-shape lsh pairs (est>=0.5): ${lshOut.count()}")
    OpCache.release()
    if (!lshOnly) {
      val pairs = Dedup.jaccardSelfJoin(docs, "text", "doc_id",
        shingleK = 3, threshold = 0.6)
      println(s"[probe] q50-shape exact pairs (j>=0.6): ${pairs.count()}")
      OpCache.release()
    }

    // timed end-to-end shapes (one warmup each, then the timed run)
    def lsh() = Dedup.minhashLsh(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.5)
    measure("warmup q32 minhashLsh")(lsh())
    measure("q32 minhashLsh")(lsh())
    if (!lshOnly) {
      def pp() = Dedup.jaccardSelfJoin(docs, "text", "doc_id",
        shingleK = 3, threshold = 0.6)
      def cc() = Dedup.resolveClusters(pp())
      def keep() = Dedup.keepRepresentatives(docs, pp(), "doc_id")
      measure("warmup q50 ppjoin")(pp())
      measure("q50 ppjoin")(pp())
      measure("warmup q86 ppjoin+CC")(cc())
      measure("q86 ppjoin+CC")(cc())
      measure("warmup q87 full dedup")(keep())
      measure("q87 full dedup")(keep())
    }
    spark.stop()
  }

  /** The pre-round-4 banding shape vs current, kept as the measurement
    * baseline for the SURVEY §6 shuffle note. */
  private def bandingRun(): Unit = {
    val spark = session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

  /** IVF-PQ code-store pruning: files/bytes scanned by the statically
    * pruned serving path ([[graft.operators.Quantize.ivfPqTopKFromStore]])
    * vs an unpruned store scoring and vs the ad-hoc recompute path, over
    * n synthetic 64-dim vectors with cells sized n/1000 (the SURVEY §6
    * sizing rule). Centroids/codebook are parqueted to /tmp and read back
    * so measure()'s OpCache.release can't invalidate them between runs.
    * Query vectors come from `range` (zero input bytes), so scan metrics
    * isolate the STORE's read: 5 queries × nProbe=2 probe ≤ 10 of the
    * ~n/1000 cells. */
  private def pqStoreRun(n: Long): Unit = {
    val spark = session()
    // session() forces broadcast off for the self-join probes; here the
    // probe frame is queries×nProbe rows — policy-sized at ANY corpus
    // scale — so the honest at-scale shape lets it broadcast (DPP's
    // reuse-broadcast mode depends on it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    val dim = 64
    val (m, subDim) = (16, 4)
    val cells = math.max(16, (n / 1000).toInt)
    val e = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => sin(col("id") * i).cast("float")).as("embedding"))
      .repartition(32)
    val tmp = java.nio.file.Files.createTempDirectory("pqstore").toString
    graft.operators.Similarity.trainCentroids(e, "embedding", "vec_id", cells)
      .write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    graft.operators.Quantize.trainCodebook(e, "embedding", "vec_id", dim, m, 16)
      .write.mode("overwrite").parquet(s"$tmp/cb")
    OpCache.release()
    val cents = spark.read.parquet(s"$tmp/cents")
    val cb = spark.read.parquet(s"$tmp/cb")
    graft.operators.Quantize.writeCodeStore(e, cents, cb, "embedding",
      "vec_id", m, subDim, s"$tmp/store")
    OpCache.release()
    val store = graft.operators.Quantize.readCodeStore(spark, s"$tmp/store")
    println(s"[probe] code store at $tmp/store: n=$n cells=$cells " +
      s"rows=${store.count()}")
    val queries = e.filter(pmod(col("vec_id"), lit(n / 5)) === 0)
    def storePath = graft.operators.Quantize.ivfPqTopKFromStore(
      spark, s"$tmp/store", queries, cents, cb, "embedding", "vec_id", m,
      subDim, k = 10, nProbe = 2)
    // post-execution scan metrics: numFiles/filesSize on the STORE scan
    // reflect files actually selected after pruning — the executed-plan
    // proof that the read is confined to the probed cells
    def scanReport(label: String)(df: DataFrame): Unit = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      val t0 = System.nanoTime()
      df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: ReusedExchangeExec => walk(r.child)
        case s: FileSourceScanExec => Seq(s)
        case other => (other.children ++ other.subqueries).flatMap(walk)
      }
      val scans = walk(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.mkString(",").contains("/store"))
      val files = scans.flatMap(_.metrics.get("numFiles").map(_.value)).sum
      val bytes = scans.flatMap(_.metrics.get("filesSize").map(_.value)).sum
      println(f"[probe] $label: $secs%.2f s, store files read $files " +
        f"of $cells, file bytes ${bytes / 1048576.0}%.2f MiB")
    }
    // baseline materializes EVERY column (a groupBy(cell) baseline would
    // column-prune the codes away and understate the full-scan bytes)
    measure("full store scan, all columns")(store)
    measure("store path ivfPqTopKFromStore (5 queries, nProbe=2)")(storePath)
    scanReport("store path scan, static pruning")(storePath)
    scanReport("unpruned store scoring (same query, full scan)")(
      graft.operators.Quantize.ivfPqTopKFromCodes(store, queries, cents, cb,
        "embedding", "vec_id", m, subDim, k = 10, nProbe = 2))
    measure("ad-hoc recompute ivfPqTopK (5 queries, nProbe=2)")(
      graft.operators.Quantize.ivfPqTopK(e, queries, cents, cb,
        "embedding", "vec_id", m, subDim, k = 10, nProbe = 2))
    spark.stop()
  }

  /** SemDeDup serving cost: the in-plan path (soft-assign + within-cell
    * self-join, exchanges included) vs the cell-bucketed assigned-corpus
    * store ([[graft.operators.Dedup.writeAssignedCorpus]] once,
    * [[graft.operators.Dedup.semDedupPairsFromStore]] per batch) over n
    * synthetic 64-dim vectors with cells sized n/256 (the §6 sem rule).
    * Broadcast is forced off (session()), so both paths take their
    * corpus-scale sort-merge shapes; centroids are parqueted to /tmp so
    * measure()'s release can't invalidate them. */
  private def semStoreRun(n: Long): Unit = {
    val spark = session()
    val dim = 64
    val cells = math.max(16, (n / 256).toInt)
    val e = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => sin(col("id") * i).cast("float")).as("embedding"))
      .repartition(32)
    val tmp = java.nio.file.Files.createTempDirectory("semstore").toString
    graft.operators.Similarity.trainCentroids(e, "embedding", "vec_id", cells)
      .write.mode("overwrite").parquet(s"$tmp/cents")
    OpCache.release()
    val cents = spark.read.parquet(s"$tmp/cents")
    val tbl = s"probe_sem_${System.nanoTime()}"
    val t0 = System.nanoTime()
    graft.operators.Dedup.writeAssignedCorpus(e, cents, "embedding",
      "vec_id", probes = 2, tbl, buckets = 32)
    println(f"[probe] assigned-corpus store build (once, amortized): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s, n=$n cells=$cells")
    measure("warmup")(graft.operators.Dedup.semDedupPairsFromStore(
      spark, tbl, "embedding", "vec_id", tau = 0.95))
    // persisted assignment — the exact shape semDedupPairs runs (without
    // it the assignment recomputes for the slim AND the vecs read and
    // the comparison flatters the store)
    measure("in-plan path (persisted assign + self-join, SMJ shape)")(
      graft.operators.Dedup.semDedupPairsAssigned(
        OpCache.track(graft.operators.Similarity.ivfAssignMulti(
          e, cents, "embedding", "vec_id", 2).persist()),
        "embedding", "vec_id", tau = 0.95, mergeHint = true))
    measure("store path (bucketed, co-located self-join)")(
      graft.operators.Dedup.semDedupPairsFromStore(
        spark, tbl, "embedding", "vec_id", tau = 0.95))
    // bipartite batch-vs-store (r12): a fresh batch (10% of n) deduped
    // against the stored corpus — the per-ingest-tick serve loop. The
    // in-plan form re-assigns the CORPUS per batch; the store form
    // assigns only the batch and reads co-located cell buckets (corpus
    // vectors never shuffle — PlanSpec-gated shape)
    val batch = spark.range(n, n + n / 10).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => sin(col("id") * i).cast("float")).as("embedding"))
      .repartition(32)
    def inPlanBip() = graft.operators.Dedup.semDedupPairsBipartite(
      OpCache.track(graft.operators.Similarity.ivfAssignMulti(
        batch, cents, "embedding", "vec_id", 2).persist()),
      OpCache.track(graft.operators.Similarity.ivfAssignMulti(
        e, cents, "embedding", "vec_id", 2).persist()),
      "embedding", "vec_id", tau = 0.95)
    def storeBip() = graft.operators.Dedup.semDedupBatchAgainstStore(
      spark, batch, tbl, cents, "embedding", "vec_id", probes = 2,
      tau = 0.95)
    measure("warmup bipartite")(storeBip())
    measure("in-plan bipartite (corpus re-assigned per batch)")(inPlanBip())
    measure("in-plan bipartite (2)")(inPlanBip())
    measure("store bipartite (assign batch only, co-located cells)")(storeBip())
    measure("store bipartite (2)")(storeBip())
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.stop()
  }

  /** BM25 serving cost: the scan-time form (re-tokenizes the corpus per
    * query) vs the materialized term-bucketed index ([[graft.operators.Rank.writeIndex]]
    * once, [[graft.operators.Rank.bm25FromIndex]] per query), decade
    * over decade — the tokenize-once-serve-many claim priced. The
    * index build is reported separately: it amortizes over every query
    * a standing search service answers. */
  private def bm25IdxRun(paths: Seq[String]): Unit = {
    val spark = session()
    val terms = Seq("spark", "data", "query")
    paths.foreach { path =>
      val docs = spark.read.parquet(path).repartition(32)
      println(s"[probe] bm25 index run over $path: ${docs.count()} docs")
      val tbl = s"probe_bm25_${System.nanoTime()}"
      val t0 = System.nanoTime()
      graft.operators.Rank.writeIndex(docs, "text", "doc_id", tbl,
        buckets = 16)
      println(f"[probe] index build+write (once, amortized): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      val (idx, stats) = graft.operators.Rank.readIndex(spark, tbl)
      measure("warmup")(
        graft.operators.Rank.bm25FromIndex(idx, stats, "doc_id", terms))
      measure("scan-path bm25 (re-tokenizes the corpus)")(
        graft.operators.Rank.bm25(docs, "text", "doc_id", terms))
      measure("index-path bm25 (bucket-pruned index scan)")(
        graft.operators.Rank.bm25FromIndex(idx, stats, "doc_id", terms))
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_stats")
    }
    spark.stop()
  }

  /** Offset-robust substring dedup scaling (the q121 stride-1 shape)
    * against the aligned q100 shape on the same corpus, decade over
    * decade — quantifies the documented `minTokens`× row-count premium
    * the thorough pass costs over the cheap aligned sweep, and checks
    * both stay linear. */
  private def substrRun(paths: Seq[String]): Unit = {
    val spark = session()
    paths.foreach { path =>
      val docs = spark.read.parquet(path).repartition(32)
      println(s"[probe] substring-dedup run over $path: ${docs.count()} docs")
      measure("warmup")(
        Dedup.duplicateSubstringSpans(docs, "text", "doc_id", minTokens = 5))
      measure("aligned removeDuplicateSpans (window=4)")(
        Dedup.removeDuplicateSpans(docs, "text", "doc_id", window = 4))
      measure("stride-1 duplicateSubstringSpans (minTokens=5)")(
        Dedup.duplicateSubstringSpans(docs, "text", "doc_id", minTokens = 5))
      measure("stride-1 + stripSpans rebuild")(
        Dedup.stripSpans(docs,
          Dedup.duplicateSubstringSpans(docs, "text", "doc_id", minTokens = 5),
          "text", "doc_id"))
    }
    spark.stop()
  }

  /** Perplexity scoring-join key width: the retired string-keyed form vs
    * the current two-xxhash64-lane form of [[TextProfile.bigramPerplexity]]
    * (q103), on a REALISTIC-vocab corpus (gen_scale_docs.py with the
    * big-vocab arg — bigram strings ~21 chars; the 31-word soup would
    * understate string key widths ~2×). The broadcast threshold is forced
    * off (session()), so both run the sort-merge shape they take when the
    * reference model is corpus-scale; the third form measures the
    * `broadcastModel` escape for policy-sized references. */
  private def pplRun(docsPath: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(docsPath).repartition(32)
    val ref = docs.filter(col("lang") === "en")
    println(s"[probe] perplexity run over $docsPath: ${docs.count()} docs, " +
      s"${ref.count()} reference")
    // retired form: scoring + model-build exchanges keyed on gram STRINGS
    def oldForm: DataFrame = {
      def toksd(df: DataFrame) = df.withColumn("__toks", tokens(col("text")))
      def bigrams(df: DataFrame) = toksd(df)
        .filter(size(col("__toks")) >= 2)
        .select(col("doc_id"), explode(shingles(col("text"), 2)).as("g"))
      val refToks = toksd(ref).select(explode(col("__toks")).as("w"))
      val uni = refToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val bi = bigrams(ref).groupBy(col("g")).agg(count(lit(1)).as("c2"))
      val vocab = uni.agg(count(lit(1)).as("__v"))
      val scored = bigrams(docs)
        .withColumn("w1", substring_index(col("g"), " ", 1))
        .join(bi, Seq("g"), "left")
        .join(uni, col("w1") === uni("w"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("__v"))).as("logp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(-avg(col("logp")), 4).as("cross_entropy"),
          round(exp(-avg(col("logp"))), 2).as("perplexity"))
      docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
    }
    def current = TextProfile.bigramPerplexity(docs, ref, "text", "doc_id")
    measure("warmup")(current)
    measure("perplexity string-keyed (retired)")(oldForm)
    measure("perplexity hash-lane keyed (current)")(current)
    measure("perplexity hash-lane + broadcast model")(
      TextProfile.bigramPerplexity(docs, ref, "text", "doc_id",
        broadcastModel = true))
    spark.stop()
  }
}
