package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Relevance ranking over a document corpus — the retrieval side of a
 * curation pipeline (targeted decontamination sweeps, eval-set mining,
 * "find documents about X" corpus audits). North-star operator: the
 * reference has no search primitive (any such logic would be user Python
 * in a step handler, `/root/reference/README.markdown:84-85`).
 */
object Rank {

  /**
   * Okapi BM25 scores for a literal query over the corpus (Robertson &
   * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
   * Beyond" — public; idf in the Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
   * form, which keeps every term's contribution positive):
   *
   *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
   *
   * Output: (idCol, score) for documents matching ≥ 1 query term.
   *
   * Distributed shape: the token explode is filtered to the QUERY TERMS
   * before anything shuffles — the (id, term) frame is bounded by
   * |query| · matching docs, not corpus tokens. Corpus stats (N, avgdl)
   * are a 1-row in-plan broadcast; per-term document frequencies are a
   * |query|-row broadcast. Document text never shuffles, so the operator
   * is a single scan of the corpus plus query-sized joins — linear at
   * 100 TB. This is the scan-time form; a standing search service
   * materializes the index once with [[writeIndex]] and serves with
   * [[bm25FromIndex]] (identical scores, q119-gated).
   */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val terms = normalizeTerms(queryTerms)
    val toks = tokenized(docs, textCol, idCol)
    val matches = toks
      .select(col(idCol), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*)) // pre-shuffle: query terms only
      .groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
    scoreMatches(matches, corpusStats(toks), idCol, k1, b)
  }

  /** Lowercase, trim, dedupe — a repeated query term must not
    * double-count its contribution. */
  private def normalizeTerms(queryTerms: Seq[String]): Seq[String] = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    queryTerms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
  }

  private def tokenized(docs: DataFrame, textCol: String,
                        idCol: String): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))

  /** Corpus stats: one (n_docs, avgdl, sum_dl) row, broadcast in-plan.
    * `avgdl` is derived from the EXACT long token-count sum (not `avg`'s
    * double accumulator) so [[removeFromIndex]]'s decrement — which
    * subtracts removed documents' exact dl sum — reproduces a full
    * rebuild's avgdl bit-for-bit at any corpus size; below 2^53 tokens
    * the two formulations are identical doubles anyway. */
  private def corpusStats(toks: DataFrame): DataFrame =
    toks.agg(count(lit(1)).as("n_docs"),
        sum(size(col("__toks"))).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"),
        col("sum_dl"))

  /** The one per-(doc, term) BM25 contribution every path runs — scan,
    * index, and streaming serve — shared so none can drift. Expects
    * columns tf, dl, __df, n_docs, avgdl in scope. */
  private def contribution(k1: Double, b: Double): org.apache.spark.sql.Column =
    log(lit(1.0) +
        (col("n_docs") - col("__df") + 0.5) / (col("__df") + 0.5)) *
      (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

  /** The one BM25 scoring formula both the scan path and the index path
    * run — shared so the two can never drift (q119 gates the identity).
    * `matches` is (idCol, term, dl, tf) restricted to query terms. */
  private def scoreMatches(matches: DataFrame, stats: DataFrame,
                           idCol: String, k1: Double, b: Double): DataFrame = {
    val dfs = matches.groupBy(col("term"))
      .agg(count(lit(1)).as("__df")) // one row per matching query term
    matches
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), contribution(k1, b).as("__s"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"))
  }

  /**
   * Materialize the standing-search-service form: the inverted index
   * (term, idCol, tf, dl) — one row per (document, distinct term) — and
   * the 1-row (n_docs, avgdl) stats frame. Write the index bucketed by
   * `term` ([[writeIndex]]): a query's `term IN (...)` filter then prunes
   * to the matching hash buckets at the scan (SelectedBucketsCount,
   * PlanSpec-gated) and the corpus text is never re-tokenized at query
   * time — tokenize once at ingest, serve many, exactly the
   * [[graft.operators.Quantize.writeCodeStore]] contract for ANN.
   * Reference analog: stepist's materialized stage boundaries
   * (`stepist/flow/workers/adapters/simple_queue.py:90-92`).
   */
  def buildIndex(docs: DataFrame, textCol: String,
                 idCol: String): (DataFrame, DataFrame) = {
    val toks = tokenized(docs, textCol, idCol)
    val index = toks
      .select(col(idCol), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .select(col("term"), col(idCol), col("tf"), col("dl"))
    (index, corpusStats(toks))
  }

  /** Write [[buildIndex]]'s frames: the index as a `term`-bucketed,
    * sorted table; the stats as `<table>_stats`. */
  def writeIndex(docs: DataFrame, textCol: String, idCol: String,
                 table: String, buckets: Int): Unit = {
    val (index, stats) = buildIndex(docs, textCol, idCol)
    // independent tables (postings vs 1-row stats) — overlap the writes
    // (guide §2.6 via Par); each re-tokenizes its own pass, which the
    // overlap hides rather than adds
    Par.par2(
      Layout.writeBucketed(index, table, Seq("term"), buckets),
      stats.write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_stats"))
  }

  /** (index, stats) back from [[writeIndex]]. */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
                table: String): (DataFrame, DataFrame) =
    (spark.table(table), spark.table(s"${table}_stats"))

  /**
   * Retraction for the standing search index — the takedown half of
   * [[writeIndex]]'s lifecycle.
   * [[graft.operators.Dedup.removeFromFingerprintStore]]'s argument
   * applies verbatim: retention policies cover derived data, and a
   * removed document's POSTINGS are derived data — an append-side
   * tombstone would keep serving them until a full rebuild. This
   * deletes every posting of `removedIds` from the term-bucketed index
   * ([[Layout.rewriteBucketed]] — bucket spec preserved, one file per
   * bucket restored, so term-bucket pruning survives; PlanSpec-gated)
   * and subtracts the removed documents' exact (count, Σdl)
   * contribution from `<table>_stats`, so [[bm25FromIndex]] afterwards
   * returns nothing for removed docs and scores the remaining corpus
   * BIT-IDENTICALLY to an index rebuilt from scratch (RankSpec-gated;
   * exactness holds because stats carry the long `sum_dl`, not a float
   * accumulator — see [[corpusStats]]).
   *
   * Contract: a removed id's contribution is read from its OWN postings
   * (every posting row carries dl). An id with NO postings — a
   * token-less document, which can never match any query — is a stats
   * no-op: its n_docs/avgdl contribution stays until the next full
   * rebuild (a documented idf-only drift; the alternative, trusting the
   * caller that every passed id was a corpus member, silently corrupts
   * stats on a bad id). Cost is one O(index) rewrite plus a 1-row stats
   * overwrite; batch takedowns on a maintenance cadence, like
   * compaction.
   */
  def removeFromIndex(spark: org.apache.spark.sql.SparkSession,
                      table: String, removedIds: DataFrame,
                      idCol: String): Unit = {
    val gone = removedIds.toDF(idCol).distinct()
    // removal-batch-bounded driver read: one (count, sum) row
    val removed = spark.table(table)
      .join(gone, Seq(idCol), "left_semi")
      .dropDuplicates(idCol) // one (id, dl) per doc, not per posting
      .agg(count(lit(1)).as("rn"), sum(col("dl")).as("rdl"))
      .collect()(0)
    val rn = removed.getLong(0)
    if (rn == 0L) return // nothing indexed under these ids
    val rdl = removed.getLong(1)
    // Refuse BEFORE any destructive write (matches removeFromCodeStore):
    // a full retraction must not leave purged postings with stale stats.
    val st = spark.table(s"${table}_stats")
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    val n = st.getLong(0) - rn
    val sumDl = st.getLong(1) - rdl
    require(n > 0, s"removeFromIndex: retraction would empty $table " +
      "(drop the index instead)")
    Layout.rewriteBucketed(spark, table)(
      _.join(gone, Seq(idCol), "left_anti"))
    import spark.implicits._
    // 1-row overwrite; same derived-avgdl formula as corpusStats
    Seq((n, sumDl.toDouble / n, sumDl)).toDF("n_docs", "avgdl", "sum_dl")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_stats")
  }

  /**
   * BM25 off a materialized index: filter the index to the query terms
   * (bucket-pruned scan), then the SAME scoring formula as [[bm25]] —
   * bit-identical scores, no tokenization anywhere in the plan
   * (PlanSpec-gated; equivalence oracle-gated by q119).
   */
  def bm25FromIndex(index: DataFrame, stats: DataFrame, idCol: String,
                    queryTerms: Seq[String], k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    val terms = normalizeTerms(queryTerms)
    scoreMatches(index.filter(col("term").isin(terms: _*)), stats, idCol,
      k1, b)
  }

  /**
   * The static SERVING frame for a stream of queries: the index rows
   * pre-joined with their per-term document frequency and the corpus
   * stats — everything the scoring formula needs per (doc, term), so
   * the per-query plan collapses to ONE stream-static join plus ONE
   * aggregation, the only shapes Structured Streaming admits (a
   * streaming plan cannot chain the df aggregation scoreMatches runs;
   * here df is static and computed once). The per-term df over the full
   * index equals scoreMatches's df over query-restricted matches (both
   * count the docs containing the term), so scores stay bit-identical —
   * StreamingSpec gates the parity.
   */
  def indexServingFrame(index: DataFrame, stats: DataFrame): DataFrame =
    index
      .join(index.groupBy(col("term")).agg(count(lit(1)).as("__df")),
        Seq("term"))
      .crossJoin(broadcast(stats))

  /**
   * BM25 for a FRAME of queries — (queryIdCol, termsCol: array<string>)
   * — against an [[indexServingFrame]]: the serve-many form, and legal
   * as a STREAMING plan (readStream of queries → stream-static inner
   * join → single update-mode aggregation; no stream-side state beyond
   * the running per-(query, doc) sums). Term normalization matches
   * [[bm25]]'s (trim, lowercase, distinct). Output: (queryIdCol, idCol,
   * score), identical per query to [[bm25FromIndex]] with the same
   * terms (StreamingSpec-gated).
   *
   * Scale shape: each micro-batch joins |batch queries|·|terms| slim
   * rows against the term-bucketed index — query-sized, corpus text
   * never touched; the aggregation state is bounded by matching (query,
   * doc) pairs in flight, and a production service emits per
   * micro-batch (update mode) so state can be dropped per trigger.
   */
  def bm25Serve(queries: DataFrame, serving: DataFrame, queryIdCol: String,
                termsCol: String, idCol: String, k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    val terms = queries.select(col(queryIdCol),
      explode(array_distinct(filter(
        transform(col(termsCol), t => trim(lower(t))),
        t => t =!= ""))).as("term"))
    terms.join(serving, Seq("term"))
      .select(col(queryIdCol), col(idCol), contribution(k1, b).as("__s"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09 — public):
   * combines any number of ranked lists into one consensus ranking,
   * `rrf(d) = Σ_lists 1/(k + rank_list(d))`, the standard way to fuse a
   * lexical (BM25) and a dense (embedding ANN) retriever without score
   * calibration — ranks are comparable across retrievers, raw scores are
   * not. A document absent from a list contributes nothing for it
   * (full-outer union semantics).
   *
   * Input: one `(idCol, rank)` frame per retriever, ranks 1-based.
   * Output: `(idCol, rrf)` — callers order/limit (round before ordering:
   * two engines' last-ULP sums must not flip a rank).
   *
   * Distributed shape: each input is a top-N list (N rows, not corpus
   * rows), so the union + groupBy moves N·lists 16-byte rows — the
   * expensive retrieval stages upstream already did the corpus-scale work.
   */
  def rrfFuse(ranked: Seq[DataFrame], idCol: String, rankCol: String = "rank",
              k: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    ranked
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(k.toDouble) + col(rankCol))).as("__c")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf"))
  }

  /**
   * Weighted graph centrality by power iteration — TextRank's scoring
   * rule (Mihalcea & Tarau 2004, the weighted-PageRank variant; Brin &
   * Page 1998) over a SIMILARITY graph: iterate
   *
   *   r'(v) = (1−d) + d · Σ_{u~v} ( w(u,v)/outW(u) ) · r(u)
   *
   * from r=1, damping d. Over a corpus near-dup/similarity graph the
   * high-centrality rows are the corpus's "hubs" — the representative
   * cores a curation pipeline keeps one of (the centrality-weighted
   * upgrade of [[Dedup.keepRepresentatives]]'s min-id rule) or the
   * over-connected templates it caps. Nodes without edges keep the
   * baseline 1−d.
   *
   * Input: the node frame plus an UNDIRECTED scored pair frame (a < b,
   * one row per pair — the [[Similarity.marginMine]]/hardNegatives
   * convention: the fixture gate feeds exact pairs, production feeds
   * the IVF store pairs — a claim GATED by q187, which serves this
   * operator off the cell-bucketed assigned store and pins edge
   * recall, zero spurious edges, and top-20 hub agreement against the
   * exact graph). The contract is ENFORCED, not assumed: pairs
   * are canonicalized to (least, greatest), duplicates and
   * double-orientation rows collapse to their max weight, and
   * self-loops drop — identity for well-formed input, well-defined
   * (instead of partition-order-dependent) for a malformed caller. Weights must be pre-rounded by the caller if
   * they come from float math (the q171 pin; q181 rounds cosines at
   * 1e-6).
   *
   * Engine-parity: every neighbor SUM (out-strength and each
   * iteration's incoming mass) folds in a WINDOW ordered by the
   * neighbor id — an unordered double `sum` is last-ULP
   * nondeterministic across engines and even across Spark runs (the
   * q110 ordered-fold discipline); iteration results round at 1e-9.
   *
   * Scale shape: out-strengths and normalized edges build once (one
   * window shuffle each, keyed on the node); each of the `iters`
   * rounds is one equi-join of the edge frame with the n-row rank
   * frame plus one window — all keyed on node ids, no vector or text
   * payload anywhere. The rounds pipeline in ONE lazy plan (each
   * round's rank frame is consumed exactly once; `iters` ≤ 64 bounds
   * the plan depth) and the RESULT IS UNCACHED — consume it once, or
   * persist at the call site, because a second action recomputes every
   * iteration. Only the multiply-read `en`/`ids` frames stay persisted.
   * iters is small by design (power iteration converges geometrically
   * at rate d).
   */
  def graphRank(nodes: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String, bCol: String, wCol: String,
                iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    import org.apache.spark.sql.expressions.Window

    /** Last row's running total per `key`, folded in `ord` order. */
    def orderedTotal(df: DataFrame, key: String, ord: String,
                     value: org.apache.spark.sql.Column,
                     out: String): DataFrame =
      df.withColumn("__cum", sum(value).over(Window.partitionBy(col(key))
          .orderBy(col(ord))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__rn", row_number().over(Window.partitionBy(col(key))
          .orderBy(col(ord).desc)))
        .filter(col("__rn") === 1)
        .select(col(key), col("__cum").as(out))

    // Enforce the "one row per undirected pair" contract rather than
    // trust it: canonicalize to (least, greatest), collapse duplicates
    // and double-orientation rows to max-weight, and drop self-loops.
    // Without this, tied neighbor ids would make the ordered folds
    // below partition-order-dependent (duplicate (a,b) rows share an
    // order key), silently corrupting out-strength and per-round mass;
    // a malformed caller now gets the well-defined max-weight graph
    // instead of a nondeterministic one. For a contract-satisfying
    // input (a < b, unique) this is an exact identity, so the q181
    // oracle replay is unchanged; the groupBy exchanges only
    // (id, id, double) triples.
    val half = pairs
      .select(least(col(aCol), col(bCol)).as("__u"),
        greatest(col(aCol), col(bCol)).as("__v"),
        col(wCol).cast("double").as("__w"))
      .filter(col("__u") =!= col("__v"))
      .groupBy(col("__u"), col("__v")).agg(max(col("__w")).as("__w"))
    val edges = half.unionByName(
      half.select(col("__v").as("__u"), col("__u").as("__v"), col("__w")))
    val en = OpCache.track(edges
      .join(orderedTotal(edges, "__u", "__v", col("__w"), "__outw"),
        Seq("__u"))
      .select(col("__u"), col("__v"), (col("__w") / col("__outw")).as("__nw"))
      .persist())
    val ids = OpCache.track(
      nodes.select(col(idCol).as("__id")).persist())

    // each round's rank frame is consumed exactly ONCE (by the next
    // round's join, or by the final attach), so the r17 per-round
    // persist only paid a cache write+read of the frame per iteration
    // without ever serving a second reader — the rounds now pipeline in
    // one lazy plan (iters ≤ 64 bounds its depth; en/ids stay persisted,
    // they ARE multiply read)
    var r = ids.withColumn("__r", lit(1.0))
    for (_ <- 1 to iters) {
      val mass = orderedTotal(
        en.join(r, col("__u") === col("__id"))
          .select(col("__v"), col("__u"), (col("__nw") * col("__r")).as("__c")),
        "__v", "__u", col("__c"), "__mass")
      r = ids
        .join(mass, col("__id") === col("__v"), "left")
        .select(col("__id"), round(lit(1.0 - damping) +
          lit(damping) * coalesce(col("__mass"), lit(0.0)), 9).as("__r"))
    }
    nodes.join(r, col(idCol) === col("__id"))
      .drop("__id")
      .withColumnRenamed("__r", "centrality")
  }
}
