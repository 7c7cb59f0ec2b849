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
   * 100 TB. For a standing search service, materialize the exploded
   * (term, id, tf, dl) frame once as an inverted index bucketed by term;
   * this operator is the scan-time form.
   */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    // normalize like the corpus tokens (lowercase) and dedupe: a repeated
    // query term must not double-count its contribution
    val terms = queryTerms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    // corpus stats: one row, broadcast in-plan (no driver action)
    val stats = toks.agg(count(lit(1)).as("__n"),
      avg(size(col("__toks"))).as("__avgdl"))
    val matches = toks
      .select(col(idCol), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(terms: _*)) // pre-shuffle: query terms only
      .groupBy(col(idCol), col("__t"))
      .agg(first(col("__dl")).as("__dl"), count(lit(1)).as("__tf"))
    val dfs = matches.groupBy(col("__t"))
      .agg(count(lit(1)).as("__df")) // one row per matching query term
    matches
      .join(broadcast(dfs), Seq("__t"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)) *
          (col("__tf") * (lit(k1) + 1.0)) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__s"))
      .groupBy(col(idCol))
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
}
