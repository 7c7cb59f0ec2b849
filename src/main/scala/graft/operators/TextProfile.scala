package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Corpus-profiling aggregates for training-data curation — the document
 * statistics that need aggregation (unlike the per-row column functions in
 * [[graft.functions.TextFunctions]]). North-star operators: the reference
 * has no text analytics (any such logic would be user Python in a step
 * handler, `/root/reference/README.markdown:84-85`).
 */
object TextProfile {

  /**
   * Gopher-style n-gram repetition profile (Rae et al. 2021, "Scaling
   * Language Models", App. A1.1 repetition filters — public): per document,
   * the fraction of n-gram occurrences that are repeats
   * (`dup_{n}gram_frac`) and the fraction claimed by the single most
   * frequent n-gram (`top_{n}gram_frac`). High values flag the
   * boilerplate/spam documents a curation pipeline drops before training.
   *
   * Distributed shape: explode grams → (id, gram) counts → per-doc
   * aggregate. Both shuffles move (id, gram/count) pairs — document text
   * never leaves its scan partition, so the operator is linear in corpus
   * size and safe at 100 TB. Short docs (≤ n tokens) collapse to one
   * whole-text shingle (the [[TextFunctions.shingles]] edge), scoring
   * dup 0 / top 1.
   */
  def repetitionScores(df: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame = {
    val grams = df.select(col(idCol),
      explode(TextFunctions.shingles(col(textCol), n)).as("g"))
    val counts = grams.groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(
        round(sum(when(col("c") > 1, col("c")).otherwise(0L))
          .cast("double") / sum(col("c")), 4).as(s"dup_${n}gram_frac"),
        round(max(col("c")).cast("double") / sum(col("c")), 4)
          .as(s"top_${n}gram_frac"))
  }

  /**
   * Benchmark-decontamination report: for each training document, the
   * number of distinct word n-grams it shares with the evaluation corpus —
   * the standard test-set-contamination check run before training (n-gram
   * overlap decontamination as published with GPT-3/PaLM/Llama). Emits
   * only contaminated docs (n_shared ≥ 1); threshold/drop downstream.
   *
   * Scale shape: the eval gram set (distinct, small — eval corpora are
   * thousands of docs, not billions) builds once and the join is an equi
   * semi-join on the gram, which Spark broadcasts when it fits; training
   * grams stream partition-parallel and only (id, gram) pairs shuffle. At
   * extreme eval sizes swap the gram string for its 8-byte xxhash64 on
   * both sides.
   */
  def contaminationReport(train: DataFrame, eval: DataFrame, textCol: String,
                          idCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(array_distinct(
        TextFunctions.shingles(col(textCol), n))).as("g"))
    val evalGrams = grams(eval).select(col("g")).distinct()
    grams(train)
      .join(evalGrams, Seq("g"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared")) // per-doc grams are distinct
  }
}
