package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.TextFunctions
import graft.functions.expressions.{CosineSimilarity, GraftExpressions, HyperplaneLshKey, MinHashSignature, RepetitionStatsExpr, RollingHash, SimHash64}

/**
 * Session-extension plugin: register graft's native expressions at session
 * build time, so clusters enable them with
 * `spark.sql.extensions=graft.GraftExtensions` — no code change in user
 * jobs. (`GraftExpressions.registerAll` remains the programmatic route for
 * an already-built session.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExpressions.{checkArity, constInt}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        checkArity("cosine_similarity", exprs, 2, 2)
        CosineSimilarity(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        checkArity("rolling_hash", exprs, 1, 1)
        RollingHash(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        checkArity("simhash64", exprs, 1, 1)
        SimHash64(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        checkArity("minhash_signature", exprs, 2, 2)
        // second argument is the (foldable) lane count
        MinHashSignature(exprs(0),
          constInt(exprs(1), "minhash_signature", "num_hashes"))
      }))
    e.injectFunction((
      FunctionIdentifier("hyperplane_lsh_key"),
      new ExpressionInfo(classOf[HyperplaneLshKey].getName, "hyperplane_lsh_key"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // (vec, nBits[, seed]) — seed defaults to 42, matching the Scala API
        checkArity("hyperplane_lsh_key", exprs, 2, 3)
        val seed = if (exprs.length > 2)
          constInt(exprs(2), "hyperplane_lsh_key", "seed")
        else 42
        HyperplaneLshKey(exprs(0),
          constInt(exprs(1), "hyperplane_lsh_key", "n_bits"), seed)
      }))
    e.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName,
        "repetition_stats"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        checkArity("repetition_stats", exprs, 1, 1)
        RepetitionStatsExpr(exprs.head)
      }))
    // the Gopher keep rules and the quality-stats struct are COMPOSED
    // column functions — registered through the same Column round-trip
    // as GraftExpressions.registerAll so SQL and Scala can never drift
    def columnBuilt(f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column)(
        ex: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      GraftColumnBridge.eagerExpression(f(GraftColumnBridge.column(ex)))
    Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      "gopher_repetition_keep" -> (TextFunctions.gopherRepetitionKeep(_)),
      "gopher_quality_stats" -> TextFunctions.gopherQualityStats,
      "gopher_quality_keep" -> (TextFunctions.gopherQualityKeep(_))
    ).foreach { case (name, f) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(TextFunctions.getClass.getName, name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          checkArity(name, exprs, 1, 1)
          columnBuilt(f)(exprs.head)
        }))
    }
  }
}
