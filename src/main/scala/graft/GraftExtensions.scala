package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions.{CosineSimilarity, HyperplaneLshKey, MinHashSignature, RollingHash, SimHash64}

/**
 * Session-extension plugin: register graft's native expressions at session
 * build time, so clusters enable them with
 * `spark.sql.extensions=graft.GraftExtensions` — no code change in user
 * jobs. (`GraftExpressions.registerAll` remains the programmatic route for
 * an already-built session.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        // second argument is the (foldable) lane count
        MinHashSignature(exprs(0),
          graft.functions.expressions.GraftExpressions.constInt(
            exprs(1), "minhash_signature", "num_hashes"))))
    e.injectFunction((
      FunctionIdentifier("hyperplane_lsh_key"),
      new ExpressionInfo(classOf[HyperplaneLshKey].getName, "hyperplane_lsh_key"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // (vec, nBits[, seed]) — seed defaults to 42, matching the Scala API
        if (exprs.length < 2 || exprs.length > 3)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "hyperplane_lsh_key",
              "expectedNum" -> "2 or 3", "actualNum" -> exprs.length.toString,
              "docroot" -> ""))
        val seed = if (exprs.length > 2)
          graft.functions.expressions.GraftExpressions.constInt(
            exprs(2), "hyperplane_lsh_key", "seed")
        else 42
        HyperplaneLshKey(exprs(0),
          graft.functions.expressions.GraftExpressions.constInt(
            exprs(1), "hyperplane_lsh_key", "n_bits"), seed)
      }))
  }
}
