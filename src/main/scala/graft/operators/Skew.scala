package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation joins. At 100 TB a handful of hot keys (the `null` user,
 * the default partition, one viral document) can pin a whole shuffle join on
 * one reducer; AQE's skew-join splitting handles many cases at runtime, but
 * salting is the deterministic plan-level tool when the skew is known.
 */
object Skew {

  /**
   * Salted equi-join: the (large, skewed) left side gets a random salt in
   * [0, saltFactor); the (smaller) right side is replicated saltFactor ways
   * — so one hot key fans out over saltFactor reducers instead of one.
   * Produces exactly the rows of `left.join(right, keys, "inner")`.
   *
   * Cost model: right side grows ×saltFactor (use only when right is much
   * smaller than the skewed shuffle partition it eliminates).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = left.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
