package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of join: for every left row, attach the single right row with the
 * latest `rightTime <= leftTime` within the same key — the trades/quotes
 * temporal-join the reference cannot express as a named operator.
 *
 * Implementation is the scalable union-and-scan formulation, NOT a range
 * cross join: tag both sides, union, sort within key by (time, side) — a
 * single hash shuffle + per-partition sort, O(n log n) — then carry the most
 * recent right payload forward with `last(ignoreNulls) over rowsBetween
 * (unboundedPreceding, current)` and keep left rows. Right rows sort before
 * left rows at equal timestamps, so an exact tie matches (inclusive as-of).
 * Equivalent to Spark's own sort-merge strategy for this shape; survives
 * 100× because nothing ever materializes the O(left × right-per-key)
 * candidate set.
 */
object AsOf {

  /**
   * @param left        probe side (each row emitted exactly once)
   * @param right       reference side
   * @param keyCols     equi-key column names present on both sides
   * @param leftTime    ordering column on `left`
   * @param rightTime   ordering column on `right`
   * @param rightValues right columns to attach (null when nothing is ≤)
   */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightValues: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    // side ordinal 0 = right so it precedes left at equal times
    val r = right.select(
      (keyCols.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
        rightValues.map(c => col(c).as(s"__rv_$c")): _*)
    val l = left.select(
      (keyCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValues.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightValues.map(c => col(s"__asof_$c").as(s"asof_$c"))): _*)
  }
}
