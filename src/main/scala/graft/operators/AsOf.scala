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
   * @param rightValues right columns to attach (null when nothing is ≤).
   *                    Must be ORDERABLE types: the carried struct enters
   *                    the window ORDER BY as the equal-time determinism
   *                    tiebreak, so a MapType column is rejected up front
   *                    (with a clear error instead of an analysis failure).
   *                    Float/double fields inherit SQL ordering quirks for
   *                    the tiebreak only (NaN sorts largest, -0.0 < 0.0);
   *                    WHICH row wins an exact-time tie can be affected,
   *                    never whether a match is found or its field values.
   */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightValues: Seq[String]): DataFrame = {
    require(rightValues.nonEmpty, "rightValues must name at least one column")
    // resolve names the way Spark will (case-insensitively under the
    // default conf): a differently-cased column must not slip past the
    // guard only to fail analysis later with the opaque error this
    // require exists to pre-empt
    val resolver = right.sparkSession.sessionState.analyzer.resolver
    val unorderable = rightValues.flatMap(c =>
      right.schema.fields.find(f => resolver(f.name, c)).collect {
        case f if !org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
      })
    require(unorderable.isEmpty,
      "as-of join rightValues must be orderable (they form the equal-time " +
        s"tiebreak sort key); not orderable: ${unorderable.mkString(", ")}. " +
        "Wrap a map column in map_entries(...) on the right side first.")
    val leftCols = left.columns.toIndexedSeq
    // Right values travel as ONE struct per right row: carrying them as
    // separate columns with per-column last(ignoreNulls) would (a) let a
    // NULL value in the matched row resurrect a STALE value from an older
    // row, and (b) mix fields of different right rows into a row that
    // never existed. The struct itself is non-null for every right row,
    // so last(struct, ignoreNulls) picks exactly one real row — NULL
    // fields included.
    // side ordinal 0 = right so it precedes left at equal times. A NULL
    // rightTime can never satisfy rightTime <= leftTime — unfiltered it
    // would sort FIRST (asc_nulls_first) and become the "match" for left
    // rows that precede every real right row
    val r = right.filter(col(rightTime).isNotNull).select(
      keyCols.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        struct(rightValues.map(col): _*).as("__rv"): _*)
    val l = left.select(
      (keyCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // __rv as the final sort key makes the winner among equal-time right
    // rows deterministic (value-lexicographic) instead of partition-order
    // dependent; left rows all carry a NULL struct, so their mutual order
    // is irrelevant (ignoreNulls skips them anyway)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightValues.map(c => col("__asof").getField(c).as(s"asof_$c"))): _*)
  }
}
