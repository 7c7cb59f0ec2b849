package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Storage-layout helpers: pre-shuffle data ONCE at write time so repeated
 * joins/aggregations on the same key read co-located buckets and skip the
 * exchange entirely — the 100 TB answer to "this join shuffles every run".
 */
object Layout {

  /**
   * Write `df` as a bucketed, sorted table: `buckets` hash buckets on
   * `keyCols`, sorted within buckets. Subsequent equi-joins or aggregations
   * on exactly `keyCols` between same-bucketing tables plan with NO shuffle
   * on either side (and no sort for sort-merge).
   */
  def writeBucketed(df: DataFrame, table: String, keyCols: Seq[String],
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
