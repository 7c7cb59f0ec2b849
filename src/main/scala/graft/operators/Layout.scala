package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /**
   * Compact a bucketed table back to ONE file per bucket, preserving its
   * bucket spec. Every [[graft.operators.Dedup.ingestBatch]]-style append
   * adds a file per touched bucket; the bucketing (and therefore the
   * exchange-free join) survives any number of appends, but bucket file
   * counts grow without bound with ingest cadence — scan fan-out,
   * footer/open overhead, and ever-smaller row groups. Compaction
   * restores one sorted file per bucket: the repartition keys rows by
   * the bucket function itself (`repartition(n, bucketCols)` = murmur3
   * pmod n = Spark's bucket id), so each task owns exactly one bucket
   * and writes exactly one file (PlanSpec-gated via the executed scan's
   * `numFiles`; q138-gated: content identical, one file per bucket).
   *
   * Honest limit: this does NOT remove the sort-merge join's store-side
   * sort. Since Spark 3.0 a bucketed scan reports no `outputOrdering`
   * unless `spark.sql.legacy.bucketedTableScan.outputOrdering` is on
   * (that conf trades scan parallelism for order and is off for a
   * reason), so SMJ re-sorts within partitions regardless of file
   * layout; the `sortBy` still pays through run-length-friendly parquet
   * encoding and tight fp min/max footer ranges.
   *
   * The swap is DROP + RENAME — two catalog operations, not one atomic
   * transaction; on a production metastore, run it in the store's
   * maintenance window or point consumers at a view over the versioned
   * table name. Cost is one O(store) rewrite with a single full shuffle;
   * amortize by cadence (e.g. every N appends), not per ingest.
   */
  def compactBucketed(spark: SparkSession, table: String): Unit =
    rewriteBucketed(spark, table)(identity)

  /**
   * Rewrite a bucketed table in place through `transform`, restoring one
   * sorted file per bucket — the maintenance primitive behind
   * [[compactBucketed]] (transform = identity) and row deletion
   * ([[graft.operators.Dedup.removeFromFingerprintStore]]'s anti-join).
   * All of [[compactBucketed]]'s mechanics and caveats apply: reads the
   * table's FILES by path, bucket-aligned repartition, DROP + RENAME
   * swap, partitioned tables refused.
   */
  def rewriteBucketed(spark: SparkSession, table: String)
                     (transform: DataFrame => DataFrame): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"rewriteBucketed: $table has no bucket spec"))
    // the path read below sees only file columns; a partitioned table's
    // partition values live in directory names and would silently read
    // back as NULL — refuse loudly (rewrite such tables per-partition)
    require(meta.partitionColumnNames.isEmpty,
      s"rewriteBucketed: $table is partitioned on " +
        s"${meta.partitionColumnNames.mkString(",")}; rewrite each " +
        "partition's own bucketed table instead")
    val bcols = spec.bucketColumnNames
    val scols =
      if (spec.sortColumnNames.nonEmpty) spec.sortColumnNames else bcols
    val tmp = s"${table}__graft_compact"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // read the table's FILES by path, not the catalog table: the bucketed
    // relation already claims HashPartitioning(bcols, n), so the
    // repartition below would be elided as redundant — and then
    // DisableUnnecessaryBucketedScan (no join/agg above, just a write)
    // reverts the scan to file-split partitions, producing one file per
    // (task × bucket) instead of one per bucket (measured: 16 for 4
    // buckets). A path scan has unknown partitioning, so the shuffle
    // stays and each write task owns exactly one bucket.
    transform(spark.read.schema(meta.schema).parquet(meta.location.toString))
      .repartition(spec.numBuckets, bcols.map(col): _*)
      .write
      .bucketBy(spec.numBuckets, bcols.head, bcols.tail: _*)
      .sortBy(scols.head, scols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }
}
