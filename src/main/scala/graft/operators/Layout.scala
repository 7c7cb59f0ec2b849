package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, CatalogTableType}
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

  private def meta(spark: SparkSession, table: String): CatalogTable =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))

  /** The `<table>__vN` versions of a versioned store, ascending by N —
    * discovered from the catalog, so the convention survives restarts
    * (no driver-side registry to lose). */
  private def versions(spark: SparkSession, table: String): Seq[(Int, String)] = {
    val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val db = id.database.getOrElse(
      spark.sessionState.catalog.getCurrentDatabase)
    val re = ("^" + java.util.regex.Pattern.quote(id.table.toLowerCase) +
      "__v(\\d+)$").r
    spark.sessionState.catalog.listTables(db, s"${id.table}__v*")
      .flatMap(ti => ti.table.toLowerCase match {
        case re(n) => Some((n.toInt, ti.table))
        case _ => None
      })
      .sortBy(_._1)
  }

  /**
   * Resolve a store name to the TABLE that appends and rewrites must
   * target: for a versioned store (`table` is the view created by
   * [[enableVersioning]]) the current backing `<table>__vN`; for a plain
   * store, `table` itself. Readers never need this — `spark.table`
   * resolves the view, and the bucketed scan underneath keeps its
   * exchange-free join property (a view is a plan alias, not a copy).
   */
  def resolveStore(spark: SparkSession, table: String): String = {
    val cat = spark.sessionState.catalog
    val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (!cat.tableExists(id)) return table
    if (cat.getTableMetadata(id).tableType != CatalogTableType.VIEW)
      return table
    val vs = versions(spark, table)
    require(vs.nonEmpty,
      s"resolveStore: $table is a view but no ${table}__vN backing table " +
        "exists — not a graft-versioned store")
    vs.last._2
  }

  /**
   * Append rows to a bucketed store under the store's OWN bucket spec,
   * read from the catalog — one new file per touched bucket, and the
   * bucketing (so the exchange-free join) survives any number of appends
   * (PlanSpec-gated). Deriving the spec from the table instead of a
   * caller parameter removes the mismatched-spec footgun entirely and
   * makes every ingest path (`Dedup.ingestBatch*`) versioning-aware for
   * free via [[resolveStore]].
   */
  def appendBucketed(spark: SparkSession, df: DataFrame,
                     table: String): Unit = {
    val target = resolveStore(spark, table)
    val m = meta(spark, target)
    val spec = m.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"appendBucketed: $target has no bucket spec"))
    val bcols = spec.bucketColumnNames
    val scols =
      if (spec.sortColumnNames.nonEmpty) spec.sortColumnNames else bcols
    df.write
      .bucketBy(spec.numBuckets, bcols.head, bcols.tail: _*)
      .sortBy(scols.head, scols.tail: _*)
      .mode("append")
      .format("parquet")
      .saveAsTable(target)
  }

  /**
   * Convert a plain bucketed store into its VERSIONED form: the data
   * moves to `<table>__v1` and `<table>` becomes a VIEW over it. From
   * then on every [[rewriteBucketed]]/[[compactBucketed]] writes
   * `<table>__v(N+1)` and repoints the view with a single
   * `CREATE OR REPLACE VIEW` — ONE atomic catalog operation, so a
   * concurrent reader always resolves to a live version and never
   * observes a missing table (LayoutSpec gates this with a reader loop
   * under repeated compactions). The version the view just left is kept
   * for one generation (in-flight readers may still hold plans against
   * its files); older versions are dropped.
   *
   * Call this ONCE right after creating the store, before concurrent
   * readers exist — the conversion itself is a rename + view create
   * (two catalog ops, the very window versioning then removes).
   */
  def enableVersioning(spark: SparkSession, table: String): Unit = {
    val m = meta(spark, table)
    require(m.tableType != CatalogTableType.VIEW,
      s"enableVersioning: $table is already a view")
    spark.sql(s"ALTER TABLE $table RENAME TO ${table}__v1")
    spark.sql(s"CREATE VIEW $table AS SELECT * FROM ${table}__v1")
  }

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
   * Swap semantics — see [[rewriteBucketed]]: on a [[enableVersioning]]
   * store the swap is one atomic view repoint (concurrent-reader safe);
   * on a plain table it is a rename chain whose unbound window is a
   * single catalog op. Cost is one O(store) rewrite with a single full
   * shuffle; amortize by cadence (e.g. every N appends), not per ingest.
   */
  def compactBucketed(spark: SparkSession, table: String): Unit =
    rewriteBucketed(spark, table)(identity)

  /**
   * Rewrite a bucketed store in place through `transform`, restoring one
   * sorted file per bucket — the maintenance primitive behind
   * [[compactBucketed]] (transform = identity) and row deletion
   * ([[graft.operators.Dedup.removeFromFingerprintStore]]'s anti-join).
   *
   * Swap semantics depend on the store form:
   *  - VERSIONED ([[enableVersioning]]): the rewrite lands in
   *    `<table>__v(N+1)` and ONE `CREATE OR REPLACE VIEW` repoints the
   *    store name — atomic for concurrent readers; the outgoing version
   *    survives one generation for in-flight plans, older versions drop.
   *  - plain table: a rename chain (`table`→`__graft_old`, tmp→`table`,
   *    drop `__graft_old`) — the store name is unbound for exactly one
   *    catalog op, and crash recovery is a single rename of
   *    `__graft_old` back; run on a maintenance cadence, or version the
   *    store if readers are truly concurrent.
   *
   * Reads the table's FILES by path (see inline note), parquet stores
   * only (the provider guard below — a non-parquet bucketed table would
   * otherwise be silently rewritten to a format its consumers don't
   * expect); partitioned tables refused (rewrite each partition's own
   * bucketed table instead — [[graft.operators.Quantize.removeFromCodeStore]]
   * is the per-partition form for the cell-partitioned code store).
   */
  def rewriteBucketed(spark: SparkSession, table: String)
                     (transform: DataFrame => DataFrame): Unit = {
    val target = resolveStore(spark, table)
    val m = meta(spark, target)
    val spec = m.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"rewriteBucketed: $target has no bucket spec"))
    // the path read below sees only file columns; a partitioned table's
    // partition values live in directory names and would silently read
    // back as NULL — refuse loudly (rewrite such tables per-partition)
    require(m.partitionColumnNames.isEmpty,
      s"rewriteBucketed: $target is partitioned on " +
        s"${m.partitionColumnNames.mkString(",")}; rewrite each " +
        "partition's own bucketed table instead")
    require(m.provider.exists(_.equalsIgnoreCase("parquet")),
      s"rewriteBucketed: $target provider is " +
        s"${m.provider.getOrElse("unknown")}; only parquet stores are " +
        "supported (the rewrite would change the table's format)")
    val bcols = spec.bucketColumnNames
    val scols =
      if (spec.sortColumnNames.nonEmpty) spec.sortColumnNames else bcols
    val versioned = target != table
    // versioned rewrites land in a NONCE-named staging table, then COMMIT
    // by renaming to __v(N+1) + repointing the view — two writers racing
    // toward the same version can never clobber each other's data (the
    // rename refuses an existing name), and a stale writer is REFUSED by
    // the generation check in commitVersioned instead of silently
    // overwriting the other's rewrite (last-swap-wins)
    // expected comes from the SUFFIX of the snapshot actually read, not a
    // second catalog listing — a commit landing between resolveStore and
    // a re-listing would otherwise move the guard's expectation along
    // with it and wave the stale rewrite through (the exact lost update
    // commitVersioned exists to refuse)
    val expected =
      if (versioned) target.substring(target.lastIndexOf("__v") + 3).toInt
      else 0
    val dest =
      if (versioned)
        s"${table}__graft_rw_${java.util.UUID.randomUUID().toString.take(8)}"
      else s"${table}__graft_compact"
    spark.sql(s"DROP TABLE IF EXISTS $dest")
    // read the table's FILES by path, not the catalog table: the bucketed
    // relation already claims HashPartitioning(bcols, n), so the
    // repartition below would be elided as redundant — and then
    // DisableUnnecessaryBucketedScan (no join/agg above, just a write)
    // reverts the scan to file-split partitions, producing one file per
    // (task × bucket) instead of one per bucket (measured: 16 for 4
    // buckets). A path scan has unknown partitioning, so the shuffle
    // stays and each write task owns exactly one bucket.
    transform(spark.read.schema(m.schema).parquet(m.location.toString))
      .repartition(spec.numBuckets, bcols.map(col): _*)
      .write
      .bucketBy(spec.numBuckets, bcols.head, bcols.tail: _*)
      .sortBy(scols.head, scols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(dest)
    if (versioned) {
      commitVersioned(spark, table, expected, dest)
    } else {
      // rename chain: the store name is unbound for exactly ONE catalog
      // op (between the two renames) and a crash leaves the data bound
      // under __graft_old — one rename recovers it (vs the previous
      // DROP+RENAME, whose crash window left no table at all)
      spark.sql(s"DROP TABLE IF EXISTS ${table}__graft_old")
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}__graft_old")
      spark.sql(s"ALTER TABLE $dest RENAME TO $table")
      spark.sql(s"DROP TABLE ${table}__graft_old")
    }
  }

  /**
   * Commit a versioned rewrite staged in `dest`: rename it to
   * `__v(expected+1)` and repoint the view — still ONE reader-visible
   * catalog op (the repoint; the rename touches a name no reader
   * resolves). CONCURRENT-WRITER contract (LayoutSpec-gated): if the
   * store's generation moved past `expected` while the rewrite ran —
   * another compaction/retraction committed — the commit is REFUSED and
   * the staged table dropped, because last-swap-wins would serve a store
   * missing that writer's changes; retry the whole rewrite against the
   * current version. The rename itself refuses an already-taken version
   * name, closing the check-to-rename window. Appends
   * ([[appendBucketed]]) do not bump the generation: an append racing a
   * rewrite can still be lost to the rewrite's pre-append snapshot —
   * single-writer discipline (or an external lock) remains the contract
   * BETWEEN append and rewrite; this guard makes rewrite-vs-rewrite
   * races loud instead of silent.
   */
  private[graft] def commitVersioned(spark: SparkSession, table: String,
                                     expected: Int, dest: String): Unit = {
    val cur = versions(spark, table).last._1
    if (cur != expected) {
      spark.sql(s"DROP TABLE IF EXISTS $dest")
      throw new IllegalStateException(
        s"rewriteBucketed: $table generation moved (expected __v$expected," +
          s" found __v$cur) — concurrent writer detected; retry against " +
          "the current version")
    }
    val vdest = s"${table}__v${expected + 1}"
    // only the name-taken case is a concurrent-writer refusal; any other
    // failure (transient metastore error, fatal) propagates as itself —
    // the nonce-named staging table survives for retry/diagnosis instead
    // of a completed full-store rewrite being dropped on a blip
    try spark.sql(s"ALTER TABLE $dest RENAME TO $vdest")
    catch {
      case e: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
        spark.sql(s"DROP TABLE IF EXISTS $dest")
        throw new IllegalStateException(
          s"rewriteBucketed: another writer took $vdest — retry against " +
            "the current version", e)
    }
    // ONE catalog op: a concurrent reader resolves either the old or
    // the new version, never a missing name (LayoutSpec reader-loop
    // gate); then drop everything older than the version just left
    spark.sql(s"CREATE OR REPLACE VIEW $table AS SELECT * FROM $vdest")
    versions(spark, table).dropRight(2)
      .foreach { case (_, v) => spark.sql(s"DROP TABLE IF EXISTS $v") }
  }
}
