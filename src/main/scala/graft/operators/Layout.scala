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
   *
   * The write CO-LOCATES each bucket first (`repartition(buckets, keys)`
   * is murmur3 pmod n — exactly Spark's bucket id function, the
   * [[rewriteBucketed]] shuffle): without it every upstream partition
   * writes its own file into every bucket it touches — tasks × buckets
   * tiny files per store (measured 256 for a 32-partition frame at 8
   * buckets), paying parquet writer open/footer cost per file at write
   * time and file-open fan-out on every later scan. One write-time
   * shuffle buys one file per bucket — the same discipline as
   * [[graft.operators.Quantize.writeCodeStore]]'s per-cell co-location
   * (its store note measured the tiny-file tax at 2× on probe reads).
   * At scale, `buckets` is sized so one bucket's rows fit a write task
   * comfortably — the parameter already carries that contract.
   */
  def writeBucketed(df: DataFrame, table: String, keyCols: Seq[String],
                    buckets: Int): Unit =
    df.repartition(buckets, keyCols.map(col): _*)
      .write
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

  // ---- view-text coupling (writer ↔ recovery parser) -------------------
  // Every view a versioned store ever gets is written through
  // `viewBodySql` and parsed back through `servingVersion` — the TWO
  // halves of one contract: recoverVersioned derives the serving
  // version from the view's SQL text (resolveStore lies mid-swap), so
  // any change to how the writer phrases the view MUST keep the parser
  // matching. LayoutSpec gates the round-trip on a freshly written
  // store and after a rewrite; change either side only with both.

  /** The ONE view body a versioned store's name is ever bound to. */
  private def viewBodySql(table: String, v: Int): String =
    s"SELECT * FROM ${table}__v$v"

  /** Parser half of the coupling: the serving version recorded in a
    * view's stored SQL text ([[viewBodySql]]'s `__vN` suffix; the LAST
    * match tolerates a db-qualified or quoted table name containing the
    * pattern). None = not a graft-versioned view. */
  private[graft] def servingVersion(viewText: String): Option[Int] =
    "__v(\\d+)".r.findAllMatchIn(viewText)
      .map(_.group(1).toInt).toSeq.lastOption

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

  // ---- append/rewrite commit protocol (versioned stores) --------------
  //
  // Catalog operations have no compare-and-swap, so an append racing a
  // rewrite used to be SILENTLY lost: the rewrite's file snapshot predates
  // the append, its view repoint serves a store without those rows, and
  // nothing ever says so. Versioned stores now serialize commits through a
  // TOKEN CHAIN — one-byte files `_t%09d` (content: kind `a`ppend or
  // `r`ewrite) in `_graft_coord/` inside
  // the CURRENT backing table's directory (underscore-prefixed: invisible
  // to file indexes; dies with the version, so stale tokens cannot poison
  // a recreated store). A commit is one exclusive `FileContext.rename`
  // (the [[graft.operators.Quantize]] manifest primitive): exactly one
  // writer owns any sequence number.
  //
  //  - an APPEND first commits an INTENT token kind `i` (before any data
  //    lands), writes its data, then commits a FINALIZATION token with
  //    content `a:<intentSeq>`; losing a CAS to other appends just
  //    retries higher, losing it to a REWRITE token refuses loudly (the
  //    rewrite may or may not have snapshotted the rows — never
  //    silently);
  //  - a REWRITE records the latest seq BEFORE listing files — and at
  //    that point REFUSES if any intent ≤ that seq is UNFINALIZED and
  //    younger than the in-flight horizon (the owning append may write
  //    data after this rewrite's listing and then crash before its
  //    finalization — the one case the seq CAS alone cannot see); its
  //    commit token CAS then fails iff ANY commit (intent or
  //    finalization included) landed since — so a rewrite that swaps
  //    provably snapshotted every committed append, including every
  //    crashed append whose data is visible, and one that didn't is
  //    refused and its staging dropped (retry re-reads);
  //  - kind `r` is a TOMBSTONE on the version: once present, the version
  //    is closed — later appends/rewrites resolving it are refused (the
  //    view repoint is mid-flight or crashed; see recovery note below).
  //
  // Crash recovery (window: rewrite crashed between its token commit and
  // the view repoint — one catalog op wide): either complete the swap
  // (`ALTER VIEW <table> AS SELECT * FROM <table>__vN+1`) or
  // drop the staged `__vN+1`/staging table and delete the `r` token file.
  // An append crashing between its data write and its finalization now
  // leaves a LIVE intent: every rewrite refuses until the intent has
  // been idle past the horizon (default 24 h), by which time the crashed
  // append's files — if any landed — are in any later listing. This
  // closes the r14/r15 residual ("append crashing between data and token
  // is unprotected for the one rewrite in flight") completely, at the
  // price that one crashed append pauses COMPACTION (never appends,
  // never reads) for the horizon; pass a shorter horizon to
  // rewriteBucketed when the writer is known dead. The bound assumes an
  // append finishes its data write within the horizon of its intent —
  // a >24 h append job must raise it.
  // the sequence number alone is the filename — the KIND lives in the
  // file's one-byte content, never in the name, so an append and a
  // rewrite racing toward the same sequence contend for the SAME rename
  // destination (a kind-suffixed name would let both exclusive renames
  // succeed and the CAS would never conflict)
  private val TokenRe = "_t(\\d{9,})".r

  private[graft] def coordPath(spark: SparkSession,
                        target: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      meta(spark, target).location.toString, "_graft_coord")

  /** (seq, content, mtime) tokens at `coord`, ascending by seq. The
    * content's FIRST char is the kind (`a` append finalization, `i`
    * append intent, `r` rewrite tombstone); a finalization's full
    * content is `a:<intentSeq>` naming the intent it resolves (legacy
    * bare `a` tokens from pre-intent stores read fine — they simply
    * finalize nothing). */
  private def listTokens(spark: SparkSession,
                         coord: org.apache.hadoop.fs.Path)
      : Seq[(Long, String, Long)] = {
    val fs = coord.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(coord)) Seq.empty
    else fs.listStatus(coord).toSeq.collect {
      case st if TokenRe.pattern.matcher(st.getPath.getName).matches() =>
        val TokenRe(n) = st.getPath.getName: @unchecked
        val in = fs.open(st.getPath)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString finally in.close()
        (n.toLong, content, st.getModificationTime)
    }.sortBy(_._1)
  }

  /** Intent seqs at `coord` that no finalization token resolves. */
  private def unfinalizedIntents(ts: Seq[(Long, String, Long)])
      : Seq[(Long, Long)] = {
    val finalized = ts.collect {
      case (_, c, _) if c.startsWith("a:") => c.stripPrefix("a:").toLong
    }.toSet
    ts.collect { case (seq, c, mt) if c.startsWith("i") &&
      !finalized(seq) => (seq, mt) }
  }

  /** Exclusive-create token `seq` with `content` — one of the three
    * protocol token contents: `i` (append intent, staged before data),
    * `a:<intentSeq>` (append finalization naming the intent it
    * resolves), `r` (rewrite tombstone). Legacy bare `a` tokens from
    * pre-intent stores still parse (they finalize nothing). Returns
    * false when the seq is taken (another writer committed first). */
  private[graft] def commitToken(spark: SparkSession,
                          coord: org.apache.hadoop.fs.Path, seq: Long,
                          content: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = coord.getFileSystem(conf)
    fs.mkdirs(coord)
    val tmp = new org.apache.hadoop.fs.Path(coord,
      s"_tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(coord.toUri, conf)
    try {
      fc.rename(tmp, new org.apache.hadoop.fs.Path(coord, f"_t$seq%09d"))
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(tmp, false); false
    }
  }

  private def refuseClosed(spark: SparkSession,
                           coord: org.apache.hadoop.fs.Path, op: String,
                           target: String): Unit =
    if (listTokens(spark, coord).exists(_._2.startsWith("r")))
      throw new IllegalStateException(
        s"$op: a rewrite already committed from $target — the store moved " +
          "(or a rewrite commit is mid-swap; complete or roll back its " +
          "view repoint); retry against the current version")

  /**
   * Crash recovery for a versioned store whose rewrite died MID-COMMIT —
   * the one window the token protocol leaves open (the rewrite's `r`
   * token committed, the view repoint never ran): the version stays
   * CLOSED — appends and rewrites refuse with the mid-swap message —
   * until this runs. Run it only when the crashed writer is KNOWN dead;
   * it inspects the state and finishes the commit one way or the other
   * (LayoutSpec-gated on both states):
   *  - `<table>__v(N+1)` exists (the crash hit between the rename and
   *    the repoint): COMPLETE the swap — the staged result is a fully
   *    written store, so repoint the view to it and drop superseded
   *    versions, exactly what [[commitVersioned]] would have done;
   *  - no next version (the crash hit between the token and the rename):
   *    ROLL BACK — delete the `r` tombstone so the current version
   *    accepts commits again, and drop any orphaned `__graft_rw_*`
   *    staging tables the dead writer left.
   * Returns true if it changed anything; false on plain stores and on
   * healthy versioned stores. The COMPLETION branch is always safe (a
   * live writer's own repoint of the same target is idempotent); the
   * ROLLBACK branch DESTROYS a live writer's staged result if that
   * writer is merely slow between its token and its rename, so it only
   * fires once the tombstone has been idle past `rollbackHorizonMs`
   * (default 24 h, the [[graft.operators.Quantize.gcCodeStore]] orphan
   * discipline) — pass 0 only when the crashed writer is KNOWN dead.
   */
  def recoverVersioned(spark: SparkSession, table: String,
                       rollbackHorizonMs: Long = 24L * 3600 * 1000)
      : Boolean = {
    if (resolveStore(spark, table) == table) return false
    // the SERVING version comes from the VIEW's definition, not from
    // resolveStore: in the crashed-mid-swap state the highest __vN table
    // IS the renamed-but-never-repointed staging result, so the two
    // diverge — exactly the divergence this op exists to repair
    // (LayoutSpec-caught; resolveStore here would inspect the staged
    // table's empty coord dir and see a healthy store)
    val viewText = meta(spark, table).viewText.getOrElse(return false)
    val cur = servingVersion(viewText).getOrElse(return false)
    val coord = coordPath(spark, s"${table}__v$cur")
    val closed = listTokens(spark, coord).filter(_._2.startsWith("r"))
    if (closed.isEmpty) return false
    val newer = versions(spark, table).map(_._1).filter(_ > cur)
    if (newer.nonEmpty) {
      // ALTER VIEW = one in-place alterTable (atomic for readers);
      // CREATE OR REPLACE VIEW would drop + recreate (see commitVersioned)
      spark.sql(s"ALTER VIEW $table AS " + viewBodySql(table, newer.min))
      versions(spark, table).dropRight(2)
        .foreach { case (_, v) => spark.sql(s"DROP TABLE IF EXISTS $v") }
    } else {
      val fs = coord.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cutoff = System.currentTimeMillis() - rollbackHorizonMs
      val stale = closed.filter(_._3 < cutoff)
      if (stale.size < closed.size) return false // maybe a live writer
      stale.foreach { case (seq, _, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(coord, f"_t$seq%09d"), false)
      }
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val db = id.database.getOrElse(
        spark.sessionState.catalog.getCurrentDatabase)
      // qualify the drop: an unqualified DROP resolves in the session's
      // CURRENT database, which for a qualified store name would spare
      // the real orphan and could hit an unrelated same-named table
      spark.sessionState.catalog
        .listTables(db, s"${id.table}__graft_rw_*")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.${t.table}"))
    }
    true
  }

  /**
   * Append rows to a bucketed store under the store's OWN bucket spec,
   * read from the catalog — one new file per touched bucket, and the
   * bucketing (so the exchange-free join) survives any number of appends
   * (PlanSpec-gated). Deriving the spec from the table instead of a
   * caller parameter removes the mismatched-spec footgun entirely and
   * makes every ingest path (`Dedup.ingestBatch*`) versioning-aware for
   * free via [[resolveStore]].
   *
   * On a VERSIONED store ([[enableVersioning]]) the append participates
   * in the commit-token protocol above: racing a
   * [[rewriteBucketed]]/[[compactBucketed]] now REFUSES loudly instead of
   * silently losing the batch to the rewrite's pre-append snapshot
   * (LayoutSpec-gated both ways). The refusal means the batch may or may
   * not be in the new version — id-idempotent ingest paths
   * (`Dedup.ingestBatch*`, whose anti-join skips already-held ids) simply
   * retry; raw callers must re-check. Plain (non-versioned) tables keep
   * the documented single-writer contract — version the store if writers
   * are truly concurrent.
   */
  def appendBucketed(spark: SparkSession, df: DataFrame,
                     table: String): Unit =
    appendBucketed(spark, df, table, () => ())

  /** CAS-loop a token of `content` into the chain at `coord`, refusing
    * on a rewrite tombstone with `refusal`. Returns the seq taken. */
  private def casToken(spark: SparkSession,
                       coord: org.apache.hadoop.fs.Path, content: String,
                       refusal: => String): Long = {
    var seq = -1L
    while (seq < 0) {
      val ts = listTokens(spark, coord)
      // the `r` check runs before EVERY attempt (not just on CAS
      // failure): a tombstone that landed before our first listing must
      // refuse, not be silently skipped past by taking the next free seq
      if (ts.exists(_._2.startsWith("r")))
        throw new IllegalStateException(refusal)
      val next = ts.lastOption.map(_._1).getOrElse(0L) + 1
      if (commitToken(spark, coord, next, content)) seq = next
    }
    seq
  }

  /** [[appendBucketed]] with a deterministic-interleaving seam:
    * LayoutSpec's crashed-append gate throws from `afterData` to leave
    * the store in the data-written-intent-unfinalized state. */
  private[graft] def appendBucketed(spark: SparkSession, df: DataFrame,
                                    table: String,
                                    afterData: () => Unit): Unit = {
    val target = resolveStore(spark, table)
    val m = meta(spark, target)
    val spec = m.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"appendBucketed: $target has no bucket spec"))
    val bcols = spec.bucketColumnNames
    val scols =
      if (spec.sortColumnNames.nonEmpty) spec.sortColumnNames else bcols
    val coord = if (target != table) Some(coordPath(spark, target)) else None
    coord.foreach(refuseClosed(spark, _, "appendBucketed", target))
    // INTENT first, data second: from this token on, any rewrite whose
    // file listing might miss this append's rows either sees a live
    // unfinalized intent (refuses at its snapshot) or a token past its
    // recorded seq (its CAS fails) — so a crash anywhere between the
    // data landing and the finalization below can no longer lose rows
    // to an in-flight rewrite's swap
    val intent = coord.map(c => casToken(spark, c, "i",
      s"appendBucketed: a rewrite already committed from $target — the " +
        "store moved; retry against the current version"))
    try
      // co-locate the batch per bucket before the append (the
      // writeBucketed note): "one new file per touched bucket" only
      // holds when each write task owns one bucket — an un-shuffled
      // 32-partition batch would append up to 32 files per bucket
      df.repartition(spec.numBuckets, bcols.map(col): _*)
        .write
        .bucketBy(spec.numBuckets, bcols.head, bcols.tail: _*)
        .sortBy(scols.head, scols.tail: _*)
        .mode("append")
        .format("parquet")
        .saveAsTable(target)
    catch {
      case e: Throwable =>
        // a FAILED (not crashed) append leaves no committed files —
        // finalize the intent so one bad batch doesn't pause rewrites
        // for the whole horizon; best-effort (a tombstone landing here
        // means the version closed anyway, the intent is moot)
        try coord.zip(intent).foreach { case (c, i) =>
          casToken(spark, c, s"a:$i", "version closed")
        } catch { case _: Throwable => () }
        throw e
    }
    // the seam fires AFTER the data landed and BEFORE the finalization —
    // a throw here leaves exactly the crashed-append state (rows
    // committed, intent live) the rewrite-side horizon gate exists for
    afterData()
    coord.zip(intent).foreach { case (c, i) =>
      // FINALIZE after the data lands: a rewrite whose token CAS
      // succeeds past ours therefore listed files written before our
      // finalization — ours included; one that read older tokens fails
      // ITS CAS and is refused
      casToken(spark, c, s"a:$i",
        s"appendBucketed: a rewrite committed from $target while " +
          "this append ran — the batch may not be in the new " +
          "version; retry against the current version " +
          "(id-idempotent ingest paths are safe to re-run)")
      // the coord dir dies with its version: if TWO rewrites completed
      // inside this append's write→token window, the grace policy has
      // already DROPPED the target table (rows included) and the loop
      // above just recreated an empty coord under the dead directory and
      // "committed" into it — re-resolve and refuse if the store moved,
      // so that pathological window is loud too, never silent
      if (resolveStore(spark, table) != target)
        throw new IllegalStateException(
          s"appendBucketed: $table moved past $target while this append " +
            "ran — the batch is not in the current version; retry " +
            "(id-idempotent ingest paths are safe to re-run)")
    }
  }

  /**
   * Convert a plain bucketed store into its VERSIONED form: the data
   * moves to `<table>__v1` and `<table>` becomes a VIEW over it. From
   * then on every [[rewriteBucketed]]/[[compactBucketed]] writes
   * `<table>__v(N+1)` and repoints the view with a single
   * `ALTER VIEW` — ONE atomic catalog operation, so a
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
    spark.sql(s"CREATE VIEW $table AS ${viewBodySql(table, 1)}")
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
   *    `<table>__v(N+1)` and ONE `ALTER VIEW` repoints the
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
                     (transform: DataFrame => DataFrame): Unit =
    rewriteBucketed(spark, table, () => ())(transform)

  /** How long an UNFINALIZED append intent blocks rewrites: past this
    * idle age the owning append is presumed crashed, and its data — if
    * any landed — landed long before any fresh file listing, so the
    * rewrite may proceed. Must exceed any append job's intent→data
    * latency (24 h: far past a write job's lifetime — the
    * [[graft.operators.Quantize.gcCodeStore]] orphan discipline). */
  private[graft] val DefaultInFlightHorizonMs: Long = 24L * 3600 * 1000

  /** [[rewriteBucketed]] with an explicit in-flight-append horizon — the
    * operator escape when a crashed append's stale intent is KNOWN dead
    * (pass 0 to ignore all unfinalized intents). */
  def rewriteBucketed(spark: SparkSession, table: String,
                      inFlightHorizonMs: Long)
                     (transform: DataFrame => DataFrame): Unit =
    rewriteBucketed(spark, table, () => (), inFlightHorizonMs)(transform)

  /** [[rewriteBucketed]] with a deterministic-interleaving seam: the
    * LayoutSpec race gates inject an append (or a competing rewrite)
    * between the staging write and the commit. */
  private[graft] def rewriteBucketed(spark: SparkSession, table: String,
                                     beforeCommit: () => Unit,
                                     inFlightHorizonMs: Long =
                                       DefaultInFlightHorizonMs)
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
    // token snapshot BEFORE the file listing below (spark.read builds its
    // file index eagerly): commit-token CAS success at seq0+1 then proves
    // no append committed after this point — every committed append's
    // files were on disk when the listing ran (appends token AFTER their
    // data lands)
    val coord = if (versioned) Some(coordPath(spark, target)) else None
    coord.foreach(refuseClosed(spark, _, "rewriteBucketed", target))
    val seq0 = coord.map { c =>
      val ts = listTokens(spark, c)
      // LIVE-INTENT refusal: an append whose intent is committed but not
      // finalized may write data files AFTER the file listing below and
      // then crash before its finalization — the one interleaving the
      // seq CAS cannot see (intents landing after this snapshot take
      // seq0+1 and fail our CAS instead). Stale intents (idle past the
      // horizon) are crashed appends whose files, if any, predate any
      // listing taken now — safe to proceed past (LayoutSpec-gated
      // both ways).
      val cutoff = System.currentTimeMillis() - inFlightHorizonMs
      val live = unfinalizedIntents(ts).filter(_._2 >= cutoff)
      if (live.nonEmpty)
        throw new IllegalStateException(
          s"rewriteBucketed: append intent(s) ${live.map(_._1).mkString(",")} " +
            s"on $target are unfinalized — an append is in flight (or " +
            "crashed less than the horizon ago) and its rows might not " +
            "be in this rewrite's snapshot; retry after it finalizes, or " +
            "pass a shorter inFlightHorizonMs if the writer is known dead")
      ts.lastOption.map(_._1).getOrElse(0L)
    }
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
    beforeCommit()
    if (versioned) {
      commitVersioned(spark, table, expected, dest, coord.get, seq0.get)
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
   * name, closing the check-to-rename window. Appends participate
   * through the commit-token chain (the protocol note above
   * [[appendBucketed]]): the token CAS at `seq0 + 1` refuses this commit
   * if ANY append committed after the rewrite's file-listing snapshot —
   * an interleaved append is either provably included or the rewrite is
   * refused, never silently dropped (LayoutSpec-gated); the committed
   * `r` token then closes the outgoing version against late appends.
   */
  private[graft] def commitVersioned(spark: SparkSession, table: String,
                                     expected: Int, dest: String,
                                     coord: org.apache.hadoop.fs.Path,
                                     seq0: Long): Unit = {
    val cur = versions(spark, table).last._1
    if (cur != expected) {
      spark.sql(s"DROP TABLE IF EXISTS $dest")
      throw new IllegalStateException(
        s"rewriteBucketed: $table generation moved (expected __v$expected," +
          s" found __v$cur) — concurrent writer detected; retry against " +
          "the current version")
    }
    if (!commitToken(spark, coord, seq0 + 1, "r")) {
      spark.sql(s"DROP TABLE IF EXISTS $dest")
      throw new IllegalStateException(
        s"rewriteBucketed: an append (or another rewrite) committed to " +
          s"$table after this rewrite's file snapshot — its rows are not " +
          "in the staged result; retry against the current version")
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
    // ONE catalog op — and it must be ALTER VIEW, not CREATE OR REPLACE
    // VIEW: Spark's CreateViewCommand implements replace as dropTable +
    // createTable (two catalog ops; javap-verified on 4.1.2), so a
    // reader resolving between them sees NO view at all — the LayoutSpec
    // reader-loop gate caught exactly that (a one-in-hundreds flake that
    // had been silent luck). AlterViewAsCommand is a single
    // SessionCatalog.alterTable, an in-place metadata replace: a
    // concurrent reader resolves either the old or the new version,
    // never a missing name. Then drop everything older than the version
    // just left.
    spark.sql(s"ALTER VIEW $table AS " + viewBodySql(table, expected + 1))
    versions(spark, table).dropRight(2)
      .foreach { case (_, v) => spark.sql(s"DROP TABLE IF EXISTS $v") }
  }
}
