package graft.operators

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/**
 * Registry of frames/RDDs persisted inside the stateless operator objects
 * ([[Dedup]], [[Similarity]]) so a long-lived driver can release them after
 * materializing results — the operator-level mirror of `core.App.cleanup()`
 * (`core/Flow.scala`). Operators persist intermediates that are read by
 * several downstream branches (signatures read by both self-join sides,
 * shingle sets read by prefix and verify stages); those cache entries must
 * not accumulate across repeated invocations on a driver that lives for
 * months.
 *
 * Usage: run operators, materialize/write their results, then
 * `OpCache.release()`. Releasing before the caller has consumed a returned
 * frame is safe (Spark recomputes from lineage) but forfeits the reuse.
 */
object OpCache {
  private val entries = mutable.ArrayBuffer.empty[() => Unit]

  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    entries += (() => df.unpersist(blocking = false)); df
  }

  private[graft] def trackRdd[T](rdd: RDD[T]): RDD[T] = synchronized {
    entries += (() => { rdd.unpersist(blocking = false); () }); rdd
  }

  /** Unpersist everything tracked since the last release. */
  def release(): Unit = synchronized {
    entries.foreach(f => f()); entries.clear()
  }

  /** Materialize `df` into a persisted RDD and re-plan it from a bare
    * scan: truncates iterative lineage (plans that reference their own
    * prior iterations grow exponentially otherwise) with an explicit
    * release path — unlike `localCheckpoint`, whose cached RDD has no
    * public-API unpersist. Returns the re-planned frame, the persisted
    * RDD handle (caller owns its release), and the row count. */
  private[graft] def materializeHandle(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], Long) = {
    val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd, n)
  }

  /** [[materializeHandle]] with the RDD auto-tracked for [[release]]. */
  private[graft] def materialize(df: DataFrame): DataFrame = {
    val (out, rdd, _) = materializeHandle(df)
    trackRdd(rdd)
    out
  }

  /** Materialize a VERDICT-SIZED frame (global 1-row aggregates,
    * `limit(k)` artifacts — never anything data-sized) into a driver-
    * local relation: one `collect()` instead of [[materialize]]'s
    * RDD persist + count + re-plan, so every downstream verdict select
    * over it is a LocalRelation — zero further Spark jobs (the r18
    * profile measured 2–4 jobs plus ~45 ms of driver planning per
    * extra job on every 1-row materialize in the gate class). The
    * guard is a hard cap, not a hint: a caller handing this a frame
    * that grows with the corpus must fail loudly, never silently
    * collect a corpus to the driver. */
  private[graft] def materializeLocal(df: DataFrame,
                                      maxRows: Int = 1024): DataFrame = {
    // collect through limit(maxRows + 1), NOT a bare collect-then-check:
    // a miswired data-sized frame must fail loudly WITHOUT first pulling
    // the whole corpus into driver memory (the limit bounds the transfer
    // to one row past the cap; the require still fires on overflow)
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"materializeLocal: over $maxRows rows — this frame is data-sized; " +
        "use materialize/persist")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
