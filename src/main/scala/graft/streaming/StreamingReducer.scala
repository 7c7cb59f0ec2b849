package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState,
  GroupStateTimeout, OutputMode, Trigger}

/**
 * Streaming fan-in: the Structured Streaming form of the reference's
 * Redis reducer engine (`stepist/flow/workers/reducer_engine.py:21-80`).
 *
 * Reference semantics reproduced:
 *  - branch results buffer under their `hub_job_id` (ZINCRBY count +
 *    HSET payload, `reducer_engine.py:27-38`) → here: per-key GroupState;
 *  - a group EMITS exactly when the arrived count reaches the branch count
 *    parsed from the id suffix `"<uuid>:<n>"` (`reducer_engine.py:58-60`);
 *  - incomplete groups expire after `ttlMs` and emit nothing
 *    (`EXPIRE reducer_job_lifetime` = 30 s, `stepist/app.py:44`,
 *    `reducer_engine.py:40-43`) → here: ProcessingTimeTimeout;
 *  - documented deviation (SURVEY §7.4): duplicate deliveries of the same
 *    (job, branch) are deduped instead of over-counting — the reference's
 *    at-least-once queue would double-count a retried branch.
 *
 * Payloads travel as JSON strings (≙ the ujson envelope on every queue hop,
 * `stepist/app.py:20,26`); callers decode with `from_json` downstream.
 */
object StreamingReducer {

  /** One branch arrival: hub job id, branch index, JSON payload. */
  case class Arrival(hubJobId: String, branch: Int, payload: String)

  /** Emitted when a hub job completes: payloads ordered by branch index. */
  case class Completed(hubJobId: String, jobList: Seq[String])

  /** Arrived branches as parallel seqs. Must be PUBLIC: the state encoder's
    * generated code instantiates it reflectively and cannot see a private
    * nested class's members. */
  case class Buf(branches: Seq[Int], payloads: Seq[String])

  /**
   * Wire the count-complete reducer onto a stream of arrivals.
   * `ttlMs` bounds how long an incomplete group is held (default 30 000 ms
   * ≙ `reducer_job_lifetime`, `stepist/app.py:44`); pass `ttlMs <= 0` to
   * keep incomplete groups forever (no timeout).
   *
   * State size per key is O(branch count) — independent of stream length —
   * and keys are dropped the moment they complete or expire, so the state
   * store stays bounded at scale. Note: with a TTL and the default
   * zero-interval trigger, registered timeouts make the micro-batch engine
   * re-trigger continuously — use [[reduceQuery]], which pairs a TTL with
   * a `Trigger.ProcessingTime` interval by default.
   */
  def reduce(arrivals: Dataset[Arrival], ttlMs: Long = 30000L): Dataset[Completed] = {
    import arrivals.sparkSession.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    arrivals
      .groupByKey(_.hubJobId)
      .flatMapGroupsWithState[Buf, Completed](
        OutputMode.Append, timeoutConf) {
        case (key, rows, state: GroupState[Buf]) =>
          if (state.hasTimedOut) {
            // incomplete after TTL → drop silently (reducer_engine.py:40-43)
            state.remove()
            Iterator.empty
          } else {
            // a malformed id (no numeric ':<n>' suffix) can never complete;
            // drop it instead of throwing — an exception here fails the
            // whole query and, since the offset is never committed,
            // crash-loops on every replay. One bad record must only lose
            // itself (≙ reference: a bad job dies alone,
            // reducer_engine.py:58-60).
            val n = key.split(":").last.toIntOption.getOrElse(-1)
            if (n < 0) {
              state.remove()
              Iterator.empty
            } else {
              val prev: Map[Int, String] = state.getOption
                .map(b => b.branches.zip(b.payloads).toMap).getOrElse(Map.empty)
              // dedup duplicate branch deliveries: first write wins
              val merged = rows.foldLeft(prev) { (acc, a) =>
                if (acc.contains(a.branch)) acc else acc + (a.branch -> a.payload)
              }
              if (merged.size >= n) {
                state.remove()
                Iterator.single(Completed(key,
                  merged.toSeq.sortBy(_._1).map(_._2)))
              } else {
                val sorted = merged.toSeq.sortBy(_._1)
                state.update(Buf(sorted.map(_._1), sorted.map(_._2)))
                if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
                Iterator.empty
              }
            }
          }
      }
  }

  /**
   * Safe-by-default query wiring for [[reduce]]: a TTL registers
   * processing-time timeouts, and under the default zero-interval trigger
   * the micro-batch engine re-fires continuously just to check them — a
   * busy spin that burns a cluster's scheduler for nothing. This pairs the
   * TTL with a `Trigger.ProcessingTime` at half the TTL (expiry still
   * observed within ~1.5× ttl worst-case); without a TTL no timeouts are
   * registered and the default data-driven trigger is kept. Caller attaches
   * format/options/checkpoint to the returned writer and `start()`s it.
   */
  def reduceQuery(arrivals: Dataset[Arrival], ttlMs: Long = 30000L,
                  triggerIntervalMs: Option[Long] = None): DataStreamWriter[Completed] = {
    val w = reduce(arrivals, ttlMs).writeStream.outputMode("append")
    // an explicitly requested pace always applies; otherwise only a TTL
    // needs one (to keep timeout checks from busy-spinning the engine)
    triggerIntervalMs match {
      case Some(ms) => w.trigger(Trigger.ProcessingTime(ms))
      case None if ttlMs > 0 =>
        w.trigger(Trigger.ProcessingTime(math.max(ttlMs / 2, 100L)))
      case None => w
    }
  }

  /** Column-level helper: turn a hub-tagged DataFrame (as produced by the
    * batch Hub — `__hub_job_id`, `__hub_branch` + data columns) into the
    * Arrival stream this reducer consumes. */
  def toArrivals(df: DataFrame): Dataset[Arrival] = {
    import df.sparkSession.implicits._
    val dataCols = df.columns.filterNot(_.startsWith("__hub_")).toIndexedSeq
    df.select(
        col("__hub_job_id").as("hubJobId"),
        col("__hub_branch").cast("int").as("branch"),
        to_json(struct(dataCols.map(col): _*)).as("payload"))
      .as[Arrival]
  }
}
