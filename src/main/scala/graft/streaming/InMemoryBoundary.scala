package graft.streaming

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

/**
 * Driver-memory stage boundary ≙ the reference's in-process dev adapter
 * (SimpleQueue over an in-memory dict when Redis isn't wired,
 * `stepist/flow/libs/simple_queue.py`): rows buffered on the driver, for
 * tests and small control-plane flows. Deliberately NOT a 100 TB data path
 * — [[write]] collects each batch into driver memory by design; bulk data
 * goes through [[ParquetBoundary]]. Second [[StageBoundary]] implementation
 * proving the SPI is pluggable (≙ the reference shipping Redis + RMQ + SQS
 * behind one ABC, `workers/worker_engine.py:5-35`).
 *
 * `limit`, if set, is the producer-side jobs_limit in rows: [[write]]
 * blocks while the buffer holds at least `limit` rows, until a consumer
 * [[flush]]es (≙ `adapters/simple_queue.py:24-29`).
 */
final class InMemoryBoundary(schema: StructType, limit: Option[Long] = None)
    extends StageBoundary {
  private val buf = mutable.ArrayBuffer.empty[Row] // guarded by this
  // every live streaming subscriber; each write feeds them all (a second
  // readStream must not silently detach the first query's feed). A
  // subscriber whose consuming query has TERMINATED is pruned on the next
  // write — otherwise a long-lived driver retains every subsequently
  // written row per dead consumer.
  private final class Sub(val stream: MemoryStream[Row]) {
    var attached = false // ever observed inside a running query's sources
  }
  private val streams = mutable.ArrayBuffer.empty[Sub] // guarded by this

  override protected def jobsLimit: Option[Long] = limit

  /** Live streaming subscribers (post-prune); for tests/introspection. */
  def subscriberCount: Int = synchronized(streams.size)

  /** Drop subscribers whose query came and went: a stream that has been
    * seen among some active query's sources but no longer is, is dead —
    * nothing will ever read what we feed it. A never-yet-attached stream
    * is kept (its query may still be starting up). Best-effort: a dead
    * stream parks only until the next write, and the rows it already
    * received are unreachable once dropped. Pruning is PERMANENT —
    * matching queue semantics, a stopped consumer's registration is gone;
    * restarting a query over the same pruned readStream frame yields a
    * subscriber that receives nothing. Call [[readStream]] again for a
    * fresh subscription instead of reusing the old frame. */
  private def pruneDead(spark: SparkSession): Unit = {
    val live: Set[AnyRef] = spark.streams.active.iterator.flatMap {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        // StreamExecution.sources is Scala-protected but JVM-public;
        // reflective read keeps us off Spark's private internals surface
        try w.streamingQuery.getClass.getMethod("sources")
          .invoke(w.streamingQuery).asInstanceOf[Seq[AnyRef]]
        catch { case _: ReflectiveOperationException => Nil }
      case _ => Nil
    }.toSet
    streams.foreach(s => if (live.contains(s.stream)) s.attached = true)
    streams.filterInPlace(s => !s.attached || live.contains(s.stream))
  }

  override def write(df: DataFrame): Unit = {
    awaitCapacity(df.sparkSession)
    val rows = df.collect().toIndexedSeq
    synchronized {
      pruneDead(df.sparkSession)
      buf ++= rows
      streams.foreach(_.stream.addData(rows))
    }
  }

  override def read(spark: SparkSession): DataFrame =
    spark.createDataFrame(synchronized(buf.toList).asJava, schema)

  /** Streaming view: everything enqueued so far plus all later writes.
    * Each call subscribes an independent consumer; all of them receive
    * every subsequent write. (Rows already handed to a stream are part of
    * its history — a later [[flush]] empties the queue but cannot retract
    * delivered batches, matching a queue consumer that already popped
    * them.) */
  override def readStream(spark: SparkSession): DataFrame = synchronized {
    pruneDead(spark)
    implicit val enc = Encoders.row(schema)
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Row]
    if (buf.nonEmpty) s.addData(buf.toIndexedSeq)
    streams += new Sub(s)
    s.toDF()
  }

  override def jobsCount(spark: SparkSession): Long = synchronized(buf.size.toLong)

  override def flush(): Unit = synchronized { buf.clear() }
}
