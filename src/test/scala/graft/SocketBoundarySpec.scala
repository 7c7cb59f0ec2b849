package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.streaming.{SocketBoundary, SocketQueueServer}

/** The wire transport of the StageBoundary SPI: rows over a TCP line
  * protocol (broker ≙ the Redis list behind the reference's adapter) —
  * same contract the parquet and in-memory boundaries pass, proving the
  * SPI is transport-agnostic. */
class SocketBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType)))

  private def withBroker(limit: Option[Long] = None,
                         timeoutMs: Option[Long] = None)
                        (body: (SocketQueueServer, SocketBoundary) => Unit)
      : Unit = {
    val srv = new SocketQueueServer()
    try body(srv, new SocketBoundary("127.0.0.1", srv.commandPort,
      srv.subscribePort, schema, limit, timeoutMs))
    finally srv.close()
  }

  test("write ships rows from executor partitions; read/count/flush round-trip") {
    withBroker() { (_, b) =>
      val df = (1L to 20L).map(i => (i, s"job-$i")).toDF("id", "payload")
        .repartition(4) // multiple partitions → multiple pushing sockets
      b.write(df)
      assert(b.jobsCount(spark) == 20L)
      assert(!b.isEmpty(spark))
      val got = b.read(spark).as[(Long, String)].collect().toSet
      assert(got == (1L to 20L).map(i => (i, s"job-$i")).toSet)
      // PEEK is non-destructive; DRAIN consumes
      assert(b.jobsCount(spark) == 20L)
      val drained = b.drain(spark).as[(Long, String)].collect().toSet
      assert(drained == got && b.jobsCount(spark) == 0L)
      b.write(df.limit(3))
      assert(b.jobsCount(spark) == 3L)
      b.flush()
      assert(b.isEmpty(spark))
      assert(b.read(spark).isEmpty, "post-flush read must be empty, typed")
    }
  }

  test("jobs_limit backpressure times out loudly when nobody drains the wire queue") {
    withBroker(limit = Some(2L), timeoutMs = Some(300L)) { (_, b) =>
      b.write(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"))
      intercept[java.util.concurrent.TimeoutException] {
        b.write(Seq((3L, "c")).toDF("id", "payload"))
      }
      // a consumer draining makes the same write succeed
      b.drain(spark)
      b.write(Seq((3L, "c")).toDF("id", "payload"))
      assert(b.jobsCount(spark) == 1L)
    }
  }

  test("readStream consumes the broker via Spark's socket source (backlog + live)") {
    withBroker() { (_, b) =>
      b.write(Seq((1L, "early")).toDF("id", "payload")) // pre-query backlog
      val q = b.readStream(spark)
        .writeStream.format("memory").queryName("sock_out").start()
      try {
        // the socket source has no replay: wait until the subscriber's
        // backlog lands, then push live rows
        eventually(() =>
          spark.table("sock_out").count() == 1L)
        b.write(Seq((2L, "live-a"), (3L, "live-b")).toDF("id", "payload"))
        eventually(() =>
          spark.table("sock_out").count() == 3L)
        val got = spark.table("sock_out").as[(Long, String)].collect().toSet
        assert(got == Set((1L, "early"), (2L, "live-a"), (3L, "live-b")))
      } finally q.stop()
    }
  }

  private def eventually(cond: () => Boolean, timeoutMs: Long = 30000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond()) {
      if (System.nanoTime() > deadline)
        fail(s"condition not met within $timeoutMs ms")
      Thread.sleep(100L)
    }
  }
}
