package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed custom aggregations (`Aggregator[IN, BUF, OUT]`) — the Spark-native
 * form of the reference's reducer-handler UDAF role (the handler receives a
 * whole `job_list` and folds it manually, `stepist/flow/workers/
 * reducer_engine.py:78`). An Aggregator instead declares reduce/merge, so
 * Catalyst runs it as a partial + final hash aggregation: map-side combine,
 * no per-group materialized list, codegen-planned — the shape that survives
 * a 100 TB groupBy where collect_list would not.
 */
object Aggregators {

  /**
   * Exact top-3 largest values per group as a sorted (desc) triple;
   * groups with fewer than 3 inputs pad with -Infinity. Constant-size
   * buffer (three doubles) regardless of group size — contrast with
   * sort+limit per group (full shuffle of every row to its group) or
   * collect_list (O(group) memory).
   */
  object Top3Double extends Aggregator[Double, (Double, Double, Double), (Double, Double, Double)] {
    private val NegInf = Double.NegativeInfinity

    override def zero: (Double, Double, Double) = (NegInf, NegInf, NegInf)

    override def reduce(b: (Double, Double, Double), v: Double): (Double, Double, Double) =
      insert(b, v)

    override def merge(a: (Double, Double, Double), b: (Double, Double, Double)): (Double, Double, Double) =
      insert(insert(insert(a, b._1), b._2), b._3)

    override def finish(r: (Double, Double, Double)): (Double, Double, Double) = r

    override def bufferEncoder: Encoder[(Double, Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[(Double, Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)

    private def insert(b: (Double, Double, Double), v: Double): (Double, Double, Double) =
      if (v > b._1) (v, b._1, b._2)
      else if (v > b._2) (b._1, v, b._2)
      else if (v > b._3) (b._1, b._2, v)
      else b
  }
}
