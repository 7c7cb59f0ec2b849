package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel analysis over an event stream: for each user, the first
 * time they completed each stage IN ORDER — stage i+1 counts only if it
 * happens strictly after the user's stage-i completion (the standard
 * product-analytics funnel; sequential-first-match semantics). The
 * reference has no analytics operator at all (any such logic would be
 * user Python in a step handler, `/root/reference/README.markdown:84-85`).
 *
 * Output: one row per user with ANY event — (userCol, ts1..tsN,
 * stages_completed). A user who stalls at stage i has null ts for every
 * later stage (the strict `>` against a null propagates, so completion
 * is monotone by construction).
 *
 * Distributed shape: one conditional aggregate for stage 1, then one
 * left join + aggregate per later stage — all keyed on the user, so with
 * the event store bucketed by user (the natural layout for any per-user
 * analytics at 100 TB) every step is co-located and exchange-free; the
 * per-stage frames carry (user, ts) only. Stage count is policy-sized
 * (3-6), not data-sized, so the cascade depth is a constant.
 */
object Funnel {

  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    val ev = df.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var acc = ev.groupBy(col("__u"))
      .agg(min(when(col("__t") === stages.head, col("__ts"))).as("ts1"))
    for ((stage, idx) <- stages.tail.zipWithIndex) {
      val i = idx + 2
      val prev = s"ts${i - 1}"
      val stageEv = ev.filter(col("__t") === stage)
        .select(col("__u"), col("__ts").as("__sts"))
      val keep = acc.columns.map(col)
      acc = acc.join(stageEv, Seq("__u"), "left_outer")
        .groupBy(keep: _*)
        .agg(min(when(col("__sts") > col(prev), col("__sts"))).as(s"ts$i"))
    }
    // stages_completed = highest non-null stage (completion is monotone);
    // forward fold so the OUTERMOST when checks the highest stage first
    val completed = stages.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"ts${i + 1}").isNotNull, lit(i + 1)).otherwise(els)
    }
    acc.select(col("__u").as(userCol) +:
      stages.indices.map(i => col(s"ts${i + 1}")) :+
      completed.as("stages_completed"): _*)
  }
}
