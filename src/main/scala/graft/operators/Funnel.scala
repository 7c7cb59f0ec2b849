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
 * analytics at 100 TB; [[Layout.writeBucketed]] on the user column)
 * every step is co-located and exchange-free — PlanSpec proves the
 * whole cascade plans with ZERO exchanges over such a store, broadcast
 * off. The per-stage frames carry (user, ts) only. Stage count is
 * policy-sized (3-6), not data-sized, so the cascade depth is a
 * constant.
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
      val keep = acc.columns.toIndexedSeq.map(col)
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

  /**
   * Per-stage conversion metrics over [[funnel]]'s per-user frame — the
   * aggregate that frame exists for: one row per stage with the users
   * reaching it, the conversion rate from the previous stage (stage 1
   * converts from ALL users with any event), and the EXACT median
   * seconds from the previous stage's completion (linear-interpolated
   * percentile, the cross-engine-stable definition; null for stage 1,
   * which has no predecessor).
   *
   * Distributed shape: the funnel cascade stays user-keyed; this adds
   * ONE global aggregate over the per-user frame (all counts and
   * per-stage medians in a single pass — medians over completed-stage
   * gaps only, stage count is policy-sized) and explodes the 1-row
   * result into |stages| rows driver-free.
   *
   * Median modes — the DEFAULT is the at-scale form: `approxMedian =
   * true` uses the mergeable `approx_percentile` sketch, which bounds
   * every aggregation buffer at O(accuracy) regardless of user count —
   * same one-pass plan, rank error ≤ 1/accuracy (gated against exact at
   * fixture scale by q128). Set `approxMedian = false` for the EXACT
   * `percentile` (the cross-engine oracle form, and fine up to millions
   * of users): it holds the distinct per-user gap values in its buffer,
   * whose final merge lands on ONE task — data-sized state, the very
   * thing a 10⁹-user profile job must avoid, which is why exact is the
   * opt-in rather than the default.
   */
  def conversion(df: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String],
                 approxMedian: Boolean = true,
                 approxAccuracy: Int = 10000): DataFrame = {
    val f = funnel(df, userCol, typeCol, tsCol, stages)
    val medFn = if (approxMedian) "approx_percentile" else "percentile"
    val medTail = if (approxMedian) s", $approxAccuracy" else ""
    val gaps = stages.indices.tail.map { i =>
      expr(s"$medFn(cast(ts${i + 1} as double) - " +
        s"cast(ts$i as double), 0.5$medTail)").as(s"med${i + 1}")
    }
    val counts = count(lit(1)).as("n_total") +:
      stages.indices.map(i => count(col(s"ts${i + 1}")).as(s"n${i + 1}"))
    val one = f.agg(counts.head, counts.tail ++ gaps: _*)
    val stageRows = stages.indices.map { i =>
      val n = col(s"n${i + 1}").cast("double")
      val prev = if (i == 0) col("n_total").cast("double")
        else col(s"n$i").cast("double")
      struct(
        lit(i + 1).as("stage_idx"),
        lit(stages(i)).as("stage"),
        col(s"n${i + 1}").cast("long").as("n_users"),
        round(when(prev > 0, n / prev).otherwise(lit(0.0)), 6)
          .as("rate_from_prev"),
        (if (i == 0) lit(null).cast("double")
         else round(col(s"med${i + 1}"), 3)).as("median_gap_s"))
    }
    one.select(explode(array(stageRows: _*)).as("s")).select(col("s.*"))
  }
}
