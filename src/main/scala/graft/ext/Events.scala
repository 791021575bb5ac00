package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch behavioral analytics over an event stream (user_id, event_type,
 * ts) — the funnel/journey surface of the engine's events table.
 */
object Events {

  /**
   * FIRST-TOUCH ordered funnel with a per-step conversion window: a user
   * reaches step i+1 by their first step-i+1 event that is strictly
   * after the matched step-i event and within `maxGap` of it (same time
   * unit as `tsCol`). First-touch is the industry-standard attribution:
   * step 1 anchors on the user's EARLIEST step-1 event, and each later
   * step greedily matches its earliest eligible occurrence — which makes
   * the result identical to the classic per-step `min(ts)` join chain
   * (the DuckDB oracle's formulation). Note this is deliberately NOT
   * "could any event assignment complete the funnel": under a window,
   * re-anchoring on a later step-1 event might convert when the first
   * touch does not; first-touch reports the canonical-path conversion.
   *
   * Scale shape: ONE user-keyed shuffle. Events pre-filter to the
   * funnel's event types (predicate pushes to the scan), collect per
   * user as a (ts, type) list — bounded by per-user activity, never
   * corpus size — sort in-memory, and a single `aggregate` HOF walks the
   * list carrying (step, matched_ts) state. The join-chain formulation
   * shuffles the events table once per step; this does it once total.
   *
   * Returns a single row: one `n_step<i>_<name>` count per step (users
   * reaching at least that step).
   */
  def funnelReachCounts(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, steps: Seq[String],
                        maxGap: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepArr = array(steps.map(lit): _*)
    val perUser = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("__user"), col(tsCol).cast("long").as("__t"),
        col(typeCol).as("__et"))
      .groupBy(col("__user"))
      .agg(sort_array(collect_list(struct(col("__t"), col("__et")))).as("__ev"))
      .select(col("__user"),
        aggregate(col("__ev"),
          struct(lit(0).as("step"), lit(Long.MinValue).as("t")),
          (s, e) => when(
            s.getField("step") < steps.length &&
              e.getField("__et") === element_at(stepArr, s.getField("step") + 1) &&
              // step 1 anchors anywhere; later steps: strictly after the
              // previous match and inside the conversion window (the
              // step-0 guard also keeps Long.MinValue out of the
              // subtraction)
              (s.getField("step") === 0 ||
                (e.getField("__t") > s.getField("t") &&
                  e.getField("__t") - s.getField("t") <= maxGap)),
            struct((s.getField("step") + 1).as("step"), e.getField("__t").as("t")))
            .otherwise(s))
          .getField("step").as("reached"))
    val aggs = steps.zipWithIndex.map { case (name, i) =>
      sum(when(col("reached") >= i + 1, 1L).otherwise(0L)).as(s"n_step${i + 1}_$name")
    }
    perUser.agg(aggs.head, aggs.tail: _*)
  }
}
