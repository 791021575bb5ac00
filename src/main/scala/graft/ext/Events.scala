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

  /**
   * Cohort retention: bucket time into `bucketSize`-unit periods (same
   * unit as `tsCol`; a week of nanos for the events table), assign each
   * user to the cohort of their FIRST active bucket, and count distinct
   * users active again `offset` buckets later — the classic retention
   * triangle (cohort × offset → users).
   *
   * Scale shape: events collapse to distinct (user, bucket) FIRST — the
   * only corpus-wide pass, map-side combined; the cohort min and the
   * final (cohort, offset) counts operate on that activity table, whose
   * size is users × active-buckets, orders of magnitude below the event
   * count. `count(*)` suffices for distinct users because (user, bucket)
   * rows are already distinct.
   */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketSize: Long, maxOffset: Int): DataFrame = {
    val act = events
      .select(col(userCol).as("__user"),
        expr(s"CAST($tsCol AS BIGINT) div $bucketSize").as("__b"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__user"))
    act
      .withColumn("cohort_bucket", min(col("__b")).over(w))
      .withColumn("bucket_offset", col("__b") - col("cohort_bucket"))
      .filter(col("bucket_offset") <= maxOffset)
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * First-order Markov transition matrix of the per-user event-type
   * journey: (prev_type → type) bigram counts and row-normalized
   * transition probabilities. One user-keyed window (the lag) and one
   * type-pair aggregate; the probability normalizer is a window over
   * the (prev_type)-grouped counts — state ∝ |type|², tiny. The
   * product-analytics "user journey" op, and the behavioral twin of
   * the text bigram LM in [[LanguageModel]].
   */
  def typeTransitions(events: DataFrame, userCol: String, tsCol: String,
                      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy(col("prev_type"))
    pairs.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(wRow), 6))
  }
}
