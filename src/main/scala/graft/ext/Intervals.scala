package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval joins at scale. Spark plans a raw `pt >= lo && pt < hi`
 * join as BroadcastNestedLoop (fine for a broadcast-small interval
 * side — the registry's `q_range_join` baseline) or, shuffled, as a
 * cartesian — the 100 TB killer. The scale path is the same
 * bounded-bucket discipline as the spatial halo joins: intervals
 * explode to the integer buckets they COVER, points carry their own
 * bucket, candidates come from a bucket equi-join and only they pay
 * the exact containment test.
 *
 * Explode factor per interval = ceil(len / bucketWidth) + 1 — pick the
 * width near the typical interval length, exactly like an LSH band
 * width; a degenerate giant interval is the hot-bucket case (cap or
 * route the outliers through the broadcast baseline).
 */
object Intervals {

  /**
   * Points joined to every [lo, hi) interval containing them.
   * `intervals` keeps its columns; both sides shuffle once by bucket.
   */
  def bucketedIntervalJoin(points: DataFrame, ptCol: String,
                           intervals: DataFrame, loCol: String,
                           hiCol: String, bucketWidth: Long): DataFrame = {
    // qualified sides + improbable temp names: a reusable helper must
    // survive callers whose two inputs share column names
    val iv = intervals.withColumn("__graft_b",
      explode(sequence(expr(s"$loCol div $bucketWidth"),
        expr(s"$hiCol div $bucketWidth")))).as("__gi")
    points
      .withColumn("__graft_pb", expr(s"$ptCol div $bucketWidth")).as("__gp")
      .join(iv, col("__gp.__graft_pb") === col("__gi.__graft_b") &&
        col(s"__gp.$ptCol") >= col(s"__gi.$loCol") &&
        col(s"__gp.$ptCol") < col(s"__gi.$hiCol"))
      .drop("__graft_pb", "__graft_b")
  }
}
