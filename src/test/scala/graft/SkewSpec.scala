package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * AQE skew handling — the runtime half of the skew story (the static
 * half, key salting, is q_salted_agg). A join where half the left side
 * carries ONE hot key would pin a single reducer at cluster scale;
 * adaptive execution must detect the oversized shuffle partition at
 * runtime and split it across tasks (AQEShuffleRead "skewed" spec).
 */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the hot-key partition of a sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // thresholds scaled down so the test corpus triggers the same
      // detection a multi-GB hot partition would in production
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      val left = spark.range(200000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
          concat(lit("pad-pad-pad-pad-pad-"), $"id").as("pad"))
      val right = spark.range(500).select($"id".as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // drive THIS plan's AdaptiveSparkPlanExec to its final form (a
      // count() would build a separate QueryExecution and leave this one
      // unexecuted)
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() == 100250) // 100k hot + 250 odd < 500

      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.toLowerCase.contains("skewed"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
