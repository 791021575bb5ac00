package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** [[graft.functions.ArgMinLongAgg]] must be value-identical to
 *  `min_by(v, struct(k, v))` — including key ties (smallest value wins),
 *  -0.0 == 0.0 (Spark's SQL double ordering, NOT Double.compare), NaN
 *  greatest, and null keys/values ignored. */
class ArgMinLongSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("argmin equals min_by(v, struct(k, v)) on ties, signed zero, NaN") {
    val rows = Seq(
      // group 1: plain
      (1L, 10L, 0.5), (1L, 11L, 0.2), (1L, 12L, 0.9),
      // group 2: key tie -> smallest value
      (2L, 7L, 0.3), (2L, 3L, 0.3), (2L, 9L, 0.3),
      // group 3: -0.0 vs 0.0 must compare EQUAL -> value tiebreak
      (3L, 8L, 0.0), (3L, 2L, -0.0),
      // group 4: NaN is greatest
      (4L, 1L, Double.NaN), (4L, 5L, 99.0),
      // group 5: all NaN keys -> still a winner by value
      (5L, 6L, Double.NaN), (5L, 4L, Double.NaN))
      .toDF("g", "v", "k")
    val native = rows.groupBy(col("g"))
      .agg(GraftFunctions.graftArgMinLong(col("v"), col("k")).as("m"))
    val legacy = rows.groupBy(col("g"))
      .agg(min_by(col("v"), struct(col("k"), col("v"))).as("m"))
    assert(native.exceptAll(legacy).isEmpty && legacy.exceptAll(native).isEmpty,
      s"native=${native.collect().toSeq} legacy=${legacy.collect().toSeq}")
  }

  test("null keys and values are ignored; all-null group yields null") {
    val rows = Seq(
      (1L, Option(10L), Option(0.5)), (1L, Option(2L), None), (1L, None, Option(0.1)),
      (2L, Option(3L), None), (2L, None, None))
      .toDF("g", "v", "k")
    val out = rows.groupBy(col("g"))
      .agg(GraftFunctions.graftArgMinLong(col("v"), col("k")).as("m"))
      .orderBy(col("g")).collect()
    assert(out(0).getLong(1) === 10L) // the only row with both non-null
    assert(out(1).isNullAt(1))
  }

  test("the assign aggregate plans as ObjectHashAggregate, not SortAggregate") {
    val df = Seq((1L, 0L, 0.9), (1L, 1L, 0.8)).toDF("id", "cid", "sim")
    val agg = df.groupBy(col("id"))
      .agg(GraftFunctions.graftArgMinLong(col("cid"),
        coalesce(-col("sim"), lit(Double.PositiveInfinity))).as("cid"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
