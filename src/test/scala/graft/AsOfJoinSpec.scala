package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/**
 * As-of join operator ([[graft.plans.AsOfJoin]] lowered via
 * [[graft.plans.LowerAsOfJoin]]): semantics pinned against hand-computed
 * expectations on adversarial in-memory data, against an independent SQL
 * window formulation on the events table, and plan-shape (ONE hash
 * exchange, no nested-loop pair blowup).
 */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  import spark.implicits._

  private def leftDf = Seq(
    // (key, ltime, lval)
    ("a", 10L, "L1"), // matches r@10 (>= semantics: equal time matches)
    ("a", 15L, "L2"), // matches r@12
    ("a", 5L, "L3"),  // skips r@10/r@12 (future), matches r@2
    ("b", 100L, "L4"), // ties at r@100: tieBreak picks larger tb
    ("c", 7L, "L5")   // key with no right rows at all
  ).toDF("k", "lt", "lv")

  private def rightDf = Seq(
    // (key, rtime, tb, payload, maybe-null col)
    ("a", 10L, 1L, "R10", Option("x")),
    ("a", 12L, 1L, "R12", None), // newest match for L2 carries a NULL cell
    ("a", 2L, 1L, "R2", Option("old")),
    ("b", 100L, 1L, "T1", Option("t1")),
    ("b", 100L, 2L, "T2", Option("t2")),
    ("b", 90L, 9L, "OLD", Option("old"))
  ).toDF("rk", "rt", "tb", "pay", "opt")

  test("as-of semantics: >= match, no-match nulls, tieBreak max wins") {
    val got = AsOf.joinAsOf(leftDf, rightDf, "lt", "rt", Seq("k" -> "rk"),
        tieBreak = Some("tb"))
      .select("k", "lt", "lv", "rt", "tb", "pay", "opt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getString(5), r.getString(6))).toSet
    assert(got === Set(
      ("a", 10L, "L1", 10L, 1L, "R10", "x"),
      ("a", 15L, "L2", 12L, 1L, "R12", null),
      ("a", 5L, "L3", 2L, 1L, "R2", "old"),
      ("b", 100L, "L4", 100L, 2L, "T2", "t2"),
      ("c", 7L, "L5", -1L, -1L, null, null)))
  }

  test("matched right columns come from ONE row (null cell not spliced over)") {
    // L2's match is R12 whose `opt` is NULL; a per-column last(ignoreNulls)
    // would wrongly backfill opt='x' from the older R10 row.
    val r = AsOf.joinAsOf(leftDf, rightDf, "lt", "rt", Seq("k" -> "rk"))
      .filter($"lv" === "L2").select("pay", "opt").collect().head
    assert(r.getString(0) === "R12" && r.isNullAt(1))
  }

  test("null right times and null keys never match (ASOF equality semantics)") {
    val l = Seq(("a", 10L, "L1"), (null.asInstanceOf[String], 10L, "LN"))
      .toDF("k", "lt", "lv")
    val r = Seq(
      ("a", Option.empty[Long], 1L, "NULLTIME", Option("x")), // rt null: unmatched
      (null.asInstanceOf[String], Option(5L), 1L, "NULLKEY", Option("y")))
      .toDF("rk", "rt", "tb", "pay", "opt")
    val got = AsOf.joinAsOf(l, r, "lt", "rt", Seq("k" -> "rk"))
      .select("lv", "pay").collect()
      .map(row => row.getString(0) -> row.getString(1)).toMap
    // the only right rows have a null time or a null key — nothing matches,
    // and the null-key LEFT row must not pair with the null-key right row
    assert(got == Map("L1" -> null, "LN" -> null))
  }

  test("self as-of join: shared exprIds are deduplicated, no ambiguity") {
    val ev = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L))
      .toDF("k", "t", "id")
    // same DataFrame on both sides: each event matched to itself or the
    // latest event at-or-before it (here: itself, since times are equal)
    val got = AsOf.joinAsOf(ev, ev.withColumnRenamed("k", "rk")
          .withColumnRenamed("t", "rt").withColumnRenamed("id", "rid"),
        "t", "rt", Seq("k" -> "rk"))
      .select("id", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // the raw self-join path (no renames) must also resolve cleanly
    val self = AsOf.joinAsOf(ev, ev, "t", "t", Seq("k" -> "k"))
    assert(self.columns.length == 6 && self.count() == 3)
  }

  test("key type mismatch fails fast at construction") {
    val l = Seq((1, 10L)).toDF("k", "lt")
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(l, r, "lt", "rt", Seq("k" -> "rk"))
    }
    assert(e.getMessage.contains("key type mismatch"))
  }

  test("events as-of join matches an independent SQL window formulation") {
    val ev = graft.ingest.Readers.tsToNanos(
      spark.read.parquet(s"$dir/events.parquet"))
    ev.createOrReplaceTempView("ev_asof")
    // Independent formulation: max_by over the pair join (quadratic but
    // exact at this SF) — purchases joined to all earlier-or-equal views.
    val expected = spark.sql(
      """SELECT p.user_id, p.event_id AS purchase_id,
        |       max_by(v.event_id, struct(v.ts, v.event_id)) AS view_id
        |FROM (SELECT * FROM ev_asof WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM ev_asof WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |GROUP BY p.user_id, p.event_id""".stripMargin)
    val got = Queries.all("q_asof_join")(spark, dir)
      .select("user_id", "purchase_id", "view_id")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("plan: one hash exchange on the key, no nested-loop/cartesian join") {
    val p = Queries.all("q_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).length == 1)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("Window"))
  }
}
