package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Events

/**
 * First-touch funnel semantics ([[Events.funnelReachCounts]]) on
 * hand-built event streams: ordering, strictness, the conversion
 * window, and the first-touch (no re-anchoring) contract.
 */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def run(rows: (Long, Long, String)*): (Long, Long, Long) = {
    val df = rows.toSeq.toDF("user_id", "ts", "event_type")
    val r = Events.funnelReachCounts(df, "user_id", "event_type", "ts",
      steps, maxGap = 100L).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("in-order users convert; out-of-order do not") {
    assert(run(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // full conversion
      (2L, 10L, "b"), (2L, 20L, "a"),                 // b before a: stops at a
      (3L, 10L, "a"),                                 // a only
      (4L, 10L, "c")                                  // never enters
    ) == ((3L, 1L, 1L)))
  }

  test("equal timestamps do not advance (strictly-after contract)") {
    assert(run((1L, 10L, "a"), (1L, 10L, "b")) == ((1L, 0L, 0L)))
  }

  test("conversion window gates each step independently") {
    assert(run(
      (1L, 0L, "a"), (1L, 100L, "b"), (1L, 201L, "c"), // c is 101 after b: cut
      (2L, 0L, "a"), (2L, 100L, "b"), (2L, 200L, "c")  // exactly at the gap: in
    ) == ((2L, 2L, 1L)))
  }

  test("first-touch anchors on the earliest step-1 even when re-anchoring would convert") {
    // a@0 (anchor) -> no b within 100; the a@500/b@550 path would
    // convert, but first-touch deliberately reports the canonical path.
    assert(run(
      (1L, 0L, "a"), (1L, 500L, "a"), (1L, 550L, "b")
    ) == ((1L, 0L, 0L)))
  }

  test("later step events before the anchor are ignored, not consumed") {
    assert(run(
      (1L, 5L, "b"), (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c")
    ) == ((1L, 1L, 1L)))
  }

  private def retention(maxOffset: Int, rows: (Long, Long)*): Set[(Long, Long, Long)] = {
    val df = rows.toSeq.toDF("user_id", "ts")
    Events.cohortRetention(df, "user_id", "ts", bucketSize = 10L, maxOffset)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("cohort retention: first active bucket anchors the cohort") {
    // u1 first seen in bucket 0, active again in 1 and 2; u2 first seen
    // in bucket 1, active again in 2; duplicate events in one bucket
    // count the user once.
    assert(retention(8,
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 25L),
      (2L, 10L), (2L, 20L), (2L, 21L)
    ) == Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
             (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("cohort retention: maxOffset truncates the triangle; gaps are absent not zero") {
    // u1 active in buckets 0 and 5: offset 5 exceeds maxOffset 3, so
    // only the (0,0) cell remains; the skipped buckets produce no rows.
    assert(retention(3, (1L, 0L), (1L, 50L)) == Set((0L, 0L, 1L)))
  }
}
