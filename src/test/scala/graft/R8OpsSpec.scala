package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8 query batch (each is also
  * DuckDB-oracle-checked through the gate; these pin the properties the
  * oracle can't express). */
class R8OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pagerank conserves probability mass (no dangling nodes)") {
    val pr = Queries.all("q_pagerank_parts")(spark, dir).collect()
    val total = pr.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-5,
      s"pagerank mass $total drifted from 1 — dangling mass is leaking")
    assert(pr.forall(_.getDouble(1) > 0))
  }

  test("touch attribution credits every purchase exactly once per model") {
    import org.apache.spark.sql.functions._
    val events = graft.ingest.Readers.tsToNanos(
      spark.read.parquet(s"$dir/events.parquet"))
    val purchases = events.filter(col("event_type") === "purchase").count()
    val att = Queries.all("q_touch_attribution")(spark, dir).collect()
    val byModel = att.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byModel("first") == purchases && byModel("last") == purchases)
    // a purchase can never be its own touch
    assert(att.forall(_.getString(1) != "purchase"))
  }

  test("cusum changepoint lies inside each series' hour range") {
    import org.apache.spark.sql.functions._
    val events = graft.ingest.Readers.tsToNanos(
      spark.read.parquet(s"$dir/events.parquet"))
    val range = events.agg(
        min(expr("ts div 3600000000000")), max(expr("ts div 3600000000000")))
      .collect()(0)
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    val cps = Queries.all("q_cusum_changepoint")(spark, dir).collect()
    assert(cps.nonEmpty)
    cps.foreach { r =>
      assert(r.getLong(1) >= lo && r.getLong(1) <= hi)
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("seasonal profile shares sum to 1 per event type") {
    val rows = Queries.all("q_seasonal_profile")(spark, dir).collect()
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val s = rs.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-3, s"$tpe shares sum to $s")
    }
  }

  test("fk orphan fractions reflect the simulated partial dimensions") {
    val rows = Queries.all("q_fk_orphans")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set("orders->customer", "lineitem->orders",
      "lineitem->part"))
    rows.values.foreach { case (children, orphans, frac) =>
      assert(children > 0 && orphans > 0 && orphans < children)
      assert(math.abs(frac - orphans.toDouble / children) < 1e-5)
    }
  }
}
