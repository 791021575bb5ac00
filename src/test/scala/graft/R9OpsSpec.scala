package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-9 query batch (each is also
  * DuckDB-oracle-checked through the gate; these pin the properties the
  * oracle can't express — the KMV estimator arm needs cardinality above
  * k, which the 31-word synthetic vocab never reaches, and the STL
  * identities hold by algebra, not by comparison). */
class R9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("KMV estimator arm: union/jaccard estimates inside the k=256 " +
    "error envelope on above-k cardinalities") {
    // two sources with 3000/2500 distinct words, 1000 shared:
    // union = 4500, jaccard = 1000/4500
    val a = (0 until 3000).map(i => ("sa", s"w$i"))
    val b = (2000 until 4500).map(i => ("sb", s"w$i"))
    val docs = (a ++ b).groupBy(_._1).toSeq.map { case (s0, ws) =>
      (0L, ws.map(_._2).mkString(" "), "en", s0, 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-kmv")
    try {
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = Queries.all("q_kmv_set_ops")(spark, tmp.toString).collect()
      assert(r.length == 1)
      val row = r(0)
      assert(row.getLong(2) == 256L, "sketch must be full at this cardinality")
      val estU = row.getDouble(3)
      val estJ = row.getDouble(4)
      val estI = row.getDouble(5)
      // k=256 KMV: relative SE ~ 1/sqrt(k-2) ~ 6.3%; allow 3 sigma
      assert(math.abs(estU - 4500.0) / 4500.0 < 0.19, s"union est $estU")
      val exactJ = 1000.0 / 4500.0
      // matches/k is Binomial(k, J): SE = sqrt(J(1-J)/k) ~ 0.026; 4 sigma
      assert(math.abs(estJ - exactJ) < 0.11, s"jaccard est $estJ vs $exactJ")
      assert(math.abs(estI - 1000.0) / 1000.0 < 0.35, s"intersection est $estI")
    } finally graft.util.Fs.deleteRecursively(tmp)
  }

  test("STL decomposition: trend + seasonal + remainder reconstructs n, " +
    "and the remainder is zero-mean within every (type, hour-of-day) cell") {
    val rows = Queries.all("q_stl_decompose")(spark, dir).collect()
    assert(rows.nonEmpty, "vacuous: no interior hours at this sf")
    rows.foreach { r =>
      val n = r.getLong(2).toDouble
      val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      // identity holds exactly in the unrounded algebra; each component
      // is rounded to 6 decimals, so the sum drifts at most 1.5e-6
      assert(math.abs(recon - n) <= 2e-6,
        s"reconstruction $recon != $n at ${r.getString(0)}/${r.getLong(1)}")
    }
    // seasonal is the MEAN of the detrended series per (type, hod), so
    // the remainder must average to 0 in every cell (rounding-bounded)
    rows.groupBy(r => (r.getString(0), r.getLong(1) % 24)).foreach {
      case (cell, rs) =>
        val meanRem = rs.map(_.getDouble(5)).sum / rs.length
        assert(math.abs(meanRem) <= 2e-6, s"remainder mean $meanRem in $cell")
    }
  }

  test("HLL merge is lossless and linear attribution conserves credit mass") {
    val hll = Queries.all("q_hll_merge_daily")(spark, dir).collect()
    assert(hll.length == 1 && hll(0).getBoolean(2),
      s"daily-register merge diverged from direct: ${hll(0)}")

    // conservation: summed credited conversions == purchase count, and
    // summed credited value == exact purchase value (each purchase
    // distributes exactly 1.0 of itself across its channels)
    val att = Queries.all("q_linear_attribution")(spark, dir).collect()
    val events = graft.ingest.Readers.tsToNanos(
      spark.read.parquet(s"$dir/events.parquet"))
      .filter(col("event_type") === "purchase")
    val purchases = events.count()
    val value = events
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    val creditedC = att.map(_.getDouble(1)).sum
    val creditedV = att.map(_.getDouble(2)).sum
    assert(math.abs(creditedC - purchases) < 1e-3,
      s"conversion credit $creditedC != $purchases purchases")
    assert(math.abs(creditedV - value) < 0.05 * att.length,
      s"value credit $creditedV != $value")
  }

  test("market share sums to 1 within every order year") {
    val rows = Queries.all("q_market_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (year, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4, s"year $year shares sum to $total")
    }
  }

  test("peak concurrency equals a direct global sweep, covers every " +
    "spanned day, and never understates the carry") {
    val got = Queries.all("q_peak_concurrency")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // direct recomputation: one global in-memory sweep over session
    // endpoints (starts before ends at equal t), tracking the running
    // level and each day's max INCLUDING the level carried in
    val dayNs = 86400L * 1000000000L
    val gapNs = 1800L * 1000000000L
    val events = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val sessions = events.groupBy(_._1).values.flatMap { evs =>
      val ts = evs.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = ts.head; var last = ts.head
      for (t <- ts.tail) {
        if (t - last > gapNs) { out += ((start, last)); start = t }
        last = t
      }
      out += ((start, last)); out
    }.toSeq
    val endpoints = sessions.flatMap { case (a, b) => Seq((a, 1), (b, -1)) }
      .sortBy { case (t, d) => (t, -d) }
    var level = 0L
    val dayPeaks = scala.collection.mutable.Map[Long, Long]()
    val d0 = endpoints.map(_._1 / dayNs).min
    val d1 = endpoints.map(_._1 / dayNs).max
    var prevDay = d0
    for ((t, d) <- endpoints) {
      val day = t / dayNs
      // days crossed without endpoints hold the carried level
      ((prevDay + 1) until day).foreach(dd =>
        dayPeaks(dd) = math.max(dayPeaks.getOrElse(dd, 0L), level))
      dayPeaks(day) = math.max(dayPeaks.getOrElse(day, level), level)
      level += d
      dayPeaks(day) = math.max(dayPeaks(day), level)
      prevDay = math.max(prevDay, day)
    }
    val expected = (d0 to d1).map(dd =>
      dd -> dayPeaks.getOrElse(dd, 0L)).toMap
    assert(got == expected,
      s"sweep divergence: ${(got.toSet -- expected.toSet).take(3)} vs " +
        s"${(expected.toSet -- got.toSet).take(3)}")
  }

  test("cohort LTV conserves purchase mass and is monotone per cohort") {
    val rows = Queries.all("q_cohort_ltv")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // last-week cumulative per cohort sums to total purchase revenue
    val lastCum = rows.groupBy(_._1).values.map(_.maxBy(_._2)._4).sum
    val total = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")))
      .collect()(0).getLong(0) / 1e2
    assert(math.abs(lastCum - total) < 1e-6 * total,
      s"LTV mass $lastCum != purchases $total")
    rows.groupBy(_._1).values.foreach { c =>
      val sorted = c.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => b >= a },
        "cumulative revenue must be monotone")
    }
  }

  test("amount reconciliation partitions every order; curve and filter " +
    "matrix are structurally complete") {
    val rec = Queries.all("q_amount_reconciliation")(spark, dir).collect()
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rec.map(_.getLong(1)).sum == nOrders)
    rec.foreach(r => assert(r.getLong(2) <= r.getLong(1)))

    val curve = Queries.all("q_dedup_threshold_curve")(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.length == 3, "every threshold must appear, even at zero")
    // monotone non-increasing in the cut
    assert(curve.zip(curve.tail).forall { case (a, b) =>
      b._2 <= a._2 && b._3 <= a._3 })

    val m = Queries.all("q_filter_overlap")(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(0)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(m.size == 10, s"4 filters -> 10 matrix rows, got ${m.size}")
    m.foreach { case ((a, b), (na, nb, both, j)) =>
      assert(both <= math.min(na, nb))
      if (a == b) assert(both == na && (j == 1.0 || na == 0L))
    }
  }

  test("seasonality strength matches variances recomputed from the STL rows") {
    val strength = Queries.all("q_seasonality_strength")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(strength.nonEmpty)
    // independent recomputation from the decomposition output itself:
    // detrended = n - trend, remainder column directly
    val stl = Queries.all("q_stl_decompose")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2).toDouble - r.getDouble(3),
        r.getDouble(5)))
    stl.groupBy(_._1).foreach { case (tpe, rows) =>
      def popVar(xs: Seq[Double]): Double = {
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / xs.length
      }
      val vd = popVar(rows.map(_._2).toSeq)
      val vr = popVar(rows.map(_._3).toSeq)
      val (gotVd, gotVr, gotS) = strength(tpe)
      assert(math.abs(gotVd - vd) < 1e-3, s"$tpe var_d $gotVd vs $vd")
      assert(math.abs(gotVr - vr) < 1e-3, s"$tpe var_r $gotVr vs $vr")
      assert(gotS >= 0.0 && gotS <= 1.0)
      assert(gotVr <= gotVd + 1e-9,
        "removing the seasonal mean can only shrink variance")
      val expS = math.max(0.0, 1.0 - vr / vd)
      assert(math.abs(gotS - expS) < 1e-3, s"$tpe strength $gotS vs $expS")
    }
  }

  test("TPC-H Q3/Q5: revenue definitions agree with a direct recomputation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    // Q3: the top row's revenue equals the directly-filtered decimal sum
    val q3 = Queries.all("q_tpch_q3")(spark, dir).collect()
    assert(q3.length <= 10 && q3.nonEmpty)
    val top = q3.maxBy(_.getDouble(3))
    val direct = li
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp") &&
        col("l_orderkey") === top.getLong(0))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double")).collect()(0).getDouble(0)
    assert(top.getDouble(3) == direct)
    // Q5: every returned nation is in ASIA, and lineitem counts match a
    // direct join recomputation
    val q5 = Queries.all("q_tpch_q5")(spark, dir).collect()
    assert(q5.nonEmpty)
    val asiaNations = spark.read.parquet(s"$dir/nation.parquet")
      .join(spark.read.parquet(s"$dir/region.parquet")
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").as[String].collect().toSet
    assert(q5.map(_.getString(0)).toSet.subsetOf(asiaNations))
    val directCount = li
      .join(ord.filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$dir/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(spark.read.parquet(s"$dir/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(asiaNations.toSeq: _*))
      .count()
    assert(q5.map(_.getLong(2)).sum == directCount)
  }
}
