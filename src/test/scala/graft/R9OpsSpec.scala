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
