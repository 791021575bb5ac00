package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approximate-aggregation sketches (q_approx_agg is rows-only — no
  * DuckDB sketch equivalent) pinned against the exact aggregates: HLL++
  * within its published relative-error envelope, the quantile sketch
  * within its rank-error bound. */
class ApproxAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per group") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val joined = Queries.all("q_approx_agg")(spark, dir)
      .join(li.groupBy($"l_returnflag").agg(
        countDistinct($"l_partkey").as("exact_parts"),
        countDistinct($"l_suppkey").as("exact_supps")), "l_returnflag")
      .select($"approx_parts", $"exact_parts", $"approx_supps", $"exact_supps")
      .as[(Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    for ((ap, ep, as_, es) <- joined) {
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es < 0.05, s"supps: $as_ vs $es")
    }
  }

  test("q_approx_agg_md5 twin: HLL estimate and sampled median inside " +
    "their error envelopes vs the exact aggregates") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = Queries.all("q_approx_agg_md5")(spark, dir)
      .join(li.groupBy($"l_returnflag").agg(
        countDistinct($"l_partkey").as("exact_parts"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median")),
        "l_returnflag")
      .select($"hll_parts_est", $"exact_parts", $"sample_n",
        $"sample_median_price", $"exact_median")
      .as[(Double, Long, Long, Double, Double)].collect()
    assert(rows.length == 3)
    for ((est, exact, n, med, exactMed) <- rows) {
      // m=64 raw HLL: standard error 1.04/sqrt(64) = 13%; allow 3 sigma
      assert(math.abs(est - exact) / exact < 0.39, s"hll: $est vs $exact")
      // ~1/16 sample of ~20k rows per flag
      assert(n > 500, s"sample unexpectedly small: $n")
      // sampled median of ~1.2k points: generous 10% envelope
      assert(math.abs(med - exactMed) / exactMed < 0.10,
        s"median: $med vs $exactMed")
    }
  }

  test("percentile_approx within the sketch's rank-error bound of the exact median") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // rank error <= 1/accuracy = 0.1% of the group: compare against the
    // exact values at ranks 0.5 +- 0.002 (double the bound for safety)
    val rows = Queries.all("q_approx_agg")(spark, dir)
      .join(li.groupBy($"l_returnflag").agg(
        expr("percentile(l_extendedprice, 0.498)").as("lo"),
        expr("percentile(l_extendedprice, 0.502)").as("hi")), "l_returnflag")
      .select($"approx_median_price", $"lo", $"hi")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((m, lo, hi) <- rows)
      assert(m >= lo && m <= hi, s"median $m outside [$lo, $hi]")
  }
}
