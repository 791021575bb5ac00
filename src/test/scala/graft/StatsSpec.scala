package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Stats

/** Hand-computed pins for the distribution-statistics operators
  * ([[graft.ext.Stats]]): binned KS, mutual information, chi-squared
  * term-class association, and the one-scan column profile. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ksDrift: hand-computed CDF gap on a 5-bin grid") {
    // a: 0,1,2,3  b: 2,3,4,5 — lo=0 hi=5 width=1; CDFs diverge most at
    // bins 1-3 where F_a - F_b = 0.5
    val df = (Seq(0.0, 1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 3.0, 4.0, 5.0).map(("b", _))).toDF("g", "v")
    val r = Stats.ksDrift(df, "v", "g", "a", "b", bins = 5).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(0) == 0.5)
    assert(r(0).getLong(1) == 4L && r(0).getLong(2) == 4L)
  }

  test("ksDrift: identical groups and degenerate single-value range give 0") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(Stats.ksDrift(same, "v", "g", "a", "b").collect()(0).getDouble(0) == 0.0)
    // hi == lo: every value lands in bin 0, ks = 0 (no division blowup)
    val flat = Seq(("a", 7.0), ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    assert(Stats.ksDrift(flat, "v", "g", "a", "b").collect()(0).getDouble(0) == 0.0)
  }

  test("mutualInformation: dependent = ln 2 with NMI 1, independent = 0") {
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val d = Stats.mutualInformation(dep, "x", "y").collect()(0)
    assert(d.getDouble(0) == BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(d.getDouble(3) == 1.0) // NMI
    assert(d.getLong(4) == 4L)
    val ind = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")).toDF("x", "y")
    val i = Stats.mutualInformation(ind, "x", "y").collect()(0)
    assert(i.getDouble(0) == 0.0 && i.getDouble(3) == 0.0)
  }

  test("chiSquaredTerms: perfect class marker scores N, shared term scores 0") {
    // foo only in both X docs: A=2 B=0 C=0 D=2 -> chi2 = 4*(4)^2/16 = 4.0
    // bar in one doc of each class: AD = BC -> 0
    val df = Seq(("X", "foo bar"), ("X", "foo"), ("Y", "bar baz"), ("Y", "baz"))
      .toDF("lang", "text")
    val got = Stats.chiSquaredTerms(df, "text", "lang", k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("X", "foo")) == ((2L, 4.0)))
    assert(got(("Y", "baz")) == ((2L, 4.0)))
    assert(got(("X", "bar"))._2 == 0.0)
    assert(got(("Y", "bar"))._2 == 0.0)
    // ranks: the perfect marker outranks the shared term in both classes
    val ranks = Stats.chiSquaredTerms(df, "text", "lang", k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(4)).toMap
    assert(ranks(("X", "foo")) == 1 && ranks(("Y", "baz")) == 1)
  }

  test("equiDepthBins: 1..100 into deciles of exactly 10") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val bins = graft.ext.Stats.equiDepthBins(df, "v", k = 10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(bins.size == 10)
    bins.values.foreach { case (n, _, _) => assert(n == 10L) }
    assert(bins(1) == ((10L, 1.0, 10.0)))
    assert(bins(10) == ((10L, 91.0, 100.0)))
  }

  test("exactQuantilesScalable equals the percentile aggregate, spikes included") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // adversarial mix: a heavy equal-valued spike (the lo==hi
    // degenerate), a dense cluster (forces re-histogram rounds at tiny
    // bins), and a broad continuous tail
    val values = Seq.fill(500)(7.25) ++
      Seq.fill(300)(100.0 + rnd.nextDouble() * 1e-9) ++
      Seq.fill(700)(rnd.nextDouble() * 1e6 - 5e5)
    val df = rnd.shuffle(values).toDF("v")
    val fracs = Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val expected = df.agg(expr(
        s"percentile(v, array(${fracs.mkString(",")}))").as("q"))
      .collect()(0).getSeq[Double](0)
    // bins=8 + localLimit=32 force DEEP refinement; defaults take the
    // single-round fast path — both must agree with the exact aggregate
    for ((bins, lim) <- Seq((8, 32L), (4096, 1L << 20))) {
      val got = graft.ext.Stats.exactQuantilesScalable(df, "v", fracs,
        bins = bins, localLimit = lim)
      fracs.indices.foreach { i =>
        assert(math.abs(got(i) - expected(i)) <= math.ulp(expected(i)) * 4,
          s"frac ${fracs(i)} bins=$bins: got ${got(i)} want ${expected(i)}")
      }
    }
  }

  test("calibrationBins: bin geometry, exact means, hand-computed ECE") {
    // bins: [0,0.25) [0.25,0.5) [0.5,0.75) [0.75,1.0]; score 1.0 clamps
    // into the top bin
    val rows = Seq(
      (0.1, true), (0.2, false),          // bin 0: avg 0.15, rate 0.5
      (0.3, false), (0.4, false),         // bin 1: avg 0.35, rate 0.0
      (0.6, true),                        // bin 2: avg 0.6,  rate 1.0
      (0.8, true), (1.0, true), (0.9, false)) // bin 3: avg 0.9, rate 2/3
    val df = rows.toDF("score", "label")
    val got = Stats.calibrationBins(df, "score", "label", bins = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(0L)._1 == 2 && got(0L)._2 == 0.15 && got(0L)._3 == 0.5)
    assert(got(1L)._4 == 0.35, "bin 1 gap = |0.35 - 0.0|")
    assert(got(2L)._1 == 1 && got(2L)._4 == 0.4)
    assert(got(3L)._1 == 3 && got(3L)._3 == 0.666667)
    // ECE = (2·0.35 + 2·0.35 + 1·0.4 + 3·|0.9 − 0.666667|) / 8
    val expectedEce = math.floor((2 * 350000L + 2 * 350000L + 1 * 400000L +
      3 * 233333L).toDouble) / 1e6 / 8
    assert(math.abs(got(0L)._5 - expectedEce) < 1e-6,
      s"ece ${got(0L)._5} want ~$expectedEce")
    // the ECE column is the same corpus constant on every bin row
    assert(got.values.map(_._5).toSet.size == 1)
  }

  test("vanished-width dense cells resolve by value counts, not a raw ranking") {
    import org.apache.spark.sql.functions._
    // the subnormal regime: lo < hi but (hi - lo) / bins underflows to 0,
    // with MORE rows than localLimit — before the r10 advice fix this
    // routed the whole cell into ONE row_number() window partition; now
    // it is a ≤ bins-row per-distinct-value count. Values are the few
    // representable doubles near zero.
    val tiny = java.lang.Double.MIN_VALUE // 4.9e-324
    val values = Seq.fill(30)(0.0) ++ Seq.fill(25)(tiny * 40) ++
      Seq.fill(25)(tiny * 100)
    val rnd = new scala.util.Random(3)
    val df = rnd.shuffle(values).toDF("v")
    val fracs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val expected = df.agg(expr(
        s"percentile(v, array(${fracs.mkString(",")}))").as("q"))
      .collect()(0).getSeq[Double](0)
    // localLimit = 8 << 80 rows: the root range [0, tiny·100] has
    // width/bins == 0 immediately, so the dense arm must fire
    val got = Stats.exactQuantilesScalable(df, "v", fracs,
      bins = 4096, localLimit = 8)
    fracs.indices.foreach { i =>
      assert(got(i) == expected(i),
        s"frac ${fracs(i)}: got ${got(i)} want ${expected(i)}")
    }
    // same shape through the grouped form, beside a normal group
    val gdf = rnd.shuffle(
      values.map(("dense", _)) ++ (1 to 50).map(i => ("wide", i.toDouble)))
      .toDF("grp", "v")
    val gotG = Stats.groupedExactQuantiles(gdf, "grp", "v", fracs,
      bins = 4096, localLimit = 8).collect()
      .map(r => r.getString(0) ->
        fracs.indices.map(i => r.getDouble(i + 1))).toMap
    fracs.indices.foreach { i =>
      assert(gotG("dense")(i) == expected(i),
        s"grouped dense frac ${fracs(i)}: got ${gotG("dense")(i)} " +
          s"want ${expected(i)}")
    }
    val expWide = Stats.exactQuantilesScalable(
      gdf.filter(col("grp") === "wide"), "v", fracs,
      bins = 4096, localLimit = 8)
    fracs.indices.foreach { i =>
      assert(gotG("wide")(i) == expWide(i))
    }
  }

  test("groupedExactQuantiles equals per-group exactQuantilesScalable " +
    "and counts jobs independent of group count") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // 8 groups with per-group adversarial shapes: spikes, dense
    // clusters, broad tails — each group exercises a different
    // refinement depth, all must land the same as the sequential form
    // each group draws from its OWN seeded RNG: the 8- and 24-group
    // runs then share identical data for common shapes, so the
    // job-count comparison depends only on group count, never on a
    // shared RNG's stream position (r9 review)
    def mkRows(groups: Int) = (0 until groups).flatMap { g =>
      val gr = new scala.util.Random(g % 8)
      val base = g % 8 match {
        case 0 => Seq.fill(50)(3.0) // pure spike: lo==hi short-circuit
        case 1 => Seq.fill(40)(1.0) ++ Seq.fill(40)(2.0)
        case m => Seq.fill(120)(gr.nextDouble() * math.pow(10, m) - m)
      }
      base.map(v => (s"g$g", v))
    }
    val df = rnd.shuffle(mkRows(8)).toDF("grp", "v")
    val fracs = Seq(0.1, 0.5, 0.9)
    // tiny bins + localLimit force multi-round refinement; a job group
    // (public statusTracker API) counts the jobs each run schedules
    val sc = spark.sparkContext
    def countJobs(data: org.apache.spark.sql.DataFrame): Int = {
      val tag = s"gq-spec-${System.nanoTime()}"
      sc.setJobGroup(tag, "job-count pin")
      try Stats.groupedExactQuantiles(data, "grp", "v", fracs,
        bins = 8, localLimit = 16).collect()
      finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(tag).length
    }
    sc.setJobGroup("grouped-quantiles-spec", "result pin")
    val got =
      try Stats.groupedExactQuantiles(df, "grp", "v", fracs,
        bins = 8, localLimit = 16).collect()
      finally sc.clearJobGroup()
    val gotMap = got.map(r => r.getString(0) ->
      fracs.indices.map(i => r.getDouble(i + 1))).toMap
    assert(gotMap.keySet == (0 until 8).map(g => s"g$g").toSet)
    (0 until 8).foreach { g =>
      val expected = Stats.exactQuantilesScalable(
        df.filter(col("grp") === s"g$g"), "v", fracs,
        bins = 8, localLimit = 16)
      fracs.indices.foreach { i =>
        assert(math.abs(gotMap(s"g$g")(i) - expected(i)) <=
          math.ulp(expected(i)) * 4,
          s"group g$g frac ${fracs(i)}: got ${gotMap(s"g$g")(i)} " +
            s"want ${expected(i)}")
      }
    }
    // the one-job-graph contract: job count is bounded by refinement
    // depth (~log_bins(range)), NOT by group count — tripling the group
    // count over the SAME shapes must not grow the chain (the
    // sequential form grows linearly: ~3 jobs per extra group)
    val jobs8 = countJobs(spark.createDataFrame(mkRows(8)).toDF("grp", "v"))
    val jobs24 = countJobs(spark.createDataFrame(mkRows(24)).toDF("grp", "v"))
    assert(jobs8 > 0 && jobs24 <= jobs8 + 2,
      s"grouped quantiles ran $jobs8 jobs at 8 groups but $jobs24 at 24 — " +
        "group count is leaking into the job graph")
  }

  test("equiDepthBinsScalable matches equiDepthBins on 1..100 deciles") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val a = graft.ext.Stats.equiDepthBins(df, "v", k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val b = graft.ext.Stats.equiDepthBinsScalable(df, "v", k = 10,
        bins = 16, localLimit = 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("signedPairSum equals the brute-force pair walk across chunk boundaries") {
    // chunkSize=4 forces the series through BOTH paths: within-chunk
    // array folds and the cross-chunk cumulative-histogram terms —
    // ties, a sparse order gap, and two groups included
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L)
    val ys = Seq(7L, 7L, 1L)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong * (if (i > 5) 3L else 1L), v) // gap makes chunks uneven
    } ++ ys.zipWithIndex.map { case (v, i) => ("b", i.toLong, v) }
    val df = rows.toDF("g", "ord", "v")
    def brute(s: Seq[Long]): Long =
      (for { i <- s.indices; j <- (i + 1) until s.length }
        yield java.lang.Long.signum(s(j) - s(i)).toLong).sum
    val got = Stats.signedPairSum(df, "g", "ord", "v", chunkSize = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> brute(xs), "b" -> brute(ys)))
    // degenerate single-chunk and single-row groups
    val tiny = Seq(("c", 0L, 5L), ("c", 1L, 5L), ("d", 0L, 1L))
      .toDF("g", "ord", "v")
    val got2 = Stats.signedPairSum(tiny, "g", "ord", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("c" -> 0L, "d" -> 0L))
  }

  test("columnProfile: nulls, exact distinct, typed min/max in one scan") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (10, 'a'), (2, 'b'), (2, CAST(NULL AS STRING)), (CAST(NULL AS INT), 'c')
        |AS t(id, name)""".stripMargin)
    val rows = Stats.columnProfile(df, Seq("id", "name")).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = rows("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 1L && id.getLong(3) == 2L)
    // min/max cast AFTER aggregation: numeric order, so min is "2" not "10"
    assert(id.getString(4) == "2" && id.getString(5) == "10")
    val name = rows("name")
    assert(name.getLong(2) == 1L && name.getLong(3) == 3L)
    assert(name.getString(4) == "a" && name.getString(5) == "c")
  }
}
