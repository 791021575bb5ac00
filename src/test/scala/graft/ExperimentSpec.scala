package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the experimentation-readout / ops-audit
  * batch (each query is also DuckDB-oracle-checked through the gate;
  * these pin the statistical identities the oracle can't express,
  * including full independent Scala recomputations of the Mann-Whitney
  * U and the Holt fold). */
class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val perUserMetric: Map[Long, BigDecimal] =
    graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
      .toMap

  test("srm check: counts partition the distinct users, chi2 >= 0") {
    val rows = Queries.all("q_srm_check")(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("A", "B"))
    val total = rows.map(_.getLong(1)).sum
    assert(total == perUserMetric.size)
    rows.foreach { r =>
      assert(r.getDouble(2) == total * 0.5)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("mann-whitney matches a direct midrank recomputation") {
    val byVariant = perUserMetric.toSeq.groupBy { case (u, _) => u % 2 == 0 }
    val a = byVariant(true).map(_._2)
    val b = byVariant(false).map(_._2)
    val all = (a ++ b).sorted
    // midrank of each tied block = average of its 1-based positions
    val midrank: Map[BigDecimal, Double] = all.zipWithIndex
      .groupBy(_._1)
      .map { case (v, ps) =>
        v -> (ps.map(_._2 + 1).sum.toDouble / ps.size)
      }
    val rA = a.map(midrank).sum
    val uA = rA - a.size.toLong * (a.size + 1L) / 2.0
    val n = a.size.toLong + b.size
    val ties3 = all.groupBy(identity).values
      .map(g => g.size.toLong * g.size * g.size - g.size).sum
    val sigma = math.sqrt(a.size.toDouble * b.size / 12.0 *
      ((n + 1) - ties3.toDouble / (n.toDouble * (n - 1))))
    val z = (uA - a.size.toDouble * b.size / 2.0) / sigma
    val row = Queries.all("q_mann_whitney")(spark, dir).collect()(0)
    assert(row.getLong(0) == a.size && row.getLong(1) == b.size)
    assert(math.abs(row.getDouble(2) - uA) < 0.51, // u_stat rounds to 1 dp
      s"u_stat ${row.getDouble(2)} vs recomputed $uA")
    assert(math.abs(row.getDouble(3) - z) < 1e-5,
      s"z ${row.getDouble(3)} vs recomputed $z")
  }

  test("winsorized mean sits inside its own caps; caps are data values") {
    val vals = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_type"),
        col("value").cast("decimal(18,2)").as("v"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getDecimal(1).doubleValue).toSet).toMap
    val rows = Queries.all("q_winsorized_mean")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tpe, lo, hi, m) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(vals(tpe).contains(lo) && vals(tpe).contains(hi),
        s"$tpe caps ($lo, $hi) must be actual data values, not interpolants")
      assert(lo <= hi)
      assert(m >= lo - 1e-9 && m <= hi + 1e-9)
    }
  }

  test("delta-method ratio equals total value over total events; CI brackets it") {
    val rows = Queries.all("q_delta_ratio_ci")(spark, dir).collect()
    val byVar = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("variant"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("tot"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) ->
        (BigDecimal(r.getDecimal(1)).toDouble / r.getLong(2)))
      .toMap
    assert(rows.length == 2)
    rows.foreach { r =>
      val (v, ratio, lo, hi) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // mx/my == Σx/Σy: the ratio-of-averages identity
      assert(math.abs(ratio - byVar(v)) < 1e-5)
      assert(lo <= ratio && ratio <= hi)
    }
  }

  test("bootstrap: 32 replicates, Poisson(1) mass near n, means near observed") {
    val rows = Queries.all("q_bootstrap_mean")(spark, dir).collect()
    assert(rows.length == 32)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 32))
    val nUsers = perUserMetric.size
    val obsMean = (perUserMetric.values.sum / nUsers).toDouble
    val sd = math.sqrt(nUsers.toDouble)
    rows.foreach { r =>
      // Σ Poisson(1) over n users: mean n, sd √n — 6σ band
      assert(math.abs(r.getLong(1) - nUsers) < 6 * sd,
        s"replicate ${r.getInt(0)} n_eff ${r.getLong(1)} vs $nUsers")
    }
    val bootMeans = rows.map(_.getDouble(2))
    // the bootstrap distribution must straddle the observed mean
    assert(bootMeans.min < obsMean && obsMean < bootMeans.max)
  }

  test("holt linear matches a direct Scala fold over the hour series") {
    val series = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("hour", expr("ts div 3600000000000"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2).toDouble).toList)
      .toMap
    val rows = Queries.all("q_holt_linear")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = series(r.getString(0))
      assert(r.getLong(1) == xs.length)
      val l0 = xs(1) * 0.3 + (xs(0) + (xs(1) - xs(0))) * 0.7
      val b0 = (l0 - xs(0)) * 0.1 + (xs(1) - xs(0)) * 0.9
      val (l, b) = xs.drop(2).foldLeft((l0, b0)) { case ((l, b), x) =>
        val l2 = x * 0.3 + (l + b) * 0.7
        (l2, (l2 - l) * 0.1 + b * 0.9)
      }
      assert(math.abs(r.getDouble(2) - l) < 1e-6,
        s"${r.getString(0)} level ${r.getDouble(2)} vs $l")
      assert(math.abs(r.getDouble(3) - b) < 1e-6)
      assert(math.abs(r.getDouble(4) - (l + b)) < 2e-6)
    }
  }

  test("degree distribution: handshake identity and unit shares") {
    val rows = Queries.all("q_degree_dist")(spark, dir).collect()
    assert(rows.nonEmpty)
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("pk") % 7 === 0).distinct()
    val edges = lp.as("x").join(lp.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk"), col("y.pk")).distinct().count()
    val degreeMass = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(degreeMass == 2 * edges, s"Σ deg·n = $degreeMass vs 2|E| = ${2 * edges}")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
  }

  private lazy val hourSeries: Map[String, List[Long]] =
    graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("hour", expr("ts div 3600000000000"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toList)
      .toMap

  test("theil-sen matches a direct dyadic-lag-median recomputation") {
    val hours: Map[String, List[(Long, Long)]] =
      graft.ingest.Readers.tsToNanos(
          spark.read.parquet(s"$dir/events.parquet"))
        .withColumn("hour", expr("ts div 3600000000000"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.sortBy(_.getLong(1))
          .map(r => (r.getLong(1), r.getLong(2))).toList)
        .toMap
    val rows = Queries.all("q_theil_sen")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = hours(r.getString(0))
      // the dyadic pair set: (i, i + 2^k) for every k with the partner
      // in range — the contract the query and oracle both state
      val slopes = (for {
        k <- 0 to 29; lag = 1L << k
        i <- s.indices if i + lag < s.length
      } yield (s(i + lag.toInt)._2 - s(i)._2).toDouble /
        (s(i + lag.toInt)._1 - s(i)._1))
        .sorted.toVector
      val m = slopes.length
      assert(r.getLong(2) == m)
      val lo = slopes((m + 1) / 2 - 1)
      val hi = slopes(m / 2)
      val med = lo + (hi - lo) * 0.5
      assert(math.abs(r.getDouble(3) - med) < 1e-6,
        s"${r.getString(0)} slope ${r.getDouble(3)} vs recomputed $med")
    }
  }

  test("mann-kendall S matches a direct pairwise-sign recomputation") {
    val rows = Queries.all("q_mann_kendall")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = hourSeries(r.getString(0))
      val sStat = (for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      assert(r.getLong(2) == sStat,
        s"${r.getString(0)} S ${r.getLong(2)} vs recomputed $sStat")
      // z carries S's sign (continuity correction shrinks, never flips)
      assert(java.lang.Long.signum(sStat) == math.signum(r.getDouble(3)).toInt
        || (sStat.abs <= 1 && r.getDouble(3) == 0.0))
    }
  }

  test("node jaccard rows satisfy their own identity, ordered descending") {
    val rows = Queries.all("q_node_jaccard")(spark, dir).collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      val (c, da, db, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(c >= 1 && c <= math.min(da, db))
      val expect = c.toDouble / (da + db - c)
      assert(math.abs(j - expect) < 1e-6)
      assert(j > 0 && j <= 1)
    }
    val js = rows.map(_.getDouble(5))
    assert(js.zip(js.tail).forall { case (x, y) => x >= y },
      "top-20 must be non-increasing in jaccard")
  }

  test("cohen's d matches a direct moment recomputation; |g| < |d|") {
    val (as, bs) = perUserMetric.toSeq.partition(_._1 % 2 == 0)
    def moments(xs: Seq[BigDecimal]): (Long, Double, Double) = {
      val n = xs.length
      val m = xs.map(_.toDouble).sum / n
      val v = xs.map(x => math.pow(x.toDouble - m, 2)).sum / (n - 1)
      (n.toLong, m, v)
    }
    val (na, ma, va) = moments(as.map(_._2))
    val (nb, mb, vb) = moments(bs.map(_._2))
    val sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    val d = (ma - mb) / sp
    val row = Queries.all("q_cohen_d")(spark, dir).collect()(0)
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(math.abs(row.getDouble(2) - d) < 1e-5,
      s"cohen_d ${row.getDouble(2)} vs recomputed $d")
    assert(math.abs(row.getDouble(3)) < math.abs(row.getDouble(2)))
  }

  test("power/mde: mde is the 2.8-sigma multiple of the observed se") {
    val row = Queries.all("q_power_mde")(spark, dir).collect()(0)
    val (se, mdeAbs, mdeRel) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(se > 0 && mdeAbs > 0 && mdeRel > 0)
    assert(math.abs(mdeAbs - (1.96 + 0.8416212336) * se) < 2e-6)
  }

  test("session deciles are monotone and bracketed by the extremes") {
    val durs = Queries.all("q_session_deciles")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(durs.map(_.getLong(0)).toSeq == (1 to 9).map(_ * 10L))
    val vs = durs.map(_.getDouble(1))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    assert(vs.forall(_ >= 0))
  }

  test("gini matches a direct sorted-index recomputation") {
    val cents = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(p => (p._2, p._1)).map(_._2)
    val n = cents.length
    val sx = cents.map(BigInt(_)).sum
    val s1 = cents.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(2) * s1 - BigInt(n + 1) * sx).toDouble /
      (BigInt(n) * sx).toDouble
    val row = Queries.all("q_gini_revenue")(spark, dir).collect()(0)
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - gini) < 1e-6,
      s"gini ${row.getDouble(1)} vs recomputed $gini")
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 1)
  }

  test("seq pattern support matches a direct existence recomputation") {
    val evs = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    val nUsers = byUser.size
    def support(a: String, b: String): Long = byUser.values.count { es =>
      val as = es.filter(_._2 == a).map(_._3)
      val bs = es.filter(_._2 == b).map(_._3)
      as.nonEmpty && bs.nonEmpty && as.min < bs.max
    }
    val rows = Queries.all("q_seq_pattern_support")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    // spot-check two directed pairs plus every row's ratio identity
    for ((a, b) <- Seq(("view", "purchase"), ("purchase", "view"))
         if rows.contains((a, b))) {
      assert(rows((a, b))._1 == support(a, b), s"support($a→$b)")
    }
    rows.foreach { case (_, (cnt, sup)) =>
      assert(math.abs(sup - cnt.toDouble / nUsers) < 1e-6)
    }
  }

  test("survival curve matches a direct Kaplan-Meier fold") {
    val evs = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gm = evs.map(_._3).max
    val hourNs = 3600L * 1000000000L
    // .toSeq BEFORE flatMap: flatMapping a Map with (h, d) tuple results
    // would rebuild a Map keyed by h and silently collapse same-bucket users
    val perUser = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val fv = es.filter(_._2 == "view").map(_._3).minOption
      val fp = es.filter(_._2 == "purchase").map(_._3).minOption
      fv.flatMap { v =>
        if (fp.exists(_ < v)) None
        else Some(fp match {
          case Some(p) => ((p - v) / hourNs, 1L)
          case None    => ((gm - v) / hourNs, 0L)
        })
      }
    }.toSeq
    val buckets = perUser.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (h, xs) => (h, xs.map(_._2).sum, xs.size.toLong) }
    val n = buckets.map(_._3).sum
    var (s, cum) = (1.0, 0L)
    val expected = buckets.map { case (h, d, tot) =>
      val ar = n - cum
      s = s * (1.0 - d.toDouble / ar)
      cum += tot
      (h, ar, d, tot - d, s)
    }.map(x => x._1 -> x).toMap
    val rows = Queries.all("q_survival_curve")(spark, dir).collect()
    assert(rows.length == buckets.length)
    rows.foreach { r =>
      val e = expected(r.getLong(0))
      assert(r.getLong(1) == e._2 && r.getLong(2) == e._3 &&
        r.getLong(3) == e._4)
      assert(math.abs(r.getDouble(4) - e._5) < 1e-6,
        s"h=${r.getLong(0)} S ${r.getDouble(4)} vs ${e._5}")
    }
    // survival is non-increasing in h
    val byH = rows.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(byH.zip(byH.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("key skew audit: ratios consistent, totals match the tables") {
    val rows = Queries.all("q_key_skew_audit")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    assert(rows.keySet == Set("orders.o_custkey", "lineitem.l_partkey",
      "lineitem.l_suppkey", "events.user_id"))
    val orders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows("orders.o_custkey")._2 == orders)
    rows.values.foreach { case (nKeys, nRows, maxRows, ratio) =>
      assert(nKeys <= nRows && maxRows >= nRows / nKeys)
      assert(ratio >= 1.0 - 1e-6, s"skew ratio $ratio must be >= 1")
    }
  }

  test("partition balance: buckets partition all events, load sums to 32") {
    val rows = Queries.all("q_partition_balance")(spark, dir).collect()
    assert(rows.length <= 32 && rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 32))
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // Σ load_factor = Σ n_i/(N/32) = 32 exactly (up to rounding)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 32.0) < 1e-3)
  }

  test("dedup cluster sizes: doc mass equals the component rows, sizes >= 2") {
    val comp = Queries.all("q_dedup_components")(spark, dir).count()
    val rows = Queries.all("q_dedup_cluster_sizes")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) >= 2),
      "components come from edges, so every cluster has >= 2 docs")
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == comp)
  }

  test("sequential z-test: final cumulative day reproduces the ab_test t") {
    val seq = Queries.all("q_sequential_ztest")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(seq.nonEmpty)
    // cumulative counts are non-decreasing per arm
    val (nas, nbs) = (seq.map(_.getLong(1)), seq.map(_.getLong(2)))
    assert(nas.zip(nas.tail).forall { case (x, y) => x <= y })
    assert(nbs.zip(nbs.tail).forall { case (x, y) => x <= y })
    // the last day folds ALL events — its z IS Welch's t over the table,
    // i.e. q_ab_test's t_stat (moment-form variance vs var_samp).
    // Precondition (inner day join): both arms appear on the last day.
    val lastDay = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
    val globalLast = lastDay.agg(max(col("day"))).collect()(0).getLong(0)
    val armsOnLast = lastDay.filter(col("day") === globalLast)
      .select((col("user_id") % 2 === 0).as("a")).distinct().count()
    assume(armsOnLast == 2, "fixture must have both arms on the last day")
    val t = Queries.all("q_ab_test")(spark, dir).collect()(0).getDouble(4)
    assert(math.abs(seq.last.getDouble(3) - t) < 1e-4,
      s"final z ${seq.last.getDouble(3)} vs ab_test t $t")
  }

  test("quantile treatment effect: deciles are data values, monotone per arm") {
    val metrics = perUserMetric.toSeq
      .groupBy { case (u, _) => if (u % 2 == 0) "A" else "B" }
      .view.mapValues(_.map(_._2.toDouble).toSet).toMap
    val rows = Queries.all("q_quantile_treatment")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1 to 9).map(_ * 10L))
    rows.foreach { r =>
      assert(metrics("A").contains(r.getDouble(1)),
        s"x_a ${r.getDouble(1)} must be an arm-A metric value")
      assert(metrics("B").contains(r.getDouble(2)))
      assert(math.abs(r.getDouble(3) - (r.getDouble(1) - r.getDouble(2)))
        < 0.006) // qte rounds to 2 dp
    }
    val (xas, xbs) = (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
    assert(xas.zip(xas.tail).forall { case (x, y) => x <= y })
    assert(xbs.zip(xbs.tail).forall { case (x, y) => x <= y })
  }

  test("covariate balance matches a direct SMD recomputation") {
    val ev = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("value"), expr("ts div 3600000000000").as("hour"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val perUser = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      val pre = es.filter(_._3 < mid)
      (u, pre.length.toDouble,
        // HALF_UP mirrors Spark's double→decimal cast (HALF_EVEN would
        // diverge on any future 3-dp fixture value)
        pre.map(e => BigDecimal(e._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }
    def smd(sel: ((Long, Double, Double)) => Double): Double = {
      val (as, bs) = perUser.partition(_._1 % 2 == 0)
      def mv(xs: Seq[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => math.pow(x - m, 2)).sum / (xs.length - 1))
      }
      val (ma, va) = mv(as.map(sel)); val (mb, vb) = mv(bs.map(sel))
      (ma - mb) / math.sqrt((va + vb) * 0.5)
    }
    val rows = Queries.all("q_covariate_balance")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet == Set("pre_events", "pre_value"))
    assert(math.abs(rows("pre_events") - smd(_._2)) < 1e-5)
    assert(math.abs(rows("pre_value") - smd(_._3)) < 1e-5)
  }

  test("mad anomaly days match a direct modified-z recomputation") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) + (s(n / 2) - s(n / 2 - 1)) * 0.5
    }
    val daily = graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("day", expr("ts div 86400000000000"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
    val rows = Queries.all("q_mad_anomaly_days")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val counts = daily(tpe)
      assert(rs.length == counts.size)
      val med = median(counts.values.map(_.toDouble).toSeq)
      val mad = median(counts.values.map(v => math.abs(v - med)).toSeq)
      rs.foreach { r =>
        val n = counts(r.getLong(1))
        assert(r.getLong(2) == n)
        if (mad > 0) {
          val rz = BigDecimal(0.6745 * (n - med) / mad)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getDouble(3) - rz) < 2e-6,
            s"$tpe day ${r.getLong(1)} rz ${r.getDouble(3)} vs $rz")
          assert(r.getBoolean(4) == (math.abs(r.getDouble(3)) > 3.5))
        } else assert(r.isNullAt(3) && !r.getBoolean(4))
      }
    }
  }

  test("forecast backtest matches a direct fold; skill consistent with MAEs") {
    val rows = Queries.all("q_forecast_backtest")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = hourSeries(r.getString(0)).map(_.toDouble)
      assert(r.getLong(1) == xs.length - 2)
      var l = xs(1) * 0.3 + (xs(0) + (xs(1) - xs(0))) * 0.7
      var b = (l - xs(0)) * 0.1 + (xs(1) - xs(0)) * 0.9
      var px = xs(1); var seh = 0.0; var sen = 0.0
      xs.drop(2).foreach { x =>
        seh += math.abs(l + b - x); sen += math.abs(px - x)
        val l2 = x * 0.3 + (l + b) * 0.7
        b = (l2 - l) * 0.1 + b * 0.9; l = l2; px = x
      }
      assert(math.abs(r.getDouble(2) - seh / (xs.length - 2)) < 1e-6)
      assert(math.abs(r.getDouble(3) - sen / (xs.length - 2)) < 1e-6)
      if (sen > 0)
        assert(math.abs(r.getDouble(4) - (1 - seh / sen)) < 1e-6)
    }
  }

  test("label propagation: census matches a direct 2-round recomputation") {
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("pk") % 7 === 0).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = lp.groupBy(_._1).values
    val edges = byOrder.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val neigh = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = neigh.keySet
    val seed: Map[Long, Option[Long]] =
      nodes.map(n => n -> (if (n % 3 == 0) Some(n % 5) else None)).toMap
    def round(labels: Map[Long, Option[Long]]): Map[Long, Option[Long]] =
      nodes.map { n =>
        n -> (seed(n) match {
          case s @ Some(_) => s
          case None =>
            val votes = neigh(n).flatMap(labels(_))
              .groupBy(identity).view.mapValues(_.size).toSeq
            if (votes.isEmpty) labels(n)
            else Some(votes.minBy { case (l, c) => (-c, l) }._1)
        })
      }.toMap
    val l2 = round(round(seed))
    val expected = l2.values.toSeq.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }
    val rows = Queries.all("q_label_propagation")(spark, dir).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)))
        -> r.getLong(1)).toMap
    assert(rows == expected, s"got $rows expected $expected")
  }

  private lazy val presence: Map[Long, Set[Long]] =
    graft.ingest.Readers.tsToNanos(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().collect()
      .groupBy(_.getLong(1))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap

  test("new-vs-returning: growth accounting sums, first day all-new") {
    val rows = Queries.all("q_new_vs_returning")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == presence.size)
    rows.foreach { r =>
      assert(r.getLong(1) == presence(r.getLong(0)).size)
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
    // the earliest day has no history: everyone is new
    assert(rows.head.getLong(2) == rows.head.getLong(1))
    // Σ n_new over all days = total distinct users (each is new once)
    assert(rows.map(_.getLong(2)).sum ==
      presence.values.reduce(_ ++ _).size)
  }

  test("churn hazard: cohort mass conserved, at-risk telescopes") {
    val rows = Queries.all("q_churn_hazard")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val nUsers = presence.values.reduce(_ ++ _).size
    assert(rows.head.getLong(1) == nUsers, "week-0 at-risk = all users")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3),
          "at-risk must telescope by churned+censored")
      case _ =>
    }
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == nUsers)
    rows.foreach(r => assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1))
  }

  test("stickiness matches a direct DAU/WAU recomputation") {
    val rows = Queries.all("q_stickiness")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == presence.size)
    rows.foreach { r =>
      val d = r.getLong(0)
      val dau = presence(d).size
      val wau = (d - 6 to d).flatMap(presence.get).reduce(_ ++ _).size
      assert(r.getLong(1) == dau && r.getLong(2) == wau,
        s"day $d dau ${r.getLong(1)}/$dau wau ${r.getLong(2)}/$wau")
      assert(math.abs(r.getDouble(3) - dau.toDouble / wau) < 1e-6)
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1)
    }
  }

  test("freshness audit: newest type has zero lag, spans non-negative") {
    val rows = Queries.all("q_freshness_audit")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).min == 0L, "some type must BE the newest")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
  }
}
