package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sampling

/** Deterministic weighted sampling ([[graft.ext.Sampling]]): selection
  * bias, determinism, and the mixture-rate arithmetic. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("priority sample is deterministic and weight-biased") {
    // 200 light rows (w=1) vs 200 heavy rows (w=1000): the top-50 by
    // priority = w/u must be dominated by heavy rows, and two runs agree.
    val df = ((1L to 200L).map(i => (i, 1L)) ++ (201L to 400L).map(i => (i, 1000L)))
      .toDF("id", "w")
    val a = Sampling.prioritySample(df, "id", col("w"), k = 50).collect()
    val b = Sampling.prioritySample(df, "id", col("w"), k = 50).collect()
    assert(a.toSeq == b.toSeq)
    val heavy = a.count(_.getLong(0) > 200L)
    assert(heavy >= 45, s"expected heavy-weight dominance, got $heavy/50")
    // priority = w/u with u in (0,1] can never fall below the weight
    assert(a.forall(r => r.getDouble(2) >= r.getDouble(1)))
  }

  test("quality cap keeps the top-cap per group with id tie-break") {
    // group g1: scores 5,5,3,1 with a tie at 5 — cap 2 keeps ids 1,2
    // (tie breaks on id asc); group g2 has fewer rows than the cap
    val df = Seq(
      ("g1", 2L, 5.0), ("g1", 1L, 5.0), ("g1", 3L, 3.0), ("g1", 4L, 1.0),
      ("g2", 9L, 7.0)).toDF("source", "doc_id", "q")
    val got = Sampling.qualityCap(df, "source", "doc_id", col("q"), cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).sorted
    assert(got.toSeq == Seq(("g1", 1L, 1), ("g1", 2L, 2), ("g2", 9L, 1)))
    // quality_score column carries the score expression's value
    val scores = Sampling.qualityCap(df, "source", "doc_id", col("q") * 2, cap = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(scores(9L) == 14.0)
  }

  test("mixture sample hits rates in (0,1] and respects group totals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sampling.mixtureSample(docs, "lang", "n_chars", "doc_id",
      Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15),
      budgetFrac = 0.6).collect()
    val totals = docs.groupBy("lang").agg(sum("n_chars").as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty && got.length <= totals.size)
    got.foreach { r =>
      val (lang, rate, n, chars) =
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(rate > 0.0 && rate <= 1.0, s"$lang rate=$rate")
      assert(n <= totals(lang)._2 && chars <= totals(lang)._1, s"$lang over total")
      // kept fraction should be in the neighborhood of the rate
      val frac = n.toDouble / totals(lang)._2
      assert(math.abs(frac - rate) < 0.35, s"$lang frac=$frac rate=$rate")
    }
  }

  test("a group smaller than its allocation is kept whole (rate capped at 1)") {
    val df = ((1L to 5L).map(i => (i, "tiny", 10L)) ++
      (6L to 500L).map(i => (i, "big", 1000L))).toDF("id", "g", "sz")
    val got = Sampling.mixtureSample(df, "g", "sz", "id",
      Map("tiny" -> 0.5, "big" -> 0.5), budgetFrac = 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got("tiny")._1 == 1.0, "tiny group's allocation exceeds its size → rate 1")
    assert(got("tiny")._2 == 5L, "rate 1 keeps every row")
    assert(got("big")._1 < 1.0)
  }

  test("group sample: exact min(k, |group|) per group, deterministic, salt-sensitive") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 15
    val a = Sampling.groupSample(docs, "lang", "doc_id", k).collect()
    val b = Sampling.groupSample(docs, "lang", "doc_id", k).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSet ==
      b.map(r => (r.getString(0), r.getLong(1))).toSet, "two runs agree")
    val perGroup = a.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    sizes.foreach { case (lang, n) =>
      assert(perGroup.getOrElse(lang, 0) == math.min(k.toLong, n).toInt, s"$lang")
    }
    val other = Sampling.groupSample(docs, "lang", "doc_id", k, salt = "gs2:")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(other != a.map(r => (r.getString(0), r.getLong(1))).toSet,
      "a different salt draws a different sample")
  }

  test("budget fill: kept mass reaches the budget, minus the threshold bucket it doesn't") {
    // group A: quality buckets 0.9/0.7/0.5 of 100 chars each, budget
    // 0.5*300=150 → keeps 0.9 (cum_before 0) and 0.7 (cum_before 100),
    // stops at 0.5 (cum_before 200 ≥ 150)
    val df = (
      (1L to 10L).map(i => (i, "A", 10L, 0.9)) ++
      (11L to 20L).map(i => (i, "A", 10L, 0.7)) ++
      (21L to 30L).map(i => (i, "A", 10L, 0.5)) ++
      // group B: one bucket bigger than the budget — still kept whole
      // (first bucket always has cum_before 0 < budget)
      (31L to 40L).map(i => (i, "B", 10L, 0.3))
    ).toDF("id", "g", "sz", "q")
    val got = Sampling.budgetFill(df, "g", "sz", col("q"), budgetFrac = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("A") == ((0.7, 20L, 200L)), s"got ${got("A")}")
    assert(got("B") == ((0.3, 10L, 100L)), "an over-budget first bucket is kept whole")
  }

  test("budget fill on real docs: per-group invariants hold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val frac = 0.5
    val got = Sampling.budgetFill(docs, "lang", "n_chars",
      graft.ext.TextAnalysis.qualityScore(col("text")), frac).collect()
    val totals = docs.groupBy("lang").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val (lang, thr, n, kept) =
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      val budget = frac * totals(lang)
      assert(n > 0 && kept <= totals(lang), s"$lang kept=$kept over total")
      // bucket-granular fill: either everything was kept, or the kept
      // mass reached the budget (the bucket that crosses is kept)
      assert(kept == totals(lang) || kept.toDouble >= budget,
        s"$lang kept=$kept budget=$budget")
      // the threshold is an attained quality value
      assert(thr >= 0.0 && thr <= 1.0, s"$lang threshold=$thr")
    }
  }

  test("dsir weights rank in-domain vocabulary above out-of-domain") {
    import spark.implicits._
    // target docs speak vocabulary A, background docs vocabulary B; a
    // held-out A-doc must outscore a held-out B-doc per token
    val rows = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta", true)) ++
      (20 until 40).map(i => (i.toLong, "omega sigma theta kappa", false)) ++
      Seq((100L, "alpha beta alpha gamma", false), (101L, "omega sigma omega theta", false))
    val df = rows.toDF("doc_id", "text", "is_t")
    val w = Sampling.dsirWeights(df, "text", "doc_id", col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(101L), s"in-domain ${w(100L)} !> out-of-domain ${w(101L)}")
    // weights are per-token sums: every target doc scores positive,
    // every pure-background doc negative
    assert(w(0L) > 0 && w(20L) < 0)
    // determinism: a re-run reproduces the identical weights
    val w2 = Sampling.dsirWeights(df, "text", "doc_id", col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w == w2)
  }
}
