package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.NaiveBayes

/** Multinomial NB semantics on hand-built corpora. */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("separable vocabularies classify perfectly") {
    val rows = (0 until 10).map(i => (i.toLong, "alpha beta gamma", "A")) ++
      (10 until 20).map(i => (i.toLong, "omega sigma theta", "B"))
    val out = NaiveBayes.trainAndScore(rows.toDF("doc_id", "text", "lang"),
      "text", "lang", "doc_id", buckets = 64)
    assert(out.count() == 20)
    assert(out.filter(!org.apache.spark.sql.functions.col("correct")).count() == 0)
  }

  test("priors break featureless ties toward the majority class") {
    // identical text everywhere: likelihoods equal, so the argmax is
    // decided by the log-prior (majority), label asc breaking exact ties
    val rows = (0 until 9).map(i => (i.toLong, "same words here", "big")) ++
      Seq((9L, "same words here", "small"))
    val out = NaiveBayes.trainAndScore(rows.toDF("doc_id", "text", "lang"),
      "text", "lang", "doc_id", buckets = 64)
      .select("predicted").distinct().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("big"))
  }

  test("exactly tied scores predict the lexicographically lowest label (r15 argmax)") {
    // 50/50 class balance + identical text: priors AND likelihoods are
    // exactly equal, so every doc's scores tie across labels and the
    // min_by aggregate (r15: replaced the row_number window) must
    // reproduce the window's (score desc, label asc) tie-break — the
    // lowest label, for every doc.
    val rows = (0 until 5).map(i => (i.toLong, "tie tie tie", "bbb")) ++
      (5 until 10).map(i => (i.toLong, "tie tie tie", "aaa"))
    val out = NaiveBayes.trainAndScore(rows.toDF("doc_id", "text", "lang"),
      "text", "lang", "doc_id")
      .select("predicted").distinct().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("aaa"))
  }

  test("scoring is deterministic across runs") {
    val df = (0 until 30).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 3} shared", if (i % 2 == 0) "x" else "y"))
      .toDF("doc_id", "text", "lang")
    val a = NaiveBayes.trainAndScore(df, "text", "lang", "doc_id")
      .collect().map(_.toString).sorted.toSeq
    val b = NaiveBayes.trainAndScore(df, "text", "lang", "doc_id")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
