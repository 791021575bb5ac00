package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.LanguageModel

/** Hand-computed cases for the bigram LM scorer (the q_lm_score oracle
  * pins the full-corpus algebra; this pins the smoothing semantics a
  * self-scored corpus never exercises). */
class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val train = Seq("a b", "a b", "a c").toDF("text")

  // model: c("a b")=2, c("a c")=1, c1(a)=3, V={a,b,c}=3, α=1

  test("in-vocabulary doc scores ln P(b|a) = ln((2+1)/(3+3))") {
    val got = LanguageModel.score(
      Seq((1L, "a b")).toDF("doc_id", "text"), "text", "doc_id", train, "text")
      .as[(Long, Long, Double)].collect().map { case (id, n, s) => id -> (n, s) }.toMap
    assert(got(1L)._1 == 1L)
    assert(got(1L)._2 == BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unseen bigrams SMOOTH to alpha/(c1+alpha*V) instead of dropping") {
    val got = LanguageModel.score(
      Seq((1L, "z z"), (2L, "a z")).toDF("doc_id", "text"), "text", "doc_id", train, "text")
      .as[(Long, Long, Double)].collect().map { case (id, n, s) => id -> (n, s) }.toMap
    // wholly unseen history: P = 1/V = 1/3
    assert(got(1L) == ((1L, BigDecimal(math.log(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // seen history 'a', unseen bigram "a z": P = (0+1)/(3+3)
    assert(got(2L) == ((1L, BigDecimal(math.log(1.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("repeated common bigrams outscore rare ones; <2-word docs drop out") {
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "a"), (4L, "")).toDF("doc_id", "text")
    val got = LanguageModel.score(docs, "text", "doc_id", train, "text")
      .as[(Long, Long, Double)].collect().map { case (id, n, s) => id -> (n, s) }.toMap
    assert(!got.contains(3L) && !got.contains(4L), "no-bigram docs carry no LM signal")
    assert(got(1L)._1 == 3L) // "a b","b a","a b" — with multiplicity
    assert(got(1L)._2 > got(2L)._2, "common-bigram doc must outscore the rare one")
  }

  test("PMI: an exclusive pair outranks an independent one; minCount filters") {
    // 'x y' always co-occur (5×); 'a' and 'b' occur often but never
    // attached to each other more than chance: pmi(x y) must rank first.
    val docs = Seq.tabulate(5)(i => (i.toLong, "x y a b a b a c b c"))
      .toDF("doc_id", "text")
    val got = LanguageModel.pmiCollocations(docs, "text", minCount = 5L, k = 10)
      .as[(String, Long, Double)].collect()
    assert(got.head._1 == "x y")
    assert(got.map(_._2).forall(_ >= 5L), "minCount gate")
    val pmis = got.map(_._3).toSeq
    assert(pmis == pmis.sorted.reverse, "ordered by pmi desc")
    // independence baseline: 'a b' occurs but near/below pmi 0 relative
    // to 'x y' (which is maximally associated)
    val byGram = got.map(g => g._1 -> g._3).toMap
    assert(byGram("x y") > byGram("a b"))
  }

  test("model broadcast is bounded by default: over-budget model auto-prunes to top-K") {
    // train model has 2 distinct bigrams; a budget of 1 forces the
    // auto-prune path, keeping only the top count ("a b", c12=2). The
    // pruned bigram "a c" must then SMOOTH like an unseen one.
    val got = LanguageModel.score(
      Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text"), "text", "doc_id",
      train, "text", maxBroadcastModelRows = 1)
      .as[(Long, Long, Double)].collect().map { case (id, n, s) => id -> (n, s) }.toMap
    // kept: P(b|a) = (2+1)/(3+3) — c1 prunes to top-1 too, keeping 'a'
    assert(got(1L)._2 == BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // pruned "a c": c12 smooths to 0 → P = (0+1)/(3+3)
    assert(got(2L)._2 == BigDecimal(math.log(1.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("an over-budget explicit topK is capped at the broadcast budget") {
    // topK wider than the budget must NOT bypass the cap: with budget 1
    // this behaves exactly like the auto-prune-to-1 path
    val got = LanguageModel.score(
      Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text"), "text", "doc_id",
      train, "text", topK = Int.MaxValue, maxBroadcastModelRows = 1)
      .as[(Long, Long, Double)].collect().map { case (id, n, s) => id -> (n, s) }.toMap
    assert(got(1L)._2 == BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L)._2 == BigDecimal(math.log(1.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("under-budget model is byte-identical to the unpruned path") {
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z z")).toDF("doc_id", "text")
    val unpruned = LanguageModel.score(docs, "text", "doc_id", train, "text",
      maxBroadcastModelRows = Int.MaxValue).collect().toSet
    val defaulted = LanguageModel.score(docs, "text", "doc_id", train, "text")
      .collect().toSet
    assert(defaulted == unpruned)
  }

  test("default-path scoring plan: model broadcasts; corpus bigrams never shuffle on the bigram key") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = LanguageModel.score(df, "text", "doc_id", df, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "a shuffle join here would key the exploded corpus on Zipfian bigrams")
  }

  test("Kneser-Ney: hand-computed discount arithmetic and unseen-history backoff") {
    // train/self-score "a b a b a c": c12 = {ab:2, ba:2, ac:1};
    // hist a:(c1=3,n1f=2) b:(2,1); cont each n1b=1; D=3, V=3
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = LanguageModel.kneserNeyScore(df, "text", "doc_id", df, "text")
      .collect()(0)
    val pc = 2.0 / 7.0 // (n1b+1)/(D+V+1)
    val pAB = (2 - 0.75) / 3 + (0.75 * 2 / 3) * pc
    val pBA = (2 - 0.75) / 2 + (0.75 * 1 / 2) * pc
    val pAC = (1 - 0.75) / 3 + (0.75 * 2 / 3) * pc
    val exp = (2 * math.log(pAB) + 2 * math.log(pBA) + math.log(pAC)) / 5
    assert(got.getLong(1) == 5L)
    assert(got.getDouble(2) == BigDecimal(exp)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // wholly unseen history backs off to the smoothed continuation:
    // train "a b" -> D=1, V=2, P("z z") = (0+1)/(1+2+1) = 0.25
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val z = Seq((9L, "z z")).toDF("doc_id", "text")
    val zr = LanguageModel.kneserNeyScore(z, "text", "doc_id", train, "text")
      .collect()(0)
    assert(zr.getDouble(2) == BigDecimal(math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("PMI plan: unigram joins and totals broadcast, top-k is TakeOrderedAndProject") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = LanguageModel.pmiCollocations(df, "text", 5L, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
