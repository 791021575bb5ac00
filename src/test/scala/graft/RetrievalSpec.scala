package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Retrieval

/** BM25 ([[graft.ext.Retrieval]]): ranking properties on a controlled
  * corpus, plus the plan contract (broadcast stats, top-k as
  * TakeOrderedAndProject — no sort-the-world). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("higher term frequency wins at equal doc length") {
    val df = corpus(
      1L -> "cat cat cat dog bird fish",
      2L -> "cat dog bird fish worm ant",
      3L -> "dog bird fish worm ant bee")
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("cat"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "doc 3 has no hit and must be filtered")
    assert(got(0)._2 > got(1)._2)
  }

  test("shorter document wins at equal term frequency") {
    val df = corpus(
      1L -> "cat dog",
      2L -> "cat dog bird fish worm ant bee wasp moth fly")
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("cat"), k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  test("multi-term scores are the sum of per-term contributions") {
    val df = corpus(
      1L -> "cat dog bird",
      2L -> "cat fish worm",
      3L -> "dog fish bee")
    def score(terms: Seq[String]) =
      Retrieval.bm25TopK(df, "text", "doc_id", terms, k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = score(Seq("cat", "dog"))
    val cat = score(Seq("cat"))
    val dog = score(Seq("dog"))
    // doc 1 contains both terms: its combined score is the sum (±6dp rounding)
    assert(math.abs(both(1L) - (cat(1L) + dog(1L))) < 2e-6)
    // docs 2/3 contain one term each: combined equals that term's score
    assert(math.abs(both(2L) - cat(2L)) < 2e-6)
    assert(math.abs(both(3L) - dog(3L)) < 2e-6)
  }

  test("k bounds the result and ordering is (score desc, id)") {
    val df = corpus((1L to 30L).map(i => i -> ("cat " + ("x " * i.toInt).trim)): _*)
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("cat"), k = 5).collect()
    assert(got.length == 5)
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("plan: top-k is TakeOrderedAndProject, stats join is broadcast") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Retrieval.bm25TopK(df, "text", "doc_id", Seq("spark"), k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
