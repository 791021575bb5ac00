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

  // ---------------------------------------------------------------
  // TF-IDF
  // ---------------------------------------------------------------

  test("tfidf: vectors are unit-length and corpus-wide terms weigh least") {
    val df = corpus(
      1L -> "the cat sat",
      2L -> "the dog ran",
      3L -> "the cat ran")
    val vecs = Retrieval.tfidfVectors(df, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    // L2 norm per doc ≈ 1 (each weight rounded to 6dp)
    for (d <- 1L to 3L) {
      val norm = math.sqrt(vecs.collect { case ((id, _), w) if id == d => w * w }.sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"doc $d norm $norm")
    }
    // 'the' is in every doc → lowest idf → smallest weight within a doc
    val doc1 = vecs.collect { case ((1L, t), w) => t -> w }.toMap
    assert(doc1("the") < doc1("cat") && doc1("the") < doc1("sat"))
  }

  test("tfidf cosine: identical docs hit 1.0, disjoint docs are absent") {
    val df = corpus(
      1L -> "alpha beta gamma",
      2L -> "alpha beta gamma",
      3L -> "delta epsilon zeta")
    val pairs = Retrieval.tfidfCosinePairs(df, "text", "doc_id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "no shared term → no candidate pair at all (the join IS the filter)")
  }

  test("tfidf cosine: maxDocFreq cuts hot terms from the join, not the norms") {
    // 'hot' is in all 4 docs; with maxDocFreq=3 it leaves the join, so
    // docs sharing ONLY 'hot' produce no pair, while the 1-2 pair
    // (sharing 'rare') survives with the full-vector norm intact.
    val df = corpus(
      1L -> "hot rare one",
      2L -> "hot rare two",
      3L -> "hot only three",
      4L -> "hot solo four")
    val all = Retrieval.tfidfCosinePairs(df, "text", "doc_id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cut = Retrieval.tfidfCosinePairs(df, "text", "doc_id", threshold = 0.0,
      maxDocFreq = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.size == 6, "all pairs share 'hot'")
    assert(cut == Set((1L, 2L)), "df-cut leaves only the 'rare' pair")
  }

  test("tfidf plan: dfreq and corpus-count join back broadcast, no term re-shuffle of the corpus") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Retrieval.tfidfVectors(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("BroadcastNestedLoopJoin")) // 1-row corpus count
    assert(!plan.contains("SortMergeJoin"))
  }

  test("rrfFusion: both-list docs outrank single-list docs, absent rank = 0") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFusion(a, b, "id", c = 60, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 11 is in both lists (1/62 + 1/61) and must outrank everything
    assert(got.head._1 == 11L)
    assert((got.head._2, got.head._3) == ((2L, 1L)))
    assert(math.abs(got.head._4 - (1.0 / 62 + 1.0 / 61)) < 1e-9)
    // absent ranks surface as 0, never null
    val m = got.map(g => g._1 -> (g._2, g._3)).toMap
    assert(m(10L) == ((1L, 0L)) && m(13L) == ((0L, 2L)))
    // equal-score tie (10 in a@1 vs 13 in b... not equal) — instead pin
    // the full deterministic order: same-rank singles tie-break by id
    val c2 = Retrieval.rrfFusion(
      Seq((5L, 1)).toDF("id", "rank"), Seq((3L, 1)).toDF("id", "rank"),
      "id", c = 60, k = 10).collect().map(_.getLong(0)).toSeq
    assert(c2 == Seq(3L, 5L), "equal RRF scores must tie-break by id")
  }

  test("tfidf cosine: the df-cut default is FINITE (scale contract, r12 item 5)") {
    // one stopword shared by >10000 docs: under the finite default the
    // hot term leaves the join and NO pair forms (each doc's other term
    // is unique); an unbounded default would emit ~5e7 candidate rows —
    // the quadratic flood the contract exists to prevent
    val many = spark.range(10001)
      .select(col("id").as("doc_id"),
        concat(lit("hot uniq"), col("id")).as("text"))
    assert(Retrieval.tfidfCosinePairs(many, "text", "doc_id",
      threshold = 0.0).count() == 0L)
    // and the guard refuses a nonsensical bound outright
    intercept[IllegalArgumentException] {
      Retrieval.tfidfCosinePairs(many, "text", "doc_id", maxDocFreq = 0L)
    }
  }

  test("rrfFusion input hygiene: dup ids collapse to best rank, sub-1 ranks fail loudly") {
    // a duplicate id in one list must NOT fan out through the
    // full-outer join and double-count its reciprocal — it collapses
    // to its best (minimum) rank
    val a = Seq((10L, 3), (10L, 1), (11L, 2)).toDF("id", "rank")
    val b = Seq((11L, 1)).toDF("id", "rank")
    val got = Retrieval.rrfFusion(a, b, "id", c = 60, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val m = got.map(g => g._1 -> ((g._2, g._3, g._4))).toMap
    assert(got.length == 2, "duplicate id must produce ONE fused row")
    assert(m(10L)._1 == 1L, "duplicate id keeps its best rank")
    assert(math.abs(m(10L)._3 - 1.0 / 61) < 1e-9, "rrf counted once, at the best rank")
    // a 0-based rank from a miscalibrated caller would collide with the
    // rank-0 absent sentinel — it FAILS LOUDLY (ADVICE r12: silently
    // dropping the row would discard exactly that list's BEST hit and
    // reinterpret the remaining ranks as 1-based)
    val ex = intercept[Exception] {
      Retrieval.rrfFusion(
        Seq((7L, 0)).toDF("id", "rank"), Seq((8L, 1)).toDF("id", "rank"),
        "id", c = 60, k = 10).collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("rrfFusion")),
      s"expected the rrfFusion rank guard, got: $messages")
  }

  test("rrfFusion top-k never plans a global sort") {
    // inputs must exceed k: with provably-few rows EliminateLimits drops
    // the Limit (maxRows ≤ k) and no TakeOrdered can form
    val a = (1L to 15L).map(i => (i, i.toInt)).toDF("id", "rank")
    val b = (10L to 24L).map(i => (i, (i - 9).toInt)).toDF("id", "rank")
    val plan = Retrieval.rrfFusion(a, b, "id").queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange rangepartitioning"))
  }
}
