package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

/** BPE vocabulary learning ([[graft.ext.Bpe]]) vs an independent
  * in-memory reference implementation: merge choice (freq-then-pair
  * tie-break), greedy left-to-right overlap semantics, early stop, and
  * the token-count readout. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Straightforward sequential BPE over a word-frequency map. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Long]) = {
    var reps: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def applyMerge(toks: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    var done = false
    var round = 0
    while (round < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      reps.foreach { case (toks, f) =>
        (0 until toks.length - 1).foreach { i =>
          counts((toks(i), toks(i + 1))) = counts.getOrElse((toks(i), toks(i + 1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
        merges += ((l, r, f))
        reps = reps.map { case (toks, wf) => (applyMerge(toks, l, r), wf) }
        round += 1
      }
    }
    val vocab = reps.flatMap { case (toks, f) => toks.map(_ -> f) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    (merges.toSeq, vocab)
  }

  private def corpus(lines: String*) = lines.toSeq.toDF("text")

  private def wordFreqs(lines: Seq[String]): Map[String, Long] =
    lines.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  test("train matches the in-memory reference on the classic corpus") {
    val lines = Seq("low lower lowest low low", "newer newest new low widest")
    val (expMerges, _) = refBpe(wordFreqs(lines), rounds = 8)
    val got = Bpe.train(corpus(lines: _*), "text", rounds = 8)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expMerges, s"got ${got.toSeq} expected $expMerges")
  }

  test("overlapping pairs merge greedily left-to-right (aaa -> [aa, a])") {
    // one word "aaa" x3 plus "ab" to keep the argmax on (a, a):
    // (a,a) appears 2x per "aaa" occurrence = 6, (a,b) = 1
    val df = corpus("aaa aaa aaa ab")
    val merges = Bpe.train(df, "text", rounds = 1).collect()
    assert(merges.length == 1)
    assert((merges(0).getString(1), merges(0).getString(2)) == ("a", "a"))
    assert(merges(0).getLong(3) == 6L)
    // after the merge the reps must be [aa, a] (greedy), not [a, aa]:
    // round 2's top pair is then (aa, a) with freq 3
    val two = Bpe.train(df, "text", rounds = 2).collect().sortBy(_.getInt(0))
    assert((two(1).getString(1), two(1).getString(2)) == ("aa", "a"))
    assert(two(1).getLong(3) == 3L)
  }

  test("stops early when no pair remains") {
    val df = corpus("a b c a b")
    // chars are single-symbol words: zero adjacent pairs anywhere
    assert(Bpe.train(df, "text", rounds = 5).count() == 0L)
  }

  test("encode: per-doc token counts under the learned merges") {
    // "ab ab b": round 1 merges (a,b); doc then tokenizes to [ab, ab, b]
    val df = Seq((7L, "ab ab b")).toDF("doc_id", "text")
    val r1 = graft.ext.Bpe.encode(df, "text", "doc_id", rounds = 1).collect()(0)
    assert((r1.getLong(1), r1.getLong(2)) == ((3L, 3L)))
    assert(r1.getDouble(3) == 1.0)
    // zero rounds: raw char segmentation, 2+2+1 symbols over 3 words
    val r0 = graft.ext.Bpe.encode(df, "text", "doc_id", rounds = 0).collect()(0)
    assert((r0.getLong(1), r0.getLong(2)) == ((3L, 5L)))
    assert(r0.getDouble(3) == BigDecimal(5.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("vocab token counts match the reference segmentation") {
    val lines = Seq("low lower lowest low low", "newer newest new low widest")
    val (_, expVocab) = refBpe(wordFreqs(lines), rounds = 4)
    val got = Bpe.vocab(corpus(lines: _*), "text", rounds = 4, k = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expVocab, s"got $got expected $expVocab")
    // rank is dense 1..n by (cnt desc, token)
    val ranked = Bpe.vocab(corpus(lines: _*), "text", rounds = 4, k = 3)
      .collect().sortBy(_.getInt(2)).map(_.getString(0))
    val expTop = expVocab.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    assert(ranked.toSeq == expTop)
  }
}
