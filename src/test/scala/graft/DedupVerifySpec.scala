package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/**
 * The verify stage ([[Dedup.verifyPairsByEditDistance]]) and the
 * cross-batch ledger ([[Dedup.incrementalDedup]]): hand-built corpora
 * where the expected verdicts are computable by eye.
 */
class DedupVerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("edit-distance verify: identical texts score 1.0, reordered words are killed") {
    // 0 and 1: byte-identical -> jaccard 1.0, edit_sim 1.0.
    // 0 and 2: same word SET in reversed order -> shingle jaccard low but
    //          nonzero is possible; force the candidate list by hand so the
    //          verify semantics are tested in isolation.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"))
      .toDF("doc_id", "text")
    val candidates = Seq((0L, 1L), (0L, 2L)).toDF("id_a", "id_b")

    val all = Dedup.verifyPairsByEditDistance(docs, "text", "doc_id",
      candidates, minEditSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(all((0L, 1L)) == 1.0)
    assert(all((0L, 2L)) < 0.5) // order-sensitive check sees a rewrite

    val strict = Dedup.verifyPairsByEditDistance(docs, "text", "doc_id",
      candidates, minEditSim = 0.9)
    assert(strict.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      == Set((0L, 1L)))
  }

  test("edit-distance verify passes through the generator's columns") {
    val docs = Seq((0L, "a b c"), (1L, "a b d")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L, 0.42)).toDF("id_a", "id_b", "jaccard")
    val out = Dedup.verifyPairsByEditDistance(docs, "text", "doc_id", pairs, 0.0)
    assert(out.columns.toSeq ==
      Seq("id_a", "id_b", "jaccard", "edit_distance", "edit_sim"))
    val r = out.collect().head
    assert(r.getDouble(2) == 0.42)
    assert(r.getLong(3) == 1L) // one substitution
  }

  test("edit-distance verify: prefixLen bounds the compared window") {
    // texts agree on the first 10 chars, diverge after: the truncated
    // verify sees identical prefixes (sim 1.0), the full verify does not
    val docs = Seq(
      (0L, "same start then completely different tail content"),
      (1L, "same start but the rest diverges wildly from doc zero"))
      .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    val truncated = Dedup.verifyPairsByEditDistance(docs, "text", "doc_id",
      pairs, minEditSim = 0.0, prefixLen = 10).collect()(0)
    assert(truncated.getDouble(3) == 1.0)
    val full = Dedup.verifyPairsByEditDistance(docs, "text", "doc_id",
      pairs, minEditSim = 0.0).collect()(0)
    assert(full.getDouble(3) < 1.0)
  }

  test("containment catches subset-duplicates that Jaccard misses") {
    // doc 2 is doc 1's text quoted whole inside unrelated framing:
    // containment of 1-in-2 is 1.0, symmetric Jaccard is well below.
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "intro words here alpha beta gamma delta and then much more trailing content follows"),
      (3L, "completely unrelated text body"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      n = 3, minContainment = 0.9, maxDocFreq = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(cont.keySet == Set((1L, 2L)))
    assert(cont((1L, 2L))._1 == 1.0, "every shingle of the short doc is in the long one")
    assert(cont((1L, 2L))._2 < 0.5)
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.9, maxDocFreq = 100L).count()
    assert(jac == 0L, "symmetric Jaccard misses the subset-dup at the same bar")
  }

  test("incremental dedup: base dup, in-batch dup, unique — fingerprint-level") {
    val base = Seq(
      (100L, "the quick brown fox"),
      (101L, "totally different words here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // punctuation/case/order rewrite of base doc 100 -> same fingerprint
      (1L, "Fox. Brown, QUICK the!"),
      // new fingerprint, two claimants -> min id unique, other dup_in_batch
      (2L, "fresh content one"),
      (3L, "one content fresh"),
      // singleton
      (4L, "only of its kind"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(batch, base, "text", "doc_id")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "dup_of_base", 2L -> "unique",
      3L -> "dup_in_batch", 4L -> "unique"))
  }

  test("duplicate spans: overlapping windows merge, separated runs stay split") {
    // docs 0 and 1 share the 6-token run "p q r s t u": in doc 0 the
    // duplicated 4-gram starts are positions 2,3,4, which merge into ONE
    // span of max(4) - min(2) + 4 = 6 tokens. Doc 2 repeats the run
    // twice around a unique middle -> two separated 6-token spans.
    val docs = Seq(
      (0L, "x0 x1 p q r s t u y0 y1"),
      (1L, "z0 p q r s t u z1 z2"),
      (2L, "p q r s t u m0 m1 m2 m3 m4 p q r s t u"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "text", "doc_id", n = 4, minCount = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L) == ((1L, 6L)), s"doc0 ${got.get(0L)}") // one 6-token span
    assert(got(1L) == ((1L, 6L)))
    assert(got(2L) == ((2L, 12L)), "two separated 6-token spans")
  }

  test("span removal rewrites the stream: covered tokens go, the rest keep order") {
    // same corpus as the spans case: the shared "p q r s t u" run is
    // deleted wherever it occurs; surviving tokens re-join in order
    val docs = Seq(
      (0L, "x0 x1 p q r s t u y0 y1"),
      (1L, "z0 p q r s t u z1 z2"),
      (2L, "p q r s t u m0 m1 m2 m3 m4 p q r s t u"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "text", "doc_id", n = 4, minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got(0L) == ((10L, 4L, 6L, m("x0 x1 y0 y1"))))
    assert(got(1L) == ((9L, 3L, 6L, m("z0 z1 z2"))))
    assert(got(2L) == ((17L, 5L, 12L, m("m0 m1 m2 m3 m4"))))
    assert(got(3L) == ((0L, 0L, 0L, m(""))), "empty doc survives with md5('')")
  }

  test("keepBestDuplicates: highest score survives, score ties fall to min id") {
    val docs = Seq(
      (1L, "same text", 0.2), (2L, "same text", 0.9), (3L, "same text", 0.5),
      (4L, "other", 0.7), (5L, "other", 0.7), // tie -> min id 4 survives
      (6L, "unique", 0.1),
      // null texts form ONE cluster and must come back tagged, not
      // silently dropped by the digest join (md5(NULL) is NULL)
      (7L, null.asInstanceOf[String], 0.3),
      (8L, null.asInstanceOf[String], 0.8))
      .toDF("doc_id", "text", "score")
    val got = Dedup.keepBestDuplicates(docs, "text", "doc_id", "score")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got == Map(
      1L -> ((2L, false)), 2L -> ((2L, true)), 3L -> ((2L, false)),
      4L -> ((4L, true)), 5L -> ((4L, false)),
      6L -> ((6L, true)),
      7L -> ((8L, false)), 8L -> ((8L, true))))
    // the argmax is ONE map-side-combinable aggregate, never a
    // per-cluster ranking window (which would gather a hot cluster —
    // the worst case is the whole corpus being one text — into one task)
    val plan = Dedup.keepBestDuplicates(docs, "text", "doc_id", "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"))
    assert(!plan.contains("Window"))
  }

  test("exact-pairs scale guard fails LOUDLY past the documented corpus bound") {
    // r13 verdict item 5: the sf100 probes measured this family's
    // unguarded past-bound failure mode as a FILLED DISK — above the
    // bound it must throw with the LSH-twin pointer instead
    val docs = (0 until 8).map(i => (i.toLong, s"alpha beta gamma delta $i"))
      .toDF("doc_id", "text")
    // under the bound: runs
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      maxCorpusDocs = 8L).count() >= 0)
    // over the bound: loud refusal naming the production twins
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", maxCorpusDocs = 7L)
    }
    assert(e.getMessage.contains("minhashCandidatePairs"))
    intercept[IllegalArgumentException] {
      Dedup.ngramContainmentPairs(docs, "text", "doc_id", maxCorpusDocs = 7L)
    }
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", maxCorpusDocs = 0L)
    }
    // the default bound is FINITE and sits between the sf10 ladder's
    // 500k-doc pass and the sf100 probe's 5M-doc disk fill
    assert(Dedup.MaxExactPairsDocs > 500000L &&
      Dedup.MaxExactPairsDocs < 5000000L)
  }
}
