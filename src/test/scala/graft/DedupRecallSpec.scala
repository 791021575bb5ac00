package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity}

/**
 * Recall gates for the four rows-only LSH paths (no DuckDB oracle pins
 * them — xxhash64/splitmix64 have no DuckDB equivalent), each asserted
 * against its own green exact baseline at sf0.01:
 *
 *  - SimHash chunk bucketing is EXACT by construction (pigeonhole:
 *    distance ≤ maxHamming ⇒ some chunk of maxHamming+1 equal) — asserted
 *    as set equality, both at the default radius and a wider one that
 *    exercises the generic chunk sizing (the r2 bug: 4 chunks claimed to
 *    cover Hamming 12).
 *  - MinHash banding, hyperplane ANN and embedding LSH are probabilistic —
 *    asserted ≥ measured-with-margin recall (measured 100%, 97.5%, 97.7%
 *    with the registered parameters).
 */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs =
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
  private lazy val embs =
    spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")

  private def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
    df.select(col(a), col(b)).as[(Long, Long)].collect().toSet

  test("simhash bucketed pairs equal the exact Hamming self-join (maxHamming 3 and 7)") {
    val sigs = Dedup.simhashSignatures(docs, "text", "doc_id").cache()
    for (maxH <- Seq(3, 7)) {
      val a = sigs.select(col("id").as("id_a"), col("sig").as("sa"))
      val b = sigs.select(col("id").as("id_b"), col("sig").as("sb"))
      val exact = pairSet(a.join(b, col("id_a") < col("id_b"))
        .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= maxH), "id_a", "id_b")
      val bucketed = pairSet(
        Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxHamming = maxH), "id_a", "id_b")
      assert(exact.nonEmpty, s"vacuous at maxHamming=$maxH")
      assert(bucketed == exact, s"maxHamming=$maxH")
    }
  }

  test("simhash hot-bucket cap keeps only true pairs (subset) and finds some") {
    val exact = pairSet(
      Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxHamming = 3), "id_a", "id_b")
    val capped = pairSet(Dedup.simhashNearDuplicates(docs, "text", "doc_id",
      maxHamming = 3, maxBucketSize = 50), "id_a", "id_b")
    assert(capped.subsetOf(exact))
    assert(capped.nonEmpty)
  }

  test("stop-shingle filter keeps Jaccard internally consistent (identical docs stay 1.0)") {
    // 'x0 x1 x2' .. appears in EVERY doc (hot shingle, filtered at
    // maxDocFreq=3); docs 1 and 2 are identical — with a pre-filter
    // denominator their similarity would drop below 1.0
    val common = "x0 x1 x2 x3"
    val docsDf = Seq(
      (1L, s"$common alpha beta gamma delta"),
      (2L, s"$common alpha beta gamma delta"),
      (3L, s"$common unrelated words only here"),
      (4L, s"$common more unrelated material again"),
      (5L, s"$common and still different stuff"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docsDf, "text", "doc_id",
        n = 3, threshold = 0.99, maxDocFreq = 3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 1.0)
  }

  test("simhash maxHamming=0 buckets on the full signature, not a zeroed mask") {
    val docsDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical -> same sig
      (3L, "completely different text goes here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(docsDf, "text", "doc_id", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // exact-signature pair found, no blowup
  }

  test("duplicateComponents merges chains the pair list never emitted directly") {
    // path graph 1-2-3-4 plus isolated pair 10-11: one 4-cluster, one 2-cluster
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.duplicateComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val docsDf = (1L to 12L).toDF("doc_id")
    val surv = Dedup.nearDupSurvivors(docsDf, "doc_id", pairs)
      .select(col("doc_id"), col("canonical_id"), col("is_survivor"))
      .as[(Long, Long, Boolean)].collect().toSet
    // unpaired docs survive as themselves; one survivor per cluster
    assert(surv.contains((5L, 5L, true)) && surv.contains((12L, 12L, true)))
    assert(surv.contains((1L, 1L, true)) && surv.contains((4L, 1L, false)))
    assert(surv.contains((10L, 10L, true)) && surv.contains((11L, 10L, false)))
    assert(surv.count(_._3) == 12 - 3 - 1) // 12 docs, 4+2 clustered keep 2
  }

  test("minhash near-dups recover >=90% of exact Jaccard pairs at the registered params") {
    val exact = pairSet(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.3, maxDocFreq = Long.MaxValue), "id_a", "id_b")
    val lsh = pairSet(Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      n = 3, k = 64, bands = 16, threshold = 0.05), "id_a", "id_b")
    assert(exact.nonEmpty)
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} exact pairs")
  }

  test("hyperplane ANN top-k finds >=85% of brute-force neighbors at the registered params") {
    val queries = embs.filter(col("vec_id") < 8)
    val bf = pairSet(Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5), "query_id", "neighbor_id")
    val lsh = pairSet(Similarity.lshTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, planes = 6, probeBits = 1, tables = 16),
      "query_id", "neighbor_id")
    assert(bf.size == 40)
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.85, s"recall $recall")
  }

  test("multi-bit probing sweep: recall is monotone over probeBits 0/1/2") {
    // one table and few planes so probing is the ONLY recall lever —
    // with OR-amplified tables every variant would saturate at 100%
    val queries = embs.filter(col("vec_id") < 8)
    val bf = pairSet(Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5), "query_id", "neighbor_id")
    val recalls = Seq(0, 1, 2).map { pb =>
      val lsh = pairSet(Similarity.lshTopK(embs, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, planes = 6, probeBits = pb, tables = 1),
        "query_id", "neighbor_id")
      bf.intersect(lsh).size.toDouble / bf.size
    }
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"recall not monotone over probeBits: $recalls")
    // each extra probe bit must actually widen the candidate set enough
    // to matter on this corpus (q_p: p^6 → +6p^5(1−p) → +15p^4(1−p)²)
    assert(recalls(2) > recalls(0), s"probing added no recall: $recalls")
  }

  test("embedding LSH near-dups recover >=90% of exact pairs at the registered params") {
    val exact = pairSet(Similarity.embeddingNearDuplicates(
      embs.filter(col("vec_id") < 400), "vec_id", "embedding", 0.3), "id_a", "id_b")
    val lsh = pairSet(Similarity.embeddingNearDuplicatesLSH(
      embs, "vec_id", "embedding", 0.3, planes = 4, tables = 24)
      .filter(col("id_a") < 400 && col("id_b") < 400), "id_a", "id_b")
    assert(exact.size > 500)
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} exact pairs")
  }
}
