package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** Distributed k-means (trainCentroids) vs an independent in-memory
  * implementation of the same algorithm — exact agreement pins the
  * (centroid_id, dim)-keyed mean-update algebra, which no DuckDB oracle
  * can reach (iterated float averages). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vectors: Array[(Long, Array[Double])] =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }
      .sortBy(_._1)

  /** Plain-Scala reference: identical seeding, cosine assignment with the
    * same (sim desc, centroid_id asc) tie-break, per-dim mean update,
    * empty cells keep their centroid. */
  private def referenceKMeans(k: Int, iters: Int): Map[Int, Array[Double]] = {
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) Double.NegativeInfinity else dot / den
    }
    var centroids: Map[Int, Array[Double]] =
      vectors.take(k).zipWithIndex.map { case ((_, v), i) => i -> v.clone() }.toMap
    for (_ <- 0 until iters) {
      val assigned = vectors.map { case (_, v) =>
        val best = centroids.toSeq
          .map { case (cid, c) => (cid, cosine(v, c)) }
          .sortBy { case (cid, sim) => (-sim, cid) }.head._1
        (best, v)
      }
      val means = assigned.groupBy(_._1).map { case (cid, vs) =>
        val dim = vs.head._2.length
        val sum = new Array[Double](dim)
        vs.foreach { case (_, v) => for (i <- 0 until dim) sum(i) += v(i) }
        cid -> sum.map(_ / vs.length)
      }
      centroids = centroids.map { case (cid, c) => cid -> means.getOrElse(cid, c) }
    }
    centroids
  }

  test("trainCentroids equals the in-memory Lloyd reference (k=8, 2 iterations)") {
    val got = Similarity.trainCentroids(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding", k = 8, iters = 2)
      .as[(Int, Array[Double])].collect().toMap
    val want = referenceKMeans(8, 2)
    assert(got.keySet == want.keySet)
    for (cid <- want.keySet) {
      val (g, w) = (got(cid), want(cid))
      assert(g.length == w.length)
      val maxDiff = g.zip(w).map { case (a, b) => math.abs(a - b) }.max
      // avg() order differs between engines: tolerance, not bit-equality
      assert(maxDiff < 1e-9, s"centroid $cid differs by $maxDiff")
    }
  }

  test("trained-centroid IVF holds >=85% recall vs brute force (nProbe=2 of k=8 cells)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    val trained = pairs(Similarity.ivfTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding",
      Similarity.trainCentroids(e, "vec_id", "embedding", k = 8, iters = 2),
      "centroid_id", "centroid", k = 5, nProbe = 2))
    // measured 37/40; a sampled-rows vs trained head-to-head on 8 queries
    // is coin-flip territory, so pin the absolute quality bar instead
    val recall = bf.intersect(trained).size.toDouble / bf.size
    assert(recall >= 0.85, s"recall $recall")
  }

  test("PQ ADC top-k holds >=85% recall vs brute force (m=16, 16 codes, 8x overfetch)") {
    // sf0.01 (500 vectors): large enough that ADC ordering is actually
    // exercised — at sf0.001 the 8x overfetch would cover most of the
    // corpus. Params match the registered q_pq_topk (replica-measured
    // recall 0.94 on this corpus; near-uniform synthetic embeddings are a
    // worst case for quantization, hence m=16 narrow subspaces).
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    val pq = pairs(Similarity.pqTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding",
      dims = 64, m = 16, codes = 16, iters = 3, k = 5, overfetch = 8))
    val recall = bf.intersect(pq).size.toDouble / bf.size
    assert(recall >= 0.85, s"recall $recall")
  }
}
