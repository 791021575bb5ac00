package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity, Stats}

/** The bounded-collect inventory as a TEST (r12 verdict item 6): every
  * documented driver-side bound lived only in comments, so a refactor
  * that unbounds one of the collects would have passed every suite.
  * This spec pins (a) the bound constants the code actually uses,
  * (b) the addressing invariant that makes the Bloom collect 65,536-
  * bounded regardless of eval-set size, (c) that duplicateComponents
  * collects edges ONLY under its counted threshold (path selection is
  * observable in the physical plan), and (d) that the centroid/codebook
  * driver state is exactly k rows. */
class DriverStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bound constants: Bloom bitset, union-find edge cap, refinement depth") {
    assert(Dedup.BloomBits == 65536,
      "bloomDecontaminate's collect is bounded by 4 md5 hex chars = 2^16 positions")
    assert(Dedup.LocalUnionFindMaxEdges == (1L << 20),
      "duplicateComponents collects edges only up to 2^20 (~16 MB)")
    assert(Stats.MaxRefinementDepth == 256,
      "quantile refinement recursion is hard-capped; driver state = O(bins x depth)")
  }

  test("Bloom bit addressing can never exceed the bitset (any eval-set size)") {
    // replicate the position expression over 50k distinct shingles: the
    // driver-side collect in bloomDecontaminate receives DISTINCT
    // positions, so its size is bounded by the address space, which this
    // pins to [0, BloomBits)
    val pos = spark.range(50000)
      .select(explode(array((0 until 4).map(i =>
        conv(substring(md5(concat(lit(i + ":shingle"), col("id"))), 1, 4), 16, 10)
          .cast("int")): _*)).as("p"))
    val row = pos.agg(min(col("p")), max(col("p")), countDistinct(col("p"))).head()
    assert(row.getInt(0) >= 0 && row.getInt(1) < Dedup.BloomBits)
    assert(row.getLong(2) <= Dedup.BloomBits.toLong)
  }

  test("duplicateComponents collects edges ONLY under the counted threshold") {
    val pairs = (1L to 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // under the threshold: the driver-side union-find produces a
    // LocalRelation — visible as LocalTableScan in the physical plan
    val local = Dedup.duplicateComponents(pairs, localThreshold = 1L << 20)
    assert(local.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "small graph must take the bounded driver-side union-find")
    // above the threshold (forced with 0): NO driver-side edge collect —
    // the result comes from the distributed star-contraction rounds
    val dist = Dedup.duplicateComponents(pairs, localThreshold = 0L)
    assert(!dist.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "past the cap the edge list must NEVER be collected")
    // and both paths agree exactly
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(local) == m(dist))
  }

  test("centroid/codebook driver state is exactly k rows") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // trainCentroids localizes each iteration: k-row LocalRelation
    val trained = Similarity.trainCentroids(e, "vec_id", "embedding",
      k = 8, iters = 1, trainSampleSize = 64)
    assert(trained.count() == 8L)
    assert(trained.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // md5 codebooks: m x codes rows, generated driver-side by contract
    assert(Similarity.md5Codebooks(spark, m = 8, codes = 8, subDim = 8).count() == 64L)
  }

  test("scalable quantiles stay exact under a tiny localLimit (forced refinement)") {
    // 40k distinct doubles with localLimit=32 forces the histogram-
    // refinement machinery through many rounds; the depth cap plus the
    // <= bins-row histogram collects are the driver-state bound, and the
    // answers must still equal the exact order statistics
    val df = spark.range(40000)
      .select((pmod(col("id") * 2654435761L, lit(999983L)).cast("double") +
        col("id").cast("double") * 1e-7).as("v"))
    val fracs = Seq(0.1, 0.5, 0.9)
    val got = Stats.exactQuantilesScalable(df, "v", fracs, bins = 64, localLimit = 32L)
    val exact = df.select(expr(s"percentile(v, array(${fracs.mkString(",")}))"))
      .head().getSeq[Double](0)
    fracs.indices.foreach { i =>
      assert(math.abs(got(i) - exact(i)) <= math.ulp(exact(i)) * 4,
        s"frac ${fracs(i)}: got ${got(i)} expected ${exact(i)}")
    }
  }
}
