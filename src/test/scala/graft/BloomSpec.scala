package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Bloom-filter decontamination ([[Dedup.bloomDecontaminate]]) vs the
  * exact broadcast-join path ([[Dedup.decontaminate]]): the Bloom side
  * can only over-count (no false negatives), and its plan must be
  * join-free on the corpus side. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val eval = docs.filter(pmod(col("doc_id"), lit(97)) === 0)

  test("no false negatives: bloom n_flagged >= exact n_overlap, everywhere") {
    val exact = Dedup.decontaminate(docs, eval, "text", "doc_id")
      .select(col("id"), col("n_overlap"), col("contaminated").as("c_exact"))
    val bloom = Dedup.bloomDecontaminate(docs, eval, "text", "doc_id")
      .select(col("id"), col("n_flagged"), col("contaminated").as("c_bloom"))
    val joined = exact.join(bloom, Seq("id")).collect()
    assert(joined.length == docs.count())
    joined.foreach { r =>
      val (id, nExact, nBloom) = (r.getAs[Long]("id"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("n_flagged"))
      assert(nBloom >= nExact, s"doc $id: bloom $nBloom < exact $nExact")
      assert(!r.getAs[Boolean]("c_exact") || r.getAs[Boolean]("c_bloom"),
        s"doc $id: exact-contaminated but bloom-clean")
    }
    // the eval docs themselves share all their shingles with the eval set
    val evalIds = eval.select("doc_id").collect().map(_.getLong(0)).toSet
    joined.filter(r => evalIds(r.getAs[Long]("id")))
      .foreach(r => assert(r.getAs[Boolean]("c_bloom"),
        s"eval doc ${r.getAs[Long]("id")} not flagged"))
  }

  test("false-positive inflation stays within the fill-factor bound") {
    val exact = Dedup.decontaminate(docs, eval, "text", "doc_id")
    val bloom = Dedup.bloomDecontaminate(docs, eval, "text", "doc_id")
    val nExact = exact.agg(sum("n_overlap")).collect()(0).getLong(0)
    val nBloom = bloom.agg(sum("n_flagged")).collect()(0).getLong(0)
    // tiny eval set → sparse bitset → FP rate far under 1%; 10% headroom
    assert(nBloom >= nExact)
    assert(nBloom <= (nExact * 1.1).toLong + 10,
      s"bloom over-count too high: $nBloom vs exact $nExact")
  }

  test("plan: corpus side is join-free (the bitset travels as a literal)") {
    val plan = Dedup.bloomDecontaminate(docs, eval, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join in:\n$plan")
  }
}
