package graft

import graft.ext.{Dedup, Similarity}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Native codegen'd vector expressions vs the independent higher-order
 * -function formulations they replaced. The HOF versions accumulate in
 * double in array order; the natives claim the same IEEE op sequence, so
 * equality here is EXACT (===), not approximate.
 */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, -3.5f, 0.25f), Array(-0.5f, 4.0f, 1.0f, 2.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f, 1.0f)),
    (3L, Array(1e-7f, -1e7f, 3.1f, 2.2f), Array(1e7f, 1e-7f, -2.2f, 3.1f)),
    (4L, Array(5.0f), Array(5.0f))
  ).toDF("id", "a", "b")

  test("graft_dot matches the HOF fold exactly") {
    val rows = vecs.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.hofDot($"a", $"b").as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_cosine matches the HOF formulation exactly; zero norm is null") {
    val rows = vecs.select($"id",
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.hofCosine($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      if (r.getLong(0) == 2L) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(r.getDouble(1) === r.getDouble(2))
    }
  }

  test("expressions survive SQL registration (SparkSessionExtensions surface)") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_native_spec")
    val rows = spark.sql(
      """SELECT id, graft_dot(a, b) AS d, graft_cosine(a, b) AS c,
        |       graft_hyperplane(a, 12, 0L) AS h
        |FROM vecs_native_spec WHERE id = 1""".stripMargin).collect()
    val viaApi = vecs.filter($"id" === 1).select(
      Similarity.dot($"a", $"b"), Similarity.cosine($"a", $"b"),
      Similarity.hyperplaneSignature($"a", 12)).head()
    assert(rows.head.getDouble(1) === viaApi.getDouble(0))
    assert(rows.head.getDouble(2) === viaApi.getDouble(1))
    assert(rows.head.getLong(3) === viaApi.getLong(2))
  }

  test("hyperplane signature is deterministic and respects the plane count") {
    val sigs = vecs.select(
      Similarity.hyperplaneSignature($"a", planes = 12).as("s1"),
      Similarity.hyperplaneSignature($"a", planes = 12).as("s2"),
      Similarity.hyperplaneSignature($"a", planes = 5).as("s5")).collect()
    sigs.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert((r.getLong(2) >>> 5) === 0L, "bits beyond `planes` must be clear")
    }
    // identical vectors land in the same bucket — the LSH contract
    val same = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("x", "y")
      .select(Similarity.hyperplaneSignature($"x", 16).as("sx"),
        Similarity.hyperplaneSignature($"y", 16).as("sy")).head()
    assert(same.getLong(0) === same.getLong(1))
  }

  test("MinHashAgg matches the per-slot xxhash64 family of minhashSignature") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val viaAgg = Dedup.minhashSignatures(docs, "text", "doc_id", n = 2, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaFold = docs.select($"doc_id",
      Dedup.minhashSignature(Dedup.wordShingles($"text", 2), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg === viaFold)
    assert(viaAgg(1L) === viaAgg(3L))
  }

  test("SimHashAgg matches the HOF simhash fold") {
    val docs = Seq(
      (1L, "spark catalyst tungsten codegen pipeline shuffle exchange"),
      (2L, "completely different words about gardening and soil and compost"),
      (3L, "spark catalyst tungsten codegen pipeline shuffle exchange")
    ).toDF("doc_id", "text")
    val viaAgg = Dedup.simhashSignatures(docs, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFold = docs.select($"doc_id",
      Dedup.simhash(Dedup.wordShingles($"text", 2)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaFold)
    assert(viaAgg(1L) === viaAgg(3L))
  }
}
