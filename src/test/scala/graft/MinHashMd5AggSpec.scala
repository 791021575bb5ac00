package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/**
 * [[graft.functions.MinHashMd5Agg]] must be bit-identical to the Column
 * formulation it replaced (r16): slot i = min over the group of the
 * lowercase-hex md5(i || ':' || s), slots in slot order. The old form is
 * rebuilt here verbatim (explode × sequence → groupBy(id, i) → min(md5))
 * and compared slot-for-slot, including the band hashes derived from the
 * ordered signature — the exact intermediates the DuckDB oracle replays
 * for q_minhash_pairs_md5 / q_corpus_curation_lsh_md5.
 */
class MinHashMd5AggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8
  private val bands = 4
  private val rows = k / bands

  private def shingled = {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "unicode süß 中文 emoji 😀 mix"),
      (4L, "single-shingle here now"))
      .toDF("doc_id", "text")
    docs.select(col("doc_id").as("id"),
      explode(GraftFunctions.graftWordShingles(col("text"), 3)).as("s"))
  }

  test("aggregate slots equal the per-slot min(md5) Column formulation") {
    val agg = shingled.groupBy(col("id"))
      .agg(GraftFunctions.graftMinhashMd5Agg(col("s"), k).as("sig"))
      .select(col("id"), posexplode(col("sig")).as(Seq("i", "slot")))
    val old = shingled
      .select(col("id"), col("s"), explode(sequence(lit(0), lit(k - 1))).as("i"))
      .groupBy(col("id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("s")))).as("slot"))
    assert(agg.count() === 5L * k)
    assert(agg.exceptAll(old).isEmpty && old.exceptAll(agg).isEmpty)
  }

  test("band hashes off the signature array equal the collect_list reassembly") {
    val sig = shingled.groupBy(col("id"))
      .agg(GraftFunctions.graftMinhashMd5Agg(col("s"), k).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(array_join(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)), ","))))
        .as(Seq("band", "band_hash")))
    val old = shingled
      .select(col("id"), col("s"), explode(sequence(lit(0), lit(k - 1))).as("i"))
      .groupBy(col("id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("s")))).as("slot"))
      .groupBy(col("id"), expr(s"i div $rows").as("band"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("slot")))),
          x => x.getField("slot")), ",")).as("band_hash"))
    assert(banded.count() === 5L * bands)
    assert(banded.exceptAll(old).isEmpty && old.exceptAll(banded).isEmpty)
  }

  test("SQL registration and null/empty-group behavior") {
    shingled.createOrReplaceTempView("mhm5_sh")
    val viaSql = spark.sql(
      "SELECT id, graft_minhash_md5_agg(s, 8) AS sig FROM mhm5_sh GROUP BY id")
    assert(viaSql.select(size(col("sig"))).distinct().head().getInt(0) === k)
    // null inputs are ignored, all-null groups yield a null signature
    val withNulls = Seq((1L, Option("a b c")), (1L, None), (2L, None))
      .toDF("id", "s")
    val out = withNulls.groupBy(col("id"))
      .agg(GraftFunctions.graftMinhashMd5Agg(col("s"), k).as("sig"))
      .orderBy(col("id")).collect()
    assert(out(0).getSeq[String](1).length === k)
    assert(out(1).isNullAt(1))
  }
}
