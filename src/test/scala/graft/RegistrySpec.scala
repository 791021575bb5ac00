package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hygiene invariants of the driver contract: the registry's oracles
  * must belong to registered queries, the rows-only set must stay the
  * DOCUMENTED approximation families (a new query silently missing its
  * oracle would otherwise skip the correctness gate), and the oracle
  * SQL must be DuckDB-parseable text (balanced quotes trip the driver's
  * json.load, tabs/newlines are escaped by Verify). */
class RegistrySpec extends AnyFunSuite {

  test("every oracle belongs to a registered query; names follow q_*") {
    val orphans = Queries.oracles.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(Queries.all.keySet.forall(n =>
      n == "q1_agg" || n.startsWith("q_")),
      "query names must follow the q_* convention (q1_agg grandfathered)")
  }

  test("rows-only queries stay the documented approximation families") {
    val rowsOnly = Queries.all.keySet -- Queries.oracles.keySet
    val documented = Set(
      // xxhash64 / splitmix64 production-hash families (md5 oracle
      // twins value-check the mechanisms)
      "q_minhash_pairs", "q_simhash_pairs", "q_ann_lsh",
      "q_embed_neardup_lsh", "q_corpus_curation_lsh",
      // k-means-trained codebooks (fixed-codebook md5 twin green)
      "q_pq_topk",
      // sketch internals (register/estimator mechanism value-checked
      // by the md5 twin; r12 moved q_compression_ratio OUT of this set
      // — it now has a tool-generated java.util.zip golden oracle)
      "q_approx_agg")
    assert(rowsOnly == documented,
      s"undocumented rows-only queries: ${rowsOnly -- documented}; " +
        s"documented-but-oracled: ${documented -- rowsOnly}")
  }

  test("SparkEntry exposes the registry itself") {
    assert(SparkEntry.queries eq Queries.all)
    assert(SparkEntry.oracleSql eq Queries.oracles)
  }

  test("oracle SQL is non-empty and never references Spark-only syntax") {
    Queries.oracles.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // the one Spark-ism that silently parses in neither engine the
      // same way; `div` is Spark SQL only and has bitten before
      assert(!sql.contains(" div "), s"$name: Spark-only `div` in oracle SQL")
    }
  }
}
