package graft

import java.nio.file.{Files, Paths}

/**
 * COVERAGE.md ↔ registry consistency gate (r11 verdict item 5): the
 * 400-line hand-maintained operator inventory WILL drift as the query
 * registry grows, and a drifted inventory silently misleads the
 * coverage audit. This main asserts, without touching Spark:
 *
 *  1. every key in `SparkEntry.queries` is mentioned somewhere in
 *     COVERAGE.md (a registered-but-undocumented query), and
 *  2. every `q_…` token in COVERAGE.md names a live registry key
 *     (a documented-but-dead row — typo or removed query), and
 *  3. every `SparkEntry.oracleSql` key has a `queries` entry (an
 *     oracle with no query can never be gated).
 *
 * Exit code 0 = consistent; 1 = drift, with every offender printed.
 * Wired into the round-close checklist beside Verify/Bench:
 *
 *   sbt "runMain graft.CoverageCheck"
 */
object CoverageCheck {
  def main(args: Array[String]): Unit = {
    val covPath = args.headOption.getOrElse("/root/repo/COVERAGE.md")
    val cov = Files.readString(Paths.get(covPath))
    val docTokens = "\\bq[0-9a-z_]*\\b".r.findAllIn(cov)
      .filter(t => t == "q1_agg" || t.startsWith("q_")).toSet
    val registry = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet

    val undocumented = (registry -- docTokens).toSeq.sorted
    val dead = (docTokens -- registry).toSeq.sorted
    val orphanOracles = (oracles -- registry).toSeq.sorted
    // r13 verdict item 4: the exact-instrument probe exclusions are a
    // REGISTRY annotation, not prose — every annotated name must be live
    val orphanNonScale = (SparkEntry.nonScalePath -- registry).toSeq.sorted

    undocumented.foreach(q => println(s"[coverage-check] UNDOCUMENTED in COVERAGE.md: $q"))
    dead.foreach(q => println(s"[coverage-check] DEAD doc row (not in registry): $q"))
    orphanOracles.foreach(q => println(s"[coverage-check] ORACLE without a query: $q"))
    orphanNonScale.foreach(q => println(s"[coverage-check] nonScalePath names a dead query: $q"))

    val rowsOnly = (registry -- oracles).toSeq.sorted
    println(s"[coverage-check] registry=${registry.size} oracles=${oracles.size} " +
      s"doc-mentions=${docTokens.size} rows-only=${rowsOnly.mkString(",")}")
    println(s"[coverage-check] nonScalePath=${SparkEntry.nonScalePath.toSeq.sorted.mkString(",")}")
    if (undocumented.nonEmpty || dead.nonEmpty || orphanOracles.nonEmpty ||
        orphanNonScale.nonEmpty) {
      println(s"[coverage-check] DRIFT: ${undocumented.size} undocumented, " +
        s"${dead.size} dead, ${orphanOracles.size} orphan oracles, " +
        s"${orphanNonScale.size} dead nonScalePath")
      sys.exit(1)
    }
    println("[coverage-check] OK: COVERAGE.md and the registry agree")
  }
}
