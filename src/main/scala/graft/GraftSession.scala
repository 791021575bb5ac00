package graft

import org.apache.spark.sql.SparkSession

/** One local-session recipe for every driver-contract main (Verify,
  * Bench, BenchValidation, PlanAudit) — a config fix applied here (e.g.
  * a new required legacy flag) cannot silently diverge between the
  * correctness gate and the benchmark. UTC, classic (non-ANSI) casts,
  * TIMESTAMP(NANOS) surfaced as long. */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      // the engine's SQL surface: graft_* native functions + the as-of
      // lowering rule, injected the way a cluster deployment would
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate adds `size(e) > 0` above every explode;
      // when e is an ALIAS of a computed array, predicate pushdown then
      // inlines the full defining expression into the filter, so every
      // row evaluates the array TWICE (optimization guide §4.4's
      // duplicated-evaluation trap, with native expressions). In this
      // engine the exploded arrays are the compiled rule-validation
      // arrays — the heaviest projections on the flagship path — and
      // they are NEVER empty by construction (every rule emits a
      // verdict), so the inferred filter prunes nothing and costs a
      // second full rule evaluation per row (measured: the explode-
      // consuming validation family runs 1.2-1.6x slower with the rule
      // on; plans/r15/q_error_histogram_parquet_before.txt shows the
      // inlined duplicate). Scale-independent: the duplication is
      // per-row CPU, so the fix transfers to any cluster size.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    // SPARK_GRAFT_CODEGEN_ONLY=1: the per-round codegen audit — every
    // expression must compile (no interpreted fallback), so a new
    // expression that silently falls off the codegen path fails loudly
    if (sys.env.get("SPARK_GRAFT_CODEGEN_ONLY").contains("1"))
      b.config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        .config("spark.sql.codegen.fallback", "false")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
