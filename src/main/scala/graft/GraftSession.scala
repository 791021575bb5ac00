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
