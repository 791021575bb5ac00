package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full ODE validation pipeline over the committed
    * fixtures — wide rule projection, sequential windows, per-file totals
    * (driver smoke-checks rows>0 at sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q_ode_file_totals")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
  /** Exact-instrument queries excluded from corpus-scale probes by
    * contract (see [[Queries.nonScalePath]]); CoverageCheck enforces
    * that each names a live registry key. */
  def nonScalePath: Set[String] = Queries.nonScalePath
}
