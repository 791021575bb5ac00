package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.SuiteLoader
import graft.model.ValidationSuite

/**
 * Config routing by key prefix (SURVEY §2.1 S10, §2.3 F14, §2.5 J2;
 * reference cvp_bucket_event_lambda_handler.py:244-267).
 *
 * The reference matches each object key against the STATIC_PREFIXES list
 * (first match wins), loads `<prefix>/config.ini` as the suite, and skips
 * files at the prefix root (key must have more than prefix-depth+1 '/'
 * segments). Spark-first restatement: the prefix match is a Column
 * predicate on the bucket-relative key (drivable from input_file_name()),
 * suites load once on the driver, and a multi-suite batch processes each
 * route group independently — embarrassingly parallel, no data movement
 * for routing itself.
 */
object Routing {

  /** First matching prefix, in declaration order (first-wins like the
   *  reference's loop) — null when nothing matches. */
  def matchedPrefix(key: Column, prefixes: Seq[String]): Column =
    prefixes.foldRight(lit(null).cast("string")) { (p, acc) =>
      when(key.startsWith(p), lit(p)).otherwise(acc)
    }

  /** Root-file guard (cvp...py:252-256): the key must sit deeper than
   *  `<prefix>/<one-level>` — `key.count('/') > prefix.count('/') + 1`. */
  def isBelowPrefixRoot(key: Column, prefix: Column): Column =
    (size(split(key, "/")) - 1) > (size(split(prefix, "/")) - 1) + 1

  /** Route assignment: adds `route_prefix` (null = unmatched) and
   *  `routable` (matched AND below the prefix root AND not the loaded
   *  suite file itself). Only `<prefix>/config.ini` is special — a
   *  config.ini nested deeper is ordinary data to the reference, and
   *  `runRouted`'s glob does process it; flag and pipeline must agree. */
  def assignRoutes(df: DataFrame, key: Column, prefixes: Seq[String]): DataFrame = {
    val prefix = matchedPrefix(key, prefixes)
    df.withColumn("route_prefix", prefix)
      .withColumn("routable",
        prefix.isNotNull && isBelowPrefixRoot(key, prefix) &&
          key =!= concat(prefix, lit("/config.ini")))
  }

  /** Load `<root>/<prefix>/config.ini` per prefix (driver-side, once per
   *  suite — like the reference's per-event config download, amortized). */
  def loadSuites(root: String, prefixes: Seq[String]): Map[String, ValidationSuite] =
    prefixes.map(p => p -> SuiteLoader.fromFile(s"$root/$p/config.ini")).toMap

  /** Multi-suite batch: run the full pipeline once per route prefix over
   *  its own files (one-level-deep glob; depth enforced by the guard).
   *  Driver-side loop over a small prefix set — each run is an independent
   *  Spark job, as in the reference's one-Lambda-per-object model but
   *  batched per prefix. */
  def runRouted(spark: SparkSession, root: String, prefixes: Seq[String])
      : Map[String, ValidationPipeline.Result] = {
    val suites = loadSuites(root, prefixes)
    suites.map { case (prefix, suite) =>
      // schema = authored base + every path this suite's rules READ —
      // targets AND condition references (custom fields would otherwise
      // null out as 'Field missing' / never-firing conditions)
      val schema = OdeSchema.withRulePaths(
        OdeSchema.record, suite.referencedPaths)
      val records = graft.ingest.Readers.ndjson(spark, s"$root/$prefix/*/*", schema)
        .filter(Routing.isBelowPrefixRoot(
          graft.ingest.Metadata.keyColumn(col("file"), root), lit(prefix)))
      val validated = ValidationPipeline.validateRecords(records, suite)
      prefix -> ValidationPipeline.run(validated, suite)
    }
  }
}
