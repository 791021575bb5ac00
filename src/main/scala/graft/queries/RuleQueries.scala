package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.aggregate.FileAggregates
import graft.config.SuiteLoader
import graft.ext.{Bpe, Dedup, Events, LanguageModel, Multimodal, Packing, Retrieval, Sampling, Similarity, Stats, TextAnalysis}
import graft.ingest.{Metadata, Readers}
import graft.pipeline.{OdeSchema, Routing, ValidationPipeline}
import graft.plans.AsOf
import graft.rules.RuleCompiler
import graft.sequential.SequentialChecks
/** Rule operators over the driver's parquet tables (independent SQL). Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait RuleQueries { this: Queries.type =>
  // =====================================================================
  // Rule operators over the driver's parquet tables (independent SQL)
  // =====================================================================

  private[graft] def ruleSuite(ini: String) = SuiteLoader.fromString(ini)

  private[graft] def schemaOf(df: DataFrame): StructType = df.schema

  /** F3: case-insensitive enum membership. */
  private[graft] def enumRule(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    val suite = ruleSuite(
      "[_settings]\nDataType = json\nSequential = False\n\n[l_returnflag]\nType = enum\nValues = [\"a\", \"n\"]\n")
    df.select(col("l_orderkey"), col("l_linenumber"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("l_orderkey"), col("l_linenumber"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val enumRuleOracle =
    """SELECT l_orderkey, l_linenumber, 'l_returnflag' AS field_path,
      |  lower(l_returnflag) IN ('a','n') AS valid,
      |  CASE WHEN lower(l_returnflag) IN ('a','n') THEN ''
      |       ELSE 'Value ''' || l_returnflag || ''' not in list of known values: [a, n]' END AS details
      |FROM lineitem""".stripMargin

  /** F4: decimal range with the %d-truncated detail rendering. */
  private[graft] def decimalRule(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val suite = ruleSuite(
      "[_settings]\nDataType = json\nSequential = False\n\n[l_quantity]\nType = decimal\nUpperLimit = 45\nLowerLimit = 5\n")
    df.select(col("l_orderkey"), col("l_linenumber"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("l_orderkey"), col("l_linenumber"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val decimalRuleOracle =
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS field_path,
      |  (l_quantity <= 45 AND l_quantity >= 5) AS valid,
      |  CASE WHEN l_quantity > 45 THEN 'Value ''' || CAST(CAST(trunc(l_quantity) AS BIGINT) AS VARCHAR) || ''' is greater than upper limit ''45'''
      |       WHEN l_quantity < 5 THEN 'Value ''' || CAST(CAST(trunc(l_quantity) AS BIGINT) AS VARCHAR) || ''' is less than lower limit ''5'''
      |       ELSE '' END AS details
      |FROM lineitem""".stripMargin

  /** Redistribute a scan whose split count is far below the cluster's
    * parallelism BEFORE an expression-heavy projection fuses into it.
    * A single-row-group parquet file yields ONE scan task no matter how
    * small `maxPartitionBytes` is (splits land on row-group boundaries),
    * so a ~µs/row expression chain runs single-threaded; one small
    * exchange buys the full core count. At scale this is a NO-OP: a
    * 100 TB read produces orders of magnitude more splits than cores,
    * so the guard never fires and no shuffle is added. */
  private[graft] def widenForCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  /** F5: timestamp parse + bounds + the +1-minute latest grace. */
  private[graft] def timestampRule(s: SparkSession, dir: String): DataFrame = {
    val df = widenForCompute(s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ship_ts")))
    val suite = ruleSuite(
      "[_settings]\nDataType = json\nSequential = False\n\n[ship_ts]\nType = timestamp\nEarliestTime = 1993-01-01T00:00:00.000Z\nLatestTime = 1997-06-01T00:00:00.000Z\n")
    df.select(col("l_orderkey"), col("l_linenumber"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("l_orderkey"), col("l_linenumber"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val timestampRuleOracle =
    """SELECT l_orderkey, l_linenumber, 'ship_ts' AS field_path,
      |  (l_shipdate >= TIMESTAMP '1993-01-01 00:00:00'
      |   AND l_shipdate <= TIMESTAMP '1997-06-01 00:01:00') AS valid,
      |  CASE WHEN l_shipdate < TIMESTAMP '1993-01-01 00:00:00'
      |         THEN 'Timestamp value ''' || strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') || '+00:00'' occurs before earliest limit ''1993-01-01 00:00:00+00:00'''
      |       WHEN l_shipdate > TIMESTAMP '1997-06-01 00:01:00'
      |         THEN 'Timestamp value ''' || strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') || '+00:00'' occurs after latest limit ''1997-06-01 00:00:00+00:00'''
      |       ELSE '' END AS details
      |FROM lineitem""".stripMargin

  /** F5 leniency: the dateutil parse grid (fixtures/lenient, generated
   *  through the live reference validator) — pins exotic-format parsing
   *  (colon-less offsets, compact ISO, month names), the parsed VALUE
   *  (via the earliest-limit message), the naive-vs-aware TypeError path,
   *  and ParserError texts. Reference validator.py:219. */
  private[graft] def timestampLenient(s: SparkSession, dir: String): DataFrame = {
    val suite = SuiteLoader.fromFile(s"$Fix/lenient/suite.ini")
    val df = s.read.schema("id LONG, ts STRING").json(s"$Fix/lenient/data/ts.json")
    df.select(col("id"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("id"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  /** F6: choice (exactly-one-of) over a constructed struct. */
  private[graft] def choiceRule(s: SparkSession, dir: String): DataFrame = {
    val df0 = s.read.parquet(t(dir, "orders"))
    val df = df0.select(col("o_orderkey"), struct(
      when(col("o_orderstatus") === "O", lit("open")).as("open_note"),
      when(col("o_orderstatus") === "F", lit("done")).as("done_note"),
      when(col("o_totalprice") > 200000, lit("big")).as("big_note")).as("req"))
    val suite = ruleSuite(
      "[_settings]\nDataType = json\nSequential = False\n\n[req]\nType = choice\nChoices = [\"open_note\", \"done_note\", \"big_note\"]\n")
    df.select(col("o_orderkey"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("o_orderkey"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val choiceRuleOracle =
    """WITH c AS (
      |  SELECT o_orderkey,
      |    (CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END +
      |     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END +
      |     CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS cnt
      |  FROM orders)
      |SELECT o_orderkey, 'req' AS field_path, cnt = 1 AS valid,
      |  CASE WHEN cnt = 0 THEN 'No choices found in ''req'''
      |       WHEN cnt > 1 THEN 'failure to perform choice validation, error: not enough arguments for format string'
      |       ELSE '' END AS details
      |FROM c""".stripMargin

  /** F7+F9+F10+F11: first-wins conditional chain with fallback. */
  private[graft] def conditionalRule(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))
    val suite = ruleSuite(
      """[_settings]
        |DataType = json
        |Sequential = False
        |
        |[l_linestatus]
        |Type = enum
        |Values = ["f"]
        |EqualsValue = {"conditions":[
        |    {"ifPart":{"fieldName":"l_returnflag","fieldValues":["N"]},"thenPart":{"matchAgainst":["O"]}},
        |    {"ifPart":{"fieldName":"l_returnflag","fieldValues":["A"]},"thenPart":{"startsWithField":"l_returnflag"}}]}
        |""".stripMargin)
    df.select(col("l_orderkey"), col("l_linenumber"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("l_orderkey"), col("l_linenumber"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val conditionalRuleOracle =
    """SELECT l_orderkey, l_linenumber, 'l_linestatus' AS field_path,
      |  CASE WHEN l_returnflag = 'N' THEN l_linestatus = 'O'
      |       WHEN l_returnflag = 'A' THEN l_linestatus LIKE l_returnflag || '%'
      |       ELSE lower(l_linestatus) = 'f' END AS valid,
      |  CASE WHEN l_returnflag = 'N' THEN
      |         CASE WHEN l_linestatus = 'O' THEN ''
      |              ELSE 'Value of Field (''' || l_linestatus || ''') is not one of the expected values ([''O''])' END
      |       WHEN l_returnflag = 'A' THEN
      |         CASE WHEN l_linestatus LIKE l_returnflag || '%' THEN ''
      |              ELSE 'Value of Field (''' || l_linestatus || ''') does not start with ' || l_returnflag END
      |       ELSE CASE WHEN lower(l_linestatus) = 'f' THEN ''
      |            ELSE 'Value ''' || l_linestatus || ''' not in list of known values: [f]' END
      |  END AS details
      |FROM lineitem""".stripMargin

  /** F8: both-absent ifPart condition (no fieldValues). */
  private[graft] def bothAbsentRule(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio"),
        nullif(col("o_orderstatus"), lit("O")).as("ref_status"))
    val suite = ruleSuite(
      """[_settings]
        |DataType = json
        |Sequential = False
        |
        |[prio]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref_status"}}]}
        |""".stripMargin)
    df.select(col("o_orderkey"),
      RuleCompiler.compileRule(suite.rules.head, schemaOf(df)).as("v"))
      .select(col("o_orderkey"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val bothAbsentRuleOracle =
    """SELECT o_orderkey, 'prio' AS field_path,
      |  CASE WHEN o_orderstatus = 'O' AND o_orderpriority = '1-URGENT' THEN TRUE
      |       WHEN o_orderpriority = '1-URGENT' THEN FALSE
      |       ELSE TRUE END AS valid,
      |  CASE WHEN o_orderstatus = 'O' AND o_orderpriority = '1-URGENT' THEN ''
      |       WHEN o_orderpriority = '1-URGENT' THEN 'Field missing: prio'
      |       ELSE '' END AS details
      |FROM orders""".stripMargin

  /** F12: sequential-skip flag computation. */
  private[graft] def skipFlagRule(s: SparkSession, dir: String): DataFrame = {
    val df = events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val suite = ruleSuite(
      """[_settings]
        |DataType = json
        |Sequential = True
        |
        |[value]
        |Type = decimal
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"event_type","fieldValues":["error"]},"thenPart":{"skipSequentialValidation":"true"}}]}
        |""".stripMargin)
    df.select(col("event_id"),
      coalesce(RuleCompiler.compileSkipFlag(suite.rules.head, schemaOf(df)).get, lit(false))
        .as("skip"))
  }

  private[graft] val skipFlagRuleOracle =
    "SELECT event_id, event_type = 'error' AS skip FROM events"

  /** P7: dotted-path + `{i}` index resolution over a nested structure. */
  private[graft] def nestedPathRule(s: SparkSession, dir: String): DataFrame = {
    val df0 = s.read.parquet(t(dir, "part"))
    val df = df0.select(col("p_partkey"), struct(
      array(
        struct(col("p_brand").as("c")),
        struct(col("p_type").as("c"))).as("b")).as("a"))
    df.select(col("p_partkey"),
      RuleCompiler.pathColumn(schemaOf(df), "a.b{1}.c").as("resolved"))
  }

  private[graft] val nestedPathRuleOracle =
    "SELECT p_partkey, p_type AS resolved FROM part"

  /** P8: dynamic `.list` rule expansion (present / missing / empty array). */
  private[graft] def listRule(s: SparkSession, dir: String): DataFrame = {
    val df0 = s.read.parquet(t(dir, "orders"))
    val items = when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
      .otherwise(when(pmod(col("o_orderkey"), lit(11)) === 0, array().cast("array<struct<x:string>>"))
        .otherwise(array(
          struct(nullif(col("o_orderstatus"), lit("O")).as("x")),
          struct(col("o_orderpriority").as("x")))))
    val df = df0.select(col("o_orderkey"), items.as("items"))
    val suite = ruleSuite(
      "[_settings]\nDataType = json\nSequential = False\n\n[items.list.x]\nType = string\n")
    df.select(col("o_orderkey"),
      explode(RuleCompiler.compileListRule(suite.rules.head, schemaOf(df))).as("v"))
      .select(col("o_orderkey"), col("v.field_path").as("field_path"),
        col("v.valid").as("valid"), col("v.details").as("details"))
  }

  private[graft] val listRuleOracle =
    """WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders)
      |SELECT o_orderkey, 'items{0}.x' AS field_path, FALSE AS valid,
      |       'Field missing: items{0}.x' AS details
      |FROM base WHERE o_orderkey % 7 = 0
      |UNION ALL
      |SELECT o_orderkey, 'items{0}', FALSE, 'Field missing: items{0}'
      |FROM base WHERE o_orderkey % 7 = 0
      |UNION ALL
      |SELECT o_orderkey, 'items{0}.x',
      |       o_orderstatus <> 'O',
      |       CASE WHEN o_orderstatus = 'O' THEN 'Field missing: items{0}.x' ELSE '' END
      |FROM base WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
      |UNION ALL
      |SELECT o_orderkey, 'items{1}.x', TRUE, ''
      |FROM base WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0""".stripMargin
}
