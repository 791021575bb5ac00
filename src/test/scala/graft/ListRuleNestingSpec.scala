package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.SuiteLoader
import graft.rules.RuleCompiler

/**
 * Multi-level `.list` expansion, pinned against an actual run of the
 * reference's populate_list_validations (validator.py:304-378) over the
 * same records — including its quirky double-advanced probe labels
 * (`arr{0}{0}.v`) for a missing outer list.
 */
class ListRuleNestingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("arr", ArrayType(StructType(Seq(
      StructField("inner", ArrayType(StructType(Seq(
        StructField("v", StringType)))))))))))

  private def run(json: String): Seq[(String, Boolean, String)] = {
    val suite = SuiteLoader.fromString(
      "[_settings]\nDataType = json\nSequential = False\n\n[arr.list.inner.list.v]\nType = string\n")
    val ds = spark.createDataset(Seq(json))(Encoders.STRING)
    val df = spark.read.schema(schema).json(ds)
    df.select(explode(RuleCompiler.compileListRule(suite.rules.head, schema)).as("v"))
      .select(col("v.field_path"), col("v.valid"), col("v.details"))
      .collect().toSeq.map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
  }

  test("nested lists expand per element at every level") {
    // reference output for {"arr":[{"inner":[{"v":"a"},{}]},{}]}:
    assert(run("""{"arr":[{"inner":[{"v":"a"},{}]},{}]}""") == Seq(
      ("arr{0}.inner{0}.v", true, ""),
      ("arr{0}.inner{1}.v", false, "Field missing: arr{0}.inner{1}.v"),
      ("arr{1}.inner{0}.v", false, "Field missing: arr{1}.inner{0}.v"),
      ("arr{1}.inner{0}", false, "Field missing: arr{1}.inner{0}")))
  }

  test("missing outer list reproduces the reference's four probes") {
    assert(run("""{"x":1}""").map(_._1) == Seq(
      "arr{0}.inner{0}.v", "arr{0}.inner{0}", "arr{0}{0}.v", "arr{0}{0}"))
  }

  test("empty outer and empty inner lists yield zero verdicts") {
    assert(run("""{"arr":[]}""").isEmpty)
    assert(run("""{"arr":[{"inner":[]}]}""").isEmpty)
  }
}
