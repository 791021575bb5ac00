package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.SuiteLoader
import graft.pipeline.OdeSchema

/** Suite-driven read-schema extension: the effective schema must cover
  * every path a suite's rules READ (targets, condition references,
  * choice children) without disturbing authored fields. */
class OdeSchemaSpec extends AnyFunSuite {

  private def field(st: StructType, dotted: String): Option[DataType] =
    dotted.split('.').foldLeft(Option(st: DataType)) {
      case (Some(s: StructType), name) =>
        s.fields.find(_.name == name).map(_.dataType)
      case _ => None
    }

  test("adds missing leaves, nested chains, and preserves authored types") {
    val suite = SuiteLoader.fromString(
      """[_settings]
        |DataType = json
        |Sequential = False
        |
        |[metadata.customFlag]
        |Type = string
        |
        |[metadata.nested.deep.field]
        |Type = decimal
        |
        |[metadata.recordType]
        |Type = string
        |""".stripMargin)
    val s = OdeSchema.withRulePaths(OdeSchema.record, suite.referencedPaths)
    assert(field(s, "metadata.customFlag").contains(StringType))
    assert(field(s, "metadata.nested.deep.field").contains(StringType))
    // authored field untouched (not re-typed, not duplicated)
    assert(field(s, "metadata.serialId.bundleSize").contains(LongType))
    val meta = s.fields.find(_.name == "metadata").get.dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.count(_ == "recordType") == 1)
  }

  test("referencedPaths includes condition references and choice children") {
    val suite = SuiteLoader.fromString(
      """[_settings]
        |DataType = json
        |Sequential = False
        |
        |[metadata.x]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.flag","fieldValues":["on"]},"thenPart":{"startsWithField":"metadata.prefixSrc"}}]}
        |
        |[metadata.pick]
        |Type = choice
        |Choices = ["a", "b"]
        |""".stripMargin)
    val paths = suite.referencedPaths
    assert(paths.contains("metadata.flag"))
    assert(paths.contains("metadata.prefixSrc"))
    assert(paths.contains("metadata.pick.a") && paths.contains("metadata.pick.b"))
    val s = OdeSchema.withRulePaths(OdeSchema.record, paths)
    assert(field(s, "metadata.flag").contains(StringType))
    assert(field(s, "metadata.pick.a").contains(StringType))
  }
}
