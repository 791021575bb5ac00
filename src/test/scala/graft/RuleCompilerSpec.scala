package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.SuiteLoader
import graft.rules.RuleCompiler

/** Per-rule goldens pinned to the cited reference branches
  * (odevalidator/validator.py — see each test). */
class RuleCompilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("a", StringType),
    StructField("n", LongType),
    StructField("d", StringType),
    StructField("ts", StringType),
    StructField("ref", StringType),
    StructField("obj", StructType(Seq(
      StructField("x", StringType), StructField("y", StringType)))),
    StructField("arr", ArrayType(StructType(Seq(StructField("v", StringType)))))))

  /** Validate one JSON record against one INI suite → (path, valid, details). */
  private def run(ini: String, json: String): Seq[(String, Boolean, String)] = {
    val suite = SuiteLoader.fromString("[_settings]\nDataType = json\nSequential = False\n\n" + ini)
    val ds = spark.createDataset(Seq(json))(Encoders.STRING)
    val df = spark.read.schema(schema).json(ds)
    df.select(explode(RuleCompiler.validationsColumn(suite, schema)).as("v"))
      .select(col("v.field_path"), col("v.valid"), col("v.details"))
      .collect().toSeq.map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
  }

  private def one(ini: String, json: String): (String, Boolean, String) = {
    val rs = run(ini, json)
    assert(rs.size == 1, s"expected 1 verdict, got $rs")
    rs.head
  }

  // --- enum (validator.py:206-207) ---------------------------------------

  test("enum membership is case-insensitive") {
    val ini = "[a]\nType = enum\nValues = [\"RV\", \"EV\"]\n"
    assert(one(ini, """{"a":"rv"}""")._2)
    assert(one(ini, """{"a":"EV"}""")._2)
  }

  test("enum failure detail joins values unquoted with ', '") {
    val ini = "[a]\nType = enum\nValues = [\"RV\", \"EV\"]\n"
    val (_, valid, details) = one(ini, """{"a":"XX"}""")
    assert(!valid)
    assert(details == "Value 'XX' not in list of known values: [RV, EV]")
  }

  // --- decimal (validator.py:208-215) ------------------------------------

  test("decimal range failure renders %d-truncated values") {
    val ini = "[d]\nType = decimal\nUpperLimit = 90\nLowerLimit = -90\n"
    val (_, v1, d1) = one(ini, """{"d":"95.5"}""")
    assert(!v1 && d1 == "Value '95' is greater than upper limit '90'")
    val (_, v2, d2) = one(ini, """{"d":"-95.5"}""")
    assert(!v2 && d2 == "Value '-95' is less than lower limit '-90'")
    assert(one(ini, """{"d":"89.99"}""")._2)
  }

  test("decimal parse failure carries the CPython ConversionSyntax text — limits only") {
    // verified against the live reference: with a limit, Decimal('abc')
    // raises inside the guarded block → parse failure; with NO limits the
    // hasattr guards short-circuit before Decimal() runs → PASS
    // (validator.py:210-213)
    val withLimit = "[d]\nType = decimal\nUpperLimit = 90\n"
    val (_, valid, details) = one(withLimit, """{"d":"abc"}""")
    assert(!valid)
    assert(details ==
      "failure to perform decimal validation on abc, error: [<class 'decimal.ConversionSyntax'>]")
    val noLimit = "[d]\nType = decimal\n"
    assert(one(noLimit, """{"d":"abc"}""")._2) // reference passes this
  }

  test("decimal boundary compares exactly, not rounded to a narrow scale") {
    val ini = "[d]\nType = decimal\nUpperLimit = 45\n"
    // 11 fractional digits: a scale-10 cast would round to 45.0000000000
    // and flip this verdict to pass (reference Decimal compares exactly)
    val (_, valid, details) = one(ini, """{"d":"45.00000000001"}""")
    assert(!valid && details == "Value '45' is greater than upper limit '45'")
    assert(one(ini, """{"d":"45"}""")._2) // the boundary itself passes
  }

  // --- timestamp (validator.py:216-229) ----------------------------------

  test("timestamp latest has a one-minute grace window") {
    val ini = "[ts]\nType = timestamp\nLatestTime = 2020-01-01T00:00:00.000Z\n"
    assert(one(ini, """{"ts":"2020-01-01T00:00:59Z"}""")._2) // inside grace
    val (_, valid, details) = one(ini, """{"ts":"2020-01-01T00:01:01Z"}""")
    assert(!valid)
    assert(details ==
      "Timestamp value '2020-01-01 00:01:01+00:00' occurs after latest limit '2020-01-01 00:00:00+00:00'")
  }

  test("timestamp earliest bound failure detail") {
    val ini = "[ts]\nType = timestamp\nEarliestTime = 2018-01-01T00:00:00.000Z\n"
    val (_, valid, details) = one(ini, """{"ts":"2017-12-31T23:59:59Z"}""")
    assert(!valid)
    assert(details ==
      "Timestamp value '2017-12-31 23:59:59+00:00' occurs before earliest limit '2018-01-01 00:00:00+00:00'")
  }

  test("DateFormat strptime path: parse + failure text") {
    val ini = "[ts]\nType = timestamp\nDateFormat = %Y-%m-%d %H:%M:%S\n"
    assert(one(ini, """{"ts":"2019-05-14 19:05:47"}""")._2)
    val (_, valid, details) = one(ini, """{"ts":"19:05 on May 14"}""")
    assert(!valid)
    assert(details ==
      "failure to perform timestamp validation, error: time data '19:05 on May 14' does not match format '%Y-%m-%d %H:%M:%S'")
  }

  // --- presence / empty (validator.py:196-204) ----------------------------

  test("missing field and empty field verdicts") {
    val ini = "[a]\nType = string\n"
    val (_, v1, d1) = one(ini, """{"n":1}""")
    assert(!v1 && d1 == "Field missing: a")
    val (_, v2, d2) = one(ini, """{"a":""}""")
    assert(!v2 && d2 == "Field empty")
  }

  test("AllowEmpty turns the empty verdict into a pass") {
    val ini = "[a]\nType = string\nAllowEmpty = True\n"
    assert(one(ini, """{"a":""}""")._2)
  }

  // --- choice (validator.py:230-243) --------------------------------------

  test("choice: zero, one, and many set children") {
    val ini = "[obj]\nType = choice\nChoices = [\"x\", \"y\"]\n"
    val (_, v0, d0) = one(ini, """{"obj":{}}""")
    assert(!v0 && d0 == "No choices found in 'obj'")
    assert(one(ini, """{"obj":{"x":"1"}}""")._2)
    val (_, v2, d2) = one(ini, """{"obj":{"x":"1","y":"2"}}""")
    assert(!v2 && d2 ==
      "failure to perform choice validation, error: not enough arguments for format string")
  }

  // --- conditionals (validator.py:96-170) ---------------------------------

  private val twoCondIni =
    """[a]
      |Type = enum
      |Values = ["fallback"]
      |EqualsValue = {"conditions":[
      |    {"ifPart":{"fieldName":"ref","fieldValues":["one"]},"thenPart":{"matchAgainst":["m1"]}},
      |    {"ifPart":{"fieldName":"ref","fieldValues":["one","two"]},"thenPart":{"matchAgainst":["m2"]}}]}
      |""".stripMargin

  test("first satisfied condition wins even when later ones also match") {
    // ref="one" satisfies both conditions; only the first thenPart applies
    val (_, v, d) = one(twoCondIni, """{"a":"m2","ref":"one"}""")
    assert(!v && d == "Value of Field ('m2') is not one of the expected values (['m1'])")
    assert(one(twoCondIni, """{"a":"m1","ref":"one"}""")._2)
  }

  test("no condition met falls back to the unconditional check") {
    val (_, v, d) = one(twoCondIni, """{"a":"m1","ref":"other"}""")
    assert(!v && d == "Value 'm1' not in list of known values: [fallback]")
    assert(one(twoCondIni, """{"a":"FALLBACK","ref":"other"}""")._2)
  }

  test("both-absent ifPart: met only when ref AND target are falsy") {
    val ini =
      """[a]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref"}}]}
        |""".stripMargin
    assert(one(ini, """{"n":1}""")._2)              // both absent → met → pass
    val (_, v, d) = one(ini, """{"ref":"x"}""")     // ref present → fallback
    assert(!v && d == "Field missing: a")
    assert(one(ini, """{"a":"x","ref":"y"}""")._2)  // fallback string check passes
  }

  test("empty string counts as falsy for the both-absent condition") {
    val ini =
      """[a]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref"}}]}
        |""".stripMargin
    assert(one(ini, """{"ref":""}""")._2) // "" is falsy like None (validator.py:137)
  }

  test("Python in-semantics: string value never equals numeric literal") {
    val ini =
      """[a]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref","fieldValues":[5]},"thenPart":{"matchAgainst":["hit"]}}]}
        |""".stripMargin
    // ref is a STRING column; "5" in [5] is False in Python → fallback
    assert(one(ini, """{"a":"whatever","ref":"5"}""")._2)
  }

  test("numeric column matches numeric fieldValues across int/float") {
    val ini =
      """[a]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"n","fieldValues":[5.0]},"thenPart":{"matchAgainst":["hit"]}}]}
        |""".stripMargin
    val (_, v, _) = one(ini, """{"a":"miss","n":5}""")
    assert(!v) // condition met (5 == 5.0), matchAgainst fails
  }

  test("startsWithField: falsy source field passes; mismatch fails") {
    val ini =
      """[a]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref","fieldValues":["go"]},"thenPart":{"startsWithField":"d"}}]}
        |""".stripMargin
    assert(one(ini, """{"a":"abc","ref":"go"}""")._2) // d absent → falsy → pass
    val (_, v, det) = one(ini, """{"a":"abc","ref":"go","d":"zz"}""")
    assert(!v && det == "Value of Field ('abc') does not start with zz")
    assert(one(ini, """{"a":"zzabc","ref":"go","d":"zz"}""")._2)
  }

  test("thenPart required-field missing") {
    val ini =
      """[a]
        |Type = string
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref","fieldValues":["go"]},"thenPart":{"matchAgainst":["x"]}}]}
        |""".stripMargin
    val (_, v, d) = one(ini, """{"ref":"go"}""")
    assert(!v && d == "Required Field is missing.")
  }

  test("opaque EqualsValue skips every check (validator.py:96-129)") {
    val ini = "[a]\nType = enum\nValues = [\"x\"]\nEqualsValue = 6\n"
    assert(one(ini, """{"n":1}""")._2)       // even missing passes
    assert(one(ini, """{"a":"zz"}""")._2)    // even bad enum passes
  }

  test("skip conditions raise the flag but never affect field verdicts") {
    val ini =
      """[a]
        |Type = enum
        |Values = ["ok"]
        |EqualsValue = {"conditions":[{"ifPart":{"fieldName":"ref","fieldValues":["skipme"]},"thenPart":{"skipSequentialValidation":"true"}}]}
        |""".stripMargin
    val suite = SuiteLoader.fromString("[_settings]\nDataType = json\nSequential = True\n\n" + ini)
    val ds = spark.createDataset(Seq("""{"a":"bad","ref":"skipme"}"""))(Encoders.STRING)
    val df = spark.read.schema(schema).json(ds)
    val flag = RuleCompiler.compileSkipFlag(suite.rules.head, schema).get
    val row = df.select(flag.as("f"),
      explode(RuleCompiler.validationsColumn(suite, schema)).as("v")).collect().head
    assert(row.getBoolean(0))                         // flag raised
    assert(!row.getStruct(1).getBoolean(1))           // field check still runs (enum fail)
  }

  // --- list rules (validator.py:304-378) -----------------------------------

  test("list rule labels each element with its index") {
    val ini = "[arr.list.v]\nType = string\n"
    val rs = run(ini, """{"arr":[{"v":"a"},{},{"v":""}]}""")
    assert(rs == Seq(
      ("arr{0}.v", true, ""),
      ("arr{1}.v", false, "Field missing: arr{1}.v"),
      ("arr{2}.v", false, "Field empty")))
  }

  test("missing list yields the reference's two probes") {
    val ini = "[arr.list.v]\nType = string\n"
    val rs = run(ini, """{"a":"x"}""")
    assert(rs == Seq(
      ("arr{0}.v", false, "Field missing: arr{0}.v"),
      ("arr{0}", false, "Field missing: arr{0}")))
  }

  test("empty list yields zero verdicts") {
    val ini = "[arr.list.v]\nType = string\n"
    assert(run(ini, """{"arr":[]}""").isEmpty)
  }

  test("list rule applies full typed checks per element") {
    val ini = "[arr.list.v]\nType = decimal\nUpperLimit = 10\nLowerLimit = 0\n"
    val rs = run(ini, """{"arr":[{"v":"5"},{"v":"11"}]}""")
    assert(rs == Seq(
      ("arr{0}.v", true, ""),
      ("arr{1}.v", false, "Value '11' is greater than upper limit '10'")))
  }
}
