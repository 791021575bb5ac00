package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.graftArrayGet
import graft.rules.RuleCompiler

/** SafeArrayGet: 0-based, null out of bounds, and — the reason it exists —
  * legal generated code where Spark's `ElementAt` emits an undeclared
  * `isNull` assignment (literal CreateArray + provably in-bounds index →
  * nullable=false → janino "not an rvalue" → interpreted fallback). */
class ArrayExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("0-based access, out-of-bounds and null element yield null") {
    val df = Seq(
      (Seq[Integer](10, null, 30), 0),
      (Seq[Integer](10, null, 30), 1),
      (Seq[Integer](10, null, 30), 2),
      (Seq[Integer](10, null, 30), 3),
      (Seq[Integer](10, null, 30), -1)).toDF("arr", "i")
    val got = df.select(graftArrayGet(col("arr"), col("i"))).collect().map(_.get(0))
    assert(got.toSeq == Seq(10, null, 30, null, null))
  }

  /** The q_rule_nested_path shape that breaks ElementAt codegen: a path
    * index into an array the same query literally constructs. Forcing
    * CODEGEN_ONLY (no interpreted fallback) pins that the generated class
    * actually compiles — through the parquet write projection, which is
    * where the fallback was silently happening. */
  test("pathColumn over literal CreateArray survives codegen-only mode") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df0 = Seq((1, "b1", "t1"), (2, "b2", "t2")).toDF("k", "brand", "typ")
        .repartition(2) // defeat LocalRelation constant folding
      val df = df0.select(col("k"), struct(
        array(
          struct(col("brand").as("c")),
          struct(col("typ").as("c"))).as("b")).as("a"))
      val out = df.select(col("k"), RuleCompiler.pathColumn(df.schema, "a.b{1}.c").as("r"))
      val dir = java.nio.file.Files.createTempDirectory("safe_array_get").toString
      out.write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).orderBy("k").collect().map(_.getString(1))
      assert(back.toSeq == Seq("t1", "t2"))
      // out-of-range literal index over the same literal array → null rows
      val oob = df.select(RuleCompiler.pathColumn(df.schema, "a.b{5}.c").as("r"))
        .collect().map(_.isNullAt(0))
      assert(oob.forall(identity))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
