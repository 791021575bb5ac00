package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** [[graft.functions.Md5PrefixLong]] must be value-identical to the
 *  `conv(substring(md5(s), 1, n), 16, 10)` spelling it replaces — the
 *  engine's cross-engine hash-bucket convention that every DuckDB
 *  oracle replays as `CAST('0x' || substr(md5(s), 1, n) AS BIGINT)`. */
class Md5PrefixLongSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefix long equals conv(substring(md5)) for 4/8/15 nibbles, incl. unicode and empty") {
    val strs = Seq("", "a", "hello world", "0:the quick brown fox",
      "süß 中文 😀", "pb:12345", "split:999", "x" * 300)
      .toDF("s")
    for (n <- Seq(4, 8, 15)) {
      val both = strs.select(
        GraftFunctions.graftMd5PrefixLong(col("s"), n).as("native"),
        conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("legacy"))
      assert(both.filter(col("native") =!= col("legacy")).count() === 0,
        s"mismatch at $n nibbles")
    }
  }

  test("SQL registration and null propagation") {
    val out = Seq(Option("abc"), None).toDF("s")
      .selectExpr("graft_md5_prefix_long(s, 8) AS h").collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }
}
