package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Upsert

/** Latest-wins merge edge cases beyond the q_upsert_latest oracle. */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null tombstone flags mean not-deleted; updates win version ties") {
    val base = Seq((1L, "old", 0), (2L, "keep", 0), (3L, "gone", 0))
      .toDF("id", "v", "version")
    val updates = Seq(
      (1L, "new", 0, Option.empty[Boolean]), // same version: update wins, null flag kept
      (3L, "tomb", 1, Option(true)),         // tombstone removes the key
      (4L, "ins", 1, Option(false)))         // brand-new key inserted
      .toDF("id", "v", "version", "deleted")
    val got = Upsert.latestSnapshot(base, updates, Seq("id"), "version",
        deleteCol = Some("deleted"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "keep", 4L -> "ins"))
  }
}
