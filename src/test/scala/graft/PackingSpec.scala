package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Packing

/** Shard assignment + sequence packing (training-data export shaping). */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, 1 + (i * 37) % 200)).toDF("id", "toks")
  }

  test("shardId is deterministic, in-range, and reasonably balanced (both families)") {
    import spark.implicits._
    for (family <- Seq("xxhash64", "mult")) {
      val d = Packing.withShard(docs(4000), "id", 16, family)
      val counts = d.groupBy("shard").count().as[(Long, Long)].collect().toMap
      assert(counts.keySet.subsetOf((0L until 16L).toSet), family)
      assert(counts.size == 16, family)
      // 4000/16 = 250 expected; a broken mixer would collapse shards
      assert(counts.values.forall(c => c > 125 && c < 500),
        s"$family skewed: $counts")
      // clustered ids (multiples of 16): a mod-n mapping with a
      // multiplier ~= 1 (mod 16) degenerates to id mod 16 and drops
      // them all in shard 0 — the high-bits mapping must still spread
      val clustered = (0 until 1024).map(i => (i.toLong * 16, 1))
        .toDF("id", "toks")
      val cc = Packing.withShard(clustered, "id", 16, family)
        .groupBy("shard").count().as[(Long, Long)].collect().toMap
      assert(cc.size >= 8, s"$family collapsed on clustered ids: $cc")
      // determinism across evaluations
      val again = Packing.withShard(docs(4000), "id", 16, family)
        .groupBy("shard").count().as[(Long, Long)].collect().toMap
      assert(again == counts, family)
    }
  }

  test("packSequences: offsets are a per-shard running layout with no gaps") {
    import spark.implicits._
    val packed = Packing.packSequences(docs(500), "id", "toks",
      budget = 256, nShards = 4, family = "mult")
      .select("shard", "id", "toks", "start_offset", "seq_id")
      .as[(Long, Long, Int, Long, Long)].collect()
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._2)
      // each doc starts exactly where the previous one ended (concat
      // layout, no slack), and seq_id is its start chunk
      var offset = 0L
      inOrder.foreach { case (_, _, toks, start, seq) =>
        assert(start == offset)
        assert(seq == start / 256)
        offset += toks
      }
    }
  }

  test("packingSummary conserves documents and tokens") {
    import spark.implicits._
    val d = docs(500)
    val total = d.agg(sum("toks")).as[Long].head()
    val s = Packing.packingSummary(d, "id", "toks", budget = 256,
      nShards = 4, family = "mult")
    val (nd, nt) = s.agg(sum("n_docs"), sum("seq_tokens"))
      .as[(Long, Long)].head()
    assert(nd == 500 && nt == total)
    // every sequence except possibly each shard's last spans >= budget
    // worth of layout: its successor starts in a later chunk
    val bad = s.filter(col("n_docs") <= 0).count()
    assert(bad == 0)
  }

  test("shardManifest matches a hand-computed mult-family assignment") {
    import spark.implicits._
    val d = docs(100)
    val m = Packing.shardManifest(d, "id", "toks", nShards = 8, family = "mult")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val expected = (0 until 100).groupBy(i =>
      (((i.toLong % 2147483648L) * 2654435761L) % 4294967296L) * 8 >> 32)
    expected.foreach { case (shard, ids) =>
      val row = m(shard)
      assert(row._2 == ids.size)
      assert(row._4 == ids.min && row._5 == ids.max)
    }
  }

  test("chunkDocuments: full coverage, ceil(len/stride) chunks, short tail") {
    import spark.implicits._
    val text = (1 to 23).map(i => s"w$i").mkString(" ") // 23 words
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = Packing.chunkDocuments(df, "text", "doc_id", window = 10, stride = 4)
      .orderBy("chunk_id").collect()
    // starts 0,4,8,12,16,20 -> 6 = ceil(23/4) chunks
    assert(chunks.length == 6)
    assert(chunks.map(_.getLong(2)).toSeq == Seq(0L, 4L, 8L, 12L, 16L, 20L))
    // interior chunks are full windows; the tail is len - start
    assert(chunks.map(_.getLong(3)).toSeq == Seq(10L, 10L, 10L, 10L, 7L, 3L))
    // md5 of the first chunk is md5 of words 1..10 verbatim (case kept)
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 10).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(chunks.head.getString(4) == exp)
  }
}
