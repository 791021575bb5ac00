package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.{graftCharEntropy, graftCharShingles, graftWordNgrams, graftWordShingles}

/** Native shingle expressions vs the interpreted Column-algebra chain they
  * replaced — element-for-element equality on real document text, plus the
  * short-document edge the Column version could not express (it threw). */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The previous HOF formulation, kept here as the cross-check oracle. */
  private def hofWordShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val words = split(trim(lower(text)), "\\s+")
    val count = greatest(size(words) - (n - 1), lit(0))
    array_distinct(transform(sequence(lit(1), count), i =>
      array_join(slice(words, i, lit(n)), " ")))
  }

  private def hofCharShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val t = lower(text)
    val count = greatest(length(t) - (n - 1), lit(0))
    array_distinct(transform(sequence(lit(1), count), i => substring(t, i, lit(n))))
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")

  test("word shingles match the HOF formulation on real documents (n=2,3)") {
    for (n <- Seq(2, 3)) {
      val mismatches = docs
        .select(graftWordShingles(col("text"), n).as("native"),
          hofWordShingles(col("text"), n).as("hof"))
        .filter(not(col("native") === col("hof")))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }

  test("char shingles match the HOF formulation on real documents (n=4,5)") {
    for (n <- Seq(4, 5)) {
      val mismatches = docs
        .select(graftCharShingles(col("text"), n).as("native"),
          hofCharShingles(col("text"), n).as("hof"))
        .filter(not(col("native") === col("hof")))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }

  test("documents shorter than n yield the empty array, not an error") {
    val df = Seq("", "one", "one two", "  spaced  ").toDF("text")
    val w = df.select(graftWordShingles(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(w(0).isEmpty)            // "" → one empty word, < 3
    assert(w(1).isEmpty)            // 1 word
    assert(w(2).isEmpty)            // 2 words
    assert(w(3).isEmpty)            // trim leaves 1 word, no 3-gram window
    val c = df.select(graftCharShingles(col("text"), 5)).collect().map(_.getSeq[String](0))
    assert(c(0).isEmpty && c(1).isEmpty)
    assert(c(2) == Seq("one t", "ne tw", "e two"))
  }

  test("word n-grams keep duplicates in document order; shingles are their distinct") {
    // the non-distinct companion: HOF formulation without array_distinct
    def hofWordNgrams(text: org.apache.spark.sql.Column, n: Int) = {
      val words = split(trim(lower(text)), "\\s+")
      val count = greatest(size(words) - (n - 1), lit(0))
      transform(sequence(lit(1), count), i => array_join(slice(words, i, lit(n)), " "))
    }
    for (n <- Seq(2, 3)) {
      val mismatches = docs
        .select(graftWordNgrams(col("text"), n).as("native"),
          hofWordNgrams(col("text"), n).as("hof"),
          graftWordShingles(col("text"), n).as("shingles"))
        .filter(not(col("native") === col("hof")) ||
          not(array_distinct(col("native")) === col("shingles")))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
    val r = Seq("A b a b a").toDF("text")
      .select(graftWordNgrams(col("text"), 2)).head().getSeq[String](0)
    assert(r == Seq("a b", "b a", "a b", "b a"), "duplicates kept, in order")
  }

  test("top n-gram dominance: argmax with lexicographic tie-break") {
    val df = Seq(
      (1L, "x y x y x y z"),       // "x y" ×3 of 6 grams → 0.5
      (2L, "a b c"),               // all grams unique → first lexicographic
      (3L, "solo")                 // < 2 words → absent
    ).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.topNgramDominance(df, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == (("x y", 3L, 6L, 0.5)))
    assert(got(2L) == (("a b", 1L, 2L, 0.5)), "tie → lexicographically first gram")
    assert(!got.contains(3L))
  }

  test("deflate ratio equals java.util.zip on real documents; repetition compresses") {
    import graft.functions.GraftFunctions.graftDeflateRatio
    def reference(s: String): Double = {
      val in = s.getBytes("UTF-8")
      if (in.isEmpty) 1.0 else {
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(in); d.finish()
        val buf = new Array[Byte](1024)
        var out = 0L
        while (!d.finished()) out += d.deflate(buf)
        d.end()
        out.toDouble / in.length
      }
    }
    val got = docs.limit(50)
      .select(col("text"), graftDeflateRatio(col("text")).as("r"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    got.foreach { case (text, r) => assert(r == reference(text), s"doc: ${text.take(40)}") }
    // the signal: a highly repetitive doc compresses far below varied text
    val rep = Seq(Tuple1("spam spam spam spam spam spam spam spam spam spam"))
      .toDF("t").select(graftDeflateRatio(col("t"))).head().getDouble(0)
    val varied = Seq(Tuple1("the quick brown fox jumps over a lazy dog tonight"))
      .toDF("t").select(graftDeflateRatio(col("t"))).head().getDouble(0)
    assert(rep < varied * 0.7, s"rep=$rep varied=$varied")
    // empty input: defined as 1.0, not a crash or division by zero
    assert(Seq(Tuple1("")).toDF("t")
      .select(graftDeflateRatio(col("t"))).head().getDouble(0) == 1.0)
  }

  test("hash embed: unit L2 norm per doc, buckets in range, deterministic") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.ext.TextAnalysis.hashEmbed(df, "text", "doc_id", dims = 64)
    val rows = a.collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64), "buckets in [0, 64)")
    val norms = rows.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.map(r => r.getDouble(3) * r.getDouble(3)).sum
    }
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-4, s"norm² = $n"))
    val b = graft.ext.TextAnalysis.hashEmbed(df, "text", "doc_id", dims = 64).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet)
  }

  test("new expressions survive SQL registration") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("a b c d", Seq(10, 20, 30))).toDF("t", "arr")
      .createOrReplaceTempView("text_expr_spec")
    val r = spark.sql(
      """SELECT graft_word_shingles(t, 2) AS ws, graft_char_shingles(t, 3) AS cs,
        |       graft_array_get(arr, 1) AS el, graft_array_get(arr, 9) AS oob,
        |       graft_gunzip_text(CAST('plain' AS BINARY)) AS pt
        |FROM text_expr_spec""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](1).head == "a b")
    assert(r.getInt(2) == 20 && r.isNullAt(3))
    assert(r.getString(4) == "plain")
  }

  test("gunzip roundtrips arbitrary text (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val prop = Prop.forAll(Gen.asciiPrintableStr, Gen.alphaNumStr) { (a, b) =>
      val text = a + "é" + b // force some multi-byte UTF-8
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(text.getBytes("UTF-8")); gz.close()
      val viaGzip = graft.functions.CodecOps.gunzipText(bos.toByteArray).toString
      val viaPlain = graft.functions.CodecOps.gunzipText(text.getBytes("UTF-8")).toString
      viaGzip == text && viaPlain == text
    }
    assert(check(Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  test("edge semantics: multi-space runs, tabs, and case folding") {
    val df = Seq("A  B\tC d", "aaaa").toDF("text")
    val got = df.select(graftWordShingles(col("text"), 2)).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1).isEmpty)
    val ch = df.select(graftCharShingles(col("text"), 2)).collect().map(_.getSeq[String](0))
    assert(ch(1) == Seq("aa")) // distinct keeps first occurrence only
  }

  test("char entropy: closed-form values, empty text, code-point counting") {
    // "aabb": p = {0.5, 0.5} → exactly 1 bit/char; "abcd": 2 bits;
    // "aaaa" and "" → 0; the 2-code-point "汉字": 1 bit.
    val df = Seq("aabb", "abcd", "aaaa", "", "汉字").toDF("text")
    val got = df.select(graftCharEntropy(col("text"))).collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(math.abs(got(1) - 2.0) < 1e-12)
    assert(got(2) == 0.0 && got(3) == 0.0)
    assert(got(4) == 1.0)
    // supplementary plane: one emoji = ONE code point (two UTF-16 chars)
    val emoji = Seq("😀😀").toDF("text")
      .select(graftCharEntropy(col("text"))).head().getDouble(0)
    assert(emoji == 0.0, "surrogate pair must count as a single symbol")
  }

  test("char entropy orders signals: constant < prose < uniform alphabet") {
    val df = Seq(
      ("spam", "zzzzzzzzzzzzzzzzzzzz"),
      ("prose", "the quick brown fox jumps over the lazy dog"),
      ("uniform", "abcdefghijklmnopqrstuvwxyz0123456789"))
      .toDF("kind", "text")
    val got = df.select(col("kind"), graftCharEntropy(col("text")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("spam") == 0.0)
    assert(got("spam") < got("prose") && got("prose") < got("uniform"))
  }

  test("winnowing: shared runs >= w+k-1 tokens share a fingerprint; short docs are empty") {
    import graft.ext.TextAnalysis
    val k = 3; val w = 4
    val shared = "one two three four five six seven" // 7 >= w+k-1 = 6 tokens
    val df = Seq(
      ("a", s"xx yy $shared zz"),
      ("b", s"pp $shared qq rr"),
      ("tiny", "just five words not enough")) // 5 words -> 3 grams < w windows
      .toDF("id", "text")
    val fps = df.select(col("id"),
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("fps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps("a") intersect fps("b")).nonEmpty,
      "winnowing guarantee: a shared >= w+k-1 run must share a fingerprint")
    assert(fps("tiny").isEmpty)
    // density: selections are a strict subset of all k-gram hashes
    assert(fps("a").size < 10) // doc has 11 words -> 9 grams, 6 windows
    // the corpus-scale DataFrame form selects the identical set
    val dfForm = TextAnalysis.winnowFingerprintsDF(df, "text", "id", k, w)
      .collect().groupBy(_.getString(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert(dfForm("a") == fps("a") && dfForm("b") == fps("b"))
    assert(!dfForm.contains("tiny"))
  }
}
