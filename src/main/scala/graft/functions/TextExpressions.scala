package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text-shingling expressions (dedup pipeline, SURVEY §7.1 step 9).
 *
 * Why native: the Column formulation
 * `array_distinct(transform(sequence(1, count), i => array_join(slice(
 * words, i, n), " ")))` evaluates an interpreted lambda per shingle and
 * allocates a sliced array + joined string per element — measured 4.9 s
 * just to explode 260k shingles at sf0.1 (the downstream typed MinHash
 * aggregate took 0.07 s). One generated call into a tight loop replaces
 * the whole chain.
 *
 * Semantics preserved from the Column version for every input the gate
 * exercises: lowercase → trim spaces → split on `\s+` with Java limit -1
 * (leading/trailing empty words kept), full n-windows joined by a single
 * space, distinct keeping first-occurrence order. One deliberate
 * divergence: for texts with fewer than n words the Column version's
 * `sequence(1, 0)` DESCENDS to [1, 0] and `slice(words, 0, n)` throws —
 * the native version returns the empty array instead (strictly more
 * correct; no fixture or testdata doc hits the old throw).
 */
object ShingleOps {
  /** \s of Java regex: exactly these six ASCII characters. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** lower → space-trim → manual "\s+" split with limit -1 (empty token
   *  before a leading run and after a trailing run, exactly like
   *  java.util.regex split). Shared by the shingle and n-gram paths. */
  private def splitWords(text: UTF8String): mutable.ArrayBuffer[String] = {
    val s = text.toLowerCase.trim.toString
    val len = s.length
    val words = mutable.ArrayBuffer.empty[String]
    var i = 0
    var start = 0
    while (i < len) {
      if (isWs(s.charAt(i))) {
        words += s.substring(start, i)
        i += 1
        while (i < len && isWs(s.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    words += s.substring(start, len)
    words
  }

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val words = splitWords(text)
    val count = words.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](count * 2)
    val sb = new java.lang.StringBuilder(64)
    var w = 0
    while (w < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(w + j))
        j += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams of lower(text) in document order, duplicates kept —
   *  the occurrence-counting companion of [[wordShingles]] (repetition
   *  metrics need multiplicities; set semantics would hide exactly the
   *  repeats being measured). Same normalization: lower → trim → split
   *  on `\s+` with Java limit -1; full n-windows only. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val words = splitWords(text)
    val count = words.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(64)
    var w = 0
    while (w < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(w + j))
        j += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Character n-gram shingles of lower(text), distinct, first-occurrence
   *  order — full windows only (empty array below n chars). */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val count = s.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) { seen.add(s.substring(i, i + n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Raw-deflate compression ratio — the classic cheap redundancy signal
 *  (highly repetitive/templated text compresses far below natural prose;
 *  curation pipelines cut on it alongside the n-gram repetition
 *  metrics). Level-6 raw DEFLATE (no gzip header — an 18-byte header
 *  would dominate short documents), ratio = deflated/original UTF-8
 *  bytes; empty input → 1.0. Deterministic for a fixed JVM zlib, but not
 *  expressible in DuckDB SQL — the registered query is rows-only and the
 *  VALUES are pinned by TextExpressionsSpec against java.util.zip
 *  directly. The Deflater is thread-local (reset per row): per-row
 *  allocation of native zlib state would dominate the scan. */
object DeflateOps {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }

  def ratio(text: UTF8String): Double = {
    val in = text.getBytes
    if (in.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](1024)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / in.length
  }
}

/** Shared shape: string → array<string> via a static one-pass helper. */
abstract class ShingleExpression extends UnaryExpression with ExpectsInputTypes {
  def n: Int
  protected def helper: String // fully-qualified static method

  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $helper($v, $n);")
}

/** Distinct word n-gram shingles of lower(text). */
case class WordShingles(child: Expression, n: Int) extends ShingleExpression {
  require(n > 0, "shingle width must be positive")
  override def prettyName: String = "graft_word_shingles"
  override protected def helper: String = "graft.functions.ShingleOps.wordShingles"
  override def nullSafeEval(v: Any): Any =
    ShingleOps.wordShingles(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Raw-deflate compression ratio of a string column, in double. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_deflate_ratio"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    DeflateOps.ratio(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = graft.functions.DeflateOps.ratio($v);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character-distribution Shannon entropy: one pass to histogram the
 *  text's Unicode code points, one pass over the (≤ alphabet-size)
 *  histogram to sum −p·log₂p. The cheap gibberish/boilerplate signal:
 *  natural prose sits ~4-5 bits/char, single-char spam near 0, random
 *  base64 near 6. */
object EntropyOps {
  private val Ln2 = math.log(2.0)

  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var total = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1L
      total += 1L
      i += Character.charCount(cp)
    }
    // deterministic sum order (ascending code point) so the value is
    // reproducible run-to-run; the oracle's own order differs by ulps
    // only, absorbed by the caller's 6-dp rounding
    val keys = new java.util.ArrayList[Integer](counts.keySet())
    java.util.Collections.sort(keys)
    var h = 0.0
    val it = keys.iterator()
    while (it.hasNext) {
      val p = counts.get(it.next())(0).toDouble / total
      h -= p * (math.log(p) / Ln2)
    }
    h
  }
}

/** Shannon entropy (bits per character) of a string's code points. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_char_entropy"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    EntropyOps.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = graft.functions.EntropyOps.charEntropy($v);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All word n-grams of lower(text) in order, duplicates kept. */
case class WordNgrams(child: Expression, n: Int) extends ShingleExpression {
  require(n > 0, "n-gram width must be positive")
  override def prettyName: String = "graft_word_ngrams"
  override protected def helper: String = "graft.functions.ShingleOps.wordNgrams"
  override def nullSafeEval(v: Any): Any =
    ShingleOps.wordNgrams(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character n-gram shingles of lower(text). */
case class CharShingles(child: Expression, n: Int) extends ShingleExpression {
  require(n > 0, "shingle width must be positive")
  override def prettyName: String = "graft_char_shingles"
  override protected def helper: String = "graft.functions.ShingleOps.charShingles"
  override def nullSafeEval(v: Any): Any =
    ShingleOps.charShingles(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[Md5PrefixLong]]: md5 digest of the UTF-8 bytes,
 *  first `nibbles` hex digits read as an unsigned integer — exactly
 *  `conv(substring(md5(s), 1, nibbles), 16, 10)` without materializing
 *  the 32-char hex string or re-parsing it (one digest, zero string
 *  round-trips). nibbles ≤ 15 keeps the value positive in a long. */
object Md5Ops {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def prefixLong(s: UTF8String, nibbles: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** First `nibbles` hex digits of md5(s) as a long — the engine's
 *  cross-engine hash-bucket convention (`conv(substring(md5(s), 1, n),
 *  16, 10)`) as ONE codegen'd call. Value-identical to the Column
 *  spelling it replaces (Md5PrefixLongSpec pins it), so every DuckDB
 *  oracle replaying `CAST('0x' || substr(md5(s), 1, n) AS BIGINT)`
 *  is untouched. */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nibbles > 0 && nibbles <= 15, "nibbles in [1, 15] to stay positive in a long")
  override def prettyName: String = "graft_md5_prefix_long"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Md5Ops.prefixLong(v.asInstanceOf[UTF8String], nibbles)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = graft.functions.Md5Ops.prefixLong($v, $nibbles);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
