package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}

/**
 * User-facing surface for the native expressions: typed Column wrappers
 * for the DataFrame API, plus SQL registration so `spark.sql("SELECT
 * graft_cosine(a, b) ...")` works.
 *
 * Two registration paths, same definitions:
 *  - [[GraftExtensions]] via `spark.sql.extensions` config (injected at
 *    session build — the SparkSessionExtensions tier);
 *  - [[GraftFunctions.register]] for an already-built session (tests,
 *    notebooks).
 */
object GraftFunctions {

  // ---- DataFrame API -------------------------------------------------

  /** Dot product of two array<float|double> columns, in double. */
  def graftDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Fused single-pass cosine similarity; null when either norm is 0. */
  def graftCosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Random-hyperplane LSH signature (`planes` sign bits in a long). */
  def graftHyperplane(vec: Column, planes: Int, seed: Long = 0L): Column =
    GraftBridge.column(HyperplaneSignature(GraftBridge.expression(vec), planes, seed))

  /** 0-based array element, null out of bounds (Python-index semantics). */
  def graftArrayGet(arr: Column, idx: Column): Column =
    GraftBridge.column(SafeArrayGet(GraftBridge.expression(arr), GraftBridge.expression(idx)))

  /** Distinct word n-gram shingles of lower(text), one codegen'd pass. */
  def graftWordShingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))

  /** Distinct character n-gram shingles of lower(text). */
  def graftCharShingles(text: Column, n: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(text), n))

  /** All word n-grams of lower(text) in order, duplicates kept. */
  def graftWordNgrams(text: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(text), n))

  /** Raw-deflate compression ratio (level-6, headerless), in double. */
  def graftDeflateRatio(text: Column): Column =
    GraftBridge.column(DeflateRatio(GraftBridge.expression(text)))

  /** Magic-byte-sniffing gzip decode of a binary column to string. */
  def graftGunzipText(bytes: Column): Column =
    GraftBridge.column(GunzipText(GraftBridge.expression(bytes)))

  /** Shannon entropy (bits per character) of a string's code points. */
  def graftCharEntropy(text: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(text)))

  /** Lenient dateutil-style timestamp parse (null on failure) — the
   *  rule compiler's whole parse chain as one native expression. */
  def graftDateutilTs(text: Column): Column =
    GraftBridge.column(DateutilTimestamp(GraftBridge.expression(text)))

  /** MinHash signature aggregate over a long hash column (k slots). */
  def graftMinhashAgg(hash: Column, k: Int): Column =
    GraftBridge.column(MinHashAgg(GraftBridge.expression(hash), k).toAggregateExpression())

  /** SimHash signature aggregate over a long hash column. */
  def graftSimhashAgg(hash: Column): Column =
    GraftBridge.column(SimHashAgg(GraftBridge.expression(hash)).toAggregateExpression())

  /** md5-family MinHash signature aggregate over shingle strings
   *  (k hex-string slots; slot i = min md5(i || ':' || s)). */
  def graftMinhashMd5Agg(shingle: Column, k: Int): Column =
    GraftBridge.column(MinHashMd5Agg(GraftBridge.expression(shingle), k).toAggregateExpression())

  /** First `nibbles` hex digits of md5(s) as a long — one codegen'd call
   *  for the `conv(substring(md5(s), 1, n), 16, 10)` bucket convention. */
  def graftMd5PrefixLong(s: Column, nibbles: Int): Column =
    GraftBridge.column(Md5PrefixLong(GraftBridge.expression(s), nibbles))

  /** argmin of a long value by a double key (ties → smallest value) —
   *  `min_by(v, struct(k, v))` as a typed aggregate so the surrounding
   *  aggregate plans hash-based (ObjectHashAggregate), never a sort. */
  def graftArgMinLong(value: Column, key: Column): Column =
    GraftBridge.column(ArgMinLongAgg(
      GraftBridge.expression(value), GraftBridge.expression(key)).toAggregateExpression())

  // ---- SQL registration ----------------------------------------------

  private def info(name: String, usage: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "math_funcs", "", "", "internal")

  /** SQL integer literals arrive as boxed Integer; a blind Long cast
   *  would throw on the natural `graft_hyperplane(v, 16, 42)` spelling. */
  private def asLong(e: Expression): Long = e.eval() match {
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(s"expected a numeric literal, got $other")
  }

  /** (name, info, builder) triples — scalar functions only; the typed
   *  aggregates stay DataFrame-side (their `k` is a constructor param). */
  private[functions] val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays in double", classOf[DotProduct]),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays", classOf[CosineSimilarity]),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("graft_hyperplane"),
      info("graft_hyperplane", "graft_hyperplane(vec, planes, seed) - packed hyperplane LSH sign bits", classOf[HyperplaneSignature]),
      (children: Seq[Expression]) => {
        val planes = asLong(children(1)).toInt
        val seed = children.lift(2).map(asLong).getOrElse(0L)
        HyperplaneSignature(children(0), planes, seed)
      }),
    (FunctionIdentifier("graft_array_get"),
      info("graft_array_get", "graft_array_get(arr, i) - 0-based element, null out of bounds", classOf[SafeArrayGet]),
      (children: Seq[Expression]) => SafeArrayGet(children(0), children(1))),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "graft_word_shingles(text, n) - distinct word n-gram shingles of lower(text)", classOf[WordShingles]),
      (children: Seq[Expression]) => WordShingles(children(0), asLong(children(1)).toInt)),
    (FunctionIdentifier("graft_char_shingles"),
      info("graft_char_shingles", "graft_char_shingles(text, n) - distinct char n-gram shingles of lower(text)", classOf[CharShingles]),
      (children: Seq[Expression]) => CharShingles(children(0), asLong(children(1)).toInt)),
    (FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams", "graft_word_ngrams(text, n) - all word n-grams of lower(text), duplicates kept", classOf[WordNgrams]),
      (children: Seq[Expression]) => WordNgrams(children(0), asLong(children(1)).toInt)),
    (FunctionIdentifier("graft_deflate_ratio"),
      info("graft_deflate_ratio", "graft_deflate_ratio(text) - raw-deflate compression ratio in double", classOf[DeflateRatio]),
      (children: Seq[Expression]) => DeflateRatio(children(0))),
    (FunctionIdentifier("graft_gunzip_text"),
      info("graft_gunzip_text", "graft_gunzip_text(bytes) - magic-byte-sniffing gzip decode to string", classOf[GunzipText]),
      (children: Seq[Expression]) => GunzipText(children(0))),
    (FunctionIdentifier("graft_dateutil_ts"),
      info("graft_dateutil_ts", "graft_dateutil_ts(s) - lenient dateutil-style timestamp parse, null on failure", classOf[DateutilTimestamp]),
      (children: Seq[Expression]) => DateutilTimestamp(children(0))),
    (FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy", "graft_char_entropy(text) - Shannon entropy of the code-point distribution, bits/char", classOf[CharEntropy]),
      (children: Seq[Expression]) => CharEntropy(children(0))),
    // aggregates: the analyzer wraps a returned AggregateFunction in the
    // AggregateExpression itself, so these work as SQL aggregates
    (FunctionIdentifier("graft_minhash_agg"),
      info("graft_minhash_agg", "graft_minhash_agg(hash, k) - k-slot MinHash signature over a long hash column", classOf[MinHashAgg]),
      (children: Seq[Expression]) => MinHashAgg(children(0), asLong(children(1)).toInt)),
    (FunctionIdentifier("graft_simhash_agg"),
      info("graft_simhash_agg", "graft_simhash_agg(hash) - 64-bit SimHash signature over a long hash column", classOf[SimHashAgg]),
      (children: Seq[Expression]) => SimHashAgg(children(0))),
    (FunctionIdentifier("graft_minhash_md5_agg"),
      info("graft_minhash_md5_agg", "graft_minhash_md5_agg(shingle, k) - k-slot md5-family MinHash signature (hex strings) over shingle strings", classOf[MinHashMd5Agg]),
      (children: Seq[Expression]) => MinHashMd5Agg(children(0), asLong(children(1)).toInt)),
    (FunctionIdentifier("graft_md5_prefix_long"),
      info("graft_md5_prefix_long", "graft_md5_prefix_long(s, nibbles) - first nibbles hex digits of md5(s) as a long", classOf[Md5PrefixLong]),
      (children: Seq[Expression]) => Md5PrefixLong(children(0), asLong(children(1)).toInt)),
    // macro-style: expands to the same built-in operation sequence as
    // the DataFrame API (graft.ext.Geo.haversineMeters) — identical
    // IEEE result — built as RESOLVED Catalyst nodes (the Column
    // bridge would hand the analyzer an unevaluable ColumnNode)
    (FunctionIdentifier("graft_haversine"),
      info("graft_haversine", "graft_haversine(lat1, lon1, lat2, lon2) - great-circle distance in meters (haversine, degrees in)", classOf[Expression]),
      (children: Seq[Expression]) => haversineExpr(children)))

  private def haversineExpr(c: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Asin, Cast, Cos, Divide, GreaterThan, If, Literal, Multiply, Pow, Sin, Sqrt, Subtract, ToRadians}
    import org.apache.spark.sql.types.DoubleType
    require(c.length == 4, "graft_haversine(lat1, lon1, lat2, lon2)")
    val Seq(lat1, lon1, lat2, lon2) = c.map(e => Cast(e, DoubleType): Expression)
    def sq(e: Expression) = Pow(e, Literal(2.0))
    def rad(e: Expression) = ToRadians(e)
    val h = Add(
      sq(Sin(Divide(rad(Subtract(lat2, lat1)), Literal(2.0)))),
      Multiply(Multiply(Cos(rad(lat1)), Cos(rad(lat2))),
        sq(Sin(Divide(rad(Subtract(lon2, lon1)), Literal(2.0))))))
    // same null-preserving near-antipodal clamp as Geo.haversineMeters
    val root = Sqrt(h)
    Multiply(Literal(2.0 * graft.ext.Geo.EarthRadiusM),
      Asin(If(GreaterThan(root, Literal(1.0)), Literal(1.0), root)))
  }

  /** Register on a live session (post-build). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point: injects the graft functions at
 *  session build. `.config("spark.sql.extensions",
 *  "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // As-of join lowering inside the operator-optimization fixed point, so
    // pruning/pushdown re-fire against the lowered Union+Window form.
    ext.injectOptimizerRule(_ => graft.plans.LowerAsOfJoin)
    // Row-mode-codegen projection fence for >64KB-of-generated-code
    // selects (wide validation suites) — see plans/FencedProject.scala.
    ext.injectPlannerStrategy(_ => graft.plans.FencedProjectStrategy)
  }
}
