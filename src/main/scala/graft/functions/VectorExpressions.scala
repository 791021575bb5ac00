package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for embedding-vector math (SURVEY §7.1
 * step 9 similarity search; reference has no analogue — this is the
 * LLM-pipeline extension surface).
 *
 * Why native instead of `zip_with`/`aggregate` higher-order functions:
 * HOF lambdas are evaluated interpreted, per element, per row — measured
 * 3–25× slower than codegen on this repo's signature folds — and a
 * 64-dim cosine via HOFs plans as ~15 nested expression nodes. Each
 * expression here is one whole-stage-codegen'd tight loop over the
 * Parquet float arrays (`doGenCode` below), the preferred extension tier
 * after built-in functions: Expression > UDF.
 *
 * All accumulate in double in array order, so results are bit-identical
 * to the previous `aggregate(zip_with(...))` formulation (same IEEE op
 * sequence) — the DuckDB value oracles are unchanged.
 */
object VectorMath {
  /** splitmix64 finalizer — the deterministic pseudo-random generator for
   *  hyperplane components; cheap integer mixing, no string hashing. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic hyperplane component for (plane p, dim i) in [-1, 1). */
  @inline def planeComponent(p: Int, i: Int, seed: Long): Double = {
    val h = mix64(seed + p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL)
    (h >>> 11).toDouble * (1.0 / (1L << 52).toDouble) - 1.0
  }

  /** Packed sign bits of `planes` random-hyperplane projections. Called
   *  from both interpreted eval and generated code (static forwarder). */
  def hyperplaneSignature(v: ArrayData, isDouble: Boolean, planes: Int, seed: Long): Long = {
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
          proj += x * planeComponent(p, i, seed)
        }
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Shared typing for binary expressions over two numeric-array columns
 *  (float or double elements, independently per side). */
trait VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(
    GraftBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)),
    GraftBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  protected def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  /** Java accessor snippet for element i of ArrayData variable `v`. */
  protected def accessor(e: Expression, v: String, i: String): String =
    if (elemIsDouble(e)) s"$v.getDouble($i)" else s"(double) $v.getFloat($i)"
  protected def get(e: Expression, v: ArrayData, i: Int): Double =
    if (elemIsDouble(e)) v.getDouble(i) else v.getFloat(i).toDouble
}

/**
 * Dot product of two array<float|double> columns in double precision:
 * `sum_i left[i] * right[i]` over the common prefix; null elements
 * contribute 0.
 */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) dot += get(left, x, i) * get(right, y, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $dot += ${accessor(left, a, i)} * ${accessor(right, b, i)};
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Cosine similarity, fused: one pass accumulates dot, |a|², |b|² — a
 * third of the array traversals of composing dot/norm separately (and the
 * HOF formulation re-planned the input subtree per norm). Null when
 * either norm is zero, matching Spark's `Divide`-by-zero semantics that
 * the previous Column formulation had.
 */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xi = get(left, x, i); val yi = get(right, y, i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
      }
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) null else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xi = ${accessor(left, a, i)};
         |    double $yi = ${accessor(right, b, i)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($den == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $den; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Random-hyperplane LSH signature: sign bits of `planes` projections
 * packed into a long. Plane components derive from splitmix64 of
 * (seed, plane, dim) — integer mixing only, where the Column-algebra
 * version hashed a `"$p:$i"` STRING per (element × plane × row). The
 * double loop lives in [[VectorMath.hyperplaneSignature]]; generated
 * code calls it via the static forwarder so the codegen'd projection
 * stays one call wide regardless of `planes`.
 */
case class HyperplaneSignature(child: Expression, planes: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {
  require(planes > 0 && planes <= 63, "signature packs into a single long")

  override def prettyName: String = "graft_hyperplane"
  override def inputTypes: Seq[GraftBridge.AbstractType] =
    Seq(GraftBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(v: Any): Any =
    VectorMath.hyperplaneSignature(v.asInstanceOf[ArrayData], isDouble, planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorMath.hyperplaneSignature($v, $isDouble, $planes, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
