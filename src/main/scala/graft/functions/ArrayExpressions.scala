package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * 0-based array element access that is null (never an error) out of
 * bounds — the lookup semantics of the reference's `{i}` path indices
 * (validator.py:172-194: a missing list slot yields None, one "Field
 * missing" verdict, no exception).
 *
 * Exists instead of `element_at(arr, i + 1)` because Spark 4.1.2's
 * `ElementAt`/`GetArrayItem` codegen has a nullability hole: when the
 * array is a literal `CreateArray` and the index provably in bounds,
 * `nullable` computes to false, so whole-stage codegen never declares the
 * `isNull` variable that the generated out-of-bounds branch still
 * assigns — janino rejects the class ("not an rvalue") and every row of
 * the projection falls back to interpreted eval. At 100 TB an interpreted
 * per-row projection is a silent multi-× regression, so this expression
 * declares `nullable = true` unconditionally and keeps the branch legal.
 */
case class SafeArrayGet(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_array_get"
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(ArrayType, IntegerType)
  override def dataType: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, idx: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val i = idx.asInstanceOf[Int]
    if (i < 0 || i >= arr.numElements() || arr.isNullAt(i)) null
    else arr.get(i, dataType)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, idx) => {
      val i = ctx.freshName("idx")
      s"""
         |final int $i = (int) $idx;
         |if ($i >= 0 && $i < $arr.numElements() && !$arr.isNullAt($i)) {
         |  ${ev.value} = ${CodeGenerator.getValue(arr, dataType, i)};
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
