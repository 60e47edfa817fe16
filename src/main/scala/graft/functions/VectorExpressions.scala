// Lives in the spark.sql namespace: AbstractDataType (the inputTypes
// contract of ImplicitCastInputTypes) and the Column<->Expression bridge
// (classic.ExpressionUtils) are private[sql] — the standard packaging for
// third-party native expressions.
package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * The builtin route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * higher-order function chain that does NOT participate in whole-stage
  * codegen (interpreted lambda per element, boxed accumulator) and
  * allocates an intermediate zipped array per evaluation. That is fine per
  * row, but pairwise scorers evaluate a dot per CANDIDATE PAIR (n·k for
  * ANN probes, up to n² for exact near-dup baselines) — measured 3× total
  * query time on the sf0.1 near-dup scan. This expression generates a
  * tight primitive loop (`doGenCode`), keeping the scorer inside the
  * codegen'd stage.
  *
  * Semantics match the builtin chain bit-for-bit on equal-length arrays
  * (same left-to-right double accumulation); inputs are implicitly cast
  * (array<float> → array<double>) by ImplicitCastInputTypes exactly like
  * the HOF route's per-element cast. Null/length-mismatch handling:
  * null input → null; trailing elements beyond the shorter array are
  * ignored (the HOF route nulls the whole result instead — pairwise
  * callers always score same-dimension vectors, where both agree).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<numeric> columns, in double. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
