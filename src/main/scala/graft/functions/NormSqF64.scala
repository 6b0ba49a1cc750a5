package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `norm_sq_f64(a)` — Σ aᵢ² of an `array<double>` column as a native
  * codegen'd Catalyst expression: the fused form of `dot_f64(a, a)`.
  *
  * `dot_f64(a, a)` evaluates its ONE array argument twice per element
  * (two `getDouble` calls into the same `ArrayData`, two null checks —
  * and, pre-CSE, possibly two whole evaluations of the child
  * expression). The norm is on every similarity query's hot path (the
  * vector frame computes it for every corpus row), so the fused
  * single-traversal form exists as its own expression and the
  * [[FuseSelfDot]] optimizer rule rewrites self-dots into it
  * automatically. Same skip-null-elements contract and the same
  * per-element fold order as [[DotF64]], so results are bit-identical
  * and oracle hashes are unaffected.
  */
case class NormSqF64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "norm_sq_f64"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) { val v = x.getDouble(i); sum += v * v }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = $a.getDouble($i);
         |    $sum += $v * $v;
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormSqF64 =
    copy(child = newChild)
}

/** Optimizer rule: `dot_f64(a, b)` where `a` and `b` are semantically the
  * same DETERMINISTIC expression → `norm_sq_f64(a)`. The (c)-tier Catalyst
  * extension point: callers keep writing the natural `dot(v, v)` and the
  * plan gets the fused single-traversal form — visible in
  * `explain`/PlanSuite as `norm_sq_f64`. Non-deterministic children are
  * left alone (two evaluations of a non-deterministic expression are NOT
  * one evaluation squared).
  */
object FuseSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotF64(a, b) if a.deterministic && a.semanticEquals(b) => NormSqF64(a)
    }
}
