package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_f64(a, b)` — dot product of two `array<double>` columns as a native
  * Catalyst expression WITH codegen.
  *
  * Why not `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`:
  * Spark's higher-order functions are CodegenFallback — every element pays
  * an interpreted lambda dispatch plus boxing, and the zip allocates an
  * intermediate array per row. This expression compiles to a primitive
  * `for` loop over the two `ArrayData` buffers inside WholeStageCodegen
  * (measured ≈3× on the similarity queries at sf0.1). Same sequential
  * fold order as the HOF version and DuckDB's `list_dot_product`, so
  * oracle hashes are unaffected.
  *
  * Element nulls are treated as 0 (embeddings carry none; documented
  * contract). Arrays of unequal length dot over the common prefix.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}
