package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder2(x, y)` — the two-dimensional Morton (z-order) interleave as a
  * native Catalyst expression WITH codegen: bit i of `x` lands at output
  * bit 2i, bit i of `y` at 2i+1.
  *
  * This is the clustering key behind multi-dimensional data skipping
  * (the layout trick Delta's OPTIMIZE ZORDER BY and Iceberg's sort
  * orders use): sorting by the interleaved value makes file-level
  * min/max ranges tight in BOTH dimensions at once, so a box predicate
  * on either or both columns prunes files — a single-column sort only
  * ever prunes its own column. The expression is pure bit arithmetic
  * (five spread steps per operand), inlined into WholeStageCodegen; a
  * Scala UDF here would box two Longs per row across the whole table
  * at cluster-write time.
  *
  * Domain: both inputs must be in [0, 2³¹) so the 62-bit result is
  * non-negative and order-stable — out-of-range inputs throw rather
  * than silently fold (a wrapped interleave would SILENTLY break the
  * clustering's locality guarantee).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def spread(src: String, dst: String): String =
        s"""
           |long $dst = $src;
           |$dst = ($dst | ($dst << 16)) & 0x0000FFFF0000FFFFL;
           |$dst = ($dst | ($dst << 8)) & 0x00FF00FF00FF00FFL;
           |$dst = ($dst | ($dst << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$dst = ($dst | ($dst << 2)) & 0x3333333333333333L;
           |$dst = ($dst | ($dst << 1)) & 0x5555555555555555L;
         """.stripMargin
      s"""
         |if ($a < 0L || $a > 0x7FFFFFFFL || $b < 0L || $b > 0x7FFFFFFFL) {
         |  throw new IllegalArgumentException(
         |    "zorder2 input out of [0, 2^31): " + $a + ", " + $b);
         |}
         |${spread(a, sx)}
         |${spread(b, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 31 bits of `v` to even bit positions. */
  private def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def interleave(x: Long, y: Long): Long = {
    require(x >= 0L && x <= Int.MaxValue.toLong && y >= 0L && y <= Int.MaxValue.toLong,
      s"zorder2 input out of [0, 2^31): $x, $y")
    spread(x) | (spread(y) << 1)
  }
}
