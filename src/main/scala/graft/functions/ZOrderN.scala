package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder_n(c0, c1, …, ck)` — the k-dimensional Morton (z-order)
  * interleave as a native Catalyst expression WITH codegen: bit i of
  * child j lands at output bit `i·n + j`, so for n = 2 it agrees
  * bit-for-bit with [[ZOrder2]] (x even, y odd — pinned by property
  * test). This is the clustering key real OPTIMIZE ZORDER BY takes: N
  * columns, not two — a 3-column layout makes per-file ranges tight in
  * all three dimensions at once, so a box on ANY subset prunes files.
  *
  * Each dimension gets ⌊63/n⌋ bits so the interleave stays in the
  * non-negative Long range and sort order is stable: n=2 → 31 bits,
  * n=3 → 21, n=4 → 15. Inputs outside [0, 2^bits) THROW rather than
  * silently fold — a wrapped interleave would silently break the
  * clustering's locality guarantee (the same contract as [[ZOrder2]]).
  * Wide-domain columns quantize first ([[graft.rel.ZOrder.quantize]] —
  * exact integer step math, monotone, no overflow).
  *
  * Codegen is a compact per-child bit loop (⌊63/n⌋ iterations of
  * shift/mask — branch-free, no boxing, inlined into WholeStageCodegen).
  * The generic loop replaces ZOrder2's magic-mask spread because the
  * masks are arity-specific; the loop form is also what the DuckDB
  * oracle replays in SQL (a sum over bit positions), gating the
  * expression bit-for-bit.
  */
case class ZOrderN(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {

  require(children.size >= 2 && children.size <= 8,
    s"zorder_n expects 2..8 arguments, got ${children.size}")

  private val n = children.size

  /** Bits per dimension: the largest b with b·n ≤ 63. */
  val bits: Int = 63 / n

  override def inputTypes = Seq.fill(n)(LongType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = children.exists(_.nullable)

  override def prettyName: String = "zorder_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      vs(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrderN.interleave(vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val childCode = gens.map(_.code.toString).mkString("\n")
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val z = ctx.freshName("z")
    val i = ctx.freshName("i")
    val lim = (1L << bits).toString + "L"
    val body = gens.zipWithIndex.map { case (g, j) =>
      s"""
         |if (${g.value} < 0L || ${g.value} >= $lim) {
         |  throw new IllegalArgumentException(
         |    "zorder_n($n) input out of [0, 2^$bits): " + ${g.value});
         |}
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= ((${g.value} >> $i) & 1L) << ($i * $n + $j);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          long $z = 0L;
          $body
          ${ev.value} = $z;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN =
    copy(children = newChildren)
}

object ZOrderN {

  /** Interleave: bit i of vs(j) → output bit i·n + j. */
  def interleave(vs: Array[Long]): Long = {
    val n = vs.length
    val bits = 63 / n
    var z = 0L
    var j = 0
    while (j < n) {
      val v = vs(j)
      require(v >= 0L && v < (1L << bits),
        s"zorder_n($n) input out of [0, 2^$bits): $v")
      var i = 0
      while (i < bits) {
        z |= ((v >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }
}
