package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.expr

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths to the same registry entry:
  *  - [[GraftExtensions]] via `spark.sql.extensions` — the library-user
  *    shape (`SparkSession.builder.withExtensions` / config);
  *  - [[GraftFunctions.register]] — imperative, idempotent, used by the
  *    query layer so any session that touches a similarity query has
  *    `dot_f64` available (including `spark.sql` text).
  */
object GraftFunctions {

  private val dotInfo = new ExpressionInfo(classOf[DotF64].getName, "dot_f64")

  private def dotBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"dot_f64 expects 2 arguments, got ${args.length}")
    DotF64(args.head, args(1))
  }

  private val zorderInfo = new ExpressionInfo(classOf[ZOrder2].getName, "zorder2")

  private def zorderBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"zorder2 expects 2 arguments, got ${args.length}")
    ZOrder2(args.head, args(1))
  }

  private val zorderNInfo = new ExpressionInfo(classOf[ZOrderN].getName, "zorder_n")

  private def zorderNBuilder(args: Seq[Expression]): Expression = ZOrderN(args)

  private val approxNdvInfo =
    new ExpressionInfo(classOf[ApproxNdv].getName, "graft_approx_ndv")

  private def approxNdvBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_approx_ndv expects (col, rsd), got ${args.length}")
    new ApproxNdv(args.head, args(1))
  }

  def registerAll(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_f64"), dotInfo, dotBuilder _))
    ext.injectFunction((FunctionIdentifier("zorder2"), zorderInfo, zorderBuilder _))
    ext.injectFunction((FunctionIdentifier("zorder_n"), zorderNInfo, zorderNBuilder _))
    ext.injectFunction(
      (FunctionIdentifier("graft_approx_ndv"), approxNdvInfo, approxNdvBuilder _))
    ext.injectOptimizerRule(_ => FuseSelfDot)
    // whole-operator tier: the native as-of join's planner strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("dot_f64"), dotInfo, dotBuilder _)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("zorder2"), zorderInfo, zorderBuilder _)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("zorder_n"), zorderNInfo, zorderNBuilder _)
    spark.sessionState.functionRegistry
      .registerFunction(
        FunctionIdentifier("graft_approx_ndv"), approxNdvInfo, approxNdvBuilder _)
    // imperative twin of injectOptimizerRule — idempotent, like the
    // function registration above
    if (!spark.experimental.extraOptimizations.contains(FuseSelfDot)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseSelfDot
    }
  }

  /** Column-API face of `dot_f64` (requires [[register]] on the session).
    * `call_function` passes the Column objects straight through the
    * registry — no SQL-text round trip, so arbitrary expressions and
    * join-disambiguated columns resolve exactly as the caller bound them.
    */
  def dotF64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_f64", a, b)

  /** Column-API face of `zorder2` (requires [[register]] on the session). */
  def zorder2(x: Column, y: Column): Column =
    org.apache.spark.sql.functions.call_function("zorder2", x, y)

  /** Column-API face of `zorder_n` (requires [[register]] on the session). */
  def zorderN(cols: Column*): Column =
    org.apache.spark.sql.functions.call_function("zorder_n", cols: _*)

  /** Column-API face of `graft_approx_ndv` (requires [[register]]). */
  def approxNdv(c: Column, rsd: Double): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_approx_ndv", c, org.apache.spark.sql.functions.lit(rsd))
}

/** `spark.sql.extensions`-style entry point:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions()(_))  // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registerAll(ext)
}
