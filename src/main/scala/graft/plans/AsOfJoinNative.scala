package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode,
  Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** NATIVE as-of join — the custom-operator tier above expressions and
  * optimizer rules: a whole-operator `LogicalPlan` node, a planner
  * `Strategy`, and a `SparkPlan` that executes the point-in-time merge
  * directly, registered through the same `SparkSessionExtensions` /
  * `experimental` hooks as the `dot_f64` expression family.
  *
  * Semantics (identical to [[graft.rel.AsOfJoin.asOf]], the composed
  * union-window implementation it is hash-gated against): for each left
  * row, the right row with the greatest time ≤ the left row's time
  * within the same key, left-join style (unmatched left rows null-pad).
  * Ties on (key, time) resolve to the right row whose payload sorts
  * LAST — the window twin's struct-max, made deterministic here by
  * including the payload columns in the required child ordering.
  *
  * Execution shape — why a custom plan is the right tier for this
  * operator: Catalyst has no join type whose matching rule is "greatest
  * prior per key", so the composed form must fake it with a union + a
  * running window. The native plan instead declares exactly what the
  * merge needs and lets EnsureRequirements provide it:
  *  - `requiredChildDistribution`: both sides clustered on the key →
  *    one hash Exchange per side (same bytes as a sort-merge join; at
  *    100 TB bucketing either side makes its Exchange vanish, which the
  *    union form can never claim because it must co-shuffle the union);
  *  - `requiredChildOrdering`: (key, time) per side → per-partition
  *    sorts;
  *  - `doExecute`: one forward pass over the two sorted streams per
  *    partition (`zipPartitions`) holding ONE buffered right row per
  *    key — O(|L| + |R|) time, O(1) state, no windowed carry column,
  *    no union row-widening.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    broadcast: Boolean = false)
  extends BinaryNode {

  /** left.* followed by right.* minus the join key (right's time column
    * is the caller-renamed `__asof_time` payload head) — all right
    * outputs nullable (unmatched left rows null-pad them).
    */
  override val output: Seq[Attribute] =
    left.output ++
      right.output.filterNot(_.exprId == rightKey.exprId).map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode if n.broadcast =>
      AsOfJoinBroadcastExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTime, n.rightTime, n.forward, n.tolerance) :: Nil
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTime, n.rightTime, n.forward, n.tolerance) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean = false,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def nodeName: String = "GraftAsOfJoin"

  override val output: Seq[Attribute] =
    left.output ++
      right.output.filterNot(_.exprId == rightKey.exprId).map(_.withNullability(true))

  /** Both sides clustered on the key: EnsureRequirements inserts one
    * hash Exchange per side (or none over bucketed/co-partitioned
    * input — the scale story).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, time) per side; the right side additionally orders by its
    * ORDERABLE payload columns so the tie winner (last in order =
    * payload max) is deterministic regardless of shuffle arrival order.
    * Unorderable payload types (MapType, …) are skipped rather than
    * failing planning — rows tying on (key, time) and every orderable
    * payload column are then interchangeable, which is the same
    * guarantee the composed window form's struct-max gives.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTime, Ascending) +:
      right.output.filterNot(a =>
        a.exprId == rightKey.exprId || a.exprId == rightTime.exprId)
        .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  /** The merge is per-partition and order-preserving on the left. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrdinal = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrdinal = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrdinal = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrdinal = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyOrdinal >= 0 && lTimeOrdinal >= 0 && rKeyOrdinal >= 0 && rTimeOrdinal >= 0)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rightArity = right.output.length
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // projection binds output attrs (right side nullability-widened
      // copies share exprIds) against the concatenated child schemas,
      // dropping right's key column positionally. The bind-side right
      // attrs are widened too: unmatched left rows read the null pad, so
      // a non-nullable bound reference would skip the null check and
      // read garbage zeros
      val proj = UnsafeProjection.create(
        outAttrs, leftAttrs ++ rightAttrs.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)

      // ONE buffered right row of lookahead + ONE retained best match —
      // the entire per-partition state of the merge
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var matchRow: InternalRow = null
      var matchKey: Any = null
      var matchTime: Any = null

      def rKey(r: InternalRow): Any =
        if (r.isNullAt(rKeyOrdinal)) null else r.get(rKeyOrdinal, keyType)
      def rTime(r: InternalRow): Any =
        if (r.isNullAt(rTimeOrdinal)) null else r.get(rTimeOrdinal, timeType)
      def advance(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
      // tolerance compares physical integral time values (micros for
      // timestamps, days for dates, raw for int/long) — asOf() validated
      // the type
      def timeL(a: Any): Long = a.asInstanceOf[Number].longValue
      def withinTol(lt: Any): Boolean = tolerance.forall { tol =>
        val gap = if (forward) timeL(matchTime) - timeL(lt) else timeL(lt) - timeL(matchTime)
        gap <= tol
      }

      lIter.map { lRow =>
        val lk = if (lRow.isNullAt(lKeyOrdinal)) null else lRow.get(lKeyOrdinal, keyType)
        val lt = if (lRow.isNullAt(lTimeOrdinal)) null else lRow.get(lTimeOrdinal, timeType)
        if (lk == null || lt == null) {
          // null key/time never matches (both sort first, so no state skew)
          proj(joined(lRow, nullRight))
        } else if (!forward) {
          // BACKWARD: advance the right stream through every row
          // at-or-before (lk, lt); later-sorting ties overwrite, giving
          // the payload-max
          var advancing = true
          while (advancing && rHead != null) {
            val rk = rKey(rHead)
            val rt = rTime(rHead)
            if (rk == null || rt == null) {
              // null-keyed/timed right rows sort first; skip them
              advance()
            } else {
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0 || (kc == 0 && timeOrd.compare(rt, lt) <= 0)) {
                // re-extract key/time from the COPY: `rk`/`rt` may
                // reference the sorter's reused buffer (UTF8String /
                // Decimal / binary), which mutates once rIter advances
                if (kc == 0) {
                  matchRow = rHead.copy()
                  matchKey = matchRow.get(rKeyOrdinal, keyType)
                  matchTime = matchRow.get(rTimeOrdinal, timeType)
                }
                advance()
              } else {
                advancing = false
              }
            }
          }
          val matched =
            matchRow != null && matchKey != null && keyOrd.compare(matchKey, lk) == 0 &&
              withinTol(lt)
          proj(joined(lRow, if (matched) matchRow else nullRight))
        } else {
          // FORWARD: the match is the EARLIEST right row with time >= lt
          // in the key — among (key, time) ties the payload-max, i.e. the
          // last of the run in the required ordering. A retained match
          // stays valid for later left rows while its time still >= their
          // time (everything consumed behind it is provably earlier);
          // rows skipped below can never match a later left row either
          // (left times only grow within the key).
          if (matchRow != null &&
              (keyOrd.compare(matchKey, lk) != 0 || timeOrd.compare(matchTime, lt) < 0)) {
            matchRow = null; matchKey = null; matchTime = null
          }
          if (matchRow == null) {
            var searching = true
            while (searching && rHead != null) {
              val rk = rKey(rHead)
              val rt = rTime(rHead)
              if (rk == null || rt == null) advance()
              else {
                val kc = keyOrd.compare(rk, lk)
                if (kc < 0 || (kc == 0 && timeOrd.compare(rt, lt) < 0)) advance()
                else if (kc == 0) {
                  // first candidate; consume its (key, time) tie run,
                  // keeping the last (payload-max) row
                  matchRow = rHead.copy()
                  matchKey = matchRow.get(rKeyOrdinal, keyType)
                  matchTime = matchRow.get(rTimeOrdinal, timeType)
                  advance()
                  var inRun = true
                  while (inRun && rHead != null) {
                    val rk2 = rKey(rHead)
                    val rt2 = rTime(rHead)
                    if (rk2 != null && rt2 != null &&
                        keyOrd.compare(rk2, matchKey) == 0 &&
                        timeOrd.compare(rt2, matchTime) == 0) {
                      matchRow = rHead.copy()
                      advance()
                    } else inRun = false
                  }
                  searching = false
                } else searching = false // rk > lk: no rows left in this key
              }
            }
          }
          val matched = matchRow != null && withinTol(lt)
          proj(joined(lRow, if (matched) matchRow else nullRight))
        }
      }
    }
  }
}

/** Per-executor memo of built broadcast as-of indexes, keyed by
  * broadcast id PLUS the join shape: the index is immutable and
  * identical for every task reading the same broadcast, so the
  * O(|R| log |R|) sort + bucket build (and the codegen'd row-ordering
  * compilation) happens once per executor, not once per probe-side
  * partition — on a 100 TB probe with thousands of scan tasks that
  * difference dominates small-task runtime. The join shape (key/time
  * ordinals + payload order) is part of the key because ReuseExchange
  * can legally share one BroadcastExchange(IdentityBroadcastMode)
  * between two as-of execs over the same right subtree but different
  * key/time columns — an id-only key would serve the first join's
  * index (bucketed on ITS ordinals) to the second, silently wrong.
  * Bounded: LRU past a handful of live entries — eldest-only eviction,
  * so a long streaming drain (one broadcast per micro-batch) never
  * thrashes indexes still in use by concurrent batches.
  */
private object AsOfBroadcastIndex {
  // lazy holder: the ConcurrentHashMap's per-bin computeIfAbsent only
  // inserts the (cheap) holder, and the O(|R| log |R|) build runs under
  // the HOLDER's own lock — concurrent tasks on the same key share one
  // build, while builds and cache hits for OTHER keys (e.g. another
  // micro-batch's broadcast) proceed without blocking on any global lock
  private final class Holder(b: () => AnyRef) { lazy val value: AnyRef = b() }
  // keyed by (applicationId, broadcast id, join shape): broadcast ids
  // restart from 0 per SparkContext, so an id-only key could serve a
  // dead context's index to a new context in the same JVM
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Holder]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def getOrBuild(key: String)(build: => AnyRef): AnyRef = {
    val h = cache.computeIfAbsent(key, k => { order.add(k); new Holder(() => build) })
    // bound the memo with eldest-first eviction (insertion order): a
    // long streaming drain creating one broadcast per micro-batch evicts
    // the OLDEST index only, never a still-live neighbor wholesale
    while (cache.size > 8) {
      val eldest = order.poll()
      if (eldest == null) return h.value
      if (eldest == key) order.add(key) // never evict the entry being served
      else cache.remove(eldest)
    }
    h.value
  }
}

/** Broadcast variant of the native as-of join — the 100 TB shape when
  * the right side is dimension-bounded: the LEFT side keeps whatever
  * partitioning its scan produced (ZERO Exchange on the corpus, the one
  * thing the shuffle merge can only achieve over bucketed tables), while
  * the right side arrives whole on every executor through a
  * `BroadcastDistribution(IdentityBroadcastMode)` — EnsureRequirements
  * inserts the BroadcastExchange exactly as it does for a broadcast
  * nested-loop join. Each task buckets the broadcast rows per key into
  * time-sorted arrays once, then answers every left row with a binary
  * search: O(|R| log |R|) prep + O(log |R|) per row, no sort of the
  * left side at all.
  */
final case class AsOfJoinBroadcastExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean,
    tolerance: Option[Long])
  extends BinaryExecNode {

  override def nodeName: String = "GraftAsOfJoinBroadcast"

  override val output: Seq[Attribute] =
    left.output ++
      right.output.filterNot(_.exprId == rightKey.exprId).map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  /** Pure per-row lookup: left order and partitioning pass through. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinBroadcastExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrdinal = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrdinal = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrdinal = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrdinal = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyOrdinal >= 0 && lTimeOrdinal >= 0 && rKeyOrdinal >= 0 && rTimeOrdinal >= 0)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rightArity = right.output.length
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output
    val fwd = forward
    val tol = tolerance
    // (key, time, orderable payload) ascending — same tie-determinism
    // contract as the shuffle merge
    val rightOrder: Seq[SortOrder] =
      SortOrder(rightKey, Ascending) +: SortOrder(rightTime, Ascending) +:
        rightAttrs.filterNot(a =>
          a.exprId == rightKey.exprId || a.exprId == rightTime.exprId)
          .filter(a => RowOrdering.isOrderable(a.dataType))
          .map(SortOrder(_, Ascending))

    val bcast = right.executeBroadcast[Array[InternalRow]]()
    // application-unique memo key minted on the DRIVER (applicationId is
    // stable per SparkContext and ships as a plain string); the join
    // shape — key/time ordinals + the payload sort order's exprIds — is
    // included because ReuseExchange may share one broadcast between
    // as-of execs with different key/time columns over the same subtree
    val memoKey = s"${sparkContext.applicationId}#${bcast.id}" +
      s"#k$rKeyOrdinal#t$rTimeOrdinal#o${rightOrder.map(_.child.asInstanceOf[Attribute].exprId.id).mkString(",")}"

    left.execute().mapPartitions({ lIter =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // index build over the (dim-bounded) broadcast rows — once per
      // EXECUTOR via the broadcast-id memo, not per task: drop null
      // key/time rows, sort, bucket per key with the times extracted
      // alongside so the binary search compares boxed values without
      // re-reading rows
      val buckets = AsOfBroadcastIndex.getOrBuild(memoKey) {
        val rowOrd = RowOrdering.create(rightOrder, rightAttrs)
        val sorted = bcast.value
          .filter(r => !r.isNullAt(rKeyOrdinal) && !r.isNullAt(rTimeOrdinal))
          .sorted(rowOrd)
        val b = new java.util.HashMap[Any, (Array[InternalRow], Array[Any])]()
        var i = 0
        while (i < sorted.length) {
          var j = i
          val k = sorted(i).get(rKeyOrdinal, keyType)
          while (j < sorted.length &&
            keyOrd.compare(sorted(j).get(rKeyOrdinal, keyType), k) == 0) j += 1
          val rows = java.util.Arrays.copyOfRange(sorted, i, j)
          b.put(k, (rows, rows.map(_.get(rTimeOrdinal, timeType): Any)))
          i = j
        }
        b
      }.asInstanceOf[java.util.HashMap[Any, (Array[InternalRow], Array[Any])]]
      val proj = UnsafeProjection.create(
        outAttrs, leftAttrs ++ rightAttrs.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      def timeL(a: Any): Long = a.asInstanceOf[Number].longValue

      lIter.map { lRow =>
        val lk = if (lRow.isNullAt(lKeyOrdinal)) null else lRow.get(lKeyOrdinal, keyType)
        val lt = if (lRow.isNullAt(lTimeOrdinal)) null else lRow.get(lTimeOrdinal, timeType)
        val bucket = if (lk == null || lt == null) null else buckets.get(lk)
        if (bucket == null) proj(joined(lRow, nullRight))
        else {
          val (rows, times) = bucket
          // rightmost index with time <= bound (-1 if none)
          def rightmostLe(bound: Any): Int = {
            var lo = 0; var hi = rows.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(times(mid), bound) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            ans
          }
          // leftmost index with time >= bound (-1 if none)
          def leftmostGe(bound: Any): Int = {
            var lo = 0; var hi = rows.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(times(mid), bound) >= 0) { ans = mid; hi = mid - 1 }
              else lo = mid + 1
            }
            ans
          }
          val idx =
            if (!fwd) rightmostLe(lt)
            else {
              val first = leftmostGe(lt)
              // payload-max of the matched time's tie run = rightmost
              // index sharing that time (sorted by payload within time)
              if (first < 0) -1 else rightmostLe(times(first))
            }
          val matched = idx >= 0 && tol.forall { t =>
            val gap = if (fwd) timeL(times(idx)) - timeL(lt) else timeL(lt) - timeL(times(idx))
            gap <= t
          }
          proj(joined(lRow, if (matched) rows(idx) else nullRight))
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Public face of the native operator. */
object AsOfJoinNative {

  /** Idempotent strategy registration — the imperative twin of
    * `injectPlannerStrategy` (mirrors [[graft.functions.GraftFunctions.register]]).
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** Same contract as [[graft.rel.AsOfJoin.asOf]]: `left` and `right`
    * carry `key` and `time`; right's other columns are the payload.
    * Output = left.* ++ `__asof_time` (matched right time, null if no
    * match) ++ payload (null if no match).
    *
    * `direction`: `"backward"` (default — greatest right time ≤ left
    * time) or `"forward"` (smallest right time ≥ left time). `tolerance`
    * (max staleness): match only if |left time − matched right time| ≤
    * tolerance, expressed in the time column's PHYSICAL integral units —
    * microseconds for timestamps, days for dates, raw value for
    * int/long times (the same convention as Spark's own
    * `datetime - datetime` arithmetic at the Catalyst layer).
    *
    * COMPOSITE KEYS: pack them into one struct column
    * (`struct(sym, exch).as("k")`) — struct ordering drives the
    * clustering, the merge comparisons, and the broadcast bucket
    * hashing identically on both exec tiers (AsOfJoinSuite pins it for
    * string/long fields). Caveat: a custom node bypasses the analyzer's
    * NormalizeFloatingNumbers rule, so FLOATING-POINT key fields keep
    * -0.0 ≠ 0.0 / NaN-bit distinctions a built-in equi-join would
    * normalize away — canonicalize float/double key fields (or cast to
    * an exact type) before packing.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      direction: String = "backward", tolerance: Option[Long] = None): DataFrame =
    build(left, right, key, time, direction, tolerance, broadcast = false)

  /** The same operator through [[AsOfJoinBroadcastExec]]: the right side
    * is broadcast whole (EnsureRequirements inserts the
    * BroadcastExchange) and the LEFT side keeps its scan partitioning —
    * ZERO Exchange on the corpus. Use when the right side is
    * dimension-bounded; semantics (including direction, tolerance, and
    * tie determinism) are identical to [[asOf]].
    */
  def asOfBroadcast(left: DataFrame, right: DataFrame, key: String, time: String,
      direction: String = "backward", tolerance: Option[Long] = None): DataFrame =
    build(left, right, key, time, direction, tolerance, broadcast = true)

  private def build(left: DataFrame, right: DataFrame, key: String, time: String,
      direction: String, tolerance: Option[Long], broadcast: Boolean): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    val payload = right.columns.toSeq.filterNot(c => c == key || c == time)
    require(
      payload.nonEmpty && left.columns.toSet.intersect(payload.toSet).isEmpty,
      s"right payload columns ${payload.mkString(",")} must not clash with left")
    require(!left.columns.contains("__asof_time") && !payload.contains("__asof_time"),
      "__asof_time is reserved for the matched right time column")
    val spark = left.sparkSession
    register(spark)
    val rightPrep = right.select(
      (col(key) +: col(time).as("__asof_time") +: payload.map(col)): _*)
    val lPlan = left.queryExecution.analyzed
    // Self-join-style lineage is legal here (q158's two sides scan the
    // same table), but a custom node never passes through the analyzer's
    // Join/Union-specific dedup — so run DeduplicateRelations ourselves
    // on a throwaway Join wrapper and keep its rewritten right child:
    // any exprIds the right subtree shared with the left are regenerated,
    // exactly what the analyzer would have done for a built-in join.
    val rPlan = {
      import org.apache.spark.sql.catalyst.plans.Cross
      import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
      val wrapped = Join(lPlan, rightPrep.queryExecution.analyzed, Cross, None, JoinHint.NONE)
      org.apache.spark.sql.catalyst.analysis.DeduplicateRelations(wrapped)
        .asInstanceOf[Join].right
    }
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val lTimeAttr = attr(lPlan, time)
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types._
      val ok = lTimeAttr.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      require(ok, s"tolerance needs an integral-backed time type, got ${lTimeAttr.dataType}")
    }
    // SAFETY RAIL for the broadcast tier: asOfBroadcast trusts the caller
    // that the right side is dimension-bounded, but a mis-called 100 TB
    // right side would OOM every executor. Gate on the plan's size
    // estimate (the same statistic Spark's own broadcast joins consult)
    // against spark.graft.asof.broadcastMaxBytes (default 512 MiB — an
    // explicit asOfBroadcast call is a hint, so the rail is a generous
    // OOM bound, not the 10 MB auto threshold) and silently fall back to
    // the shuffle-merge tier: semantics are identical across tiers, so
    // the fallback only changes the physical plan. The gate sums the
    // KNOWN leaf sizes: a leaf with no real statistics (RDD-backed,
    // localCheckpoint'ed) reports EXACTLY the defaultSizeInBytes
    // sentinel and is excluded — the rail demotes only KNOWN-huge
    // inputs, it doesn't punish unknown ones, and a known-huge leaf
    // UNDER a union with an unknown sibling still trips it. Leaf sums
    // (not the composed estimate) also dodge the visitor's artifacts:
    // projections scale the sentinel below Long.MaxValue (false
    // demotion) and joins multiply estimates past it (false approval).
    // A real leaf coincidentally equal to the sentinel reads as unknown
    // — the conservative direction (broadcast honored), and vanishingly
    // unlikely at the default sentinel of Long.MaxValue.
    val useBroadcast = broadcast && {
      val maxBytes = BigInt(spark.conf.getOption("spark.graft.asof.broadcastMaxBytes")
        .map(_.toLong).getOrElse(512L << 20))
      org.apache.spark.sql.graft.GraftSqlBridge.withActive(spark) {
        val sentinel = BigInt(org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes)
        rPlan.collectLeaves().map(_.stats.sizeInBytes)
          .filter(_ != sentinel).sum <= maxBytes
      }
    }
    val node = AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      lTimeAttr, attr(rPlan, "__asof_time"),
      forward = direction == "forward", tolerance = tolerance, broadcast = useBroadcast)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark, node)
  }
}
