package graft.pipeline

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The memory-pressure gate the reference can't pass: its reducer state
  * is an unbounded in-process `std::map` (`mr_tasks.h:44` — SURVEY §4),
  * so a hot key set larger than RAM kills the job. Spark replaces that
  * with spillable operators (UnsafeKVExternalSorter under aggregation,
  * ExternalAppendOnlyUnsafeRowArray under sort-merge join buffers), and
  * THIS suite proves the engine's hot aggregation path actually survives
  * the spill: it runs the q16 shingle-pair aggregation in a session
  * squeezed hard enough that the hash aggregate provably falls back and
  * writes spill files (asserted via the operators' own spillSize
  * metrics), then asserts the answer is bit-identical to the untouched
  * session's. At 100 TB this is the difference between "fast when it
  * fits" and "correct when it doesn't".
  */
class SpillSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Every node of the executed plan (AQE disabled → static tree). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p.collect { case n => n }

  test("q16 under memory pressure: aggregation spills to disk and stays exact") {
    val ss = spark.newSession()
    // static plan so the operator metrics are reachable post-execution
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    // force the Tungsten hash aggregate to fall back to sort-based
    // aggregation after a handful of keys: each fallback round converts
    // the hash map into an UnsafeKVExternalSorter and MERGES it into the
    // accumulated sorter, which forces the merged-in run to SPILL to
    // disk — the exact code path a too-hot 100 TB key set takes
    ss.conf.set("spark.sql.TungstenAggregate.testFallbackStartsAt", "2, 5")
    // and squeeze the join buffers too (sort-merge join buffered groups
    // beyond 8 rows go through the spillable row array)
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "4")
    ss.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "8")

    val df = Dedup.ngramJaccard(ss, dir)
    val squeezed = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val spillBytes = allNodes(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("spillSize").map(_.value).filter(_ > 0))
      .sum
    assert(spillBytes > 0,
      "no operator reported spilled bytes — the memory squeeze did not engage")

    // bit-identical to the untouched session (same rounding, same rows)
    val baseline = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(squeezed == baseline, "spilled execution changed the answer")
    assert(baseline.nonEmpty) // non-degenerate: the gate exercised real pairs
  }
}
