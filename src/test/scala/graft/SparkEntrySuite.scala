package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every oracle key must name a declared
  * query (a typo'd key would make the driver dump an oracle for a
  * nonexistent result and silently weaken the gate to rows-only for the
  * real one), query names must be unique across the two registries, and
  * the flagship entry must return rows.
  */
class SparkEntrySuite extends AnyFunSuite {

  test("every oracleSql key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("relational and pipeline registries do not shadow each other") {
    val dup = rel.Queries.all.keySet.intersect(pipeline.PipelineQueries.all.keySet)
    assert(dup.isEmpty, s"duplicate query names: $dup")
    val dupOracle = rel.Oracles.all.keySet.intersect(pipeline.PipelineQueries.oracles.keySet)
    assert(dupOracle.isEmpty, s"duplicate oracle names: $dupOracle")
  }

  test("bench short keys (qNN prefix) are unique across all queries") {
    // Bench's size-capped final JSON line keys each query by its name up
    // to the first underscore; two queries sharing a qNN prefix would
    // silently merge into one (last-wins) entry in the driver's metrics
    val shorts = SparkEntry.queries.keys.toSeq.map(n => n.takeWhile(_ != '_'))
    val dups = shorts.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"colliding bench keys: $dups")
    shorts.foreach(s => assert(s.matches("q\\d+"), s"unkeyed query name: $s"))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
