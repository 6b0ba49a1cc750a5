package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark plans a raw `s <= p AND p < e`
  * theta join as a nested-loop — fine when one side broadcasts, quadratic
  * when both sides are large. The scalable form bins time: an interval
  * replicates into every fixed-width bin it overlaps, a point lives in
  * exactly one bin, and the join becomes an equi-join on the bin id with
  * the range predicate as a residual filter. A point meets an interval in
  * at most one bin (its own), so no dedup is needed. Bin width trades
  * interval replication (wide bins) against join fan-in (narrow bins) —
  * pick it near the median interval length.
  */
object RangeJoin {

  /** Equi-binned range join of `points` (`timeCol`: LONG, e.g. epoch
    * micros via `unix_micros`) against `intervals` (`startCol` inclusive,
    * `endCol` exclusive, same unit). Output: every (interval row ++ point
    * row) pair with start <= t < end. Timestamp callers convert up front —
    * a timestamp-to-long cast truncates to seconds, which would corrupt
    * the binning silently.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      timeCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", binOf(col(timeCol)))
    // drop empty/inverted intervals BEFORE binning: Spark's sequence(a, b)
    // counts DOWN when b < a, so start >= end would fabricate junk bins
    // (or explode an enormous descending range for malformed input)
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(binOf(col(startCol)), binOf(col(endCol) - 1))))
    iv.join(p, "__bin")
      .filter(col(startCol) <= col(timeCol) && col(timeCol) < col(endCol))
      .drop("__bin")
  }
}
