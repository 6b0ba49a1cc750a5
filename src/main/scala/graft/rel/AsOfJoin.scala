package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the right row with the
  * greatest `time` ≤ the left row's `time`, per key. Spark has no native
  * operator; rather than a custom SparkPlan this composes existing ones
  * (union → per-key window scan), which keeps the whole thing inside
  * Spark's standard shuffle/sort machinery:
  *
  *   1. tag left (probe) and right (reference) rows and union them;
  *   2. one window per key, ordered by (time, tag) with right-before-left
  *      on ties so "≤" matches same-timestamp rows;
  *   3. running `last(…, ignoreNulls)` carries the latest right payload
  *      forward; left rows then read their match from the running state;
  *   4. keep the left rows.
  *
  * Cost shape: ONE hash shuffle on the key plus a per-partition sort —
  * identical to a sort-merge join, with no range-explosion risk. The
  * right payload rides in a single struct so a NULL field inside a
  * matched row is preserved (a per-column `last` would skip it).
  */
object AsOfJoin {

  /** `left` and `right` must both carry `key` and `time` columns; right's
    * other columns become the match payload. Output = left.* plus
    * `__asof_time` (matched right time, null if no match) plus the right
    * payload columns (null if no match). Left-join semantics.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => c == key || c == time)
    require(
      payload.nonEmpty && left.columns.toSet.intersect(payload.toSet).isEmpty,
      s"right payload columns ${payload.mkString(",")} must not clash with left")
    val leftOnly = left.columns.toSeq.filterNot(c => c == key || c == time)
    val timeType = right.schema(time).dataType

    val payloadStruct = struct(
      (col(time).as("__t") +: payload.map(col)): _*)

    val rTagged = right.select(
      (Seq(col(key), col(time), lit(0).as("__is_l"), payloadStruct.as("__p")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (Seq(col(key), col(time), lit(1).as("__is_l"),
        lit(null).cast(rTagged.schema("__p").dataType).as("__p")) ++
        leftOnly.map(col)): _*)

    // right rows sort before left rows on equal time ("<=" includes ties);
    // the payload struct is the final sort key so that when several right
    // rows share (key, time) the match is the struct-max — deterministic
    // regardless of shuffle order (left rows carry a null payload, which
    // sorts consistently)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_l").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged
      .unionByName(rTagged)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)
      .select(
        (Seq(col(key), col(time)) ++ leftOnly.map(col) :+
          col("__match.__t").cast(timeType).as("__asof_time")) ++
          payload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
