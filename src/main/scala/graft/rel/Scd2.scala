package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING-DIMENSION TYPE 2 — versioned history with validity
  * intervals, the standard warehouse shape for "what was this entity's
  * attribute AT time t": one row per (entity, value, [valid_from,
  * valid_to)), open-ended row flagged `is_current`. Two faces:
  *
  *  - [[fromChangeLog]] — the batch bootstrap: de-noop the change log
  *    (consecutive equal values collapse to the first), then one window
  *    pass assigns each surviving change its interval. Two windows over
  *    the same (user, time) partitioning → ONE shuffle (Catalyst reuses
  *    the sort).
  *
  *  - [[applyDelta]] — the operator that matters at 100 TB: a day's
  *    delta must NOT rebuild the full history. Closed rows are immutable
  *    by construction (a later event can only ever close the OPEN row),
  *    so the untouched users' rows and the touched users' closed rows
  *    carry through verbatim (anti/semi joins — with the history
  *    partitioned by entity, partition-pruned; the delta side is a day's
  *    data, broadcast-able). Only each touched user's single open row
  *    re-enters the chain: it is re-seeded as a pseudo-change (tie-broken
  *    FIRST via event_id −1) ahead of the delta's changes, so the
  *    de-noop correctly swallows a delta event that repeats the current
  *    value. The q186 oracle replays the FULL log in SQL, gating that
  *    incremental == batch.
  */
object Scd2 {

  /** Change log (`user_id, event_type, ts, event_id`) → SCD2 history
    * (`user_id, seg, valid_from, valid_to, is_current`). `event_id`
    * breaks same-timestamp ties deterministically on both the de-noop
    * and the interval window.
    */
  def fromChangeLog(log: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    log
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("event_type") =!= col("prev"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(
        col("user_id"),
        col("event_type").as("seg"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Apply `delta` (a later slice of the change log) to an existing SCD2
    * `base`: untouched users and closed rows carry verbatim; each
    * touched user's open row re-enters the change chain as a seed
    * pseudo-change ordered before every delta row of that user.
    *
    * Precondition (the log-append contract): every delta event is at or
    * after its user's open-row `valid_from` — deltas are appends, not
    * retro-corrections. ENFORCED: a retro-dated event raises an error at
    * execution time instead of silently diverging from the full-log
    * batch replay. The guard is a per-user window over the same
    * partitioning the interval chain already shuffles on, so it costs no
    * extra Exchange and no eager job.
    */
  def applyDelta(base: DataFrame, delta: DataFrame): DataFrame = {
    val touched = delta.select("user_id").distinct()
    val carry = base.join(touched, Seq("user_id"), "left_anti")
    val touchedBase = base.join(touched, Seq("user_id"), "left_semi")
    val closed = touchedBase.filter(!col("is_current"))
    // the open row as a pseudo-change: event_id −1 sorts before any real
    // event at the same timestamp, so the seed is always the chain head
    val seed = touchedBase.filter(col("is_current"))
      .select(col("user_id"), col("seg").as("event_type"),
        col("valid_from").as("ts"), lit(-1L).as("event_id"),
        lit(true).as("__seed"))
    val chain = seed.unionByName(
      delta.select(col("user_id"), col("event_type"), col("ts"),
        col("event_id").cast("long"), lit(false).as("__seed")))
    // retro-dated guard: every real delta event must be at or after its
    // user's seed ts (users new to the table have no seed — unchecked by
    // construction). Seeds are identified by the explicit __seed marker,
    // NOT the event_id −1 sentinel — an in-band −1 in the delta would
    // both poison the seed detection and break fromChangeLog's
    // seed-sorts-first tie-break, so negative delta ids are rejected
    // outright. Both errors are woven into the ts column itself so the
    // optimizer cannot prune them.
    val byUser = Window.partitionBy("user_id")
    val checked = chain
      .withColumn("_seed_ts",
        max(when(col("__seed"), col("ts"))).over(byUser))
      .withColumn("ts",
        when(!col("__seed") && (col("event_id").isNull || col("event_id") < 0L),
          raise_error(concat(
            lit("Scd2.applyDelta: null or negative event_id in delta for user_id="),
            col("user_id").cast("string"),
            lit(" (ids must be non-negative; negatives and NULLs break the"),
            lit(" seed-sorts-first tie-break)")))
            .cast("timestamp"))
          .when(
            !col("__seed") && col("_seed_ts").isNotNull &&
              col("ts") < col("_seed_ts"),
            raise_error(concat(
              lit("Scd2.applyDelta: retro-dated delta event for user_id="),
              col("user_id").cast("string"),
              lit(" (ts precedes the open row's valid_from; deltas must be appends)")))
              .cast("timestamp"))
          .otherwise(col("ts")))
      .drop("_seed_ts", "__seed")
    carry.unionByName(closed).unionByName(fromChangeLog(checked))
  }
}
