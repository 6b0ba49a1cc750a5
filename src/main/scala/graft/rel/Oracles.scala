package graft.rel

/** DuckDB oracle SQL for every query in [[Queries.all]]. Column aliases and
  * ORDER BY must match the Spark side exactly — the driver sorts columns by
  * name and hashes values. Rounding of FP aggregates mirrors the Spark side
  * so accumulation-order differences can't flip the hash.
  */
object Oracles {

  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1999-01-01' AND l_discount < 0.05 AND l_quantity >= 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_revenue" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_orderstatus = 'F' AND o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | count(DISTINCT l_suppkey) AS supp_cnt,
        | round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q08_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        | round(coalesce(lag(o_totalprice, 1) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // ntile casts to INT to match Spark's IntegerType; the (date, key)
    // order is total per customer so every function is deterministic.
    "q78_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        | round(coalesce(lead(o_totalprice, 1) OVER w, 0.0), 2) AS next_price,
        | round(percent_rank() OVER w, 4) AS pct_rank,
        | round(cume_dist() OVER w, 4) AS cdist,
        | (ntile(4) OVER w)::INT AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_topk" ->
      """SELECT l_partkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_partkey
        |ORDER BY revenue DESC, l_partkey
        |LIMIT 10""".stripMargin,

    "q10_union_except" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000)
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY c_custkey""".stripMargin,

    "q11_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,

    "q12_scalar_funcs" ->
      """SELECT o_orderkey,
        | upper(o_orderpriority) AS pri_upper,
        | lower(o_orderstatus) AS status_lower,
        | substr(o_orderpriority, 1, 1) AS pri_code,
        | length(o_orderpriority) AS pri_len,
        | concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
        | replace(o_orderpriority, '-', '_') AS pri_us,
        | year(o_orderdate) AS o_year,
        | month(o_orderdate) AS o_month,
        | day(o_orderdate) AS o_day,
        | datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS o_month_start,
        | round(sqrt(o_totalprice), 4) AS sqrt_price,
        | round(ln(o_totalprice), 6) AS ln_price,
        | round(abs(o_totalprice - 250000.0), 2) AS dev,
        | CAST(floor(o_totalprice) AS BIGINT) AS floor_price
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q13_events_json" ->
      """SELECT event_id, event_type,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        | CASE WHEN value >= 100 THEN 'high'
        |      WHEN value >= 10 THEN 'mid'
        |      ELSE 'low' END AS band
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q14_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '[ ,."'']+')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY word""".stripMargin,

    // Same oracle as q14 — q51 runs the identical word count but through
    // the engine's MrJob map/reduce path instead of the relational twin,
    // and q65 through the algebraic Aggregator fast path.
    "q51_mr_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '[ ,."'']+')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY word""".stripMargin,

    "q65_mr_wordcount_algebraic" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '[ ,."'']+')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY word""".stripMargin,

    // The salted join is row-identical to the plain join — the oracle IS
    // the plain join, aggregated for determinism.
    "q52_salted_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // The bucketed co-located join must equal the plain join; the
    // no-Exchange plan property is pinned in BucketingSuite.
    "q53_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q32_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS INT) AS g_rf,
        | CAST(grouping(l_linestatus) AS INT) AS g_ls,
        | round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q33_sql_api" -> graft.rel.Queries.SqlRevenueByMonth,

    "q36_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |      FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts::TIMESTAMP AS ts, l.value,
        |       r.err_ts::TIMESTAMP AS err_ts, r.err_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.err_ts
        |ORDER BY l.event_id""".stripMargin,

    // q158: the native as-of SparkPlan must reproduce the composed
    // union-window form's answer — literally q36's ASOF oracle.
    "q158_asof_native" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |      FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts::TIMESTAMP AS ts, l.value,
        |       r.err_ts::TIMESTAMP AS err_ts, r.err_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.err_ts
        |ORDER BY l.event_id""".stripMargin,

    // q169: the broadcast as-of exec must reproduce the composed and
    // shuffle-merge forms' answer — literally q36's ASOF oracle again.
    "q169_asof_broadcast" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |      FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts::TIMESTAMP AS ts, l.value,
        |       r.err_ts::TIMESTAMP AS err_ts, r.err_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.err_ts
        |ORDER BY l.event_id""".stripMargin,

    // q172: hourly resample + forward-fill — generate_series builds the
    // same per-user grid (both engines' sequence/series are inclusive of
    // both endpoints) and ASOF carries the last at-or-before observation
    // onto each grid point; pre-aggregated obs make ties unambiguous.
    "q172_resample_ffill" ->
      """WITH e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |             date_trunc('hour', max(ts)) AS h1 FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |o AS (SELECT user_id, ts, max(value) AS value FROM e GROUP BY 1, 2)
        |SELECT g.user_id, g.h::TIMESTAMP AS h, o.ts::TIMESTAMP AS obs_ts, o.value
        |FROM g ASOF LEFT JOIN o ON g.user_id = o.user_id AND g.h >= o.ts
        |ORDER BY g.user_id, g.h""".stripMargin,

    // q173: linear interpolation at the grid points — two ASOFs (one
    // per direction) then the same blend expression in the same
    // operand order; `+ 0.0` canonicalizes any -0.0 the rounding could
    // emit (the q128 precedent).
    "q173_resample_interp" ->
      """WITH e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |             date_trunc('hour', max(ts)) AS h1 FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |o AS (SELECT user_id, ts, max(value) AS v FROM e GROUP BY 1, 2),
        |bk AS (SELECT g.user_id, g.h, o.ts AS tb, o.v AS vb
        |       FROM g ASOF LEFT JOIN o ON g.user_id = o.user_id AND g.h >= o.ts),
        |bf AS (SELECT bk.user_id, bk.h, bk.tb, bk.vb, o.ts AS tf, o.v AS vf
        |       FROM bk ASOF LEFT JOIN o ON bk.user_id = o.user_id AND bk.h <= o.ts)
        |SELECT user_id, h::TIMESTAMP AS h,
        |  round(CASE WHEN tb IS NULL AND tf IS NULL THEN NULL
        |             WHEN tb IS NULL THEN vf
        |             WHEN tf IS NULL THEN vb
        |             WHEN tf = tb THEN vb
        |             ELSE vb + (vf - vb) * ((epoch_us(h) - epoch_us(tb))::DOUBLE
        |                                    / (epoch_us(tf) - epoch_us(tb))::DOUBLE)
        |        END, 4) + 0.0 AS v_interp
        |FROM bf ORDER BY user_id, h""".stripMargin,

    // q178: the ANALYZE equi-height histogram — quantile_cont uses the
    // same (n−1)·q positioning as Spark's exact percentile, and the
    // integer column + /8 quantiles make every interpolated boundary an
    // exact double in BOTH engines (integer·2⁻³), so boundaries, bin
    // assignment (first bin with v <= hi), per-bin NDVs, and the height
    // all hash-match bit-for-bit.
    "q178_column_histogram" ->
      """WITH b AS (SELECT quantile_cont(o_orderkey,
        |    [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS qs,
        |    count(o_orderkey) AS n FROM orders),
        |bins AS (SELECT i AS bin, qs[i+1] AS lo, qs[i+2] AS hi
        |         FROM b, (SELECT unnest(range(0, 8)) AS i)),
        |asn AS (SELECT o.o_orderkey AS v,
        |          coalesce((SELECT min(bin) FROM bins
        |                    WHERE o.o_orderkey <= hi AND bin <= 6), 7) AS bin
        |        FROM orders o),
        |nd AS (SELECT bin, count(DISTINCT v) AS ndv FROM asn GROUP BY 1)
        |SELECT bins.bin::INT AS bin, round(bins.lo, 4) AS lo, round(bins.hi, 4) AS hi,
        |  coalesce(nd.ndv, 0)::BIGINT AS ndv, (b.n::DOUBLE / 8.0) AS height
        |FROM bins LEFT JOIN nd USING (bin), b
        |ORDER BY bin""".stripMargin,

    // q184: the z-order data-skipping read — the box is recomputed from
    // the RAW table (so a file the Spark side wrongly pruned loses rows
    // and goes red) and the Morton value is replayed bit-for-bit: the
    // five spread/mask steps per dimension as chained CTEs (masks are
    // the 0x0000FFFF0000FFFF / 00FF00FF / 0F0F0F0F / 33333333 / 55555555
    // constants in decimal), then ex | (ey << 1).
    "q184_zorder_skipping" ->
      s"""WITH f AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
         |  FROM lineitem
         |  WHERE l_partkey BETWEEN ${Queries.ZOrderBoxX1} AND ${Queries.ZOrderBoxX2}
         |    AND l_suppkey BETWEEN ${Queries.ZOrderBoxY1} AND ${Queries.ZOrderBoxY2}),
         |s1 AS (SELECT *, (l_partkey::BIGINT | (l_partkey::BIGINT << 16)) & 281470681808895 AS ax,
         |               (l_suppkey::BIGINT | (l_suppkey::BIGINT << 16)) & 281470681808895 AS ay FROM f),
         |s2 AS (SELECT *, (ax | (ax << 8)) & 71777214294589695 AS bx,
         |               (ay | (ay << 8)) & 71777214294589695 AS by FROM s1),
         |s3 AS (SELECT *, (bx | (bx << 4)) & 1085102592571150095 AS cx,
         |               (by | (by << 4)) & 1085102592571150095 AS cy FROM s2),
         |s4 AS (SELECT *, (cx | (cx << 2)) & 3689348814741910323 AS dx,
         |               (cy | (cy << 2)) & 3689348814741910323 AS dy FROM s3),
         |s5 AS (SELECT *, (dx | (dx << 1)) & 6148914691236517205 AS ex,
         |               (dy | (dy << 1)) & 6148914691236517205 AS ey FROM s4)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
         |  (ex | (ey << 1))::BIGINT AS zval
         |FROM s5 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // q201: the 3-D z-order read — quantization is replayed from the
    // raw table (min/max CTE + the exact (v−min)//step integer math,
    // step = ceil(range / 2^21)) and the N-way interleave as a sum over
    // the 21 bit positions (bit i of dim j → output bit i·3+j); the sum
    // is CAST BIGINT (DuckDB promotes sums to HUGEINT — the q194
    // lesson). The box itself recomputes from the raw table, gating the
    // skipping decision exactly like q184.
    "q201_zorder3_skipping" -> {
      val Seq((x1, x2), (y1, y2), (q1, q2)) = Queries.ZOrder3Box
      s"""WITH mm AS (
         |  SELECT CAST(floor(min(l_partkey)) AS BIGINT) AS min0, CAST(floor(max(l_partkey)) AS BIGINT) AS max0,
         |         CAST(floor(min(l_suppkey)) AS BIGINT) AS min1, CAST(floor(max(l_suppkey)) AS BIGINT) AS max1,
         |         CAST(floor(min(l_quantity)) AS BIGINT) AS min2, CAST(floor(max(l_quantity)) AS BIGINT) AS max2
         |  FROM lineitem),
         |st AS (SELECT *,
         |  greatest(1, (max0 - min0 + 1 + 2097151) // 2097152) AS s0,
         |  greatest(1, (max1 - min1 + 1 + 2097151) // 2097152) AS s1,
         |  greatest(1, (max2 - min2 + 1 + 2097151) // 2097152) AS s2 FROM mm),
         |f AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
         |         (CAST(floor(l_partkey) AS BIGINT) - min0) // s0 AS q0,
         |         (CAST(floor(l_suppkey) AS BIGINT) - min1) // s1 AS q1,
         |         (CAST(floor(l_quantity) AS BIGINT) - min2) // s2 AS q2
         |  FROM lineitem, st
         |  WHERE l_partkey BETWEEN $x1 AND $x2
         |    AND l_suppkey BETWEEN $y1 AND $y2
         |    AND l_quantity BETWEEN $q1 AND $q2),
         |bits AS (SELECT unnest(range(0, 21)) AS i),
         |-- zval is a pure function of the quantized triple, so the bit
         |-- sum groups by (q0,q1,q2) — NOT by (orderkey,linenumber),
         |-- which this synthetic lineitem does not keep unique
         |z AS (
         |  SELECT q0, q1, q2,
         |    CAST(sum((((q0 >> i) & 1) << (i * 3))
         |           + (((q1 >> i) & 1) << (i * 3 + 1))
         |           + (((q2 >> i) & 1) << (i * 3 + 2))) AS BIGINT) AS zval
         |  FROM (SELECT DISTINCT q0, q1, q2 FROM f) d CROSS JOIN bits
         |  GROUP BY 1, 2, 3)
         |SELECT f.l_orderkey, f.l_linenumber, f.l_partkey, f.l_suppkey,
         |       f.l_quantity, z.zval
         |FROM f JOIN z USING (q0, q1, q2)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    // q202: the evolved-table read reconstructed from the raw table —
    // partitions 0..2 (rewritten after ADD COLUMN) carry the derived
    // channel, partitions 3..5 (carried forward pre-evolution files)
    // carry NULL; a mis-conformed cross-boundary read diverges here.
    "q202_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CASE WHEN o_orderkey % 6 <= 2 THEN
        |    (CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END)
        |  END AS o_channel
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // q204: the renamed-column read — the raw table aliased: a dropped
    // name mapping (old files serving NULL) or a stale physical name
    // diverges here.
    "q204_schema_rename" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS o_amount
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // q205: the dropped-column read — the raw table minus the column;
    // a leaked tombstoned column changes the schema hash, lost rows go
    // red.
    "q205_schema_drop" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // q206: the widened-column read — partitions 0..2 were rewritten
    // post-widening with custkeys shifted past Int.MaxValue (+2^32),
    // 3..5 still serve INT32 files; the reconstruction is exact BIGINT
    // arithmetic, so a truncated or mis-cast era diverges.
    "q206_schema_widen" ->
      s"""SELECT o_orderkey,
         |  CAST(CASE WHEN o_orderkey % 6 <= 2
         |    THEN o_custkey + ${1L << 32}
         |    ELSE o_custkey END AS BIGINT) AS o_custkey,
         |  o_totalprice
         |FROM orders
         |ORDER BY o_orderkey""".stripMargin,

    // q185: the bloom-skipped point lookup — recomputed from the RAW
    // table, so the gate is on the SKIPPING decision: a file whose
    // bloom was wrongly negative (or wrongly dropped from the manifest)
    // loses its rows here and goes red; bloom false positives are
    // invisible (the residual filter removes them on the Spark side).
    "q185_bloom_skipping" ->
      s"""SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, l_extendedprice
         |FROM lineitem
         |WHERE l_orderkey IN (${Queries.BloomProbeKeys.mkString(", ")})
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // q186: the SCD2 equivalence gate — the oracle builds the type-2
    // history from the FULL change log in one window pass, while the
    // Spark side builds base-before-cutoff then applies the tail
    // incrementally; any seam error (wrongly carried open row, missed
    // no-op collapse, dropped new user) diverges here.
    "q186_scd2_incremental" ->
      s"""WITH chg AS (
         |  SELECT user_id, event_type, ts, event_id,
         |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM events),
         |keep AS (
         |  SELECT user_id, event_type, ts, event_id FROM chg
         |  WHERE prev IS NULL OR event_type <> prev)
         |SELECT user_id, event_type AS seg, ts AS valid_from,
         |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         |       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
         |FROM keep ORDER BY user_id, valid_from""".stripMargin,

    // q187: the merge-on-read delete gate — the oracle aggregates the
    // RAW table under the NEGATED delete predicates, so a row the
    // reader failed to subtract (or wrongly subtracted) flips a
    // count/sum and goes red; positions never appear in the output, so
    // the check is purely semantic.
    "q187_delete_vectors" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS cnt,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE NOT (l_returnflag = 'R') AND NOT (l_quantity > 45.0)
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // q188: point-in-time enrichment — DuckDB's native ASOF JOIN over
    // the SQL-built SCD2 dimension gates BOTH composed layers (the
    // history build and the native as-of lookup) in one shot.
    "q188_scd2_asof_enrich" ->
      """WITH chg AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |dim AS (
        |  SELECT user_id, event_type AS seg, ts AS valid_from FROM chg
        |  WHERE prev IS NULL OR event_type <> prev)
        |SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
        |       d.seg, d.valid_from AS seg_since
        |FROM events e
        |ASOF JOIN dim d ON e.user_id = d.user_id AND e.ts >= d.valid_from
        |ORDER BY e.event_id""".stripMargin,

    // q189: the MoR upsert gate — final state reconstructed from the
    // raw table; the CASE branch order encodes latest-wins (batch 2's
    // %97 update shadows batch 1's 'P' repricing where both hit).
    // No per-row round(): the arithmetic is order-free so both engines
    // produce bit-identical doubles, while round() itself diverges on
    // half-way products (Spark HALF_UP vs DuckDB double rounding).
    "q189_mor_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_custkey % 97 = 0 THEN o_totalprice + 5000.0
        |      WHEN o_orderstatus = 'P' THEN o_totalprice * 1.10
        |      ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
        | o_custkey, 'N' AS o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey % 101 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // q190: the DFP gate is the plain join itself — a fact file the
    // bloom wrongly skipped loses its join rows here and goes red.
    "q190_dfp_join" ->
      s"""SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, o_totalprice
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_totalprice > ${Queries.DfpPriceFloor}
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // q191: the CDF gate — batch 2's exact row-level effect rebuilt
    // from the raw table. update_pre must show the state AFTER batch 1
    // (the 'P' repricing), update_post batch 2's values, insert the
    // offset new keys; no rounding (order-free per-row arithmetic).
    "q191_change_data_feed" ->
      """SELECT 'update_pre' AS op, o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.10
        |      ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_custkey % 97 = 0
        |UNION ALL
        |SELECT 'update_post', o_orderkey, o_custkey, o_orderstatus,
        | o_totalprice + 5000.0
        |FROM orders WHERE o_custkey % 97 = 0
        |UNION ALL
        |SELECT 'insert', o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
        | o_custkey, 'N', o_totalprice
        |FROM orders WHERE o_custkey % 101 = 0
        |ORDER BY o_orderkey, op""".stripMargin,

    // q192/q193: the hidden-partitioning gates are the plain data
    // predicates — a wrongly-derived day bound or a probe routed to the
    // wrong bucket loses rows and goes red.
    "q192_hidden_partition_day" ->
      s"""SELECT event_id, ts, user_id, event_type, value
         |FROM events
         |WHERE ts >= TIMESTAMP '${Queries.HiddenPartLo}'
         |  AND ts < TIMESTAMP '${Queries.HiddenPartHi}'
         |ORDER BY event_id""".stripMargin,

    // q208: the string-keyed bloom lookup — recomputed from the raw
    // table with the uid derived in SQL: the gate is on the skipping
    // decision (a file whose bloom was wrongly negative loses rows);
    // false positives are invisible (residual-filtered on the Spark
    // side).
    "q208_string_bloom_lookup" -> {
      val in = Queries.StringProbeUids.map(u => s"'$u'").mkString(", ")
      s"""SELECT doc_id, printf('doc-%08d', doc_id) AS doc_uid, lang, source, n_chars
         |FROM documents
         |WHERE printf('doc-%08d', doc_id) IN ($in)
         |ORDER BY doc_id""".stripMargin
    },

    // q209: bucket-count evolution — the plain equality SQL, blind to
    // the bucket(4)/bucket(8) era boundary: a probe routed to the
    // wrong bucket in either era loses that era's rows and goes red.
    "q209_bucket_evolution" ->
      s"""SELECT event_id, ts, user_id, event_type, value
         |FROM events
         |WHERE user_id = ${Queries.HiddenPartUser}
         |ORDER BY event_id""".stripMargin,

    // q207: partition evolution — the plain ts-range SQL, blind to the
    // day/hour era boundary the engine's layout crosses: a directory
    // wrongly pruned in either era loses rows here and goes red.
    "q207_partition_evolution" ->
      s"""SELECT event_id, ts, user_id, event_type, value
         |FROM events
         |WHERE ts >= TIMESTAMP '${Queries.PartEvolveLo}'
         |  AND ts < TIMESTAMP '${Queries.PartEvolveHi}'
         |ORDER BY event_id""".stripMargin,

    "q193_hidden_partition_bucket" ->
      s"""SELECT event_id, ts, user_id, event_type, value
         |FROM events
         |WHERE user_id = ${Queries.HiddenPartUser}
         |ORDER BY event_id""".stripMargin,

    // q194: time-in-state — the SCD2 intervals rebuilt in SQL, open
    // rows capped at max(ts); all sums in integral microseconds so the
    // gate is FP-free.
    "q194_scd2_time_in_state" ->
      """WITH chg AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |keep AS (
        |  SELECT user_id, event_type, ts, event_id FROM chg
        |  WHERE prev IS NULL OR event_type <> prev),
        |iv AS (
        |  SELECT user_id, event_type AS seg, ts AS valid_from,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM keep)
        |SELECT seg, count(*) AS n_versions,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(sum(epoch_us(coalesce(valid_to, (SELECT max(ts) FROM events)))
        |           - epoch_us(valid_from)) AS BIGINT) AS total_us
        |FROM iv GROUP BY seg ORDER BY seg""".stripMargin,

    // q196: compaction is content-neutral layout maintenance — exactly
    // q189's oracle; any dropped/duplicated/resurrected row goes red.
    "q196_mor_compaction" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_custkey % 97 = 0 THEN o_totalprice + 5000.0
        |      WHEN o_orderstatus = 'P' THEN o_totalprice * 1.10
        |      ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
        | o_custkey, 'N' AS o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey % 101 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // q198: the horizon gate — the state after batch 1 only: 'P'
    // orders repriced, nothing else; a batch-2 tombstone or append
    // leaking through the horizon changes a row here and goes red.
    "q198_mor_time_travel" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.10
        |      ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // q199: the indexed-lookup gate — the probed keys' LIVE versions
    // from the raw table (latest-wins CASE); none of the probes is an
    // inserted key, so every branch is base-derivable.
    "q199_mor_indexed_lookup" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
         | CASE WHEN o_custkey % 97 = 0 THEN o_totalprice + 5000.0
         |      WHEN o_orderstatus = 'P' THEN o_totalprice * 1.10
         |      ELSE o_totalprice END AS o_totalprice
         |FROM orders
         |WHERE o_orderkey IN (${Queries.BloomProbeKeys.mkString(", ")})
         |ORDER BY o_orderkey""".stripMargin,

    // q168: the native as-of's forward direction + 24 h tolerance —
    // DuckDB's ASOF with the `<=` inequality finds the earliest
    // at-or-after error; the tolerance is applied as a predicate over
    // the raw match (a match beyond tolerance null-pads, identical to
    // a miss, which is exactly the operator's contract).
    "q168_asof_fwd_tol" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts AS err_ts, max(value) AS err_value
        |      FROM events WHERE event_type = 'error' GROUP BY user_id, ts),
        |m AS (SELECT l.event_id, l.user_id, l.ts, l.value, r.err_ts, r.err_value
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.err_ts)
        |SELECT event_id, user_id, ts::TIMESTAMP AS ts, value,
        |  CASE WHEN err_ts - ts <= INTERVAL 24 HOUR THEN err_ts::TIMESTAMP END AS err_ts,
        |  CASE WHEN err_ts - ts <= INTERVAL 24 HOUR THEN err_value END AS err_value
        |FROM m ORDER BY event_id""".stripMargin,

    // q161: lag/lead/ntile/percent_rank share one (user, ts, event_id)
    // window — DuckDB's ntile/percent_rank semantics match Spark's
    // (SQL-standard bucket sizing and (rank-1)/(n-1)).
    "q161_window_analytics" ->
      """SELECT event_id, user_id, value,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    // q162: the CSV write+read round-trip must be row-identical to the
    // parquet table — typed fidelity through the text format.
    "q162_csv_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // q165: the JSONL write+read round-trip, same identity gate as q162.
    "q165_jsonl_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // q164: the ANALYZE-style stats table, one UNION ALL arm per column.
    "q164_table_stats" ->
      """SELECT 'o_custkey' AS col_name, count(*)::BIGINT AS n_rows,
        |  (count(*) - count(o_custkey))::BIGINT AS n_nulls,
        |  count(DISTINCT o_custkey)::BIGINT AS n_distinct,
        |  min(o_custkey)::DOUBLE AS min_val, max(o_custkey)::DOUBLE AS max_val
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*)::BIGINT, (count(*) - count(o_orderkey))::BIGINT,
        |  count(DISTINCT o_orderkey)::BIGINT,
        |  min(o_orderkey)::DOUBLE, max(o_orderkey)::DOUBLE
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*)::BIGINT, (count(*) - count(o_totalprice))::BIGINT,
        |  count(DISTINCT o_totalprice)::BIGINT,
        |  min(o_totalprice)::DOUBLE, max(o_totalprice)::DOUBLE
        |FROM orders
        |ORDER BY col_name""".stripMargin,

    "q37_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (event_type = 'click') AS click,
        | count(*) FILTER (event_type = 'error') AS error,
        | count(*) FILTER (event_type = 'purchase') AS purchase,
        | count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q38_unpivot" ->
      """WITH w AS (
        |  SELECT user_id,
        |   count(*) FILTER (event_type = 'click') AS click,
        |   count(*) FILTER (event_type = 'error') AS error,
        |   count(*) FILTER (event_type = 'purchase') AS purchase,
        |   count(*) FILTER (event_type = 'view') AS view
        |  FROM events GROUP BY user_id)
        |SELECT user_id, event_type, n_events FROM (
        |  SELECT user_id, 'click' AS event_type, click AS n_events FROM w
        |  UNION ALL SELECT user_id, 'error', error FROM w
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM w
        |  UNION ALL SELECT user_id, 'view', view FROM w)
        |WHERE n_events > 0
        |ORDER BY user_id, event_type""".stripMargin,

    "q39_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(quantile_cont(value, 0.99), 4) AS p99,
        | round(min(value), 2) AS vmin,
        | round(max(value), 2) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q41_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 2 * (
        |  SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q42_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q43_range_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
        |w AS (SELECT event_id AS window_id, t AS w_start, t + 3600000000 AS w_end
        |      FROM ev WHERE event_type = 'purchase' AND user_id < 5)
        |SELECT window_id, count(*) AS n_events
        |FROM w JOIN ev ON w.w_start <= ev.t AND ev.t < w.w_end
        |GROUP BY window_id ORDER BY window_id""".stripMargin,

    // U3: the reference assignment's named alternate workload (mean/max
    // per time bucket) over events; day buckets because the testdata
    // spans under a month.
    "q72_daily_stats" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS day,
        | round(avg(value), 4) AS avg_value,
        | round(max(value), 2) AS max_value,
        | count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q92_full_outer_join" ->
      """WITH rich AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000),
        |spenders AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         round(sum(o_totalprice), 2) AS total_spent
        |  FROM orders GROUP BY o_custkey
        |  HAVING round(sum(o_totalprice), 2) > 2500000)
        |SELECT coalesce(c_custkey, o_custkey) AS cust_id, c_name, c_acctbal,
        |       n_orders, total_spent
        |FROM rich FULL OUTER JOIN spenders ON c_custkey = o_custkey
        |ORDER BY cust_id""".stripMargin,

    "q93_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |mx AS (SELECT max(o_orderkey) AS m FROM base),
        |changes AS (
        |  SELECT o_orderkey AS k, 'D' AS op, NULL::BIGINT AS new_custkey,
        |         NULL::VARCHAR AS new_status, NULL::DOUBLE AS new_price
        |  FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'U', o_custkey, o_orderstatus,
        |         o_totalprice * 2
        |  FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + mx.m + 1, 'I', o_custkey, 'O', 100.0
        |  FROM base, mx WHERE o_orderkey % 101 = 0)
        |SELECT coalesce(base.o_orderkey, changes.k) AS o_orderkey,
        |       coalesce(changes.new_custkey, base.o_custkey) AS o_custkey,
        |       coalesce(changes.new_status, base.o_orderstatus) AS o_orderstatus,
        |       coalesce(changes.new_price, base.o_totalprice) AS o_totalprice
        |FROM base FULL OUTER JOIN changes ON base.o_orderkey = changes.k
        |WHERE changes.op IS NULL OR changes.op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,

    // q146: the textbook correlated-min form — equality against the
    // part's own min compares the SAME double on both engines.
    "q146_cheapest_supplier" ->
      """SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
        | round(l.l_extendedprice, 2) AS best_price
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE l.l_extendedprice = (SELECT min(l2.l_extendedprice)
        |                           FROM lineitem l2
        |                           WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    // q147: IN (GROUP BY ... HAVING) — quantities are integer-valued, so
    // the sums and the 180 threshold are exact.
    "q147_large_orders" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        | round(o.o_totalprice, 2) AS o_totalprice, q.total_qty
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180) q
        |ON q.l_orderkey = o.o_orderkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,

    // q148: scalar-avg subquery + NOT EXISTS. The avg threshold sits in
    // the gaps between 2-decimal balances, so cross-engine
    // accumulation-order noise (~1e-12) cannot flip a row.
    "q148_rich_inactive" ->
      """SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS c_acctbal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |AND NOT EXISTS (SELECT 1 FROM orders o
        |                WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    // q149: the double-correlated EXISTS / NOT EXISTS form of the
    // Spark side's set algebra.
    "q149_lone_late_supplier" ->
      """WITH late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM late lt JOIN supplier s ON s.s_suppkey = lt.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = lt.l_orderkey
        |              AND l2.l_suppkey <> lt.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM late l3
        |                WHERE l3.l_orderkey = lt.l_orderkey
        |                AND l3.l_suppkey <> lt.l_suppkey)
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey""".stripMargin,

    // q150: NOT IN + count-distinct; the below-average exclusion reuses
    // the q148 gap argument.
    "q150_supplier_diversity" ->
      """SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_acctbal < (SELECT avg(s_acctbal) FROM supplier))
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,

    // q151: one row per FK edge — counts are exact integers.
    "q151_fk_audit" ->
      """SELECT * FROM (
        |  SELECT 'orders.o_custkey->customer' AS fk_edge,
        |    (SELECT count(*) FROM orders)::BIGINT AS n_rows,
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey NOT IN
        |      (SELECT c_custkey FROM customer))::BIGINT AS n_orphans
        |  UNION ALL SELECT 'lineitem.l_orderkey->orders',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey NOT IN
        |      (SELECT o_orderkey FROM orders))
        |  UNION ALL SELECT 'lineitem.l_partkey->part',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE l.l_partkey NOT IN
        |      (SELECT p_partkey FROM part))
        |  UNION ALL SELECT 'lineitem.l_suppkey->supplier',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE l.l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier))
        |  UNION ALL SELECT 'customer.c_nationkey->nation',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM customer c WHERE c.c_nationkey NOT IN
        |      (SELECT n_nationkey FROM nation))
        |  UNION ALL SELECT 'supplier.s_nationkey->nation',
        |    (SELECT count(*) FROM supplier),
        |    (SELECT count(*) FROM supplier s WHERE s.s_nationkey NOT IN
        |      (SELECT n_nationkey FROM nation))
        |  UNION ALL SELECT 'nation.n_regionkey->region',
        |    (SELECT count(*) FROM nation),
        |    (SELECT count(*) FROM nation n WHERE n.n_regionkey NOT IN
        |      (SELECT r_regionkey FROM region)))
        |ORDER BY fk_edge""".stripMargin,

    // q152: the oracle is the FULL recompute — a green gate proves the
    // Spark side's base+delta partial merge equivalent to it, which is
    // the materialized-view-maintenance contract.
    "q152_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_spend
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin
  )
}
