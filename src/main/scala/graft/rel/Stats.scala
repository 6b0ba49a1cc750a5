package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.functions.{col, count, countDistinct, expr, lit, when}
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType}

/** Feeds the engine's own ANALYZE output (the q164 exact / q166
  * one-pass-HLL column statistics queries) into the session catalog —
  * the imperative twin of `ANALYZE TABLE … COMPUTE STATISTICS FOR
  * COLUMNS`, closing the loop that makes the stats queries LOAD-BEARING:
  * with `spark.sql.cbo.enabled`, Catalyst's FilterEstimation reads the
  * injected row count + per-column NDV/min/max/null-count to estimate
  * post-filter cardinalities, and JoinSelection then flips a
  * sort-merge join to a broadcast join when the estimated build side is
  * small (pinned in PlanSuite). At 100 TB this is the ANALYZE→CBO path
  * a warehouse runs nightly: q166's Expand-free one-pass plan produces
  * the numbers, this feeds them to the optimizer.
  */
object Stats {

  /** Inject table + column statistics for `tableName` from a stats
    * frame in the q164/q166 row shape:
    * `(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)` —
    * `min_val`/`max_val` as doubles (the queries' cross-engine
    * normalization), re-rendered integral for integral columns.
    * `avgRowBytes` sizes the table estimate (`sizeInBytes`) from the
    * row count; CBO's filter/join estimation works off the row count
    * and column stats, so a coarse width is fine.
    */
  /** Build an EQUI-HEIGHT histogram over `column` — the ANALYZE
    * `spark.sql.statistics.histogram.enabled` shape, computed by the
    * engine's own distributed passes: exact percentile boundaries at
    * the 1/nBins quantiles (one aggregation; swap in approx_percentile
    * at 100 TB — bin SHAPE is what estimation needs, not exactness),
    * then one group-by for the exact per-bin NDVs. Feed the result to
    * [[feedTableStats]] and CBO's FilterEstimation prices RANGE
    * predicates by the bins actually covered instead of assuming a
    * uniform [min, max] spread — the difference between a sensible and
    * a wildly-wrong plan on a skewed column (pinned in PlanSuite).
    */
  def equiHeightHistogram(df: DataFrame, column: String, nBins: Int): Histogram = {
    require(nBins >= 2, "need at least two bins")
    val v = col(column).cast("double")
    val qs = (0 to nBins).map(i => i.toDouble / nBins)
    val head = df.agg(
      expr(s"percentile($column, array(${qs.mkString(", ")}))").as("bs"),
      count(v).as("n")).head()
    val bs = head.getSeq[Double](0)
    val n = head.getLong(1)
    require(n > 0, s"no non-null values in $column")
    // bin assignment by boundary: bin i covers (bs(i), bs(i+1)] with the
    // first bin closed at both ends — the standard equi-height layout
    val bin = (1 until nBins).foldRight(lit(nBins - 1): Column)((i, acc) =>
      when(v <= lit(bs(i)), lit(i - 1)).otherwise(acc))
    val ndvs = df.filter(v.isNotNull)
      .groupBy(bin.as("b")).agg(countDistinct(v).as("ndv"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Histogram(n.toDouble / nBins,
      Array.tabulate(nBins)(i => HistogramBin(bs(i), bs(i + 1), ndvs.getOrElse(i, 0L))))
  }

  def feedTableStats(
      spark: SparkSession,
      tableName: String,
      stats: DataFrame,
      avgRowBytes: Long = 32L,
      histograms: Map[String, Histogram] = Map.empty): Unit = {
    val rows = stats.collect()
    require(rows.nonEmpty, "empty stats frame")
    val nRows = rows.head.getAs[Long]("n_rows")
    val schema = spark.table(tableName).schema
    val colStats = rows.flatMap { r =>
      val name = r.getAs[String]("col_name")
      schema.find(_.name == name).map { field =>
        // CatalogColumnStat stores min/max in EXTERNAL string form:
        // integral columns must not carry a decimal point, DateType must
        // be the yyyy-MM-dd form fromExternalString parses (the q164
        // shape normalizes min/max to double = days since epoch), and
        // types with non-numeric external forms (timestamp, string)
        // carry NO min/max — NDV and null count remain useful on their
        // own. An all-null column has NULL min/max in the stats frame;
        // injecting a fabricated 0 would hand CBO a fake [0,0] range,
        // so nulls stay None.
        def render(col: String): Option[String] = {
          val i = r.fieldIndex(col)
          if (r.isNullAt(i)) None
          else {
            val v = r.getDouble(i)
            field.dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                Some(v.toLong.toString)
              case DateType =>
                Some(java.time.LocalDate.ofEpochDay(v.toLong).toString)
              case org.apache.spark.sql.types.FloatType |
                   org.apache.spark.sql.types.DoubleType => Some(v.toString)
              case t: org.apache.spark.sql.types.DecimalType =>
                Some(BigDecimal(v).setScale(t.scale, BigDecimal.RoundingMode.HALF_UP).toString)
              case _ => None
            }
          }
        }
        // avg/max byte length: taken from the stats frame when the
        // ANALYZE pass measured them (`avg_len`/`max_len` columns,
        // nullable), else the type's fixed width — a flat 8 would
        // understate CBO's size-in-bytes for wide string columns.
        def measuredLen(col: String): Option[Long] =
          if (!stats.columns.contains(col)) None
          else {
            val i = r.fieldIndex(col)
            if (r.isNullAt(i)) None else Some(r.getLong(i))
          }
        val typeLen = field.dataType.defaultSize.toLong
        name -> CatalogColumnStat(
          distinctCount = Some(BigInt(r.getAs[Long]("n_distinct"))),
          min = render("min_val"),
          max = render("max_val"),
          nullCount = Some(BigInt(r.getAs[Long]("n_nulls"))),
          avgLen = Some(measuredLen("avg_len").getOrElse(typeLen)),
          maxLen = Some(measuredLen("max_len").getOrElse(typeLen)),
          histogram = histograms.get(name))
      }
    }.toMap
    spark.sessionState.catalog.alterTableStats(
      spark.sessionState.sqlParser.parseTableIdentifier(tableName),
      Some(CatalogStatistics(
        sizeInBytes = BigInt(nRows) * avgRowBytes,
        rowCount = Some(BigInt(nRows)),
        colStats = colStats)))
  }
}
