package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
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
  def feedTableStats(
      spark: SparkSession,
      tableName: String,
      stats: DataFrame,
      avgRowBytes: Long = 32L): Unit = {
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
          maxLen = Some(measuredLen("max_len").getOrElse(typeLen)))
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
