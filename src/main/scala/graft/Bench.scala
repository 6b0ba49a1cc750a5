package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    // Uncounted warmup: JIT + codegen + parquet footer caches, so the
    // first measured query isn't charged for JVM startup.
    try {
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      l.groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }
    // (name, seconds, error). A failed query reports err and is excluded
    // from the headline total instead of masquerading as a fast run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        // noop sink, not count(): under count() Catalyst prunes every
        // projected expression and eliminates final sorts, so projection-
        // heavy queries would measure a bare scan instead of their work.
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${esc(String.valueOf(e.getMessage)).take(200)}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isEmpty) v else -1.0)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => "\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val nFail = results.count(_._3.isDefined)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFail,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
