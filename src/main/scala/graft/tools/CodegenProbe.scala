package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures whether Spark's generated-code compile cache
  * (`spark.sql.codegen.cache.maxEntries`, static, default 100) thrashes
  * when the full declared-query suite cycles round-robin: runs the suite
  * (or a prefix subset) for N passes and prints, per pass, the wall time
  * and the DELTA of Janino compilations + compile milliseconds from
  * `CodegenMetrics`. A warm second pass that still recompiles thousands
  * of units is cache thrash; a big cache makes the delta collapse.
  *
  * Args: [passes] [prefix,prefix,...]; env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_CODEGEN_CACHE (forwarded to the static conf before session start).
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val only = args.lift(1).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    sys.env.get("SPARK_GRAFT_CODEGEN_CACHE")
      .foreach(v => System.setProperty("spark.sql.codegen.cache.maxEntries", v))
    val spark: SparkSession = graft.Sessions.local(s"local[$cpus]", cpus)
    val m = org.apache.spark.metrics.source.CodegenMetrics
    def compCount: Long = m.METRIC_COMPILATION_TIME.getCount
    try {
      graft.pipeline.TextAnalysis.warmShared(spark, dir)
      graft.pipeline.Dedup.warmShared(spark, dir)
    } catch { case _: Throwable => () }
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    println(s"[cgprobe] cacheMaxEntries=" +
      spark.conf.getOption("spark.sql.codegen.cache.maxEntries").getOrElse("default(100)") +
      s" queries=${qs.size}")
    (1 to passes).foreach { p =>
      val c0 = compCount
      val t0 = System.nanoTime()
      qs.foreach { case (n, fn) =>
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"[cgprobe] $n FAILED: ${e.getMessage}") }
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cgprobe] pass=$p%d wall=$secs%.1f s compiles=${compCount - c0}%d totalCompiles=$compCount%d")
    }
    spark.stop()
  }
}
