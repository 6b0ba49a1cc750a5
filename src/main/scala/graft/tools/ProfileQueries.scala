package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level profiler for a declared-query subset: prints every stage
  * over 300 ms with its TASK COUNT, which is how the round-10 q73
  * regression was pinned (8 s and 15 s single-task stages — AQE's 1 MB
  * coalescing floor serializing a CPU-dense 700 KB shuffle; see
  * [[graft.Sessions]]). Reuses the real query registry, so it can never
  * drift from the plans it profiles.
  *
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_CPUS`
  * (default 32), `SPARK_GRAFT_BENCH_ONLY`-style arg list of query-name
  * prefixes (default q73).
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val prefixes = if (args.nonEmpty) args.toSet else Set("q73")
    val spark: SparkSession = graft.Sessions.local(s"local[$cpus]", cpus)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        if (ms > 300)
          println(f"[prof] stage ${i.stageId} tasks=${i.numTasks} ${ms / 1000.0}%.2f s")
      }
    })

    time("warm shared caches") {
      graft.pipeline.TextAnalysis.warmShared(spark, dir)
      graft.pipeline.Dedup.warmShared(spark, dir)
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        (1 to 3).foreach { i =>
          time(s"$name (noop) #$i") {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
          }
        }
      }
    spark.stop()
  }
}
