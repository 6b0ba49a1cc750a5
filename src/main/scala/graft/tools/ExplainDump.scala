package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for a set of declared queries to files —
  * the plan evidence for optimization rounds (plans/r<N>/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> <name,name,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, names) = args.take(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(s"local[$cpus]", cpus)
    Files.createDirectories(Paths.get(outDir))
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty)
    val registry = graft.SparkEntry.queries
    wanted.foreach { prefix =>
      registry.toSeq.sortBy(_._1).filter(_._1.startsWith(prefix)).foreach {
        case (name, fn) =>
          try {
            val df = fn(spark, dir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
            println(s"[explain] wrote $name ($tag)")
          } catch {
            case e: Throwable =>
              println(s"[explain] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
