package graft.tools

import graft.core.{Engine, MapReduceSpec, Registry}
import graft.jobs.WordCount
import org.apache.spark.sql.SparkSession

/** CLI demo driver — the equivalent of the reference's `mrdemo` binary
  * (reference `test/main.cc:10-23`): `MrDemo <config.ini>` loads the spec,
  * resolves the registered job by `user_id`, and runs the engine.
  *
  * The bundled word-count job registers under the id named in the config
  * (reference registers "cs6210" via a static initializer,
  * `test/user_tasks.cc:45-58`).
  */
object MrDemo {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: MrDemo <config.ini>")
    val spec = MapReduceSpec.fromConfigFile(args(0))
    val errs = MapReduceSpec.validate(spec)
    if (errs.nonEmpty) {
      System.err.println(s"mr_spec invalid:\n  ${errs.mkString("\n  ")}")
      sys.exit(1)
    }
    Registry.register(spec.userId, WordCount)
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-mrdemo")
      .config("spark.sql.shuffle.partitions", spec.nOutputFiles)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = Engine.run(spark, spec)
      println(s"mapreduce done: $n output files in ${spec.outputDir}")
    } finally spark.stop()
  }
}
