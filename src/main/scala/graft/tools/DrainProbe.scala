package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-run probe for the streaming drains' steady-state behavior —
  * built to root-cause the r16 SCALING.json anomaly (q132's 10× repeat
  * runs climbing 13 → 33 → 56 s monotonically, the signature of per-run
  * accumulation, not noise). Runs one named drain query N times against
  * a dataset dir and prints, per run: wall seconds, JVM heap in use
  * after a System.gc(), the size and entry count of java.io.tmpdir, and
  * the count of live child-session streaming listener buses — the
  * candidate accumulation channels.
  *
  * Usage: runMain graft.tools.DrainProbe <query> <dir> <iters>
  */
object DrainProbe {

  private def tmpStats(): (Long, Long) = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    var bytes = 0L; var n = 0L
    val walk = java.nio.file.Files.walk(tmp)
    try walk.forEach { p =>
      try if (java.nio.file.Files.isRegularFile(p)) {
        bytes += java.nio.file.Files.size(p); n += 1
      } catch { case _: java.io.IOException => }
    } catch { case _: java.io.UncheckedIOException => () }
    finally walk.close()
    (bytes, n)
  }

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q132_stream_delta_dedup")
    val dir = args.lift(1).getOrElse("/tmp/graft_scale_10x_r15")
    val iters = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      query match {
        case "q132_stream_delta_dedup" =>
          graft.streaming.Events.streamDeltaDedupFinal _
        case other => graft.SparkEntry.queries(other)
      }
    // "nosleep" reproduces the scaling smoke's back-to-back shape (no
    // idle between runs — nothing background gets a quiet window);
    // default interleaves gc+sleep like a paced deployment
    val pause = !args.contains("nosleep")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val (heapMb, tmpB, tmpN) =
        if (pause) {
          System.gc(); Thread.sleep(500); System.gc()
          val rt = Runtime.getRuntime
          val (b, n) = tmpStats()
          ((rt.totalMemory() - rt.freeMemory()) / (1 << 20), b, n)
        } else (0L, 0L, 0L)
      println(f"PROBE run=$i%d secs=$secs%.2f heapMB=$heapMb%d " +
        f"tmpMB=${tmpB / (1 << 20)}%d tmpFiles=$tmpN%d")
    }
    spark.stop()
  }
}
