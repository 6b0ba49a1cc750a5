package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.TestSpark
import graft.jobs.WordCount
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end test of SURVEY.md §7.2: word count over the reference's
  * own fixtures with the reference's output contract (R files `output_<i>`,
  * per-file key-sorted, disjoint keys, correct totals). The oracle is an
  * independently computed in-memory frequency table with *intended*
  * semantics (SURVEY.md §2.5 — the reference binary itself has a
  * value-corruption bug we must not replicate).
  */
class EngineWordCountSuite extends AnyFunSuite {

  private val inputs =
    Seq("/root/reference/test/input1.txt", "/root/reference/test/input2.txt")

  private def goldenCounts(): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    inputs.foreach { f =>
      Files.lines(Paths.get(f)).iterator().asScala.foreach { line =>
        line.split("[ ,.\"']+").foreach { w =>
          if (w.nonEmpty) counts.update(w, counts.getOrElse(w, 0L) + 1L)
        }
      }
    }
    counts.toMap
  }

  private def readOutput(dir: Path, r: Int): Seq[(Int, Seq[(String, String)])] =
    (0 until r).map { i =>
      val f = dir.resolve(s"output_$i")
      assert(Files.exists(f), s"missing output_$i")
      val pairs = Files.readAllLines(f).asScala.toSeq.map { line =>
        val cut = line.lastIndexOf(", ")
        assert(cut > 0, s"malformed line in output_$i: $line")
        (line.substring(0, cut), line.substring(cut + 2))
      }
      i -> pairs
    }

  test("F3-F12+U1+U2: word count over the reference fixtures honors the full output contract") {
    val outDir = Files.createTempDirectory("graft-wc")
    val r = 10
    val spec = MapReduceSpec(
      nWorkers = 4,
      workerAddrs = (1 to 4).map(i => s"localhost:$i"),
      inputFiles = inputs,
      outputDir = outDir.toString,
      nOutputFiles = r,
      mapKilobytes = 500,
      userId = "wc-golden"
    )
    Registry.clear()
    assert(Registry.register("wc-golden", WordCount))
    assert(Engine.run(TestSpark.spark, spec) == r)

    val outputs = readOutput(outDir, r)
    // Exactly R files, nothing else (tmp files cleaned up).
    val fileNames = Files.list(outDir).iterator().asScala.map(_.getFileName.toString).toSet
    assert(fileNames == (0 until r).map(i => s"output_$i").toSet)

    // Per-file key-sortedness (byte order).
    outputs.foreach { case (i, pairs) =>
      val keys = pairs.map(_._1)
      assert(keys == keys.sorted, s"output_$i not sorted by key")
    }

    // Each key in exactly one file.
    val keysPerFile = outputs.map(_._2.map(_._1).toSet)
    val total = keysPerFile.map(_.size).sum
    assert(keysPerFile.reduce(_ union _).size == total, "keys not disjoint across files")

    // Value correctness: union of all pairs == golden frequency table.
    val got = outputs.flatMap(_._2).map { case (k, v) => k -> v.toLong }.toMap
    val golden = goldenCounts()
    assert(got.size == golden.size, s"key count ${got.size} != golden ${golden.size}")
    assert(got == golden)
    Registry.clear()
  }

  test("engine result is invariant to shard size and R (partitioning contract only)") {
    import TestSpark.spark
    val golden = goldenCounts()
    for ((kb, r) <- Seq((100, 3), (2000, 7))) {
      val spec = MapReduceSpec(1, Seq("x"), inputs,
        Files.createTempDirectory(s"graft-wc-$r").toString, r, kb, "wc")
      val ds = Engine.transform(spark, spec, WordCount)
      assert(ds.rdd.getNumPartitions == r)
      val got = ds.collect().map { case (k, v) => k -> v.toLong }.toMap
      assert(got == golden)
    }
  }

  test("re-running into the same output dir overwrites stale files (even with smaller R)") {
    import TestSpark.spark
    val outDir = Files.createTempDirectory("graft-rerun")
    val tiny = Files.createTempFile("graft-tiny", ".txt")
    Files.writeString(tiny, "word extra\n")
    def spec(r: Int) = MapReduceSpec(1, Seq("x"), Seq(tiny.toString), outDir.toString, r, 10, "wc")
    Engine.runJob(spark, spec(10), WordCount)
    assert(Files.list(outDir).count() == 10)
    Engine.runJob(spark, spec(3), WordCount)
    val files = Files.list(outDir).iterator().asScala.map(_.getFileName.toString).toSet
    assert(files == Set("output_0", "output_1", "output_2"), "stale output files survived a re-run")
    val pairs = (0 until 3).flatMap(i => Files.readAllLines(outDir.resolve(s"output_$i")).asScala)
    assert(pairs.sorted == Seq("extra, 1", "word, 1"))
  }

  test("unknown user_id fails like the reference's null factory lookup") {
    Registry.clear()
    val spec = MapReduceSpec(1, Seq("x"), inputs, "/tmp/never", 2, 10, "ghost")
    intercept[NoSuchElementException](Engine.run(TestSpark.spark, spec))
  }
}
