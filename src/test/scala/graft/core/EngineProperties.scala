package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.TestSpark
import graft.jobs.WordCount

/** SURVEY.md §5.3 property tests: for arbitrary corpora, the engine's
  * output equals the `Map.groupBy` reference model, every key lands in
  * exactly one of the R partitions, each partition is key-sorted, and the
  * result is invariant to shard size and R. Spark jobs are slow per case,
  * so the case count is bounded — the point is randomized structure, not
  * volume.
  */
object EngineProperties extends Properties("Engine") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val word = Gen.nonEmptyStringOf(Gen.alphaLowerChar).map(_.take(8))
  private val line = Gen.listOf(word).map(_.mkString(" "))
  private val corpus = Gen.nonEmptyListOf(line)

  private def specFor(lines: Seq[String], r: Int, kb: Int): MapReduceSpec = {
    val f = java.nio.file.Files.createTempFile("engineprop", ".txt")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    MapReduceSpec(1, Seq("w"), Seq(f.toString), "/tmp/engineprop-unused", r, kb, "wc")
  }

  private def model(lines: Seq[String]): Map[String, Long] =
    lines
      .flatMap(_.split("[ ,.\"']+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  property("output == groupBy model; keys disjoint; partitions sorted") =
    forAll(corpus, Gen.choose(1, 7), Gen.oneOf(1, 10, 1000)) { (lines, r, kb) =>
      val ds = Engine.transform(spark, specFor(lines, r, kb), WordCount)
      val parts = ds.rdd
        .mapPartitionsWithIndex { (pid, it) => Iterator((pid, it.toVector)) }
        .collect().toMap
      val pairs = parts.values.flatten.map { case (k, v) => (k, v.toLong) }
      val keysPerPart = parts.view.mapValues(_.map(_._1).toSet).values.toSeq

      parts.size == r &&
      pairs.toMap == model(lines) &&
      keysPerPart.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty } &&
      parts.values.forall(p => p.map(_._1) == p.map(_._1).sorted)
    }

  property("result invariant to shard size and partition count") =
    forAll(corpus, Gen.choose(1, 6), Gen.choose(1, 6)) { (lines, r1, r2) =>
      val a = Engine.transform(spark, specFor(lines, r1, 1), WordCount).collect().toMap
      val b = Engine.transform(spark, specFor(lines, r2, 1000), WordCount).collect().toMap
      a == b && a == model(lines).map { case (k, v) => k -> v.toString }
    }
}
