package graft.rel

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the TopK aggregator's pure core — no Spark session.
  *
  * The aggregator only produces correct distributed results if reduce +
  * merge over ANY partitioning of the input equal the global sorted
  * take-k: Spark is free to split rows across tasks arbitrarily and merge
  * partial buffers in any grouping. These properties drive exactly that
  * contract, plus the UTF-8 tie-break ordering the string variant relies
  * on for oracle consistency.
  */
object TopKProperties extends Properties("TopKAgg") {

  private val row: Gen[(Double, Long)] = for {
    s <- Gen.chooseNum(-5.0, 5.0)
    // small id range on purpose: forces duplicate ids and (score, id) ties
    i <- Gen.chooseNum(0L, 20L)
  } yield (s, i)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  property("arbitrary split + merge == global sorted take k") =
    forAll(Gen.listOf(row), Gen.choose(1, 6), Gen.choose(1, 7)) { (rows, k, nChunks) =>
      val agg = new TopK.TopKAgg[Long](k)
      // deterministic uneven split: chunk membership by index stride
      val chunks = rows.zipWithIndex.groupMap(_._2 % nChunks)(_._1).values.toList
      val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      val expected = rows.sortWith(better).take(k)
      agg.finish(merged) == expected
    }

  property("merge order does not change the result") =
    forAll(Gen.listOf(row), Gen.choose(1, 4)) { (rows, k) =>
      val agg = new TopK.TopKAgg[Long](k)
      val (l, r) = rows.splitAt(rows.length / 2)
      val (bl, br) = (l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      agg.merge(bl, br) == agg.merge(br, bl)
    }

  // code points across BMP boundaries, including supplementary planes where
  // UTF-16 code-unit order (Java String.compareTo) and UTF-8 byte order
  // disagree — the divergence Utf8StringOrdering exists to fix
  private val codePoint: Gen[Int] = Gen.frequency(
    3 -> Gen.choose(0x20, 0x7E),
    1 -> Gen.choose(0xE000, 0xFFFD),
    1 -> Gen.choose(0x10000, 0x1FFFF))
  private val str: Gen[String] =
    Gen.listOf(codePoint).map(_.flatMap(Character.toChars(_).toSeq).mkString)

  property("Utf8StringOrdering == unsigned UTF-8 byte comparison") =
    forAll(str, str) { (a, b) =>
      def byteOrder(x: Array[Byte], y: Array[Byte]): Int = {
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xFF) - (y(i) & 0xFF)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
      val expect = byteOrder(
        a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))
      Integer.signum(TopK.Utf8StringOrdering.compare(a, b)) == Integer.signum(expect)
    }
}
