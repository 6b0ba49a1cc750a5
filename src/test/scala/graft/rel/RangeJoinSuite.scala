package graft.rel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binned range join == naive theta join, across bin boundaries") {
    import spark.implicits._
    val points = (0L until 200L by 3L).map(t => (t, s"p$t")).toDF("t", "ptag")
    val intervals = Seq(
      (1L, 0L, 10L), // inside one bin
      (2L, 5L, 95L), // spans many bins
      (3L, 99L, 100L), // single-point interval ending on a bin edge
      (4L, 150L, 150L), // empty interval (start == end)
      (5L, 190L, 500L) // runs past the last point
    ).toDF("iid", "s", "e")

    val binned = RangeJoin
      .pointInInterval(points, intervals, "t", "s", "e", binWidth = 10L)
      .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = intervals
      .join(points, $"s" <= $"t" && $"t" < $"e")
      .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty && !naive.exists(_._1 == 4L)) // empty interval stays empty
  }
}
