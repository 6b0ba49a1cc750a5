package graft.rel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q64's sketch percentiles are RANK-accurate (they return an actual data
  * value whose rank is within n/accuracy of the target), unlike q39's
  * interpolated values — so the right contract to pin is rank error, not
  * value distance (a p99 on a small group can differ >5% in value at
  * exact rank).
  */
class PercentileApproxSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx percentile ranks within tolerance of the target quantile") {
    import spark.implicits._
    val values = Queries.events(spark, dir)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Queries.q64PercentileApprox(spark, dir).collect()
    assert(approx.length == values.size)
    approx.foreach { r =>
      val vs = values(r.getString(0))
      val n = vs.length.toDouble
      assert(r.getLong(4) == vs.length)
      Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3)).foreach {
        case (q, a) =>
          // rank of the returned value (allowing for the round(.,4) in q64)
          val rank = vs.count(_ <= a + 5e-5)
          val err = math.abs(rank / n - q)
          assert(err <= math.max(0.02, 1.5 / n), s"${r.getString(0)} q=$q value=$a rankErr=$err")
      }
    }
  }
}
