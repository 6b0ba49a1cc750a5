package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("heap top-k == window row_number top-k; partial aggregation in plan") {
    import spark.implicits._
    // skewed groups: group 0 holds half the rows — the case where the
    // window idiom sorts a huge group and the heap carries only k
    val rows = (1L to 4000L).map { i =>
      val g = if (i % 2 == 0) 0L else i % 7
      (g, (i * 2654435761L % 997).toDouble, i)
    }
    val ds = rows.toDS()

    val heap = TopK.topKPerGroup(ds, 3)
    val w = Window.partitionBy(col("group")).orderBy(col("score").desc, col("id"))
    val window = ds.toDF("group", "score", "id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("group"), col("rnk"), col("id"), col("score"))

    assert(heap.collect().toSet == window.collect().toSet)

    // map-side partial + final merge: the typed aggregator plans as two
    // ObjectHashAggregate phases around the exchange
    val p = heap.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("string ids: ties broken by id asc, matching the window idiom") {
    import spark.implicits._
    // deliberate score ties so the Ordering[String] tie-break is exercised
    val rows = (1 to 300).map { i =>
      (i % 5L, (i % 7).toDouble, f"w${i % 26}%02d")
    }.distinct
    val ds = rows.toDS()
    val heap = TopK.topKPerGroup(ds, 4)
    val w = Window.partitionBy(col("group")).orderBy(col("score").desc, col("id"))
    val window = ds.toDF("group", "score", "id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4)
      .select(col("group"), col("rnk"), col("id"), col("score"))
    assert(heap.collect().toSet == window.collect().toSet)
  }

  test("BottomKDistinctAgg == distinct + sort + take(k), with partial aggregation") {
    import spark.implicits._
    implicit val utf8: Ordering[String] = TopK.Utf8StringOrdering
    // heavy duplication + values arriving in adversarial (descending)
    // order, so both the in-buffer dedup and the bounded insert paths run
    val rows = (1 to 2000).map { i =>
      (i % 3L, f"h${(997 - i * 31 % 997) % 50}%03d")
    }
    val ds = rows.toDS()
    val agg = ds
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopK.BottomKDistinctAgg[String](7).toColumn.name("sig"))
      .collect()
      .toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted(utf8).take(7)
    }
    assert(agg.keySet == expected.keySet)
    expected.foreach { case (g, sig) => assert(agg(g) == sig, s"group $g") }

    // the whole point: map-side partials (two ObjectHashAggregate phases)
    val p = ds
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopK.BottomKDistinctAgg[String](7).toColumn.name("sig"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("BottomKDistinctAgg: merge dedups by ord.equiv, not universal equals") {
    // an Ordering where equiv != equals: compare ints by ABSOLUTE value.
    // reduce dedups with ord.equiv; before r18, merge used Seq.distinct
    // (universal equals), so -3 and 3 — equivalent under ord — could both
    // survive a cross-partition merge and burn two of the k slots.
    implicit val absOrd: Ordering[Int] = Ordering.by[Int, Int](math.abs)(Ordering.Int)
    val agg = new TopK.BottomKDistinctAgg[Int](3)
    val a = agg.reduce(agg.reduce(agg.zero, 3), 7)     // [3, 7]
    val b = agg.reduce(agg.reduce(agg.zero, -3), 5)    // [-3, 5]
    val merged = agg.merge(a, b)
    // abs-equivalent 3/-3 must collapse to ONE slot: bottom-3 distinct
    // by abs is {3-or-minus-3, 5, 7}, not {-3, 3, 5}
    assert(merged.map(math.abs) == Seq(3, 5, 7), merged.toString)

    // k <= 0 is a construction-time error, not a mid-job NPE
    intercept[IllegalArgumentException] {
      new TopK.BottomKDistinctAgg[Int](0)
    }
  }
}
