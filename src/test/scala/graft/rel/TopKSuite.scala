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
}
