package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FormatsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def orders = graft.rel.Queries.table(spark, dir, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  test("csv round-trip preserves rows under an explicit schema") {
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = orders
    Formats.writeCsv(src, s"$base/csv")
    val back = Formats.readCsv(spark, s"$base/csv", src.schema)
    assert(back.schema == src.schema)
    assert(back.collect().toSet == src.collect().toSet)
  }

  test("jsonl round-trip preserves rows under an explicit schema") {
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = orders
    Formats.writeJsonl(src, s"$base/json")
    val back = Formats.readJsonl(spark, s"$base/json", src.schema)
    assert(back.collect().toSet == src.collect().toSet)
  }

  test("orc round-trip preserves rows; filters push to the ORC scan") {
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = orders
    Formats.writeOrc(src, s"$base/orc")
    val back = Formats.readOrc(spark, s"$base/orc", src.schema)
    assert(back.schema == src.schema)
    assert(back.collect().toSet == src.collect().toSet)
    val plan = back.filter(col("o_totalprice") > 100000.0)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"), plan)
  }

  test("sharded writer: no output file exceeds the record cap") {
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = graft.rel.Queries.table(spark, dir, "documents")
    Formats.writeSharded(src, s"$base/shards", maxRecordsPerFile = 7)
    val perFile = spark.read.parquet(s"$base/shards")
      .groupBy(input_file_name()).count().collect()
    assert(perFile.nonEmpty)
    perFile.foreach(r => assert(r.getLong(1) <= 7, r))
    assert(perFile.map(_.getLong(1)).sum == src.count())
  }

  test("partitioned layout: a partition-column filter prunes at plan time") {
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    Formats.writePartitioned(
      graft.rel.Queries.table(spark, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate"))),
      s"$base/part", "o_year")
    val filtered = Formats.readPartitioned(spark, s"$base/part")
      .filter(col("o_year") === 1996)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_year"), plan) // pruned at the scan, not a row filter
    assert(filtered.count() ==
      graft.rel.Queries.table(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996).count())
  }
}
