package graft.tools

import org.apache.spark.sql.functions._

/** Scratch micro-benchmark for isolating expression/aggregate costs seen
  * in ProfileQueries stage dumps (e.g. r17: q166's approx_count_distinct
  * rsd-0.01 stages running 20–80 s). Not part of any query path.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(s"local[$cpus]", cpus)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.count() // warm footer
    def time(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[micro] $label #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("rsd=0.05 single-col") {
      orders.agg(approx_count_distinct(col("o_orderkey"), 0.05)).collect()
    }
    time("rsd=0.01 single-col") {
      orders.agg(approx_count_distinct(col("o_orderkey"), 0.01)).collect()
    }
    time("rsd=0.01 three-col") {
      orders.agg(
        approx_count_distinct(col("o_orderkey"), 0.01),
        approx_count_distinct(col("o_custkey"), 0.01),
        approx_count_distinct(col("o_totalprice"), 0.01)).collect()
    }
    time("rsd=0.01 three-col + count/min/max/nulls (q166 shape)") {
      orders.agg(
        count(lit(1)),
        approx_count_distinct(col("o_orderkey"), 0.01), min(col("o_orderkey")), max(col("o_orderkey")),
        approx_count_distinct(col("o_custkey"), 0.01), min(col("o_custkey")), max(col("o_custkey")),
        approx_count_distinct(col("o_totalprice"), 0.01), min(col("o_totalprice")), max(col("o_totalprice"))).collect()
    }
    spark.stop()
  }
}
