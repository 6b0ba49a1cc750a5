package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q73 stage costs — not part of the library surface. */
object ProfileQ73 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = time("shingle+persist") {
      graft.pipeline.Dedup.warmShared(spark, dir)
      spark.read.parquet(s"$dir/documents.parquet")
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        if (ms > 300)
          println(f"[prof] stage ${i.stageId} '${i.name.take(60)}' tasks=${i.numTasks} ${ms / 1000.0}%.2f s")
      }
    })
    (1 to 3).foreach { i =>
      time(s"q73 full (noop) #$i") {
        graft.pipeline.Dedup.ngramJaccardPrefix(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    val stats = spark.read.parquet(s"$dir/documents.parquet")
      .select(count(lit(1)), avg(length(col("text"))), max(length(col("text"))))
      .collect()(0)
    println(s"[prof] docs: $stats")

    // mirror ngramJaccardPrefix internals
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, graft.pipeline.Dedup.shingleKernel(t)) })
      .toDF("doc_id", "sh").withColumn("n_sh", size(col("sh"))).filter(col("n_sh") > 0)
      .persist()
    time("shingles count")(println("[prof] docs w/ shingles: " + sh.count()))
    val ex = sh.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    time("exploded count")(println("[prof] exploded rows: " + ex.count()))
    val withFreq = ex.groupBy(col("s"))
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ids"))
      .select(col("s"), size(col("ids")).as("freq"), explode(col("ids")).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.n_sh").as("n_sh"), col("s"), col("freq"))
      .persist()
    time("withFreq count")(println("[prof] withFreq rows: " + withFreq.count()))

    val t = graft.pipeline.Dedup.PrefixJaccardThreshold
    implicit val utf8: Ordering[String] = graft.rel.TopK.Utf8StringOrdering
    val prefixRows = withFreq.as[(Long, Int, String, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (doc: Long, rows: Iterator[(Long, Int, String, Int)]) =>
        val arr = rows.toArray
        val nSh = arr(0)._2
        val plen = nSh - math.ceil(nSh * t).toInt + 1
        arr.sortBy(x => (x._4, x._3))(Ordering.Tuple2(Ordering.Int, utf8))
          .iterator.take(plen).map(x => (doc, nSh, x._3))
      }
      .toDF("doc_id", "n_sh", "s").persist()
    time("prefixRows count")(println("[prof] prefix rows: " + prefixRows.count()))

    val postings = prefixRows.groupBy(col("s"))
      .agg(collect_list(struct(col("doc_id").as("_1"), col("n_sh").as("_2"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .persist()
    time("postings count")(println("[prof] prefix postings >1: " + postings.count()))
    println("[prof] postings size histogram: " + postings
      .select(size(col("ids")).as("n")).groupBy("n").count().orderBy(desc("n"))
      .limit(10).collect().mkString(", "))

    val pairs = postings.select(col("ids")).as[Array[(Long, Int)]]
      .flatMap { ids0 =>
        val ids = ids0.sortBy(_._1)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Int)]()
        var i = 0
        while (i < ids.length) {
          var j = i + 1
          while (j < ids.length) {
            out += ((ids(i)._1, ids(j)._1, ids(i)._2, ids(j)._2)); j += 1
          }
          i += 1
        }
        out
      }.toDF("d1", "d2", "n1", "n2")
    time("raw pair rows")(println("[prof] co-occurrence pairs: " + pairs.count()))
    val cand = pairs
      .filter(least(col("n1"), col("n2")) >= greatest(col("n1"), col("n2")) * lit(t))
      .select(col("d1"), col("d2")).distinct().persist()
    time("distinct candidates")(println("[prof] candidates: " + cand.count()))

    val s1 = sh.select(col("doc_id").as("d1"), col("sh").as("sh1"), col("n_sh").as("n1"))
    val s2 = sh.select(col("doc_id").as("d2"), col("sh").as("sh2"), col("n_sh").as("n2"))
    val verified = cand.join(s1, "d1").join(s2, "d2")
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("common") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= t)
    time("verify join")(println("[prof] verified pairs: " + verified.count()))
    spark.stop()
  }
}
