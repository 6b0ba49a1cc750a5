package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line the driver parses.
  *
  * Each query runs `SPARK_GRAFT_BENCH_ITERS` (default 3) timed iterations and
  * the headline number per query is the MEDIAN over non-outlier runs.
  * Rounds 3 and 4 proved a single-shot gate is noise-dominated on this box:
  * byte-identical code swung 2-11x in both directions between rounds
  * (r3: q23 7.06s -> r4 0.62s; r4: q59 0.66s -> 7.27s). Round 7 pinned the
  * mechanism: the host intermittently freezes whole minutes (a 206 s run
  * between 4-6 s runs of the same query; buffered-disk writeback measured
  * at ~15 MB/s during one window) — so runs that exceed 3x the fastest are
  * rejected as stall-contaminated, with bounded top-up runs when the
  * original sample was eaten (see the loop below). `first`/`min`/`max` and
  * every raw run are kept per query so run-to-run spread stays inspectable.
  *
  * OUTPUT-SIZE CONTRACT: the driver keeps only the last ~2000 characters of
  * stdout and parses the JSON line out of that tail. Five rounds of
  * `"parsed": null` in BENCH_r0*.json traced to exactly this: 73 queries x
  * long names + embedded per-run detail pushed the line past the tail window
  * and truncated its head. So the FINAL line is compact — short `qNN` keys
  * (the `_name` suffix is dropped; CORRECTNESS files carry the full names),
  * 3-decimal medians, no embedded detail — and the full-name per-run detail
  * goes to `BENCH_DETAIL.json` in the working directory, never to stdout
  * (r5's tail landed wholly inside the old detail stdout line, proving the
  * capture is byte-capped and anything bulky starves the parse target).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    // Uncounted warmup: JIT + codegen + parquet footer caches, so the
    // first measured query isn't charged for JVM startup.
    try {
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      l.groupBy("l_returnflag").count().collect()
      // footer caches for the other hot tables too — ~30 queries read
      // documents/embeddings and their first runs were eating the open cost
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      // events carries nanos timestamps: without the legacy conf the read
      // throws PARQUET_TYPE_ILLEGAL and the footer never warmed (the
      // declared events queries set the same conf before reading)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet").count()
    } catch { case _: Throwable => () }
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Per query: iters timed runs -> median headline. A failed query reports
    // err and is excluded from the headline total instead of masquerading as
    // a fast run.
    // Optional subset filter for local profiling (comma-separated name
    // prefixes, e.g. "q62,q73"). The driver never sets it -> full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    val results = selected.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      def runOnce(): Unit = {
        val t0 = System.nanoTime()
        // noop sink, not count(): under count() Catalyst prunes every
        // projected expression and eliminates final sorts, so projection-
        // heavy queries would measure a bare scan instead of their work.
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable => err = Some(s"${e.getClass.getSimpleName}: ${esc(String.valueOf(e.getMessage)).take(200)}") }
        if (err.isEmpty) times += (System.nanoTime() - t0) / 1e9
      }
      var i = 0
      while (i < iters && err.isEmpty) { runOnce(); i += 1 }
      // Host-stall outlier rejection: this box intermittently freezes for
      // minutes at a time (r7 evidence: a 206 s run of a query whose
      // adjacent runs took 4-6 s, with clean PSI io/cpu/mem — hypervisor
      // pauses, invisible to the guest). A run is an outlier when it
      // exceeds max(3x the fastest run, fastest + 1 s; the absolute floor
      // keeps sub-second jitter from counting). If outliers ate into the
      // sample, top up with at most `iters` extra runs so a stall spanning
      // the original window can't dictate the headline; the median is then
      // taken over the non-outlier runs. All runs stay in the detail file.
      def outlierCut: Double = math.max(times.min * 3, times.min + 1.0)
      var extra = 0
      while (err.isEmpty && times.nonEmpty && extra < iters &&
        times.count(_ <= outlierCut) < iters) { runOnce(); extra += 1 }
      // Old-gen churn from the finished query's shuffles shouldn't be billed
      // to the next query's first run (r5 pattern: later queries drifted up
      // as the run aged). Caches stay — clearing them would orphan memoized
      // frames into recompute-on-every-action plans.
      System.gc()
      val kept = if (times.isEmpty) times.toSeq else times.filter(_ <= outlierCut).toSeq
      val sorted = kept.sorted
      // true median: mean of the middle pair for even n, so iters=2 doesn't
      // report the worse run (upper-middle would reintroduce one-off-stall
      // bias for even iteration counts)
      val median =
        if (sorted.isEmpty) -1.0
        else if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
      (name, median, times.toSeq, err)
    }
    // qNN short key for the size-capped final line; full names in the detail.
    def short(name: String): String = { val i = name.indexOf('_'); if (i > 0) name.take(i) else name }
    val qs = results.map { case (k, med, _, err) =>
      "\"" + short(k) + "\":" + (if (err.isEmpty) fmt(med) else "-1.0")
    }.mkString("{", ",", "}")
    val runsJson = results.collect { case (k, _, ts, None) if ts.nonEmpty =>
      "\"" + k + "\":{\"first\":" + fmt(ts.head) + ",\"min\":" + fmt(ts.min) +
        ",\"max\":" + fmt(ts.max) + ",\"runs\":" + ts.map(fmt).mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(m)) => "\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, med, _, None) => med }.sum
    val nFail = results.count(_._4.isDefined)
    val detail =
      s"""{"iters":$iters,"detail":$runsJson,"errors":$errs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      // stderr, not stdout: a warning on stdout would compete with the
      // size-capped tail window the driver parses the metric line from
      case e: Throwable =>
        System.err.println(s"WARN: BENCH_DETAIL.json write failed: ${e.getMessage}")
    }
    // The per-run detail goes to BENCH_DETAIL.json ONLY — never stdout.
    // r5 evidence (BENCH_r05.json "parsed": null, tail sitting wholly INSIDE
    // the detail line): the driver's stdout capture is size-capped, so a
    // ~20 KB detail line starves the final metric line out of the captured
    // window. Total stdout from this main must stay small.
    // FINAL stdout line = the driver's parse target; keep it last and small.
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"iters":$iters,"failed":$nFail,"sf":"$sfDir"}""")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
