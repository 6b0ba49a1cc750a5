package graft.rel

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the per-file bloom-skipping layer: the no-false-negative
  * contract (every key actually present in a file is admitted by that
  * file's bloom — the property correctness rides on), the pruning win on
  * a hash-scattered layout where min/max stats provably prune nothing,
  * the partial-merge path when one file spans several input partitions,
  * and the read-path contract (scan lists exactly the bloom-positive
  * files; rows equal the unpruned filter).
  */
class BloomSkipSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** keys 0..999 hash-scattered into `files` files — each file holds a
    * random subset of the key space, so key min/max per file spans ~all
    * of it (the layout bloom skipping exists for).
    */
  private def writeScattered(dir: String, files: Int): Unit = {
    import spark.implicits._
    (0L until 1000L).map(k => (k, k % 17, s"v$k")).toDF("key", "salt", "payload")
      .repartition(files, col("salt"))
      .write.parquet(dir)
  }

  test("no false negatives: every file's bloom admits every key the file holds") {
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 8)
    val manifest = BloomSkip.buildManifest(spark, dir, "key", 200L, 0.01)
    assert(manifest.length == 8)
    manifest.foreach { fb =>
      val keys = spark.read.parquet(fb.file).select("key").collect().map(_.getLong(0))
      assert(keys.nonEmpty)
      val missed = keys.filterNot(k => BloomSkip.candidates(Seq(fb), Seq(k)).nonEmpty)
      assert(missed.isEmpty, s"bloom false negative for keys ${missed.take(5).toSeq} in ${fb.file}")
    }
  }

  test("partial merge: blooms built across partition boundaries equal single-pass blooms") {
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 4)
    val whole = BloomSkip.buildManifest(spark, dir, "key", 300L, 0.01)
    val conf = "spark.sql.files.maxPartitionBytes"
    val saved = spark.conf.get(conf)
    val split = try {
      // force each parquet file to split into many input partitions so
      // buildManifest's reduceGroups merge path actually runs
      spark.conf.set(conf, "2048")
      BloomSkip.buildManifest(spark, dir, "key", 300L, 0.01)
    } finally spark.conf.set(conf, saved)
    assert(split.map(_.file) == whole.map(_.file))
    // identical geometry + same keys folded in → identical bit arrays
    split.zip(whole).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.bloom, b.bloom),
        s"merged bloom differs from single-pass bloom for ${a.file}")
    }
  }

  test("pruning wins where min/max cannot: scattered layout, point probes") {
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 16)
    val manifest = BloomSkip.buildManifest(spark, dir, "key", 80L, 0.01)
    // min/max manifest over the same files: every file spans ~the whole
    // key domain, so a point probe's [k, k] box overlaps every file
    val mm = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min("key").as("min_k"), max("key").as("max_k"))
      .collect()
    val probe = 123L
    val mmSurvivors = mm.count(r => r.getLong(1) <= probe && r.getLong(2) >= probe)
    assert(mmSurvivors == mm.length,
      "hash-scattered layout: min/max stats must fail to prune a point probe")
    val bloomSurvivors = BloomSkip.candidates(manifest, Seq(probe))
    assert(bloomSurvivors.length < manifest.length,
      s"bloom must prune: ${bloomSurvivors.length}/${manifest.length} files survive")
    // and the one file that really holds key 123 is among the survivors
    val truly = spark.read.parquet(dir).filter(col("key") === probe)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(truly.subsetOf(bloomSurvivors.toSet))
  }

  test("prunedRead: scan lists exactly the bloom-positive files; rows == unpruned filter") {
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 16)
    val manifest = BloomSkip.buildManifest(spark, dir, "key", 80L, 0.01)
    val keys = Seq(7L, 123L, 999L)
    val pruned = BloomSkip.prunedRead(spark, manifest, "key", keys)
    val survivors = BloomSkip.candidates(manifest, keys).toSet
    assert(pruned.inputFiles.toSet == survivors)
    val expected = spark.read.parquet(dir).filter(col("key").isin(keys: _*))
      .collect().map(_.toSeq).toSet
    assert(pruned.collect().map(_.toSeq).toSet == expected)
  }

  test("dfpJoin: pruned == plain == over-cap fallback; dim selectivity drives the skipping") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 16)
    val manifest = BloomSkip.buildManifest(spark, dir, "key", 80L, 0.01)
    val dim = Seq((7L, "a"), (123L, "b"), (999L, "c")).toDF("dim_key", "dim_val")
    val pruned = BloomSkip.dfpJoin(spark, dir, manifest, "key", dim, "dim_key")
    val plain = spark.read.parquet(dir).join(dim, col("key") === col("dim_key"))
    assert(collectNorm(pruned) == collectNorm(plain))
    // some hash partitions come out empty: the writer can emit zero-row
    // files (absent from the manifest — correctly never scanned) and
    // fewer than the requested 16, so count what's actually on disk
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(pruned.inputFiles.count(_.contains("/t/")) < nFiles,
      "a 3-key dim must skip fact files")
    // over the cap: semantics identical, all files read
    val fallback = BloomSkip.dfpJoin(spark, dir, manifest, "key", dim, "dim_key", maxKeys = 2)
    assert(collectNorm(fallback) == collectNorm(plain))
    assert(fallback.inputFiles.count(_.contains("/t/")) == nFiles)
    // empty dim: typed empty result, zero fact rows read
    val none = BloomSkip.dfpJoin(spark, dir, manifest, "key",
      dim.filter(lit(false)), "dim_key")
    assert(none.count() == 0L)
  }

  private def collectNorm(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "salt", "payload", "dim_key", "dim_val")
      .collect().map(_.toSeq).toSet

  test("extendManifest: O(new) incremental — covered blooms reused byte-identically, new files folded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 8)
    val m0 = BloomSkip.buildManifest(spark, dir, "key", 200L, 0.01)
    // append a second wave of files with a DISJOINT key range
    (2000L until 2500L).map(k => (k, k % 17, s"w$k")).toDF("key", "salt", "payload")
      .repartition(4, col("salt"))
      .write.mode("append").parquet(dir)
    val m1 = BloomSkip.extendManifest(spark, m0, dir, "key", 200L, 0.01)
    assert(m1.length > m0.length, "new files must join the manifest")
    // covered files: the ORIGINAL bloom bytes, never rebuilt
    val byFile = m1.map(fb => fb.file -> fb.bloom).toMap
    m0.foreach { fb =>
      assert(java.util.Arrays.equals(byFile(fb.file), fb.bloom),
        s"covered bloom rebuilt for ${fb.file}")
    }
    // extending again with nothing new is the identity
    assert(BloomSkip.extendManifest(spark, m1, dir, "key", 200L, 0.01)
      .map(_.file) == m1.map(_.file))
    // and the extended manifest answers probes in BOTH waves
    Seq(123L, 2123L).foreach { k =>
      val got = BloomSkip.prunedRead(spark, m1, "key", Seq(k))
        .select("key").collect().map(_.getLong(0)).toSet
      val want = spark.read.parquet(dir).filter(col("key") === k)
        .select("key").collect().map(_.getLong(0)).toSet
      assert(got == want, s"probe $k")
    }
  }

  test("probe outside the key space: typed empty result (bloom may pass stray files, filter absorbs)") {
    val dir = Files.createTempDirectory("bloom-suite-").toString + "/t"
    writeScattered(dir, 8)
    val manifest = BloomSkip.buildManifest(spark, dir, "key", 200L, 0.01)
    val out = BloomSkip.prunedRead(spark, manifest, "key", Seq(424242L))
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("key", "salt", "payload"))
  }

  test("table-form manifest: same candidates and rows as the driver form; pruning is a Spark job") {
    val root = Files.createTempDirectory("bloom-suite-").toString
    val dir = s"$root/t"
    writeScattered(dir, 8)
    val seqForm = BloomSkip.buildManifest(spark, dir, "key", 200L, 0.01)
    BloomSkip.buildManifestTable(spark, dir, "key", 200L, 0.01, s"$root/m")
    val probes = Seq(7L, 123L, 999L)
    assert(BloomSkip.candidatesTable(spark, s"$root/m", probes) ==
      BloomSkip.candidates(seqForm, probes).sorted)
    val got = BloomSkip.prunedReadTable(spark, s"$root/m", "key", probes)
      .select("key").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(7L, 123L, 999L))
    // the skipping decision itself plans as a distributed job over the
    // manifest TABLE: a parquet scan of the manifest dir + a filter —
    // not a driver loop deserializing every bloom
    val plan = BloomSkip.candidateFiles(spark, s"$root/m", probes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("m]") || plan.contains("/m"),
      s"candidates must scan the manifest table:\n$plan")
    assert(plan.contains("Filter"), s"the probe must be a distributed filter:\n$plan")
  }

  test("string keys: putString fold, pruning wins, extend covers appends, residual exact") {
    import spark.implicits._
    val root = Files.createTempDirectory("bloom-str-").toString
    val dir = s"$root/t"
    // string uids scattered across 8 files by an unrelated salt: min/max
    // on the uid prunes nothing, only the bloom's content can
    (0L until 800L).map(k => (f"uid-$k%06d", k % 13, s"v$k"))
      .toDF("uid", "salt", "payload")
      .repartition(8, col("salt")).write.parquet(dir)
    BloomSkip.buildManifestTableString(spark, dir, "uid", 200L, 0.01, s"$root/m")
    val probes = Seq("uid-000007", "uid-000123", "uid-000699")
    val files = BloomSkip.candidateFilesString(spark, s"$root/m", probes)
      .as[String].collect()
    assert(files.nonEmpty && files.length < 8,
      s"string blooms must prune some of the 8 files: ${files.length}")
    val got = BloomSkip.prunedReadTableString(spark, s"$root/m", "uid", probes)
      .select("uid").collect().map(_.getString(0)).sorted.toSeq
    assert(got == probes.sorted)
    // a probe outside the key space: zero rows, typed schema
    val miss = BloomSkip.prunedReadTableString(
      spark, s"$root/m", "uid", Seq("uid-999999"))
    assert(miss.count() == 0L && miss.columns.toSeq == Seq("uid", "salt", "payload"))
    // incremental extend: second wave of uids in new files, covered rows
    // byte-identical, probes resolve across both waves
    val before = spark.read.parquet(s"$root/m").as[(String, Array[Byte])]
      .collect().map { case (f, b) => f -> b.toSeq }.toMap
    (2000L until 2400L).map(k => (f"uid-$k%06d", k % 13, s"v$k"))
      .toDF("uid", "salt", "payload")
      .repartition(2, col("salt")).write.mode("append").parquet(dir)
    BloomSkip.extendManifestTableString(spark, s"$root/m", dir, "uid", 200L, 0.01)
    val after = spark.read.parquet(s"$root/m").as[(String, Array[Byte])]
      .collect().map { case (f, b) => f -> b.toSeq }.toMap
    assert(after.keySet == spark.read.parquet(dir).inputFiles.toSet)
    before.foreach { case (f, b) => assert(after(f) == b, s"rewritten $f") }
    Seq("uid-000123", "uid-002123").foreach { k =>
      val r = BloomSkip.prunedReadTableString(spark, s"$root/m", "uid", Seq(k))
        .select("uid").collect().map(_.getString(0)).toSet
      assert(r == Set(k), s"probe $k")
    }
    // rebuild refusal mirrors the long-keyed guard
    intercept[IllegalArgumentException](
      BloomSkip.buildManifestTableString(spark, dir, "uid", 200L, 0.01, s"$root/m"))
  }

  test("table-form extend: O(new) appends, covered rows byte-identical, coverage complete") {
    import spark.implicits._
    val root = Files.createTempDirectory("bloom-suite-").toString
    val dir = s"$root/t"
    writeScattered(dir, 4)
    BloomSkip.buildManifestTable(spark, dir, "key", 300L, 0.01, s"$root/m")
    val before = spark.read.parquet(s"$root/m").as[(String, Array[Byte])]
      .collect().map { case (f, b) => f -> b.toSeq }.toMap
    // wave 2: new keys in new files, same directory
    (2000L until 2400L).map(k => (k, k % 17, s"v$k")).toDF("key", "salt", "payload")
      .repartition(2, col("salt")).write.mode("append").parquet(dir)
    BloomSkip.extendManifestTable(spark, s"$root/m", dir, "key", 300L, 0.01)
    val after = spark.read.parquet(s"$root/m").as[(String, Array[Byte])]
      .collect().map { case (f, b) => f -> b.toSeq }.toMap
    assert(after.keySet == spark.read.parquet(dir).inputFiles.toSet,
      "manifest must cover exactly the directory's files")
    before.foreach { case (f, b) =>
      assert(after(f) == b, s"covered bloom rewritten for $f")
    }
    // extending again with nothing new appends nothing
    BloomSkip.extendManifestTable(spark, s"$root/m", dir, "key", 300L, 0.01)
    assert(spark.read.parquet(s"$root/m").count() == after.size.toLong)
    // probes resolve across both waves
    Seq(123L, 2123L).foreach { k =>
      val got = BloomSkip.prunedReadTable(spark, s"$root/m", "key", Seq(k))
        .select("key").collect().map(_.getLong(0)).toSet
      assert(got == Set(k), s"probe $k")
    }
  }

  test("null keys: dropped from blooms, never NPE; an all-null file is covered by an empty bloom") {
    import spark.implicits._
    val root = Files.createTempDirectory("bloom-suite-").toString
    val dir = s"$root/t"
    // file A: real keys; file B: ONLY null keys (the silent-gap case)
    Seq((Some(1L), "a"), (Some(2L), "a"), (Some(3L), "a"))
      .toDF("key", "payload").coalesce(1).write.parquet(dir)
    Seq((Option.empty[Long], "b"), (Option.empty[Long], "b"))
      .toDF("key", "payload").coalesce(1).write.mode("append").parquet(dir)
    // driver form: every file covered, null rows indexed nowhere
    val manifest = BloomSkip.buildManifest(spark, dir, "key", 10L, 0.01)
    assert(manifest.map(_.file).toSet == spark.read.parquet(dir).inputFiles.toSet,
      "the all-null file must still be covered (empty bloom), not silently absent")
    assert(BloomSkip.prunedRead(spark, manifest, "key", Seq(2L))
      .select("key").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // table form: same coverage contract
    BloomSkip.buildManifestTable(spark, dir, "key", 10L, 0.01, s"$root/m")
    val covered = spark.read.parquet(s"$root/m").select("file")
      .as[String].collect().toSet
    assert(covered == spark.read.parquet(dir).inputFiles.toSet)
    assert(BloomSkip.prunedReadTable(spark, s"$root/m", "key", Seq(3L))
      .select("key").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
