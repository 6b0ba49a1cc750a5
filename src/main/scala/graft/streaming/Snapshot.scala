package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed, versioned parquet snapshot — the transactional
  * commit layer under the q156 streaming MERGE sink (and the q177
  * time-travel read). The layout is the minimal form of what
  * table formats (Iceberg/Delta-style) do at warehouse scale:
  *
  * {{{
  * root/
  *   CURRENT            — the committed version number (pointer file)
  *   manifest-v{N}.txt  — immutable: one "partition dir" line per part
  *   v{N}/__part={p}/   — immutable data directories
  * }}}
  *
  * COMMIT PROTOCOL (per increment): (1) write the new version's data
  * directories for the touched partitions only; (2) write
  * `manifest-v{N}` mapping every partition to its serving directory —
  * touched parts point at the new dirs, untouched parts CARRY FORWARD
  * their existing dirs unchanged; (3) atomically rename a temp file
  * onto `CURRENT`. The rename is the single commit point: a reader
  * concurrent with a batch resolves `CURRENT` to a fully-written
  * manifest whose directories are all complete — it can never see a
  * partition mid-rewrite — and a crash anywhere before the rename
  * leaves `CURRENT` at version N−1 with only unreferenced garbage dirs
  * on disk (re-running the batch is idempotent: the MERGE's per-key
  * last-write semantics reproduce the same content under a fresh
  * version number). Old versions stay readable by manifest — time
  * travel — until a retention GC deletes their manifests and any dirs
  * no retained manifest references.
  *
  * At 100 TB nothing here grows with the table: a manifest is one line
  * per partition, data dirs are written by ordinary distributed parquet
  * jobs, and the commit itself is two driver-side metadata writes + one
  * rename.
  */
object Snapshot {

  /** Manifest marker for a partition with no rows (all keys deleted). */
  val EmptyDir = "-"

  final case class Manifest(version: Int, parts: Map[Int, String])

  /** Race-tolerant recursive delete (deleteIfExists per entry) — the
    * ONE copy of the walk/reverse-sort/delete idiom, shared with
    * [[Events]].
    */
  private[streaming] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(x => java.nio.file.Files.deleteIfExists(x))
      finally walk.close()
    }

  private def currentPath(root: String) =
    java.nio.file.Paths.get(root, "CURRENT")
  private def manifestPath(root: String, v: Int) =
    java.nio.file.Paths.get(root, s"manifest-v$v.txt")
  private def schemaPath(root: String, v: Int) =
    java.nio.file.Paths.get(root, s"schema-v$v.json")

  // ---- SCHEMA EVOLUTION -------------------------------------------------
  //
  // A version may carry a `schema-v{N}.json` sidecar (Spark StructType
  // JSON, immutable like the manifest). The SERVING schema of version v
  // is the newest sidecar at or below v; versions below the first
  // sidecar — and whole tables that never evolved — have none and read
  // exactly as before (plain multi-dir parquet read, zero overhead).
  // Evolution is a METADATA-ONLY commit: no data file is touched, old
  // files simply lack the new column and serve NULL for it through a
  // mergeSchema read conformed to the serving schema. Time travel below
  // the evolution version therefore serves the OLD schema by
  // construction — the sidecar, like the manifest, is part of the
  // version.

  /** The serving schema of `version`: the newest schema sidecar at or
    * below it, if the table ever evolved.
    */
  def servingSchema(root: String, version: Int): Option[org.apache.spark.sql.types.StructType] = {
    import scala.jdk.CollectionConverters._
    val vs = java.nio.file.Files.list(java.nio.file.Paths.get(root))
    val best =
      try vs.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("schema-v") && n.endsWith(".json"))
        .map(_.stripPrefix("schema-v").stripSuffix(".json").toInt)
        .filter(_ <= version)
        .maxOption
      finally vs.close()
    best.map { v =>
      org.apache.spark.sql.types.DataType.fromJson(
        new String(java.nio.file.Files.readAllBytes(schemaPath(root, v)),
          java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
  }

  /** ADD COLUMN as a transactional commit: version N+1 carries every
    * partition dir forward VERBATIM (zero data rewrite — the Iceberg
    * discipline) plus a schema sidecar extending the serving schema
    * with the new nullable column. Readers at or above N+1 see the
    * column (NULL until writers backfill it); time travel below N+1
    * still serves the old schema. Returns the committed version.
    */
  def evolveAddColumn(
      spark: SparkSession, root: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Int =
    evolveSchema(spark, root) { base =>
      requireNameFree(base, name)
      base.add(name, dataType, nullable = true)
    }

  /** Field-metadata key listing a renamed column's PRIOR physical
    * names, most recent first — the name-mapping RENAME leaves behind
    * instead of rewriting files.
    */
  private val PriorNamesKey = "graftPriorNames"

  private def priorNames(f: org.apache.spark.sql.types.StructField): Seq[String] =
    if (f.metadata.contains(PriorNamesKey))
      f.metadata.getStringArray(PriorNamesKey).toSeq
    else Nil

  /** Reject a new declared name that collides with ANY name still in
    * use — declared names AND every prior physical name a rename left
    * behind in old data files. Declared-only checking would let
    * `rename(b→a)` after `rename(a→c)` (or `add("amt")` after
    * `rename(amt→amount)`) resolve against the WRONG era's physical
    * column and silently serve another column's data.
    */
  private def requireNameFree(
      base: org.apache.spark.sql.types.StructType, name: String): Unit = {
    val inUse = base.fields.flatMap(f => f.name +: priorNames(f)).toSet
    require(!inUse(name),
      s"column name $name is still in use (declared or as a renamed " +
        s"column's physical name in old files): ${inUse.mkString(", ")}")
  }

  /** The ONE schema-evolution commit protocol both ADD and RENAME
    * share: resolve the serving schema (donor-bootstrapped for tables
    * that never evolved), apply `transform`, and commit version N+1 as
    * carry-forward manifest + immutable schema sidecar + pointer swap.
    */
  private def evolveSchema(spark: SparkSession, root: String)(
      transform: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType): Int = {
    val cur = currentVersion(root)
    val man = readManifest(root, cur)
    val base = servingSchema(root, cur).getOrElse {
      val donor = man.parts.toSeq.sortBy(_._1).collectFirst {
        case (_, d) if d != EmptyDir => d
      }
      require(donor.nonEmpty, "cannot evolve an all-empty never-evolved table")
      spark.read.parquet(s"$root/${donor.get}").schema
    }
    val evolved = transform(base)
    val newV = cur + 1
    clearUncommitted(root, newV) // also clears a crashed attempt's sidecar
    java.nio.file.Files.write(schemaPath(root, newV),
      evolved.json.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    writeManifest(root, Manifest(newV, man.parts))
    swapCurrent(root, newV)
    newV
  }

  /** RENAME COLUMN as a transactional metadata-only commit: version
    * N+1 carries every partition dir forward verbatim plus a schema
    * sidecar in which the field is renamed and its prior physical
    * names recorded in field metadata — zero data rewrite; old files
    * keep serving their rows under the old physical name, conformed to
    * the new declared name at read time. Chains compose (a column
    * renamed twice accumulates both priors), and time travel below the
    * commit serves the old name by construction. Returns the committed
    * version.
    */
  def evolveRenameColumn(
      spark: SparkSession, root: String, from: String, to: String): Int =
    evolveSchema(spark, root) { base =>
      require(base.fieldNames.contains(from), s"no column $from to rename")
      requireNameFree(base, to)
      org.apache.spark.sql.types.StructType(base.fields.map { f =>
        if (f.name != from) f
        else f.copy(name = to, metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putStringArray(PriorNamesKey, (f.name +: priorNames(f)).toArray)
            .build())
      })
    }

  /** Conform a frame to the serving schema: columns the physical files
    * predate are added as typed NULLs, renamed columns resolve through
    * their prior physical names (coalesce, newest first — any one row
    * carries exactly one of them, since every writer wrote its era's
    * serving name), and the projection fixes the declared column order.
    */
  private def conform(
      df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val have = df.columns.toSet
    val cols = schema.fields.map { f =>
      val present = (f.name +: priorNames(f)).filter(have)
      present match {
        case Nil => lit(null).cast(f.dataType).as(f.name)
        case Seq(one) => col(one).as(f.name)
        case many => coalesce(many.map(col): _*).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  def currentVersion(root: String): Int =
    new String(java.nio.file.Files.readAllBytes(currentPath(root)),
      java.nio.charset.StandardCharsets.US_ASCII).trim.toInt

  def readManifest(root: String, version: Int): Manifest = {
    import scala.jdk.CollectionConverters._
    val parts = java.nio.file.Files.readAllLines(manifestPath(root, version))
      .asScala.filter(_.nonEmpty)
      .map { line =>
        val Array(p, d) = line.split(" ", 2)
        p.toInt -> d
      }.toMap
    Manifest(version, parts)
  }

  /** Manifests are immutable: written once under their final name BEFORE
    * the pointer swap, never rewritten (`CREATE_NEW` enforces it).
    */
  def writeManifest(root: String, m: Manifest): Unit = {
    val body = m.parts.toSeq.sortBy(_._1)
      .map { case (p, d) => s"$p $d" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(manifestPath(root, m.version),
      body.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      java.nio.file.StandardOpenOption.CREATE_NEW)
  }

  /** Remove any UNCOMMITTED leftovers of `version` — the data dirs and
    * manifest a crashed attempt wrote before its pointer swap. Called by
    * the writer before re-attempting a version so at-least-once
    * redelivery is actually idempotent (the fresh attempt must not
    * collide with the garbage's ErrorIfExists/CREATE_NEW guards).
    * ONLY legal for versions above CURRENT: committed state is immutable.
    */
  def clearUncommitted(root: String, version: Int): Unit = {
    require(version > currentVersion(root),
      s"refusing to clear v$version: CURRENT is ${currentVersion(root)}")
    deleteRecursively(java.nio.file.Paths.get(root, s"v$version"))
    java.nio.file.Files.deleteIfExists(manifestPath(root, version))
    // a crashed ADD COLUMN attempt's sidecar must not attach itself to
    // an unrelated later commit of the same version number
    java.nio.file.Files.deleteIfExists(schemaPath(root, version))
  }

  /** Retention GC: keep the last `keepLast` committed versions (their
    * manifests and every data directory any of them references — carry-
    * forward means an old `v{K}` dir can serve a new manifest), delete
    * the expired manifests and their now-unreferenced data dirs. Bounds
    * the disk footprint of a long streaming drain at O(keepLast × churn).
    *
    * Versions ABOVE CURRENT are never touched: an in-flight commit may
    * legitimately be mid-write there, and [[clearUncommitted]] (run by
    * the writer itself, which knows no commit is racing) already covers
    * crashed-attempt garbage. If every retained manifest maps every
    * partition to the empty marker (a fully-deleted table), the newest
    * on-disk data directory is retained as the SCHEMA DONOR so
    * [[read]] can keep serving the typed empty frame.
    */
  def gc(root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val cur = currentVersion(root)
    val keepFrom = math.max(0, cur - keepLast + 1)
    val retained = (keepFrom to cur)
      .filter(v => java.nio.file.Files.exists(manifestPath(root, v)))
    val referenced = retained.flatMap(v => readManifest(root, v).parts.values)
      .filter(_ != EmptyDir).toSet
    import scala.jdk.CollectionConverters._
    def versionDirs(): Seq[(Int, java.nio.file.Path)] = {
      val vs = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      try vs.iterator().asScala.toSeq
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.matches("v\\d+"))
        .map(p => p.getFileName.toString.drop(1).toInt -> p)
      finally vs.close()
    }
    def partDirs(vDir: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val ps = java.nio.file.Files.list(vDir)
      try ps.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("__part="))
      finally ps.close()
    }
    // schema donor for an all-empty retention set: newest dir wins
    val keep =
      if (referenced.nonEmpty) referenced
      else versionDirs().filter(_._1 <= cur).sortBy(-_._1).iterator
        .flatMap { case (_, vDir) => partDirs(vDir).sortBy(_.getFileName.toString)
          .map(pd => s"${vDir.getFileName}/${pd.getFileName}") }
        .take(1).toSet
    // expired manifests (never above CURRENT — writer race). One
    // directory listing, not a version-counter probe loop: gc after
    // each commit must stay O(live files), not O(version number).
    locally {
      val all = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      try all.iterator().asScala.toSeq.foreach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("manifest-v") && name.endsWith(".txt")) {
          val v = name.stripPrefix("manifest-v").stripSuffix(".txt").toInt
          if (v < keepFrom) java.nio.file.Files.deleteIfExists(p)
        }
      } finally all.close()
    }
    // data dirs (≤ CURRENT only) that no retained manifest references
    versionDirs().filter(_._1 <= cur).foreach { case (_, vDir) =>
      partDirs(vDir).foreach { pd =>
        val rel = s"${vDir.getFileName}/${pd.getFileName}"
        if (!keep(rel)) deleteRecursively(pd)
      }
      // a version dir with no partitions left is garbage wholesale
      // (incl. its _SUCCESS marker)
      if (partDirs(vDir).isEmpty) deleteRecursively(vDir)
    }
  }

  /** Result of a [[compact]] pass: live data-file counts before/after
    * and which partitions were rewritten.
    */
  final case class CompactStats(
      filesBefore: Int, filesAfter: Int, rewritten: Seq[Int])

  /** Bin-packing FILE COMPACTION — the OPTIMIZE / rewrite-data-files
    * table-maintenance op every incrementally-written table needs: a
    * long MERGE drain leaves each partition's directory holding one
    * small file per writer task per batch, and scan cost degrades with
    * file count (per-file open + footer read + scheduling), not bytes.
    *
    * For each live partition, the bin-packed target is
    * `ceil(bytes / targetBytes)` files; partitions already at or under
    * target are CARRIED FORWARD BY REFERENCE (a no-op costs metadata
    * only — an all-compact table commits nothing at all). Each
    * over-target partition is rewritten by an ordinary distributed
    * read→coalesce→write into a fresh `v{N}/__part={p}` directory;
    * partitions rewrite independently, so at warehouse scale the
    * rewrites run as parallel jobs and total cost is O(bytes in
    * over-target partitions), never O(|table|). The commit is the same
    * manifest + pointer-swap protocol as the MERGE: readers concurrent
    * with compaction resolve the old or new version atomically, content
    * is IDENTICAL either way (only layout changes), a crash before the
    * swap leaves CURRENT untouched, and superseded versions stay
    * time-travel readable until retention GC.
    */
  /** The parquet data files of one partition dir — shared by both
    * maintenance ops so a listing-filter change can't diverge.
    */
  private def dataFiles(root: String, dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(root, dir))
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
    finally s.close()
  }

  /** Submit independent per-partition rewrite jobs CONCURRENTLY from a
    * bounded driver-side pool (`spark.graft.compact.maxConcurrentJobs`,
    * default 8) — Spark schedules jobs from multiple threads safely,
    * and partition rewrites share no state, so compaction wall-clock
    * tracks the LARGEST partition, not the partition count. Failure
    * semantics are unchanged: any rewrite error propagates after the
    * pool drains (no thread left writing), the manifest + pointer swap
    * is never reached, and the next attempt's [[clearUncommitted]]
    * removes the orphaned version dirs — the same crash-window story
    * as a serial failure.
    */
  private def rewriteInParallel[A](
      spark: SparkSession, items: Seq[A])(job: A => Unit): Unit = {
    val n = math.min(items.size,
      spark.conf.getOption("spark.graft.compact.maxConcurrentJobs")
        .map(_.toInt).getOrElse(8))
    if (n <= 1) { items.foreach(job); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.traverse(items)(a => scala.concurrent.Future(job(a))),
      scala.concurrent.duration.Duration.Inf): Unit
    finally {
      pool.shutdown()
      pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS): Unit
    }
  }

  def compact(
      spark: SparkSession, root: String,
      targetBytes: Long = 128L << 20): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val cur = currentVersion(root)
    val man = readManifest(root, cur)
    def dataFiles(dir: String): Seq[java.nio.file.Path] =
      Snapshot.dataFiles(root, dir)
    val plan = man.parts.toSeq.sortBy(_._1)
      .filter(_._2 != EmptyDir)
      .map { case (p, d) =>
        val fs = dataFiles(d)
        val bytes = fs.map(java.nio.file.Files.size(_)).sum
        val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        (p, d, fs.size, target)
      }
    val before = plan.map(_._3).sum
    val candidates = plan.filter { case (_, _, n, t) => n > t }
    if (candidates.isEmpty) return CompactStats(before, before, Nil)
    val newV = cur + 1
    clearUncommitted(root, newV)
    rewriteInParallel(spark, candidates) { case (p, d, _, t) =>
      spark.read.parquet(s"$root/$d").coalesce(t)
        .write.parquet(s"$root/v$newV/__part=$p")
    }
    writeManifest(root, Manifest(newV, man.parts ++ listPartDirs(root, newV)))
    swapCurrent(root, newV)
    val rewrittenAfter = candidates
      .map { case (p, _, _, _) => dataFiles(s"v$newV/__part=$p").size }.sum
    val carriedAfter = plan.collect {
      case (p, _, n, _) if !candidates.exists(_._1 == p) => n
    }.sum
    CompactStats(before, rewrittenAfter + carriedAfter, candidates.map(_._1))
  }

  /** Z-ORDER CLUSTERING COMPACTION (OPTIMIZE ZORDER BY) — the layout
    * CHOICE, not just the small-file fix: every live partition is
    * rewritten with its rows range-partitioned and sorted by the Morton
    * interleave of (`xCol`, `yCol`) ([[graft.functions.ZOrder2]],
    * codegen'd), so each data file covers a TIGHT rectangle of the
    * 2-D key space and file-level min/max stats prune boxes on either
    * or both columns (the [[graft.rel.ZOrder]] read path, now under the
    * transactional commit). Unlike [[compact]], clustering rewrites
    * EVERY non-empty partition — it is changing the order, not only the
    * file count — but under the SAME manifest + CURRENT-swap protocol:
    * content identical, readers atomic, crash-before-swap invisible,
    * superseded versions time-travel readable. Cost is one
    * range-shuffle per partition, partitions independent/parallel.
    */
  def compactClustered(
      spark: SparkSession, root: String, xCol: String, yCol: String,
      targetBytes: Long = 128L << 20): CompactStats =
    clusteredRewrite(spark, root, targetBytes) { df =>
      graft.functions.GraftFunctions.zorder2(
        org.apache.spark.sql.functions.col(xCol).cast("long"),
        org.apache.spark.sql.functions.col(yCol).cast("long"))
    }

  /** [[compactClustered]] at real OPTIMIZE ZORDER BY arity: N clustering
    * columns via the N-way interleave ([[graft.functions.ZOrderN]]),
    * each quantized onto the ⌊63/N⌋-bit grid from ITS PARTITION's
    * min/max ([[graft.rel.ZOrder.quantize]] — one scalar agg per
    * partition, exact integer step math). Per-partition grids are
    * correct because clustering only ever orders rows WITHIN a
    * partition's rewrite; cross-partition placement is the hash
    * partitioning's job.
    */
  def compactClusteredN(
      spark: SparkSession, root: String, cols: Seq[String],
      targetBytes: Long = 128L << 20): CompactStats = {
    require(cols.size >= 2, s"compactClusteredN needs >= 2 columns, got $cols")
    val bits = 63 / cols.size
    clusteredRewrite(spark, root, targetBytes) { df =>
      import org.apache.spark.sql.functions.{col, floor, lit, max, min}
      // floor-then-cast, matching [[graft.rel.ZOrder.quantize]]'s grid
      val mmAggs = cols.flatMap(c =>
        Seq(floor(min(col(c))).cast("long"), floor(max(col(c))).cast("long")))
      val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
      // a zero-row partition (or an all-NULL clustering column) has no
      // grid — there is nothing to order, so a constant z is correct
      // (compact/compactClustered never aggregate and tolerate the same
      // partitions implicitly)
      if ((0 until 2 * cols.size).exists(mm.isNullAt)) lit(0L)
      else graft.functions.GraftFunctions.zorderN(
        cols.zipWithIndex.map { case (c, i) =>
          graft.rel.ZOrder.quantize(col(c), mm.getLong(2 * i),
            mm.getLong(2 * i + 1), bits)
        }: _*)
    }
  }

  /** The ONE clustered-rewrite kernel both arities share: every live
    * partition rewritten range-partitioned + sorted by the z-value
    * `zOf` derives from the partition's frame, under the same
    * manifest + CURRENT-swap protocol.
    */
  private def clusteredRewrite(
      spark: SparkSession, root: String, targetBytes: Long)(
      zOf: DataFrame => org.apache.spark.sql.Column): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    graft.functions.GraftFunctions.register(spark)
    val cur = currentVersion(root)
    val man = readManifest(root, cur)
    // on an evolved table each partition is conformed to the SERVING
    // schema before clustering: the caller's clustering columns resolve
    // on every era's files (a renamed table would otherwise have no
    // name valid across eras), and the rewrite modernizes the physical
    // schema as a side effect — the table-format OPTIMIZE discipline
    val schema = servingSchema(root, cur)
    val live = man.parts.toSeq.sortBy(_._1).filter(_._2 != EmptyDir)
      .map { case (p, d) => (p, d, dataFiles(root, d)) } // one listing per partition
    if (live.isEmpty) return CompactStats(0, 0, Nil)
    val before = live.map(_._3.size).sum
    val newV = cur + 1
    clearUncommitted(root, newV)
    rewriteInParallel(spark, live) { case (p, d, fs) =>
      val bytes = fs.map(java.nio.file.Files.size(_)).sum
      val t = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      import org.apache.spark.sql.functions.col
      val raw = spark.read.parquet(s"$root/$d")
      val df = schema.map(conform(raw, _)).getOrElse(raw)
      df.withColumn("__z", zOf(df))
        .repartitionByRange(t, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(s"$root/v$newV/__part=$p")
    }
    writeManifest(root, Manifest(newV, man.parts ++ listPartDirs(root, newV)))
    swapCurrent(root, newV)
    val after = live.map { case (p, _, _) => dataFiles(root, s"v$newV/__part=$p").size }.sum
    CompactStats(before, after, live.map(_._1))
  }

  /** THE commit point: write the pointer beside CURRENT, then rename
    * onto it atomically. Readers resolve either the old or the new
    * version — never a partial state.
    */
  def swapCurrent(root: String, version: Int): Unit = {
    val tmp = java.nio.file.Paths.get(root, s"CURRENT.tmp-$version")
    java.nio.file.Files.write(tmp, version.toString
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    java.nio.file.Files.move(tmp, currentPath(root),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Initialize version 0 from a frame already carrying the partition
    * column: one distributed write + manifest + pointer.
    */
  def init(root: String, df: DataFrame, partCol: String = "__part"): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    df.write.partitionBy(partCol).parquet(s"$root/v0")
    writeManifest(root, Manifest(0, listPartDirs(root, 0)))
    swapCurrent(root, 0)
  }

  /** The partition directories a written version actually produced
    * (`v{N}/__part={p}`), from a filesystem listing — used instead of a
    * second pass over the frame.
    */
  def listPartDirs(root: String, version: Int): Map[Int, String] = {
    import scala.jdk.CollectionConverters._
    val vDir = java.nio.file.Paths.get(root, s"v$version")
    val stream = java.nio.file.Files.list(vDir)
    try {
      stream.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("__part="))
        .map { p =>
          val v = p.getFileName.toString.stripPrefix("__part=").toInt
          v -> s"v$version/__part=$v"
        }.toMap
    } finally stream.close()
  }

  /** Read a committed snapshot version (default: CURRENT). The data
    * directories are leaf dirs, so no partition column is inferred —
    * rows carry the data schema only.
    */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(root))
    val schema = servingSchema(root, v)
    val dirs = readManifest(root, v).parts.toSeq.sortBy(_._1)
      .collect { case (_, d) if d != EmptyDir => s"$root/$d" }
    if (dirs.nonEmpty) schema match {
      // evolved table: dirs from before the boundary physically lack the
      // added columns — mergeSchema unions the footers, conform fills
      // the typed NULLs and fixes the declared order. Never-evolved
      // tables take the plain read below: zero footer-merge overhead.
      case Some(s) =>
        conform(spark.read.option("mergeSchema", "true").parquet(dirs: _*), s)
      case None => spark.read.parquet(dirs: _*)
    }
    else {
      // a fully-deleted table is a LEGAL committed state: serve an empty
      // frame in the table's schema, recovered from the newest still-on-
      // disk data directory of any earlier version (init always wrote one)
      val fromManifests = ((v - 1) to 0 by -1).iterator
        .filter(pv => java.nio.file.Files.exists(manifestPath(root, pv)))
        .flatMap(pv => readManifest(root, pv).parts.values
          .find(_ != EmptyDir).map(d => s"$root/$d"))
        .nextOption()
      // after retention GC the older manifests are gone but gc retains
      // the newest data dir as schema donor — find it on disk. Bounded
      // to dirs AT OR BELOW the version being read: an uncommitted
      // in-flight dir above CURRENT may be half-written (no footers),
      // and a dir newer than a time-travel target could carry an
      // evolved schema.
      def fromDisk: Option[String] = {
        import scala.jdk.CollectionConverters._
        val vs = java.nio.file.Files.list(java.nio.file.Paths.get(root))
        try vs.iterator().asScala.toSeq
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.matches("v\\d+") &&
            p.getFileName.toString.drop(1).toInt <= v)
          .sortBy(-_.getFileName.toString.drop(1).toInt)
          .iterator.flatMap { vDir =>
            val ps = java.nio.file.Files.list(vDir)
            try ps.iterator().asScala.toSeq
              .filter(_.getFileName.toString.startsWith("__part="))
              .sortBy(_.getFileName.toString)
              .map(pd => s"$root/${vDir.getFileName}/${pd.getFileName}")
            finally ps.close()
          }.nextOption()
        finally vs.close()
      }
      val donor = fromManifests.orElse(fromDisk)
      require(donor.nonEmpty, s"snapshot $root never held data: no schema to serve")
      val empty = spark.read.parquet(donor.get)
        .filter(org.apache.spark.sql.functions.lit(false))
      schema.map(conform(empty, _)).getOrElse(empty)
    }
  }

  /** Read ONLY the named partitions of a version — the touched-set read
    * the MERGE issues: cost is O(|touched|) directories by construction
    * (the untouched dirs never even reach the scan's file listing).
    */
  def readParts(spark: SparkSession, root: String, version: Int, ps: Seq[Int]): Option[DataFrame] = {
    val man = readManifest(root, version)
    val dirs = ps.flatMap(p => man.parts.get(p))
      .filter(_ != EmptyDir).map(d => s"$root/$d")
    if (dirs.isEmpty) None
    else Some(servingSchema(root, version) match {
      case Some(s) =>
        conform(spark.read.option("mergeSchema", "true").parquet(dirs: _*), s)
      case None => spark.read.parquet(dirs: _*)
    })
  }
}
