package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The events table's `ts` column has shipped two physical parquet
  * encodings across driver testdata generations: TIMESTAMP(NANOS),
  * which Spark can only read as a long under the legacy
  * `nanosAsLong` conf, and plain timestamp[us]. Rounds 8–9 lost all 26
  * events-backed queries to that drift; [[Queries.rawEventsNanos]] is
  * the single normalization boundary that must make BOTH encodings
  * read identically — pinned here by materializing the same rows under
  * each encoding and asserting the loaders agree row-for-row.
  */
class EventsEncodingSuite extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    tmpDirs.foreach(rm)
    super.afterAll()
  }

  /** One (legacy long-nanos dir, micros-timestamp dir) pair per suite —
    * lazily written once, removed in afterAll.
    */
  private lazy val bothDirs: (String, String) = {
    val micros = Seq(
      (1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1700000123456789L, 11L, "error", 2.5, "{}"),
      (3L, 1700009999999999L, 10L, "view", -0.5, "{}"))
    import spark.implicits._
    val base = micros
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val legacyDir = java.nio.file.Files.createTempDirectory("graft-ev-long-").toFile
    val microsDir = java.nio.file.Files.createTempDirectory("graft-ev-ts-").toFile
    tmpDirs += legacyDir += microsDir
    // legacy shape: what a TIMESTAMP(NANOS) file looks like to Spark
    // under the nanosAsLong conf — a LongType nanos column
    base.select(
      col("event_id"), (col("us") * 1000L).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$legacyDir/events.parquet")
    // current shape: a plain micros timestamp column
    base.select(
      col("event_id"), timestamp_micros(col("us")).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$microsDir/events.parquet")
    (legacyDir.toString, microsDir.toString)
  }

  /** A REAL TIMESTAMP(NANOS) parquet file (Spark cannot write one, so it
    * is a committed pyarrow-written fixture with the same rows as
    * [[bothDirs]]) — readable ONLY under the `nanosAsLong` conf, which
    * is exactly the path a nanos testdata regeneration exercises.
    * Resolved from the test classpath, not the JVM working directory.
    */
  private lazy val nanosFixtureDir =
    new java.io.File(getClass.getResource("/events_nanos").toURI).getAbsolutePath

  test("rawEventsNanos normalizes long-nanos and micros-timestamp files identically") {
    val (legacyDir, microsDir) = bothDirs
    val a = Queries.rawEventsNanos(spark, legacyDir)
      .orderBy("event_id").collect().toSeq
    val b = Queries.rawEventsNanos(spark, microsDir)
      .orderBy("event_id").collect().toSeq
    assert(a == b)
    assert(a.head.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    // nanos round-trip exactly (micros × 1000)
    assert(a.map(_.getAs[Long]("ts")) ==
      Seq(1700000000000000L, 1700000123456789L, 1700009999999999L).map(_ * 1000L))
  }

  test("rawEventsNanos reads a genuine TIMESTAMP(NANOS) file (the r8-r9 drift shape)") {
    val (_, microsDir) = bothDirs
    // without the legacy conf this scan throws Illegal Parquet type —
    // rows agreeing with the micros encoding proves the conf is applied
    // on the real nanos-typed path, not just simulated with a long column
    val a = Queries.rawEventsNanos(spark, nanosFixtureDir)
      .orderBy("event_id").collect().toSeq
    val b = Queries.rawEventsNanos(spark, microsDir)
      .orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("events() yields the same timestamp column from either encoding") {
    val (legacyDir, microsDir) = bothDirs
    val a = Queries.events(spark, legacyDir).orderBy("event_id").collect().toSeq
    val b = Queries.events(spark, microsDir).orderBy("event_id").collect().toSeq
    assert(a == b)
    assert(a.head.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(a.head.getAs[java.sql.Timestamp]("ts").getTime == 1700000000000L)
  }
}
