package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture-encoding contract for [[Tables.events]].
  *
  * The driver has regenerated /root/testdata with different physical `ts`
  * encodings across rounds — TIMESTAMP(NANOS) (read as epoch-nanos LONG
  * under the nanosAsLong flag), then timestamp[us] without timezone (read
  * as TIMESTAMP_NTZ by Spark 4) — and each change silently broke every
  * downstream `unix_millis`/`unix_micros` query and typed
  * `java.sql.Timestamp` encoder until normalization caught up. This spec
  * writes a tiny events table in each of the three observed encodings and
  * asserts Tables.events yields micros TimestampType with identical UTC
  * instants for all of them, so the next fixture regeneration cannot
  * silently drop queries again.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // exact-micros instants so all three encodings can represent the same
  // values; includes a pre-1970 one to exercise the nanos floor division
  private val microsUtc = Seq(
    -1000000L,          // 1969-12-31 23:59:59
    1704067200000000L,  // 2024-01-01 00:00:00
    1704067200123456L)  // sub-second micros

  private def writeEvents(tag: String, ts: Column, expectOnDisk: DataType): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"events-enc-$tag").toString
    microsUtc.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"), ts.as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val onDisk = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(onDisk == expectOnDisk, s"$tag encoding setup: wrote $onDisk, wanted $expectOnDisk")
    dir
  }

  test("Tables.events normalizes int64-nanos, TIMESTAMP and TIMESTAMP_NTZ to identical TimestampType instants") {
    val dirs = Seq(
      writeEvents("long", (col("us") * lit(1000L)).cast(LongType), LongType),
      writeEvents("ts", timestamp_micros(col("us")), TimestampType),
      writeEvents("ntz", timestamp_micros(col("us")).cast(TimestampNTZType), TimestampNTZType))
    val results = dirs.map { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType,
        s"$d: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
      df.orderBy("event_id").select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    }
    results.zip(Seq("long", "ts", "ntz")).foreach { case (r, tag) =>
      assert(r == microsUtc, s"$tag: instants must be preserved, got $r")
    }
  }

  test("Tables.events supports the typed java.sql.Timestamp encoder path in every encoding") {
    // the streaming sessionize path reads events.as[SessionEvent] with a
    // java.sql.Timestamp field — NTZ breaks it unless normalized
    val dir = writeEvents("ntz2", timestamp_micros(col("us")).cast(TimestampNTZType), TimestampNTZType)
    val got = Tables.events(spark, dir)
      .orderBy("event_id")
      .collect()
      .map(_.getAs[java.sql.Timestamp]("ts").getTime) // millis
      .toSeq
    assert(got == microsUtc.map(us => Math.floorDiv(us, 1000L)), s"typed path instants: $got")
  }
}
