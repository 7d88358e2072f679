package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The driver regenerates /root/testdata per round and the events `ts`
  * column has shipped as BOTH nanosecond int64 (read via nanosAsLong) and
  * TIMESTAMP(MICROS) NTZ across corpus generations. `Tables.events` must
  * derive the SAME epoch-micros `ts_us` from either physical type — a
  * silent mismatch shifts every events-derived bucket, window and
  * watermark. This spec writes the same instants in both layouts and
  * pins the equality.
  */
class EventsLoaderSpec extends SparkSpec {

  test("events loader derives identical ts_us from nanos-long and micros-NTZ layouts") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-events-")
    val micros = Seq(
      1704067200000000L, // 2024-01-01 00:00:00 UTC
      1704110445123456L, // sub-second precision survives
      1706655432194062L) // late-January instant
    try {
      // layout A: ts as int64 nanoseconds
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us * 1000L) }
        .toDF("event_id", "ts")
        .coalesce(1).write.parquet(s"$base/nanos/events.parquet")
      // layout B: ts as TIMESTAMP_NTZ micros
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us) }
        .toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
        .coalesce(1).write.parquet(s"$base/ntz/events.parquet")
      def tsUs(dir: String): Seq[(Long, Long)] =
        Tables.events(spark, dir).select(col("event_id"), col("ts_us"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      val a = tsUs(s"$base/nanos")
      val b = tsUs(s"$base/ntz")
      assert(a === b, "the two physical layouts must yield identical epoch micros")
      assert(a.map(_._2) === micros, "ts_us must be the exact source instants")
    } finally {
      Files.walk(base).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
  }
}
