package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated corpus (TESTDATA.md): TPC-H-ish star
  * schema + `events` / `documents` / `embeddings`, one parquet per table
  * under `/root/testdata/sf{0.001,0.01,0.1}/`.
  *
  * All engine operators read through here so the scan path is uniform:
  * plain `spark.read.parquet` — schema from footer, predicate pushdown and
  * column pruning supplied by Catalyst. At cluster scale the same call
  * works against a partitioned directory tree; nothing here assumes a
  * single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its `ts` timestamp read portably — the driver has
    * shipped this column as TIMESTAMP(NANOS) (which Spark 4 rejects unless
    * read as a raw Long) and as TIMESTAMP(MICROS) (NTZ) in different
    * corpus generations — exposing a uniform epoch-microseconds `ts_us`
    * column that every downstream operator builds on. The session time
    * zone is UTC in every entry point, so the NTZ→micros conversion is
    * the identity wall-clock mapping DuckDB's oracle applies too. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→micros branch below is only the identity wall-clock mapping
    // (the one DuckDB's oracle applies) when the session zone is UTC —
    // enforce it HERE, not just in the Bench/Verify/test entry points, so
    // a future entry point can't silently shift every events-derived ts_us.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanosecond int64: derive micros by integer floor
        raw.withColumn("ts_us", expr("ts DIV 1000"))
      case TimestampNTZType =>
        raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      case _ => // TIMESTAMP (ltz) micros
        raw.withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
