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

  /** `events` with its nanosecond parquet timestamp read portably: Spark 4
    * rejects TIMESTAMP(NANOS) outright, so read it as a raw Long and expose
    * both the nanos and a derived microseconds column (`ts_us`). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts DIV 1000"))
  }
}
