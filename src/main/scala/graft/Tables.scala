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
}
