package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Exactly-once ACROSS RESTARTS — the property the st-registry queries
  * exercise within one run, proven here over a stop/restart boundary: a
  * query is killed after consuming part of its source, a NEW writeStream
  * (fresh query object, same checkpoint) consumes the rest, and the file
  * sink must hold each input row exactly once — no replays of the files
  * the first incarnation committed, no gaps. This is the recovery
  * contract a 1000-executor deployment leans on every deploy/restart. */
class RestartSpec extends SparkSpec {

  test("file-sink aggregationless pipeline resumes from checkpoint without replay") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-restart-")
    val src = base.resolve("src").toString
    val ck = base.resolve("ck").toString
    val out = base.resolve("out").toString
    // phase-1 source: 2 files
    Seq(1L, 2L, 3L).toDF("id").coalesce(1).write.parquet(s"$src/b0")
    Seq(4L, 5L).toDF("id").coalesce(1).write.parquet(s"$src/b1")
    def run(): Unit = {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/b*")
        .withColumn("doubled", col("id") * 2)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // incarnation 1 consumes b0 + b1, then terminates
    // more data lands while the query is DOWN
    Seq(6L, 7L, 8L).toDF("id").coalesce(1).write.parquet(s"$src/b2")
    run() // incarnation 2: same checkpoint, must process ONLY b2
    val rows = spark.read.parquet(out).select(col("id"), col("doubled"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows === (1L to 8L).map(i => (i, i * 2)),
      "restart must neither replay committed files nor drop the new one")
    // cleanup
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm); p.delete()
    }
    rm(base.toFile)
  }
}
