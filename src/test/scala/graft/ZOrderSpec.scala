package graft

import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries2

/** The z-order layout claim, asserted on real files: writing the table
  * sorted by the interleaved z-value gives per-FILE min/max envelopes that
  * are narrow in BOTH dimensions — the stats parquet row-group pruning
  * reads — while an unsorted (round-robin) layout leaves every file
  * spanning the full range of both columns. */
class ZOrderSpec extends SparkSpec {

  test("z-sorted files have narrow envelopes on BOTH dims; round-robin does not") {
    val sf = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val z = RelationalQueries2.zFrame(spark, sf).select("c", "day", "z")
    z.repartitionByRange(4, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(s"$tmp/zsorted")
    z.repartition(4).write.mode("overwrite").parquet(s"$tmp/plain")

    def avgWidths(dir: String): (Double, Double) = {
      val e = spark.read.parquet(dir).withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("c") - min("c")).cast("double").as("wc"),
          (max("day") - min("day")).cast("double").as("wd"))
        .agg(avg("wc"), avg("wd")).head()
      (e.getDouble(0), e.getDouble(1))
    }
    val (zc, zd) = avgWidths(s"$tmp/zsorted")
    val (pc, pd) = avgWidths(s"$tmp/plain")
    // 4 z-range files = top two interleaved bits = half the range of EACH
    // dimension per file; round-robin files span ~the full range of both
    assert(zc < 0.7 * pc, s"custkey envelope not narrowed: $zc vs $pc")
    assert(zd < 0.7 * pd, s"day envelope not narrowed: $zd vs $pd")
  }
}
