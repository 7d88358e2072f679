package graft

import org.apache.spark.sql.functions._

/** Demonstrates the SCALE.md claim that bucketing the shredded tables by
  * key hash makes the per-level assembly joins co-partitioned: with both
  * sides bucketed on the join key, the sort-merge join plans with NO
  * shuffle exchange — the property that keeps reassembly one-pass at
  * 100 TB. (Run with broadcast disabled so the join can't degenerate into
  * a broadcast and hide the exchange.)
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed entity/edge tables join without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.docs.PlanDocs.docs(spark, sf)
    val sh = graft.docs.Shredder.shred(docs)

    spark.sql("DROP TABLE IF EXISTS bucketed_entities")
    spark.sql("DROP TABLE IF EXISTS bucketed_edges")
    sh.entities.write.mode("overwrite")
      .bucketBy(8, "key").sortBy("key")
      .saveAsTable("bucketed_entities")
    sh.edges.filter(col("child_key").isNotNull)
      .withColumn("key", col("child_key"))
      .write.mode("overwrite")
      .bucketBy(8, "key").sortBy("key")
      .saveAsTable("bucketed_edges")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_entities")
        .join(spark.table("bucketed_edges"), "key")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // sanity: the join actually produced the edge rows
      assert(joined.count() === sh.edges.filter(col("child_key").isNotNull).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucketed_entities")
      spark.sql("DROP TABLE IF EXISTS bucketed_edges")
    }
  }
}
