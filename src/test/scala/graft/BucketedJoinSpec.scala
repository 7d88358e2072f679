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

  test("stream state merge does not re-shuffle the bucketed state side") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

    val stateTbl = "st1_audit_state"
    spark.sql(s"DROP TABLE IF EXISTS $stateTbl")
    Seq((1L, 10L, "SAVE", "view", 1.0, 3L), (3L, 9L, "SAVE", "click", 5.0, 1L))
      .toDF("key", "seq", "op", "event_type", "value", "n_events")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable(stateTbl)
    val batch = Seq(
      (1L, 11L, "SAVE", "click", 2.0),
      (1L, 12L, "DELETE", "error", 3.0),
      (2L, 13L, "SAVE", "view", 4.0))
      .toDF("key", "seq", "op", "event_type", "value")

    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val merged = graft.stream.IndexPipeline.merge(spark.table(stateTbl), batch)
      // semantics unchanged: last write wins, counts accumulate
      val rows = merged.collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(1L).getAs[Long]("seq") === 12L)
      assert(rows(1L).getAs[String]("op") === "DELETE")
      assert(rows(1L).getAs[Long]("n_events") === 5L)
      assert(rows(2L).getAs[Long]("n_events") === 1L)
      assert(rows(3L).getAs[Long]("seq") === 9L) // untouched key survives
      // the 100 TB property: the state scan is bucketed and sits under NO
      // shuffle exchange — only the (small) batch side moves
      val plan = merged.queryExecution.executedPlan
      def stateScans(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
        case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == stateTbl) => f
      }
      val scans = stateScans(plan)
      assert(scans.nonEmpty, "state table scan not found in plan")
      assert(scans.forall(_.bucketedScan), "state scan lost its bucketing")
      plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        assert(stateScans(e).isEmpty,
          s"state side re-shuffled:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP TABLE IF EXISTS $stateTbl")
    }
  }
}
