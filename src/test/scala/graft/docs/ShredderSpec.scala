package graft.docs

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two shred shapes (per-level codegen walk for at-rest inputs vs
  * single-pass expression walk for computed inputs — r19, see Shredder's
  * class doc) must produce IDENTICAL tables: the mutation oracle gates run
  * through `shredComputed` while d1/d2/d3 pin `shred`, so a divergence
  * would surface as a mutation-vs-ingest inconsistency, not a loud error.
  * Pinned here on the real sf0.001 corpus and on an adversarial fixture
  * exercising every NULL/empty shape the walks special-case.
  */
class ShredderSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertSame(a: Shredded, b: Shredded): Unit = {
    assert(a.entities.columns.toSeq === b.entities.columns.toSeq)
    assert(a.edges.columns.toSeq === b.edges.columns.toSeq)
    assert(sorted(a.entities) === sorted(b.entities))
    assert(sorted(a.edges) === sorted(b.edges))
  }

  test("shred == shredComputed on the sf0.001 plan corpus") {
    val docs = graft.docs.PlanDocs.docs(spark, "/root/testdata/sf0.001")
    assertSame(Shredder.shred(docs), Shredder.shredComputed(docs))
  }

  test("shred == shredComputed on adversarial null/empty shapes") {
    // one JSON document per special case the walks branch on:
    //  - NULL object-valued field (absent planCostShares)
    //  - absent array (NULL linkedPlanServices) — no edge at all
    //  - present-but-EMPTY array — the single (NULL, NULL) marker edge
    //  - NULL array element — edge with NULL child_key, no child subtree
    //  - duplicate child key across documents — entity dedup
    val rows = Seq(
      // full document, two array elements
      """{"objectId":"p1","objectType":"plan","a":1,
         "planCostShares":{"objectId":"cs1","objectType":"membercostshare","d":7},
         "linkedPlanServices":[
           {"objectId":"s1","objectType":"planservice","e":1,
            "linkedService":{"objectId":"v1","objectType":"service","n":"x"}},
           {"objectId":"s2","objectType":"planservice","e":2}]}""",
      // absent struct child + absent array
      """{"objectId":"p2","objectType":"plan","a":2}""",
      // present-but-empty array
      """{"objectId":"p3","objectType":"plan","a":3,"linkedPlanServices":[]}""",
      // NULL array element between real ones
      """{"objectId":"p4","objectType":"plan","a":4,
         "linkedPlanServices":[
           {"objectId":"s3","objectType":"planservice","e":3},
           null,
           {"objectId":"s1","objectType":"planservice","e":1,
            "linkedService":{"objectId":"v1","objectType":"service","n":"x"}}]}"""
    ).map(_.replaceAll("\n\\s*", ""))
    import spark.implicits._
    val raw = spark.createDataset(rows)
    val schema = spark.read.json(raw).schema
    val docs = raw.toDF("j").select(from_json(col("j"), schema).as("doc"))
      .persist() // computed input: both walks must read the same rows
    try {
      val a = Shredder.shred(docs)
      val b = Shredder.shredComputed(docs)
      assertSame(a, b)
      // the fixture actually exercises the special cases it claims to
      val edges = a.edges.collect()
      assert(edges.exists(r => r.isNullAt(2) && r.isNullAt(3) &&
        r.getString(0) == "plan_p3"), "expected the empty-array marker edge")
      assert(edges.exists(r => r.getString(0) == "plan_p4" && !r.isNullAt(2) &&
        r.isNullAt(3)), "expected the NULL-element edge")
      assert(a.entities.filter(col("key") === "planservice_s1").count() === 1,
        "expected the shared child to dedup to one entity row")
      assert(!edges.exists(_.getString(0) == "plan_p2"), "absent fields emit no edge")
    } finally docs.unpersist(true)
  }
}
