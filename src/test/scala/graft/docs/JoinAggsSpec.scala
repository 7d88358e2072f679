package graft.docs

import graft.SparkSpec

/** children/parent aggregation parse guards (the numbers ride the
  * d203/d206 oracle gates; these pin the loud rejections). */
class JoinAggsSpec extends SparkSpec {

  private def sh: Shredded =
    Shredder.shred(PlanDocs.docs(spark, "/root/testdata/sf0.001"))

  private def bad(body: String): String =
    intercept[IllegalArgumentException](
      JoinAggs.run(sh, "plan", body)).getMessage

  test("rejections: non-terms top, unknown knobs, metric kinds, hits requests") {
    assert(bad("""{"size": 0, "aggs": {"a": {"histogram": {"field": "x"}}}}""")
      .contains("unsupported top agg key"))
    assert(bad(
      """{"size": 0, "aggs": {"a": {"terms": {"field": "planType", "order": {}}}}}""")
      .contains("unsupported terms option"))
    assert(bad(
      """{"size": 5, "aggs": {"a": {"terms": {"field": "planType"}}}}""")
      .contains("size:0"))
    assert(bad(
      """{"size": 0, "aggs": {"a": {"terms": {"field": "planType"},
        |  "aggs": {"c": {"children": {"type": "linkedPlanServices"},
        |    "aggs": {"m": {"cardinality": {"field": "objectId"}}}}}}}}""".stripMargin)
      .contains("unsupported metric"))
    assert(bad(
      """{"size": 0, "aggs": {"a": {"terms": {"field": "planType"},
        |  "aggs": {"m": {"avg": {"field": "x"}}}}}}""".stripMargin)
      .contains("must be children or parent"))
  }

  test("a children hop over an empty relation keeps buckets with doc_count 0") {
    val out = JoinAggs.run(sh, "plan",
      """{"size": 0, "aggs": {"a": {"terms": {"field": "planType", "size": 3},
        |  "aggs": {"c": {"children": {"type": "noSuchRelation"}}}}}}""".stripMargin)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("c_doc_count") == 0L),
      "empty relation must yield doc_count 0, not dropped buckets")
  }
}
