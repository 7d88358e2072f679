package graft.docs

import graft.SparkSpec

/** `_aliases` actions semantics + guards (search behavior rides the d190
  * oracle gate). */
class AliasesSpec extends SparkSpec {

  test("add upserts, remove deletes; re-add replaces the definition") {
    val r1 = Aliases(Map.empty,
      """{"actions": [{"add": {"index": "plan", "alias": "a",
        |  "filter": {"term": {"planType": "X"}}}}]}""".stripMargin)
    assert(r1("a").filter.exists(_.contains("planType")))
    val r2 = Aliases(r1,
      """{"actions": [{"add": {"index": "plan", "alias": "a"}}]}""")
    assert(r2("a").filter.isEmpty)
    val r3 = Aliases(r2, """{"actions": [{"remove": {"alias": "a"}}]}""")
    assert(r3.isEmpty)
  }

  test("rejections: unknown action, wrong index, routing knob, remove of unknown alias") {
    def bad(reg: Map[String, Aliases.AliasDef], body: String): String =
      intercept[IllegalArgumentException](Aliases(reg, body)).getMessage
    assert(bad(Map.empty, """{"actions": [{"swap": {"alias": "a"}}]}""")
      .contains("unsupported alias action"))
    assert(bad(Map.empty,
      """{"actions": [{"add": {"index": "other", "alias": "a"}}]}""")
      .contains("plan"))
    assert(bad(Map.empty,
      """{"actions": [{"add": {"index": "plan", "alias": "a", "routing": "1"}}]}""")
      .contains("unsupported alias add key"))
    assert(bad(Map.empty, """{"actions": [{"remove": {"alias": "nope"}}]}""")
      .contains("aliases_not_found"))
    assert(intercept[IllegalArgumentException](Aliases.search(
      spark.emptyDataFrame, "doc", Map.empty, "nope", "{}",
      graft.model.PlanSchema.plan)).getMessage.contains("no such alias"))
  }
}
