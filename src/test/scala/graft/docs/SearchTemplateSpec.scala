package graft.docs

import org.scalatest.funsuite.AnyFunSuite

/** Render-layer coverage for the `_search/template` mustache subset —
  * escaping, defaults, and the loud-rejection contract (no Spark needed:
  * rendering is pure string work; execution is d177's oracle gate). */
class SearchTemplateSpec extends AnyFunSuite {

  test("scalar substitution: string raw, ints/longs/booleans as literals") {
    assert(SearchTemplate.render("x={{a}} n={{b}} f={{c}}",
      Map("a" -> "BUILDING", "b" -> 42, "c" -> true)) == "x=BUILDING n=42 f=true")
  }

  test("default value renders iff the param is absent") {
    val t = """"size": {{size}}{{^size}}25{{/size}}"""
    assert(SearchTemplate.render(t, Map.empty) == "\"size\": 25")
    assert(SearchTemplate.render(t, Map("size" -> 7)) == "\"size\": 7")
  }

  test("inverted section alone renders only when absent") {
    val t = "a{{^flag}}-default{{/flag}}b"
    assert(SearchTemplate.render(t, Map.empty) == "a-defaultb")
    assert(SearchTemplate.render(t, Map("flag" -> "x")) == "ab")
  }

  test("toJson escapes quotes, backslashes and control chars") {
    assert(SearchTemplate.render("{{#toJson}}v{{/toJson}}",
      Map("v" -> "a\"b\\c\nd\tef")) == "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
  }

  test("toJson renders lists and maps as JSON") {
    assert(SearchTemplate.render("{{#toJson}}xs{{/toJson}}",
      Map("xs" -> Seq("a", 1, true))) == "[\"a\",1,true]")
    assert(SearchTemplate.render("{{#toJson}}m{{/toJson}}",
      Map("m" -> Map("k" -> Seq(2L)))) == "{\"k\":[2]}")
  }

  test("toJson integral doubles render without a fraction (JSON ints)") {
    assert(SearchTemplate.render("{{#toJson}}d{{/toJson}}", Map("d" -> 40.0)) == "40")
    assert(SearchTemplate.render("{{#toJson}}d{{/toJson}}", Map("d" -> 2.5)) == "2.5")
  }

  test("missing param without a default is rejected loudly") {
    val e = intercept[IllegalArgumentException](
      SearchTemplate.render("{{nope}}", Map.empty))
    assert(e.getMessage.contains("missing param nope"))
  }

  test("missing toJson param is rejected loudly") {
    val e = intercept[IllegalArgumentException](
      SearchTemplate.render("{{#toJson}}nope{{/toJson}}", Map.empty))
    assert(e.getMessage.contains("missing param nope"))
  }

  test("unknown section helpers and unclosed tags are rejected") {
    assert(intercept[IllegalArgumentException](
      SearchTemplate.render("{{#each}}x{{/each}}", Map.empty))
      .getMessage.contains("unsupported section"))
    assert(intercept[IllegalArgumentException](
      SearchTemplate.render("{{oops", Map("oops" -> 1)))
      .getMessage.contains("unclosed"))
    assert(intercept[IllegalArgumentException](
      SearchTemplate.render("{{/x}}", Map.empty))
      .getMessage.contains("unmatched closing"))
  }

  test("a list param in scalar position is rejected (use toJson)") {
    val e = intercept[IllegalArgumentException](
      SearchTemplate.render("{{xs}}", Map("xs" -> Seq(1, 2))))
    assert(e.getMessage.contains("toJson"))
  }

  test("rendered template is valid JSON end-to-end") {
    val body = SearchTemplate.render(
      """{"query":{"terms":{"f":{{#toJson}}vs{{/toJson}}}},"size":{{n}}{{^n}}5{{/n}}}""",
      Map("vs" -> Seq("a\"b", "c")))
    val parsed = org.json4s.jackson.JsonMethods.parse(body)
    assert((parsed \\ "size") == org.json4s.JInt(5))
  }
}
