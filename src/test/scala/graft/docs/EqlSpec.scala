package graft.docs

import graft.SparkSpec

/** EQL parse guards (the sequence numbers ride the d208 oracle gate). */
class EqlSpec extends SparkSpec {

  private def bad(q: String): String =
    intercept[IllegalArgumentException](Eql.parse(q)).getMessage

  test("rejections: non-sequence queries, step counts, unknown step syntax") {
    assert(bad("""any where event_type == "view"""")
      .contains("unsupported eql query"))
    assert(bad("""sequence by user_id with maxspan=1h [ event where event_type == "view" ]""")
      .contains("2-5 steps"))
    assert(bad("""sequence by user_id with maxspan=1h
      | [ event where event_type == "view" ]
      | [ event where event_type == "click" ] until [ event where event_type == "error" ]""".stripMargin)
      .contains("unsupported eql step syntax"))
  }

  test("maxspan units and step extraction") {
    val sq = Eql.parse(
      """sequence by user_id with maxspan=90m
        | [ event where event_type == "a" ] [ event where event_type == "b" ]""".stripMargin)
    assert(sq.by === "user_id")
    assert(sq.maxspanUs === 90L * 60000000L)
    assert(sq.steps.map(_.value) === Seq("a", "b"))
  }
}
