package graft.docs

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** ES|QL compiler guards + semantics on a tiny in-memory frame (the
  * corpus-scale numbers ride the d210/d211 oracle gates). */
class EsqlSpec extends SparkSpec {

  private lazy val tiny: Map[String, DataFrame] = {
    import spark.implicits._
    Map("t" -> Seq(
      (1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "alkali", 30.0),
      (4L, "beta", 5.5)).toDF("id", "name", "v"))
  }

  private def bad(q: String): String =
    intercept[IllegalArgumentException](Esql.run(tiny, q)).getMessage

  test("rejections are loud and name the reason") {
    assert(bad("""ROW a = 1""").contains("pipe must start with FROM"))
    assert(bad("""FROM missing | LIMIT 1""").contains("unknown index"))
    assert(bad("""FROM t | ENRICH policy""").contains("unsupported command"))
    assert(bad("""FROM t | WHERE name LIKE id""")
      .contains("LIKE needs a string literal pattern"))
    assert(bad("""FROM t | STATS n = MEDIAN(v)""").contains("unsupported agg"))
    assert(bad("""FROM t | STATS n = SUM(*)""").contains("only COUNT(*)"))
    assert(bad("""FROM t | LIMIT 3 extra""").contains("trailing tokens"))
  }

  test("wildcard LIKE: * ? are ES|QL wildcards; literal % _ are escaped") {
    val out = Esql.run(tiny, """FROM t | WHERE name LIKE "al*" | KEEP id | SORT id ASC""")
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L, 3L))
    val one = Esql.run(tiny, """FROM t | WHERE name LIKE "bet?" | KEEP id | SORT id ASC""")
      .collect().map(_.getLong(0)).toSeq
    assert(one === Seq(2L, 4L))
  }

  test("full pipe: WHERE/EVAL/STATS BY/SORT/LIMIT end to end") {
    val rows = Esql.run(tiny,
      """FROM t
        || WHERE v >= 10
        || EVAL v2 = v * 2
        || STATS total = SUM(v2), n = COUNT(*) BY name
        || SORT total DESC
        || LIMIT 2""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ===
      Seq(("alkali", 60.0, 1L), ("beta", 40.0, 1L)))
  }

  test("grand-total STATS without BY; arithmetic precedence and unary minus") {
    val r = Esql.run(tiny,
      """FROM t | EVAL x = -v + 2 * 10 | STATS lo = MIN(x), hi = MAX(x)""")
      .collect().head
    // x = 20 - v: v=30 -> -10 ... v=5.5 -> 14.5
    assert(r.getDouble(0) === -10.0 && r.getDouble(1) === 14.5)
  }
}
