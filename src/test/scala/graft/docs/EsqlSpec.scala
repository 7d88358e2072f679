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
    assert(bad("""SHOW INFO""").contains("pipe must start with FROM"))
    // ROW is a literal source: one local row, the pipe applies normally
    val rowOut = Esql.run(tiny, """ROW a = 5, b = "x" | EVAL c = a * 2""").collect()
    assert(rowOut.length === 1)
    assert(rowOut.head.getLong(0) === 5L && rowOut.head.getString(1) === "x" &&
      rowOut.head.getLong(2) === 10L)
    assert(bad("""FROM missing | LIMIT 1""").contains("unknown index"))
    // the 9.x inference commands reject by NAME with the why (they call a
    // deployed model; this engine has no serving layer)
    assert(bad("""FROM t | RERANK query""").contains("RERANK is not supported"))
    assert(bad("""FROM t | COMPLETION prompt""")
      .contains("COMPLETION is not supported"))
    assert(bad("""FROM t | FORK (WHERE v > 1)""").contains("FORK takes 2-8 branches"))
    assert(bad("""FROM t | LOOKUP JOIN x ON id""").contains("unknown lookup index"))
    assert(bad("""FROM t | ENRICH policy""").contains("unexpected end of input"))
    assert(bad("""FROM t | WHERE name LIKE id""")
      .contains("LIKE needs a string literal pattern"))
    assert(bad("""FROM t | STATS n = MODE(v)""").contains("unsupported agg"))
    assert(bad("""FROM t | STATS n = PERCENTILE(v, name)""")
      .contains("percent must be a numeric literal"))
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

  test("wave-2 rejections: grok types, enrich policies, IN literals, functions") {
    assert(bad("""FROM t | GROK name "%{IP:addr}"""").contains("unsupported grok type"))
    assert(bad("""FROM t | ENRICH pol ON id WITH x""").contains("unknown enrich policy"))
    assert(bad("""FROM t | WHERE id IN (1, v)""").contains("IN list must be literals"))
    // TO_IP graduated to a supported function in r15; TO_VERSION (semver
    // ordering type) remains the named unsupported-function witness
    assert(bad("""FROM t | EVAL x = TO_VERSION(name)""").contains("unsupported function"))
    assert(bad("""FROM t | RENAME nope AS x""").contains("RENAME of unknown column"))
    assert(bad("""FROM t | WHERE id IS TRUE""").contains("expected NULL after IS"))
  }

  test("DISSECT anchors the whole string; GROK matches anywhere") {
    import spark.implicits._
    val logs = Map("lg" -> Seq(
      (1L, "GET /api/users 200"), (2L, "POST /api/orders 503"))
      .toDF("id", "line"))
    val dis = Esql.run(logs,
      """FROM lg | DISSECT line "%{verb} %{path} %{code}"
        || KEEP id, verb, path, code | SORT id ASC""".stripMargin).collect()
    assert(dis.map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq ===
      Seq(("GET", "/api/users", "200"), ("POST", "/api/orders", "503")))
    val grk = Esql.run(logs,
      """FROM lg | GROK line "%{WORD:verb} %{NOTSPACE:path} %{INT:code}"
        || EVAL status = TO_LONG(code) | WHERE status >= 500 | KEEP id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(grk === Seq(2L))
  }

  test("LOOKUP JOIN appends non-key lookup columns via a left join; RLIKE is raw regex") {
    import spark.implicits._
    val lk = Seq((1L, "odd"), (2L, "even")).toDF("id", "parity")
    val out = Esql.run(tiny ++ Map("lk" -> lk),
      """FROM t | LOOKUP JOIN lk ON id | KEEP id, parity | SORT id ASC""")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(out === Seq((1L, Some("odd")), (2L, Some("even")), (3L, None), (4L, None)))
    val rl = Esql.run(tiny,
      """FROM t | WHERE name RLIKE "^al.*i$" | KEEP id""")
      .collect().map(_.getLong(0)).toSeq
    assert(rl === Seq(3L)) // alkali
    val clash = intercept[IllegalArgumentException](Esql.run(
      tiny ++ Map("lk2" -> Seq((1L, "x")).toDF("id", "name")),
      """FROM t | LOOKUP JOIN lk2 ON id""")).getMessage
    assert(clash.contains("would overwrite pipe column"))
    // multi-key form (9.x): composite equi-join, still broadcast-left
    val lk3 = Seq((1L, "alpha", "one-alpha"), (2L, "beta", "two-beta"))
      .toDF("id", "name", "label")
    val multi = Esql.run(tiny ++ Map("lk3" -> lk3),
      """FROM t | LOOKUP JOIN lk3 ON id, name | KEEP id, label | SORT id ASC""")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(multi === Seq((1L, Some("one-alpha")), (2L, Some("two-beta")),
      (3L, None), (4L, None)))
    // duplicate keys reject loudly (a duplicated using-column would emit
    // a duplicate output column and die later with AMBIGUOUS_REFERENCE)
    assert(intercept[IllegalArgumentException](Esql.run(
      tiny ++ Map("lk3" -> lk3),
      """FROM t | LOOKUP JOIN lk3 ON id, id""")).getMessage
      .contains("duplicate LOOKUP JOIN key"))
    // boolean literals work in IN lists too
    import spark.implicits._
    val fl = Map("f" -> Seq((1L, true), (2L, false)).toDF("id", "flag"))
    val inb = Esql.run(fl, """FROM f | WHERE flag IN (TRUE) | KEEP id""")
      .collect().map(_.getLong(0)).toSeq
    assert(inb === Seq(1L))
  }

  test("ENRICH is a left join: unmatched keys keep the row with a null field") {
    import spark.implicits._
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "kname")
    val out = Esql.run(tiny,
      """FROM t | ENRICH names ON id WITH kname | KEEP id, kname | SORT id ASC""",
      enrich = Map("names" -> (dim, "k"))).collect()
    assert(out.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ===
      Seq((1L, Some("one")), (2L, Some("two")), (3L, None), (4L, None)))
  }

  test("MV_EXPAND keeps null arrays as null rows (explode_outer semantics)") {
    import spark.implicits._
    val arr = Map("a" -> Seq(
      (1L, Seq("x", "y")), (2L, Seq.empty[String]), (3L, null))
      .toDF("id", "vs"))
    val out = Esql.run(arr, """FROM a | MV_EXPAND vs | SORT id ASC, vs ASC""")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(out === Seq((1L, Some("x")), (1L, Some("y")), (2L, None), (3L, None)))
  }

  test("string functions: TRIM family, ENDS_WITH, regex REPLACE") {
    import spark.implicits._
    val sdf = Map("s" -> Seq((1L, "  pad  ", "file.txt")).toDF("id", "pad", "fn"))
    val r = Esql.run(sdf,
      """FROM s
        || EVAL t = TRIM(pad), l = LTRIM(pad), rr = RTRIM(pad),
        |       ext = REPLACE(fn, "^.*\\.", ""), istxt = ENDS_WITH(fn, ".txt")
        || KEEP t, l, rr, ext, istxt""".stripMargin).collect().head
    assert(r.getString(0) === "pad" && r.getString(1) === "pad  " &&
      r.getString(2) === "  pad")
    assert(r.getString(3) === "txt" && r.getBoolean(4))
  }

  test("scalar functions, IN, IS NULL compile to the expected values") {
    val r = Esql.run(tiny,
      """FROM t
        || WHERE name IN ("alpha", "beta") AND name IS NOT NULL
        || EVAL u = TO_UPPER(SUBSTRING(name, 1, 2)), ln = LENGTH(name),
        |       r2 = ROUND(v / 3, 1)
        || KEEP id, u, ln, r2 | SORT id ASC""".stripMargin).collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getDouble(3))).toSeq ===
      Seq((1L, "AL", 5, 3.3), (2L, "BE", 4, 6.7), (4L, "BE", 4, 1.8)))
  }

  test("STATS per-agg WHERE and CASE: filtered aggs in one pass, when-chain values") {
    val rows = Esql.run(tiny,
      """FROM t
        || STATS small = COUNT(*) WHERE v < 15, total = SUM(v), n = COUNT(*)
        || EVAL label = CASE(small == n, "all_small", small == 0, "none_small", "mixed")""".stripMargin)
      .collect().head
    assert(rows.getLong(0) === 2L) // 10.0 and 5.5
    assert(rows.getDouble(1) === 65.5 && rows.getLong(2) === 4L)
    assert(rows.getString(3) === "mixed")
    // CASE without default -> null
    val nul = Esql.run(tiny,
      """FROM t | EVAL z = CASE(v > 1000, "big") | KEEP z | LIMIT 1""")
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("r15 aggs honor the per-agg WHERE filter: FIRST/LAST ignore " +
      "filtered-out rows; PERCENTILE_RANK ranks within the filtered set") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "c", 30L, 3L),
      (2L, "x", 5L, 1L), (2L, "y", 50L, 2L)).toDF("g", "s", "v", "ord"))
    val r = Esql.run(docs,
      """FROM d
        || STATS f = FIRST(s, ord) WHERE v >= 20, l = LAST(s, ord),
        |        pr = PERCENTILE_RANK(v, 10) WHERE v <= 30,
        |        sk = SKEWNESS(v) BY g
        || KEEP g, f, l, pr, sk
        || SORT g""".stripMargin).collect()
    // g=1: FIRST over v>=20 rows = b (ord 2); LAST unfiltered = c
    assert(r(0).getString(1) === "b" && r(0).getString(2) === "c")
    // pr: within v<=30 for g=1 -> {10,20,30}, share <=10 is 1/3
    assert(math.abs(r(0).getDouble(3) - 100.0 / 3.0) < 1e-12)
    // g=2: FIRST over v>=20 = y; LAST = y (ord 2)
    assert(r(1).getString(1) === "y" && r(1).getString(2) === "y")
  }

  test("INLINESTATS appends window aggregates: no row reduction, BY partitions") {
    val rows = Esql.run(tiny,
      """FROM t
        || INLINESTATS total = SUM(v), grp_n = COUNT(*) BY name
        || EVAL share = v / total
        || SORT id ASC""".stripMargin).collect()
    assert(rows.length === 4) // every row kept
    val byId = rows.map(r => r.getLong(0) ->
      (r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    assert(byId(2L) === ((25.5, 2L, 20.0 / 25.5))) // beta: 20 + 5.5
    assert(byId(4L) === ((25.5, 2L, 5.5 / 25.5)))
    assert(byId(1L) === ((10.0, 1L, 1.0)))
    // global window when BY is absent
    val g = Esql.run(tiny,
      """FROM t | INLINESTATS all_n = COUNT(*) | KEEP id, all_n | SORT id ASC""")
      .collect()
    assert(g.forall(_.getLong(1) === 4L))
  }

  test("multi-index FROM unions by name with null fill; METADATA _index stamps origin") {
    import spark.implicits._
    val a = Seq((1L, "x", 9.0)).toDF("id", "name", "v")
    val b = Seq((2L, "y")).toDF("id", "name") // no v column
    val out = Esql.run(Map("ia" -> a, "ib" -> b),
      """FROM ia,ib METADATA _index | KEEP id, v, _index | SORT id ASC""")
      .collect().map(r => (r.getLong(0), Option(if (r.isNullAt(1)) null else r.getDouble(1)),
        r.getString(2))).toSeq
    assert(out === Seq((1L, Some(9.0), "ia"), (2L, None, "ib")))
    // without METADATA there is no _index column
    val cols = Esql.run(Map("ia" -> a, "ib" -> b), """FROM ia,ib | LIMIT 1""").columns
    assert(!cols.contains("_index"))
  }

  test("METADATA _score: matched-term counts accumulate over scoring WHEREs") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, "vector windows are wide"),   // both terms → 2
      (2L, "a vector of things"),        // one term → 1
      (3L, "nothing relevant here"))     // filtered out
      .toDF("id", "txt"))
    val out = Esql.run(docs,
      """FROM d METADATA _score
        || WHERE MATCH(txt, "vector windows")
        || SORT _score DESC, id ASC
        || KEEP id, _score""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 2L), (2L, 1L)))
    // no full-text function → score stays 0; _score filters like a column
    val zero = Esql.run(docs,
      """FROM d METADATA _score | WHERE id < 3 | WHERE _score == 0
        || KEEP id, _score | SORT id ASC""".stripMargin).collect()
    assert(zero.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // unknown metadata still rejects
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      "FROM d METADATA _version | LIMIT 1")).getMessage.contains("_version"))
    // NEGATED full-text contributes NOTHING: a doc must not rank higher
    // for containing the negated term (ES must_not scores 0)
    val neg = Esql.run(docs,
      """FROM d METADATA _score
        || WHERE MATCH(txt, "vector") OR NOT MATCH(txt, "windows")
        || KEEP id, _score | SORT id ASC""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1 has both terms: only the positive MATCH scores (1, not 2)
    assert(neg === Seq((1L, 1L), (2L, 1L), (3L, 0L)))
    // QSTR and MATCH_PHRASE score 1 point per satisfied clause
    val fts = Esql.run(docs,
      """FROM d METADATA _score
        || WHERE QSTR("txt:vector") AND MATCH_PHRASE(txt, "vector windows")
        || KEEP id, _score | SORT id ASC""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fts === Seq((1L, 2L))) // both clauses hit on doc 1 only
  }

  test("INLINESTATS COUNT_DISTINCT via collect_set; MV_ZIP nulls unequal lengths;" +
    " DATE_DIFF truncates toward zero") {
    import spark.implicits._
    // the r12 named reject, now implemented: exact per-partition distinct
    // count (size(collect_set)) appended to every row — tiny has names
    // alpha/beta/alkali with 1/2/1 rows, 1 distinct name per name group
    val cd = Esql.run(tiny,
      "FROM t | INLINESTATS u = COUNT_DISTINCT(name) BY name | SORT id ASC")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("u"))).toSeq
    assert(cd === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
    // global window (no BY): 3 distinct names over all rows
    val cdAll = Esql.run(tiny,
      "FROM t | INLINESTATS u = COUNT_DISTINCT(name) | KEEP id, u | SORT id ASC")
      .collect().map(_.getLong(1)).toSeq
    assert(cdAll === Seq(3L, 3L, 3L, 3L))
    val mv = Map("m" -> Seq((1L, Seq("a", "b"), Seq("x"))).toDF("id", "l", "r"))
    val z = Esql.run(mv,
      """FROM m | EVAL zz = MV_ZIP(l, r, "-") | KEEP zz""").collect().head
    assert(z.isNullAt(0)) // unequal lengths → null, never half-pairs
    // -1.5 days truncates to -1 (floor would give -2)
    val base = 1700000000000000L
    val neg = Map("ts" -> Seq((1L, base, base - 129600L * 1000000L))
      .toDF("id", "t0", "t1"))
    val dd = Esql.run(neg,
      """FROM ts | EVAL d = DATE_DIFF("days", t0, t1) | KEEP d""")
      .collect().head.getLong(0)
    assert(dd === -1L)
  }

  test("QSTR compiles the query-string grammar; MATCH_PHRASE needs adjacency") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, "en", "wide vector windows"),
      (2L, "en", "windows vector"),      // phrase terms out of order
      (3L, "de", "wide vector windows"), // lang excluded by qstr
      (4L, "en", "nothing here"))
      .toDF("id", "lang", "txt"))
    val qs = Esql.run(docs,
      """FROM d | WHERE QSTR("lang:en AND (txt:vector OR txt:nothing)")
        || KEEP id | SORT id ASC""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(qs === Seq(1L, 2L, 4L))
    val ph = Esql.run(docs,
      """FROM d | WHERE MATCH_PHRASE(txt, "vector windows")
        || KEEP id | SORT id ASC""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(ph === Seq(1L, 3L)) // in-order adjacency only — never doc 2
    // KQL rejects loudly with a pointer to QSTR
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      """FROM d | WHERE KQL("lang:en")""")).getMessage.contains("QSTR"))
    // QSTR prefix leaf: txt:wide* matches raw-prefix docs
    val pre = Esql.run(docs,
      """FROM d | WHERE QSTR("txt:wide*") | KEEP id | SORT id ASC""")
      .collect().map(_.getLong(0)).toSeq
    assert(pre === Seq(1L, 3L))
  }

  test("SORT nulls: ES|QL default is nulls-last ASC / nulls-first DESC; NULLS overrides") {
    import spark.implicits._
    val n = Map("nn" -> Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)))
      .toDF("id", "x"))
    def ids(q: String) = Esql.run(n, q).collect().map(_.getLong(0)).toSeq
    assert(ids("""FROM nn | SORT x ASC | KEEP id""") === Seq(3L, 1L, 2L))
    assert(ids("""FROM nn | SORT x DESC | KEEP id""") === Seq(2L, 1L, 3L))
    assert(ids("""FROM nn | SORT x ASC NULLS FIRST | KEEP id""") === Seq(2L, 3L, 1L))
    assert(ids("""FROM nn | SORT x DESC NULLS LAST | KEEP id""") === Seq(1L, 3L, 2L))
  }

  test("KEEP/DROP accept wildcard patterns; pattern order defines column order") {
    import spark.implicits._
    val wide = Map("w" -> Seq((1L, 2L, "a", "b", 3.0))
      .toDF("id", "id_aux", "name_first", "name_last", "score"))
    val kept = Esql.run(wide, """FROM w | KEEP score, id* | LIMIT 1""").columns.toSeq
    assert(kept === Seq("score", "id", "id_aux"))
    val dropped = Esql.run(wide, """FROM w | DROP name* | LIMIT 1""").columns.toSeq
    assert(dropped === Seq("id", "id_aux", "score"))
    assert(bad("""FROM t | KEEP nope""").contains("unknown column"))
  }

  test("grand-total STATS without BY; arithmetic precedence and unary minus") {
    val r = Esql.run(tiny,
      """FROM t | EVAL x = -v + 2 * 10 | STATS lo = MIN(x), hi = MAX(x)""")
      .collect().head
    // x = 20 - v: v=30 -> -10 ... v=5.5 -> 14.5
    assert(r.getDouble(0) === -10.0 && r.getDouble(1) === 14.5)
  }

  test("wave-3 math: libm family pinned JVM-side; FLOOR/CEIL return double") {
    val r = Esql.run(tiny,
      """FROM t | WHERE id == 3
        || EVAL p = POW(v, 2), s = SQRT(v * 3 - 54), cb = CBRT(27.0),
        |       ln = LOG(v), lb = LOG(2, 8.0), lt = LOG10(1000.0),
        |       ex = EXP(0.0), f = FLOOR(v / 7), ce = CEIL(v / 7),
        |       sg = SIGNUM(10 - v), tau = TAU() / PI(), eu = E()
        || KEEP p, s, cb, ln, lb, lt, ex, f, ce, sg, tau, eu""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 900.0 && r.getDouble(1) === 6.0)
    assert(r.getDouble(2) === 3.0 && r.getDouble(3) === math.log(30.0))
    assert(r.getDouble(4) === 3.0 && r.getDouble(5) === 3.0)
    assert(r.getDouble(6) === 1.0)
    assert(r.getDouble(7) === 4.0 && r.getDouble(8) === 5.0)
    assert(r.getDouble(9) === -1.0)
    assert(r.getDouble(10) === 2.0 && r.getDouble(11) === math.E)
  }

  test("wave-3 strings: LEFT/RIGHT/REVERSE/REPEAT/LOCATE/lengths/hashes") {
    val r = Esql.run(tiny,
      """FROM t | WHERE id == 1
        || EVAL l3 = LEFT(name, 3), r3 = RIGHT(name, 3), rv = REVERSE(name),
        |       rp = REPEAT(name, 2), loc = LOCATE(name, "pha"), miss = LOCATE(name, "zz"),
        |       sp = CONCAT("a", SPACE(2), "b"), bits = BIT_LENGTH(name),
        |       bytes = BYTE_LENGTH(name), h = MD5(name), idc = TO_STRING(id)
        || KEEP l3, r3, rv, rp, loc, miss, sp, bits, bytes, h, idc""".stripMargin)
      .collect().head
    assert(r.getString(0) === "alp" && r.getString(1) === "pha")
    assert(r.getString(2) === "ahpla" && r.getString(3) === "alphaalpha")
    assert(r.getLong(4) === 3L && r.getLong(5) === 0L)
    assert(r.getString(6) === "a  b")
    assert(r.getLong(7) === 40L && r.getLong(8) === 5L)
    assert(r.getString(9) === "2c1743a391305fbf367df8e4f069f9f9") // md5("alpha")
    assert(r.getString(10) === "1")
  }

  test("wave-3 dates: DATE_EXTRACT ISO day_of_week, DATE_FORMAT, DATE_DIFF trunc") {
    import spark.implicits._
    // 2024-03-04 is a Monday; micros timeline
    val base = java.time.Instant.parse("2024-03-04T10:30:00Z").toEpochMilli * 1000L
    val later = base + (50L * 3600L + 30L * 60L) * 1000000L // +50h30m
    val dd = Map("ts" -> Seq((1L, base, later)).toDF("id", "t0", "t1"))
    val r = Esql.run(dd,
      """FROM ts
        || EVAL yy = DATE_EXTRACT("year", t0), mm = DATE_EXTRACT("month_of_year", t0),
        |       dow = DATE_EXTRACT("day_of_week", t0), hh = DATE_EXTRACT("hour_of_day", t0),
        |       fmt = DATE_FORMAT("yyyy-MM-dd HH:mm", t0),
        |       dh = DATE_DIFF("hours", t0, t1), ddays = DATE_DIFF("days", t0, t1)
        || KEEP yy, mm, dow, hh, fmt, dh, ddays""".stripMargin).collect().head
    assert(r.getLong(0) === 2024L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 1L) // ISO Monday = 1
    assert(r.getLong(3) === 10L)
    assert(r.getString(4) === "2024-03-04 10:30")
    assert(r.getLong(5) === 50L && r.getLong(6) === 2L) // whole units, toward zero
  }

  test("wave-3 MV functions: folds, median, dedupe/sort/slice/concat/append/zip") {
    import spark.implicits._
    val mv = Map("m" -> Seq(
      (1L, Seq(3.0, 1.0, 2.0, 10.0), Seq("b", "a", "b")),
      (2L, Seq(5.0, 1.0, 4.0), Seq("z", "z")))
      .toDF("id", "nums", "tags"))
    val r = Esql.run(mv,
      """FROM m
        || EVAL s = MV_SUM(nums), a = MV_AVG(nums), med = MV_MEDIAN(nums),
        |       uniq = MV_CONCAT(MV_DEDUPE(tags), "|"),
        |       back = MV_CONCAT(MV_SORT(nums, "DESC"), "|"),
        |       mid = MV_CONCAT(MV_SLICE(nums, 1, 2), "|"),
        |       app = MV_CONCAT(MV_APPEND(tags, tags), "|"),
        |       zip = MV_CONCAT(MV_ZIP(tags, tags, "-"), "|")
        || KEEP id, s, a, med, uniq, back, mid, app, zip | SORT id ASC""".stripMargin)
      .collect()
    val r1 = r(0)
    assert(r1.getDouble(1) === 16.0 && r1.getDouble(2) === 4.0)
    assert(r1.getDouble(3) === 2.5) // even count: (2+3)/2
    assert(r1.getString(4) === "a|b")
    assert(r1.getString(5) === "10.0|3.0|2.0|1.0")
    assert(r1.getString(6) === "1.0|2.0")
    assert(r1.getString(7) === "b|a|b|b|a|b")
    assert(r1.getString(8) === "b-b|a-a|b-b")
    val r2 = r(1)
    assert(r2.getDouble(3) === 4.0) // odd count: middle element
    assert(r2.getString(4) === "z")
  }

  test("FORK branches recurse from the fork point; union by name with _fork stamp") {
    val rows = Esql.run(tiny,
      """FROM t
        || WHERE v >= 10
        || FORK (WHERE name LIKE "al*" | EVAL flag = 1)
        |       (STATS total = SUM(v) | EVAL big = total > 50)
        || SORT _fork ASC, id ASC NULLS LAST""".stripMargin).collect()
    // branch 1: alpha(10), alkali(30) keep their rows; branch 2: one agg row
    assert(rows.length === 3)
    val fk = rows.map(r => r.getAs[String]("_fork")).toSeq
    assert(fk === Seq("fork1", "fork1", "fork2"))
    assert(rows(0).getAs[Long]("id") === 1L && rows(1).getAs[Long]("id") === 3L)
    assert(rows(0).getAs[Long]("flag") === 1L)
    assert(rows(2).isNullAt(rows(2).fieldIndex("id"))) // agg branch: no id column value
    assert(rows(2).getAs[Double]("total") === 60.0 && rows(2).getAs[Boolean]("big"))
    // pipe continues after FORK over the union
    val n = Esql.run(tiny,
      """FROM t | FORK (WHERE v > 25) (WHERE v < 6) | STATS n = COUNT(*)""")
      .collect().head.getLong(0)
    assert(n === 2L)
  }

  test("CHANGE_POINT flags the CUSUM argmax row; AS renames the output columns") {
    import spark.implicits._
    // flat at 10 for keys 1-5, steps to 50 for keys 6-10 → CP at key 6
    val series = Map("s" -> (1 to 10).map(k =>
      (k.toLong, if (k <= 5) 10.0 else 50.0)).toDF("k", "v"))
    val rows = Esql.run(series,
      """FROM s | CHANGE_POINT v ON k | SORT k ASC""").collect()
    assert(rows.length === 10)
    val hit = rows.filter(!_.isNullAt(2))
    assert(hit.length === 1)
    assert(hit.head.getLong(0) === 6L)
    assert(hit.head.getString(3) === "step_change")
    val renamed = Esql.run(series,
      """FROM s | CHANGE_POINT v ON k AS cp_kind, cp_stat | WHERE cp_kind IS NOT NULL""")
    assert(renamed.columns.contains("cp_kind") && renamed.columns.contains("cp_stat"))
    assert(renamed.collect().map(_.getAs[Long]("k")).toSeq === Seq(6L))
  }

  test("wave-3 aggs: STD_DEV exact-sums, TOP bounded slice, VALUES sorted, WEIGHTED_AVG") {
    import spark.implicits._
    val g = Map("g" -> Seq(
      ("a", 1L, 2L), ("a", 3L, 1L), ("a", 5L, 1L), ("b", 4L, 3L))
      .toDF("k", "x", "w"))
    val rows = Esql.run(g,
      """FROM g
        || STATS sd = STD_DEV(x), top2 = TOP(x, 2, "DESC"), vs = VALUES(x),
        |        wa = WEIGHTED_AVG(x, w) BY k
        || EVAL top2 = MV_CONCAT(top2, ","), vs = MV_CONCAT(vs, ",")
        || SORT k ASC""".stripMargin).collect()
    val a = rows(0)
    // population sigma of {1,3,5} = sqrt(8/3 eh: mean 3, var (4+0+4)/3)
    assert(math.abs(a.getDouble(1) - math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(a.getString(2) === "5,3")
    assert(a.getString(3) === "1,3,5")
    assert(a.getDouble(4) === (1.0 * 2 + 3 + 5) / 4.0) // 10/4
    val b = rows(1)
    assert(b.getDouble(1) === 0.0 && b.getString(2) === "4" && b.getDouble(4) === 4.0)
  }

  test("TS + RATE: positive deltas per second, counter resets, single-point null") {
    import spark.implicits._
    // series A: 0→10→4 (reset: +10, then +4) over 2s → (10+4)/2 = 7/s
    // series B: 5→8 over 1s → 3/s; series C: one point → null rate
    val ts = Map("m" -> Seq(
      ("A", 0L, 0.0), ("A", 1000000L, 10.0), ("A", 2000000L, 4.0),
      ("B", 0L, 5.0), ("B", 1000000L, 8.0),
      ("C", 0L, 99.0)).toDF("host", "ts_us", "ctr"))
    val rows = Esql.run(ts,
      """TS m ON host
        || STATS peak = MAX(RATE(ctr)), low = MIN(RATE(ctr)),
        |    n = COUNT(RATE(ctr))""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows(0).getDouble(0) === 7.0)
    assert(rows(0).getDouble(1) === 3.0)
    assert(rows(0).getLong(2) === 2L) // C's single point drops out
  }

  test("TS/RATE rejections: RATE outside TS, bad outer agg, INLINESTATS, mixing") {
    import spark.implicits._
    val ts = Map("m" -> Seq(("A", 0L, 1.0)).toDF("host", "ts_us", "ctr"))
    assert(intercept[IllegalArgumentException](Esql.run(ts,
      "FROM m | STATS x = MAX(RATE(ctr))")).getMessage
      .contains("only valid in a TS pipe"))
    assert(intercept[IllegalArgumentException](Esql.run(ts,
      "TS m ON host | STATS x = SUM(RATE(ctr))")).getMessage
      .contains("MAX/MIN/COUNT"))
    assert(intercept[IllegalArgumentException](Esql.run(ts,
      "TS m ON host | INLINESTATS x = MAX(RATE(ctr))")).getMessage
      .contains("INLINESTATS"))
    assert(intercept[IllegalArgumentException](Esql.run(ts,
      "TS m ON host | STATS x = MAX(RATE(ctr)), y = COUNT(*)")).getMessage
      .contains("mixes RATE"))
    assert(intercept[IllegalArgumentException](Esql.run(ts,
      "TS nope ON host | LIMIT 1")).getMessage.contains("unknown index"))
    // TS requires the epoch-micros timeline column
    val noTs = Map("m" -> Seq(("A", 1.0)).toDF("host", "ctr"))
    assert(intercept[IllegalArgumentException](Esql.run(noTs,
      "TS m ON host | LIMIT 1")).getMessage.contains("ts_us"))
  }

  test("CATEGORIZE masks hex before digits; DATE_PARSE round-trips and nulls bad input") {
    import spark.implicits._
    val logs = Map("lg" -> Seq(
      (1L, "err 0xdead12 at port 8080"), (2L, "err 0xbeef at port 9090"),
      (3L, "ok started"), (4L, "2024-02-29"), (5L, "not a date"))
      .toDF("id", "msg"))
    val cats = Esql.run(logs,
      """FROM lg | STATS n = COUNT(*) BY cat = CATEGORIZE(msg) | SORT n DESC, cat ASC""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cats.head === ("err <hex> at port <n>", 2L))
    // DATE_PARSE: leap-day round-trip; unparseable → null
    val parsed = Esql.run(logs,
      """FROM lg | WHERE id >= 4 | EVAL us = DATE_PARSE("yyyy-MM-dd", msg) | KEEP id, us | SORT id""")
      .collect()
    assert(parsed(0).getLong(1) === 1709164800000000L) // 2024-02-29T00:00Z
    assert(parsed(1).isNullAt(1))
  }

  test("SAMPLE: md5-threshold inclusion is exact and stable; bounds enforced") {
    import spark.implicits._
    val ids = (1L to 200L)
    val frame = Map("t" -> ids.map(i => (i, i % 7)).toDF("id", "g"))
    val got = Esql.run(frame, "FROM t | SAMPLE 0.25 ON id | KEEP id")
      .collect().map(_.getLong(0)).toSet
    // independent recomputation of the contract: first 8 md5 hex chars
    // below 0x40000000
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = ids.filter { i =>
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      hex < f"${(0.25 * 4294967296.0).toLong}%08x"
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < ids.size)
    assert(intercept[IllegalArgumentException](Esql.run(frame,
      "FROM t | SAMPLE 1.5 ON id")).getMessage.contains("in (0,1)"))
    assert(intercept[IllegalArgumentException](Esql.run(frame,
      "FROM t | SAMPLE 0.5")).getMessage.contains("unexpected end of input"))
  }

  test("FUSE merges FORK branches by key: RRF ranks, LINEAR sums, first-seen rows") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, "the running shoes are fast"), (2L, "slow boats"),
      (3L, "shoe polish")).toDF("id", "body"))
    // branch 1 "shoes fast": doc1 score 2, doc3 score 1 → ranks 1, 2
    // branch 2 "polish":     doc3 score 1            → rank 1
    val rrf = Esql.run(docs,
      """FROM d METADATA _score
        || FORK (WHERE MATCH(body, "shoes fast")) (WHERE MATCH(body, "polish"))
        || FUSE KEY BY id
        || SORT _score DESC, id ASC""".stripMargin).collect()
    assert(rrf.map(_.getAs[Long]("id")).toSeq === Seq(3L, 1L))
    val s3 = rrf(0).getAs[Double]("_score")
    val s1 = rrf(1).getAs[Double]("_score")
    assert(math.abs(s3 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(s1 - 1.0 / 61) < 1e-12)
    // doc3 appears in both branches; the merged row keeps the FIRST
    // branch's _fork stamp and column values
    assert(rrf(0).getAs[String]("_fork") === "fork1")
    assert(rrf(0).getAs[String]("body") === "shoe polish")
    // LINEAR sums the branch scores: doc1 = 2, doc3 = 1 + 1 = 2 (tie →
    // id ASC); explicit RRF keyword parses too
    val lin = Esql.run(docs,
      """FROM d METADATA _score
        || FORK (WHERE MATCH(body, "shoes fast")) (WHERE MATCH(body, "polish"))
        || FUSE LINEAR KEY BY id
        || SORT _score DESC, id ASC""".stripMargin).collect()
    assert(lin.map(_.getAs[Long]("id")).toSeq === Seq(1L, 3L))
    assert(lin.map(_.getAs[Double]("_score")).toSeq === Seq(2.0, 2.0))
    assert(Esql.run(docs,
      """FROM d METADATA _score
        || FORK (WHERE MATCH(body, "shoes")) (WHERE MATCH(body, "boats"))
        || FUSE RRF KEY BY id""".stripMargin).count() === 3L)
    // a branch whose projection dropped the key (unionByName back-fills
    // null) must NOT collapse into one fused group: null-keyed rows pass
    // through unfused, one row each
    val nullKey = Esql.run(docs,
      """FROM d METADATA _score
        || FORK (WHERE MATCH(body, "shoes")) (WHERE MATCH(body, "boats") | KEEP body, _score)
        || FUSE KEY BY id""".stripMargin).collect()
    assert(nullKey.length === 3) // ids 1, 3 fused normally + 1 null-key row
    assert(nullKey.count(_.isNullAt(nullKey.head.fieldIndex("id"))) === 1)
    // guards: FUSE before FORK (no _fork), default key absent, bad option
    def bad2(q: String): String =
      intercept[IllegalArgumentException](Esql.run(docs, q)).getMessage
    assert(bad2("""FROM d METADATA _score | FUSE KEY BY id""")
      .contains("FUSE needs the _fork"))
    assert(bad2("""FROM d METADATA _score
                  || FORK (WHERE id > 0) (WHERE id > 1)
                  || FUSE""".stripMargin).contains("FUSE needs the _id"))
    assert(bad2("""FROM d METADATA _score
                  || FORK (WHERE id > 0) (WHERE id > 1)
                  || FUSE WITH retriever""".stripMargin)
      .contains("FUSE option"))
  }

  test("MATCH analyzes both sides; OR semantics; all-stopword query matches nothing") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, "the running shoes are fast"), (2L, "slow boats"),
      (3L, "shoe polish")).toDF("id", "body"))
    // "runs" stems to "run" = analyzed "running"? no — s-stemmer: running
    // stays "running", runs → "run". Use terms that stem-align: "shoes"
    // → "shoe" matches doc 1 ("shoes"→"shoe") and doc 3 ("shoe").
    val hit = Esql.run(docs, """FROM d | WHERE MATCH(body, "shoes") | SORT id""")
      .collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(1L, 3L))
    // OR of terms: "boats polish" matches docs 2 and 3
    val or = Esql.run(docs, """FROM d | WHERE MATCH(body, "boats polish") | SORT id""")
      .collect().map(_.getLong(0)).toSeq
    assert(or === Seq(2L, 3L))
    // all-stopword query matches nothing (the ES contract)
    assert(Esql.run(docs, """FROM d | WHERE MATCH(body, "the and of")""")
      .collect().isEmpty)
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      "FROM d | WHERE MATCH(body, id)")).getMessage
      .contains("string literal"))
  }

  test("HASH dispatches on a literal algorithm; base64 round-trips") {
    import spark.implicits._
    val docs = Map("d" -> Seq((1L, "abc")).toDF("id", "s"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL h1 = HASH("sha256", s), h2 = SHA256(s), h3 = HASH("md5", s),
        |       b = TO_BASE64(s), rt = FROM_BASE64(TO_BASE64(s))
        || KEEP h1, h2, h3, b, rt""".stripMargin).collect().head
    assert(r.getString(0) === r.getString(1)) // HASH("sha256") == SHA256
    assert(r.getString(2) === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(r.getString(3) === "YWJj") // base64("abc")
    assert(r.getString(4) === "abc") // round-trip
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      """FROM d | EVAL h = HASH("crc32", s)""")).getMessage
      .contains("HASH algorithm crc32"))
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      """FROM d | EVAL h = HASH(s, s)""")).getMessage
      .contains("string literal"))
  }

  test("TO_DATETIME: ISO strings, epoch-millis literals, null on junk") {
    import spark.implicits._
    val docs = Map("d" -> Seq((1L, "2026-03-01T06:30:00"), (2L, "junk"))
      .toDF("id", "s"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL a = TO_DATETIME("2026-03-01"), b = TO_DATETIME(s),
        |       m = TO_DATETIME(1767225600000)
        || KEEP id, a, b, m
        || SORT id""".stripMargin).collect()
    val mar1 = java.time.Instant.parse("2026-03-01T00:00:00Z")
      .toEpochMilli * 1000L
    assert(r(0).getLong(1) === mar1)
    assert(r(0).getLong(2) === mar1 + (6 * 3600 + 30 * 60) * 1000000L)
    assert(r(0).getLong(3) === 1767225600000L * 1000L) // millis -> micros
    assert(r(1).isNullAt(2)) // junk -> null, the TO_* contract
  }

  test("TO_DATETIME on a numeric COLUMN is epoch millis (ADVICE r14: was " +
      "an all-null string parse)") {
    import spark.implicits._
    val docs = Map("d" -> Seq((1L, 1767225600000L), (2L, 0L))
      .toDF("id", "ms"))
    val r = Esql.run(docs,
      "FROM d | EVAL t = TO_DATETIME(ms) | KEEP id, t | SORT id").collect()
    assert(r(0).getLong(1) === 1767225600000L * 1000L)
    assert(r(1).getLong(1) === 0L)
  }

  test("MV_PERCENTILE: linear interpolation, endpoints, empty → null") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(10.0)),
      (3L, Seq.empty[Double])).toDF("id", "v"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL p50 = MV_PERCENTILE(v, 50), p100 = MV_PERCENTILE(v, 100),
        |       p25 = MV_PERCENTILE(v, 25)
        || KEEP id, p50, p100, p25
        || SORT id""".stripMargin).collect()
    assert(r(0).getDouble(1) === 2.5)  // (n-1)*.5 = 1.5 → 2 + .5*(3-2)
    assert(r(0).getDouble(2) === 4.0)  // p100 = last element, frac 0
    assert(r(0).getDouble(3) === 1.75) // rank .75 → 1 + .75*(2-1)
    assert(r(1).getDouble(1) === 10.0) // single element, any p
    assert(r(2).isNullAt(1))           // empty multivalue → null
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      "FROM d | EVAL x = MV_PERCENTILE(v, id)")).getMessage
      .contains("numeric literal"))
  }

  test("TO_IP validates canonical IPv4 (v6/leading-zero/junk → null); " +
      "IP_PREFIX masks with a constant; bad prefix length rejects") {
    import spark.implicits._
    val docs = Map("d" -> Seq(
      (1L, "10.20.30.40"), (2L, "256.1.1.1"), (3L, "01.2.3.4"),
      (4L, "fe80::1"), (5L, "1.2.3"), (6L, "192.168.255.7"))
      .toDF("id", "ip"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL v = TO_IP(ip), n24 = IP_PREFIX(ip, 24, 64),
        |       n12 = IP_PREFIX(ip, 12, 64), n0 = IP_PREFIX(ip, 0, 0)
        || KEEP id, v, n24, n12, n0
        || SORT id""".stripMargin).collect()
    assert(r(0).getString(1) === "10.20.30.40")
    assert(r(0).getString(2) === "10.20.30.0")
    assert(r(0).getString(3) === "10.16.0.0")   // /12 mask
    assert(r(0).getString(4) === "0.0.0.0")
    assert((1 to 4).forall(i => r(i).isNullAt(1) && r(i).isNullAt(2)))
    assert(r(5).getString(2) === "192.168.255.0")
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      "FROM d | EVAL x = IP_PREFIX(ip, 40, 64)")).getMessage
      .contains("prefix length"))
  }

  test("DATE_DIFF widened fixed units (weeks/ms/mcs); calendar units are " +
      "named rejects") {
    import spark.implicits._
    val docs = Map("d" -> Seq((1L, 0L, 15L * 86400L * 1000000L))
      .toDF("id", "a", "b"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL w = DATE_DIFF("weeks", a, b), ms = DATE_DIFF("ms", a, b),
        |       us = DATE_DIFF("mcs", a, b)
        || KEEP id, w, ms, us""".stripMargin).collect()(0)
    assert(r.getLong(1) === 2L) // 15 days = 2 whole weeks
    assert(r.getLong(2) === 15L * 86400L * 1000L)
    assert(r.getLong(3) === 15L * 86400L * 1000000L)
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      """FROM d | EVAL x = DATE_DIFF("months", a, b)""")).getMessage
      .contains("day-of-month-rule"))
  }

  test("DATE_ADD: exact micros for fixed units; calendar month/year clamp " +
      "day-of-month (Jan 31 + 1 month = Feb 28); bad unit rejects") {
    import spark.implicits._
    def us(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    val docs = Map("d" -> Seq((1L, us("2026-01-31T10:00:00Z")))
      .toDF("id", "ts"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL d1 = DATE_ADD("day", 1, ts), h2 = DATE_ADD("hh", -2, ts),
        |       m1 = DATE_ADD("month", 1, ts), y1 = DATE_ADD("years", 1, ts),
        |       q1 = DATE_ADD("quarter", 1, ts), w1 = DATE_ADD("week", 2, ts)
        || KEEP id, d1, h2, m1, y1, q1, w1""".stripMargin).collect()(0)
    assert(r.getLong(1) === us("2026-02-01T10:00:00Z"))
    assert(r.getLong(2) === us("2026-01-31T08:00:00Z"))
    assert(r.getLong(3) === us("2026-02-28T10:00:00Z")) // clamped
    assert(r.getLong(4) === us("2027-01-31T10:00:00Z"))
    assert(r.getLong(5) === us("2026-04-30T10:00:00Z")) // Apr 31 clamps
    assert(r.getLong(6) === us("2026-02-14T10:00:00Z"))
    assert(intercept[IllegalArgumentException](Esql.run(docs,
      """FROM d | EVAL x = DATE_ADD("fortnight", 1, ts)""")).getMessage
      .contains("DATE_ADD unit"))
  }

  test("wave 3: TO_TIMEDURATION/TO_DATEPERIOD arithmetic lowers onto " +
      "DATE_ADD; ROUND_TO buckets; loud rejects (KNN, standalone " +
      "duration, bad unit, non-literal points)") {
    import spark.implicits._
    def us(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    val docs = Map("d" -> Seq((1L, us("2026-01-31T10:00:00Z"), 73.0))
      .toDF("id", "ts", "v"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL p = ts + TO_TIMEDURATION("90 minutes"),
        |       m = ts - TO_TIMEDURATION("500 ms"),
        |       mo = ts + TO_DATEPERIOD("1 month"),
        |       com = TO_DATEPERIOD("2 weeks") + ts,
        |       rt = ROUND_TO(v, 0, 50, 100),
        |       rtd = ROUND_TO(v, 0.5, 80.25)
        || KEEP id, p, m, mo, com, rt, rtd""".stripMargin).collect()(0)
    assert(r.getLong(1) === us("2026-01-31T11:30:00Z"))
    assert(r.getLong(2) === us("2026-01-31T10:00:00Z") - 500000L)
    assert(r.getLong(3) === us("2026-02-28T10:00:00Z")) // calendar clamp
    assert(r.getLong(4) === us("2026-02-14T10:00:00Z")) // commuted +
    assert(r.getLong(5) === 50L)     // all-long points → long
    assert(r.getDouble(6) === 0.5)   // mixed/double points → double
    // null input → null (not the smallest point), and below-all → smallest
    val docs2 = Map("d" -> Seq((1L, Option.empty[Double]),
      (2L, Option(-3.0))).toDF("id", "v"))
    val r2 = Esql.run(docs2,
      """FROM d | EVAL rt = ROUND_TO(v, 0, 50) | KEEP id, rt | SORT id ASC""")
      .collect()
    assert(r2(0).isNullAt(1))
    assert(r2(1).getLong(1) === 0L)
    // rejects, each with the why
    def msg(q: String): String =
      intercept[IllegalArgumentException](Esql.run(docs, q)).getMessage
    assert(msg("""FROM d | EVAL x = TO_TIMEDURATION("1 hour")""")
      .contains("only meaningful in datetime arithmetic"))
    assert(msg("""FROM d | EVAL x = ts + TO_TIMEDURATION("1 month")""")
      .contains("not a fixed-width time unit"))
    assert(msg("""FROM d | EVAL x = ts + TO_DATEPERIOD("5 minutes")""")
      .contains("not a calendar unit"))
    assert(msg("""FROM d | EVAL x = ts + TO_DATEPERIOD("soon")""")
      .contains("cannot parse"))
    // r18: KNN is served from the standing IVF index when annDir names
    // one (d292); a run WITHOUT an index rejects with the pointer
    assert(msg("""FROM d | WHERE KNN(v, 3)""").contains("standing ANN index"))
    assert(msg("""FROM d | EVAL x = ROUND_TO(v, id)""")
      .contains("ROUND_TO points must be numeric literals"))
  }

  test("TO_INTEGER widens to long (documented deviation); TO_BOOLEAN: " +
      "string true/false/junk→null, numeric 0/non-0") {
    import spark.implicits._
    val docs = Map("d" -> Seq((1L, "TRUE", 0.0), (2L, "false", -2.5),
      (3L, "yes", 7.0)).toDF("id", "s", "v"))
    val r = Esql.run(docs,
      """FROM d
        || EVAL i = TO_INTEGER(v), bs = TO_BOOLEAN(s), bv = TO_BOOLEAN(v)
        || KEEP id, i, bs, bv
        || SORT id ASC""".stripMargin).collect()
    assert(r(0).getLong(1) === 0L && r(1).getLong(1) === -2L) // trunc cast
    assert(r(0).getBoolean(2) === true && r(1).getBoolean(2) === false)
    assert(r(2).isNullAt(2)) // junk string → null
    assert(r(0).getBoolean(3) === false && r(1).getBoolean(3) === true
      && r(2).getBoolean(3) === true)
  }
}
