package graft.docs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ES SQL translator: pins the emitted ES|QL pipe for each supported
  * clause shape (the translation IS the implementation — one string pin
  * per dialect rule), checks end-to-end equivalence against hand-built
  * DataFrame twins, and asserts every documented v1 bound rejects with a
  * named reason instead of going silently wrong. */
class EsSqlSpec extends SparkSpec {

  private def t(sql: String): String = EsSql.translate(sql)

  test("aggregate path: GROUP BY + HAVING + aliased key + COUNT DISTINCT") {
    val got = t("""SELECT lang AS language, COUNT(*) AS n,
                  |  COUNT(DISTINCT source) AS srcs
                  |FROM documents WHERE n_chars > 200
                  |GROUP BY lang HAVING n > 1
                  |ORDER BY n DESC, language ASC LIMIT 10""".stripMargin)
    assert(got ===
      """FROM documents
        || WHERE n_chars > 200
        || STATS n = COUNT ( * ), srcs = COUNT_DISTINCT ( source ) BY language = lang
        || WHERE n > 1
        || SORT n DESC, language ASC
        || LIMIT 10
        || KEEP language, n, srcs""".stripMargin)
  }

  test("HISTOGRAM group key becomes a computed BUCKET BY key") {
    val got = t("""SELECT HISTOGRAM(price, 50) AS b, SUM(price) AS s
                  |FROM t GROUP BY HISTOGRAM(price, 50) ORDER BY b""".stripMargin)
    assert(got ===
      """FROM t
        || STATS s = SUM ( price ) BY b = BUCKET ( price , 50 )
        || SORT b
        || KEEP b, s""".stripMargin)
  }

  test("row path: dialect map = / <> / 'str' / LIKE wildcards, KEEP deferred") {
    val got = t("""SELECT a, b AS bb, c / 10 AS ck FROM t
                  |WHERE s = 'x''y' AND p LIKE '1%_' AND q <> 'z'
                  |ORDER BY ck DESC LIMIT 5""".stripMargin)
    // KEEP comes AFTER SORT/LIMIT in the row path so ORDER BY may
    // reference non-selected source columns (the SQL contract)
    assert(got ===
      """FROM t
        || WHERE s == "x'y" AND p LIKE "1*?" AND q != "z"
        || EVAL bb = b, ck = c / 10
        || SORT ck DESC
        || LIMIT 5
        || KEEP a, bb, ck""".stripMargin)
  }

  test("SELECT * expands from the registered schema; SCORE() and OFFSET pin") {
    val star = EsSql.translate("SELECT * FROM t ORDER BY a LIMIT 3",
      Map("t" -> Seq("a", "b")))
    assert(star ===
      """FROM t
        || SORT a
        || LIMIT 3
        || KEEP a, b""".stripMargin)
    val scored = t(
      "SELECT id, SCORE() AS sc FROM t WHERE MATCH(txt, 'x') ORDER BY sc DESC")
    assert(scored ===
      """FROM t METADATA _score
        || WHERE MATCH ( txt , "x" )
        || EVAL sc = _score
        || SORT sc DESC
        || KEEP id, sc""".stripMargin)
    // LIMIT n OFFSET m → pipe LIMIT n+m (one bounded sort) + the drop
    // count, which the pipe cannot carry — translateWithOffset returns it
    val (paged, off) =
      EsSql.translateWithOffset("SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 10")
    assert(off === 10)
    assert(paged ===
      """FROM t
        || SORT a
        || LIMIT 15
        || KEEP a""".stripMargin)
    // the string-only translate rejects OFFSET: its pipe alone would
    // return the rows paging should skip (silently mis-paged)
    assert(intercept[IllegalArgumentException](
      t("SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 10")).getMessage
      .contains("OFFSET in string-only translate"))
  }

  test("BETWEEN rewrites to the comparison pair; NOT BETWEEN negates it") {
    assert(t("SELECT a FROM t WHERE v BETWEEN 10 AND 20") ===
      """FROM t
        || WHERE ( v >= 10 AND v <= 20 )
        || KEEP a""".stripMargin)
    assert(t("SELECT a FROM t WHERE v NOT BETWEEN 10 AND 20 ORDER BY a") ===
      """FROM t
        || WHERE NOT ( v >= 10 AND v <= 20 )
        || SORT a
        || KEEP a""".stripMargin)
    val e = intercept[IllegalArgumentException](
      t("SELECT a FROM t WHERE v + 1 BETWEEN x AND 20")).getMessage
    assert(e.contains("BETWEEN"))
    // negative literal bounds are literals too
    assert(t("SELECT a FROM t WHERE v BETWEEN -5 AND 5") ===
      """FROM t
        || WHERE ( v >= - 5 AND v <= 5 )
        || KEEP a""".stripMargin)
  }

  test("CAST rewrites to ES|QL conversion functions, nested casts included") {
    assert(t("SELECT CAST(v AS BIGINT) AS b FROM t WHERE CAST(n AS DOUBLE) > 1.5") ===
      """FROM t
        || WHERE TO_DOUBLE ( n ) > 1.5
        || EVAL b = TO_LONG ( v )
        || KEEP b""".stripMargin)
    assert(t("SELECT CAST(CAST(v AS DOUBLE) AS VARCHAR) AS s FROM t") ===
      """FROM t
        || EVAL s = TO_STRING ( TO_DOUBLE ( v ) )
        || KEEP s""".stripMargin)
    import spark.implicits._
    val base = Seq((1L, "7"), (2L, "9")).toDF("id", "txt")
    val got = EsSql.run(Map("t" -> base),
      "SELECT id, CAST(txt AS BIGINT) AS n FROM t ORDER BY n DESC LIMIT 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 9L)))
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT CAST(v AS BLOB) AS b FROM t").contains("CAST target type BLOB"))
    assert(err("SELECT CAST(v) AS b FROM t").contains("CAST without AS"))
  }

  test("page bounds reject loudly: non-integer, out-of-range, overflow-safe") {
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT a FROM t ORDER BY a LIMIT 3000000000")
      .contains("LIMIT exceeds 1e9"))
    assert(err("SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 99999999999999999999")
      .contains("OFFSET out of range"))
    assert(err("SELECT a FROM t ORDER BY a LIMIT 2.5")
      .contains("LIMIT must be an integer literal"))
    // max in-range page still fits in the Int pipe bound (1e9 + 1e9)
    assert(EsSql.translateWithOffset(
      "SELECT a FROM t ORDER BY a LIMIT 1000000000 OFFSET 1000000000")
      ._1.contains("LIMIT 2000000000"))
  }

  test("OFFSET pages the sorted rows end-to-end; ORDER BY non-selected column") {
    import spark.implicits._
    val base = (1 to 40).map(i => (i.toLong, 40L - i)).toDF("id", "rev")
    val page = EsSql.run(Map("t" -> base),
      "SELECT id FROM t ORDER BY id ASC LIMIT 5 OFFSET 10")
      .collect().map(_.getLong(0)).toSeq
    assert(page === (11L to 15L))
    // sort key not in the SELECT list
    val byRev = EsSql.run(Map("t" -> base),
      "SELECT id FROM t ORDER BY rev ASC LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    assert(byRev === Seq(40L, 39L, 38L))
  }

  test("translated SQL equals the hand-built DataFrame twin") {
    import spark.implicits._
    val base = (1 to 300).map { i =>
      (i.toLong, s"g${i % 5}", (i % 97).toLong)
    }.toDF("id", "g", "v")
    val got = EsSql.run(Map("t" -> base),
      """SELECT g, COUNT(*) AS n, SUM(v) AS s FROM t
        |WHERE v > 10 GROUP BY g HAVING n > 2
        |ORDER BY s DESC, g ASC LIMIT 4""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val twin = base.filter(col("v") > 10)
      .groupBy("g")
      .agg(count(lit(1)).cast("long").as("n"), sum("v").cast("long").as("s"))
      .filter(col("n") > 2)
      .select("g", "n", "s")
      .orderBy(col("s").desc, col("g").asc).limit(4)
      .collect().map(_.toSeq).toSeq
    assert(got === twin)
  }

  test("metadata commands: SHOW TABLES lists indices, DESCRIBE lists columns") {
    import spark.implicits._
    val a = Seq((1L, "x", 2.5)).toDF("id", "name", "v")
    val b = Seq((1, true)).toDF("k", "flag")
    val tables = EsSql.run(Map("beta" -> b, "alpha" -> a), "SHOW TABLES")
      .collect().map(_.getString(0)).toSeq
    assert(tables === Seq("alpha", "beta"))
    val desc = EsSql.run(Map("alpha" -> a), "DESCRIBE alpha")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc === Seq("id" -> "BIGINT", "name" -> "VARCHAR", "v" -> "DOUBLE"))
    val desc2 = EsSql.run(Map("beta" -> b), "DESC beta")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc2 === Seq("k" -> "INTEGER", "flag" -> "BOOLEAN"))
    // SHOW COLUMNS FROM/IN is the DESCRIBE alias
    val sc = EsSql.run(Map("beta" -> b), "SHOW COLUMNS FROM beta")
      .collect().map(_.getString(0)).toSeq
    assert(sc === Seq("k", "flag"))
    // boolean literals ride through to ES|QL
    val boolq = EsSql.run(Map("beta" -> b),
      "SELECT k FROM beta WHERE flag = TRUE ORDER BY k")
      .collect().map(_.getInt(0)).toSeq
    assert(boolq === Seq(1))
    assert(intercept[IllegalArgumentException](
      EsSql.run(Map("alpha" -> a), "DESCRIBE nope")).getMessage
      .contains("unknown index nope"))
    // no sources and no session: a named reject, not a bare head-of-empty
    assert(intercept[IllegalArgumentException](
      EsSql.run(Map.empty, "SHOW TABLES")).getMessage
      .contains("no SparkSession"))
    // SHOW TABLES with an explicit session and zero sources is legal
    assert(EsSql.run(Map.empty, "SHOW TABLES", spark).count() === 0L)
  }

  test("breadth probes: ORDER BY agg expression, fn renames, IS NOT NULL") {
    // Kibana-generated shape: sort on the aggregate expression itself —
    // resolved to its SELECT alias (the post-STATS output column)
    assert(t("""SELECT g, COUNT(*) AS n FROM t GROUP BY g
               |ORDER BY COUNT(*) DESC LIMIT 5""".stripMargin) ===
      """FROM t
        || STATS n = COUNT ( * ) BY g
        || SORT n DESC
        || LIMIT 5
        || KEEP g, n""".stripMargin)
    // fn-name case is insensitive in the match (ES SQL contract) while
    // column identifiers stay exact
    assert(t("""SELECT g, COUNT(*) AS n FROM t GROUP BY g
               |ORDER BY count(*) DESC""".stripMargin).contains("SORT n DESC"))
    // row path: a computed item's expression sorts via its EVAL alias
    assert(t("SELECT a / 10 AS bucket FROM t ORDER BY a / 10") ===
      """FROM t
        || EVAL bucket = a / 10
        || SORT bucket
        || KEEP bucket""".stripMargin)
    // an expression in neither SELECT nor source columns still rejects
    assert(intercept[IllegalArgumentException](
      t("SELECT a FROM t ORDER BY b + 1")).getMessage
      .contains("ORDER BY key"))
    // ES SQL fn spellings that differ in ES|QL rename — only when CALLED
    assert(t("SELECT UCASE(name) AS u, CHAR_LENGTH(name) AS l FROM t") ===
      """FROM t
        || EVAL u = TO_UPPER ( name ), l = LENGTH ( name )
        || KEEP u, l""".stripMargin)
    // a COLUMN named ucase is not a call — passes through untouched
    assert(t("SELECT ucase FROM t WHERE LCASE(x) = 'y'") ===
      """FROM t
        || WHERE TO_LOWER ( x ) == "y"
        || KEEP ucase""".stripMargin)
    // IS [NOT] NULL rides through to ES|QL unchanged
    assert(t("SELECT a FROM t WHERE b IS NOT NULL AND c IS NULL") ===
      """FROM t
        || WHERE b IS NOT NULL AND c IS NULL
        || KEEP a""".stripMargin)
    import spark.implicits._
    val base = Seq(("Ab", 1L), ("c", 2L), ("Ab", 3L)).toDF("name", "v")
    val got = EsSql.run(Map("t" -> base),
      """SELECT UCASE(name) AS u, COUNT(*) AS n FROM t
        |GROUP BY UCASE(name) ORDER BY COUNT(*) DESC, u ASC""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("AB", 2L), ("C", 1L)))
  }

  test("CASE WHEN rewrites to ES|QL CASE(); both dialect forms, nested") {
    // searched form: conditions map 1:1; no ELSE → no default (null)
    assert(t("SELECT CASE WHEN v > 10 THEN 'hi' ELSE 'lo' END AS band FROM t") ===
      """FROM t
        || EVAL band = CASE ( v > 10 , "hi" , "lo" )
        || KEEP band""".stripMargin)
    assert(t("SELECT CASE WHEN v > 10 THEN 'hi' END AS band FROM t") ===
      """FROM t
        || EVAL band = CASE ( v > 10 , "hi" )
        || KEEP band""".stripMargin)
    // simple form: operand = value per branch
    assert(t("SELECT CASE g WHEN 'a' THEN 1 WHEN 'b' THEN 2 ELSE 0 END AS k FROM t")
      === """FROM t
        || EVAL k = CASE ( ( g ) == ( "a" ) , 1 , ( g ) == ( "b" ) , 2 , 0 )
        || KEEP k""".stripMargin)
    // nested CASE WHEN in a branch value recurses; BETWEEN inside a
    // condition was already rewritten when the CASE pass runs
    assert(t("""SELECT CASE WHEN v BETWEEN 1 AND 5 THEN
               |  CASE WHEN w > 0 THEN 'p' ELSE 'n' END
               |  ELSE 'out' END AS k FROM t""".stripMargin) ===
      """FROM t
        || EVAL k = CASE ( ( v >= 1 AND v <= 5 ) , CASE ( w > 0 , "p" , "n" ) , "out" )
        || KEEP k""".stripMargin)
    // a native function-form CASE( passes through untouched
    assert(t("SELECT CASE(v > 1, 'a', 'b') AS k FROM t")
      .contains("""EVAL k = CASE ( v > 1 , "a" , "b" )"""))
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT CASE WHEN v > 1 THEN 'a' AS k FROM t")
      .contains("CASE without END"))
    assert(err("SELECT CASE WHEN v > 1 ELSE 'a' END AS k FROM t")
      .contains("CASE WHEN without THEN"))
    assert(err("SELECT CASE ELSE 'a' END AS k FROM t")
      .contains("CASE without WHEN branches"))
    assert(err("SELECT CASE WHEN v > 1 THEN 'a' ELSE 'b' WHEN v > 2 THEN 'c' END AS k FROM t")
      .contains("ELSE must be the last CASE branch"))
    // end-to-end: both forms as computed GROUP BY keys (via ordinals)
    import spark.implicits._
    val base = Seq((1L, "en"), (5L, "en"), (9L, "fr"), (20L, "fr"))
      .toDF("v", "g")
    val got = EsSql.run(Map("t" -> base),
      """SELECT CASE WHEN v >= 10 THEN 'big' WHEN v >= 5 THEN 'mid'
        |  ELSE 'small' END AS band,
        |  CASE g WHEN 'en' THEN 'E' ELSE 'O' END AS fam,
        |  COUNT(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY band ASC, fam ASC""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("big", "O", 1L), ("mid", "E", 1L), ("mid", "O", 1L),
      ("small", "E", 1L)))
  }

  test("function-form CASE(...) in a NON-final THEN branch (ADVICE r14: " +
      "the next WHEN made the END scan miscount)") {
    // NULLIF rewrites to a function-form CASE( before the CASE WHEN pass;
    // with another WHEN following, parenCaseIsSimpleForm used to mistake
    // it for the paren-operand simple form and eat the real END
    assert(t("""SELECT CASE WHEN v > 1 THEN NULLIF(g, 'en')
               |  WHEN v > 0 THEN g ELSE 'x' END AS k FROM t""".stripMargin)
      === """FROM t
        || EVAL k = CASE ( v > 1 , CASE ( ( g ) == ( "en" ) , NULL , ( g ) ) , v > 0 , g , "x" )
        || KEEP k""".stripMargin)
    // a user-written native CASE(...) in a non-final branch, same shape
    assert(t("""SELECT CASE WHEN v > 1 THEN CASE(v > 2, 'a', 'b')
               |  WHEN v > 0 THEN 'c' END AS k FROM t""".stripMargin)
      === """FROM t
        || EVAL k = CASE ( v > 1 , CASE ( v > 2 , "a" , "b" ) , v > 0 , "c" )
        || KEEP k""".stripMargin)
    // end-to-end through the engine
    import spark.implicits._
    val base = Seq((2L, "en"), (2L, "fr"), (1L, "de"), (0L, "de"))
      .toDF("v", "g")
    val got = EsSql.run(Map("t" -> base),
      """SELECT CASE WHEN v > 1 THEN NULLIF(g, 'en')
        |  WHEN v > 0 THEN g ELSE 'x' END AS k
        |FROM t ORDER BY k NULLS FIRST""".stripMargin)
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(None, Some("de"), Some("fr"), Some("x")))
  }

  test("out-of-Int-range ordinal is a named reject (ADVICE r14: was an " +
      "uncaught NumberFormatException)") {
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT g, COUNT(*) AS n FROM t GROUP BY 99999999999")
      .contains("ordinal must be an integer"))
    assert(err("SELECT g FROM t ORDER BY 99999999999")
      .contains("ordinal must be an integer"))
  }

  test("conditional scalars: NULLIF/IIF/IFNULL/NVL + DATE_TRUNC passthrough") {
    // NULLIF → null-when-equal CASE; the default branch carries `a`
    assert(t("SELECT NULLIF(a, 0) AS k FROM t") ===
      """FROM t
        || EVAL k = CASE ( ( a ) == ( 0 ) , NULL , ( a ) )
        || KEEP k""".stripMargin)
    // nested NULLIF recurses (both arg copies)
    assert(t("SELECT NULLIF(NULLIF(a, 1), 2) AS k FROM t").contains(
      "CASE ( ( CASE ( ( a ) == ( 1 ) , NULL , ( a ) ) ) == ( 2 ) , NULL"))
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT NULLIF(a) AS k FROM t")
      .contains("NULLIF takes exactly two arguments"))
    assert(err("SELECT NULLIF(a, b, c) AS k FROM t")
      .contains("NULLIF takes exactly two arguments"))
    // IIF → variadic CASE; IFNULL/ISNULL/NVL → COALESCE (call-only renames)
    assert(t("SELECT IIF(v > 1, 'hi', 'lo') AS k, IFNULL(g, 'na') AS g2, " +
      "NVL(h, 0) AS h2 FROM t").contains(
      """EVAL k = CASE ( v > 1 , "hi" , "lo" ), g2 = COALESCE ( g , "na" ), h2 = COALESCE ( h , 0 )"""))
    // DATE_TRUNC has the same (unit, ts) signature in both dialects
    assert(t("SELECT DATE_TRUNC('month', ts) AS m FROM t") ===
      """FROM t
        || EVAL m = DATE_TRUNC ( "month" , ts )
        || KEEP m""".stripMargin)
    // standard-SQL EXTRACT(part FROM e) = the named scalar (the inner
    // FROM never confuses the clause splitter — paren depth >= 1)
    assert(t("SELECT EXTRACT(YEAR FROM ts) AS y FROM t WHERE " +
      "EXTRACT(QUARTER FROM ts) = 1") ===
      """FROM t
        || WHERE TO_LONG ( FLOOR ( ( DATE_EXTRACT ( "month_of_year" , ts ) + 2 ) / 3 ) ) == 1
        || EVAL y = DATE_EXTRACT ( "year" , ts )
        || KEEP y""".stripMargin)
    assert(intercept[IllegalArgumentException](
      t("SELECT EXTRACT(EPOCH FROM ts) AS e FROM t")).getMessage
      .contains("EXTRACT part EPOCH"))
    assert(intercept[IllegalArgumentException](
      t("SELECT EXTRACT(WEEK FROM ts) AS w FROM t")).getMessage
      .contains("WEEK"))
    // end-to-end: divide-by-zero guard, the canonical NULLIF use
    import spark.implicits._
    val base = Seq((1L, 10L, 2L), (2L, 7L, 0L)).toDF("id", "num", "den")
    val got = EsSql.run(Map("t" -> base),
      "SELECT id, num / NULLIF(den, 0) AS ratio FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toSeq
    assert(got === Seq((1L, 5.0), (2L, -1.0)))
  }

  test("|| concat rewrites to CONCAT; chains left-fold; precedence guards") {
    assert(t("SELECT lang || '-' || source AS tag FROM t") ===
      """FROM t
        || EVAL tag = CONCAT ( CONCAT ( lang , "-" ) , source )
        || KEEP tag""".stripMargin)
    // function-call operands ride whole; rename applies inside
    assert(t("SELECT UCASE(lang) || '!' AS u FROM t").contains(
      """EVAL u = CONCAT ( TO_UPPER ( lang ) , "!" )"""))
    // parenthesized expressions are atoms
    assert(t("SELECT (lang) || (source) AS u FROM t").contains(
      "EVAL u = CONCAT ( ( lang ) , ( source ) )"))
    // || in WHERE too
    assert(t("SELECT a FROM t WHERE lang || source = 'enx'").contains(
      """WHERE CONCAT ( lang , source ) == "enx""""))
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT a + b || c AS k FROM t").contains("parenthesize"))
    assert(err("SELECT a || b + c AS k FROM t").contains("parenthesize"))
    import spark.implicits._
    val base = Seq(("en", "s1"), ("fr", "s2")).toDF("lang", "source")
    val got = EsSql.run(Map("t" -> base),
      "SELECT lang || '-' || source AS tag FROM t ORDER BY tag")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("en-s1", "fr-s2"))
  }

  test("review fixes: CASE/NULLIF results compose with || and NOT IN; " +
      "parenthesized simple-form CASE; stray END rejects by name") {
    // a NULLIF result (function-form CASE after rewrite) as a || operand
    assert(t("SELECT NULLIF(lang, 'en') || '!' AS k FROM t").contains(
      """EVAL k = CONCAT ( CASE ( ( lang ) == ( "en" ) , NULL , ( lang ) ) , "!" )"""))
    // ...and on the right side
    assert(t("SELECT 'x' || NULLIF(lang, 'en') AS k FROM t").contains(
      """CONCAT ( "x" , CASE ("""))
    // a CASE WHEN result as a || operand (caseWhen now runs first)
    assert(t("SELECT CASE WHEN v > 1 THEN 'a' ELSE 'b' END || '!' AS k FROM t")
      .contains("""EVAL k = CONCAT ( CASE ( v > 1 , "a" , "b" ) , "!" )"""))
    // function-call / CASE results as NOT IN left operands
    assert(t("SELECT a FROM t WHERE UCASE(lang) NOT IN ('EN', 'FR')").contains(
      """WHERE NOT TO_UPPER ( lang ) IN ( "EN" , "FR" )"""))
    assert(t("SELECT a FROM t WHERE " +
      "CASE WHEN v > 1 THEN lang ELSE 'x' END NOT IN ('en')").contains(
      """WHERE NOT CASE ( v > 1 , lang , "x" ) IN ( "en" )"""))
    // simple-form CASE with a parenthesized operand is NOT the native
    // function form
    assert(t("SELECT CASE (lang) WHEN 'en' THEN 1 ELSE 0 END AS k FROM t")
      .contains("""EVAL k = CASE ( ( ( lang ) ) == ( "en" ) , 1 , 0 )"""))
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    // stray CASE keywords reject by name at translate time, not as an
    // ES|QL "bad expression" three layers later
    assert(err("SELECT a FROM t WHERE b END > 1")
      .contains("stray END outside a CASE expression"))
    assert(err("SELECT a FROM t WHERE 'x' NOT IN ('x')")
      .contains("NOT IN/LIKE on this shape"))
    assert(err("SELECT a FROM t WHERE p LIKE 'a!%' ESCAPE '!'")
      .contains("LIKE ... ESCAPE"))
  }

  test("NOT IN / NOT LIKE rewrite to the prefix-NOT forms") {
    assert(t("SELECT a FROM t WHERE g NOT IN ('x', 'y') AND p NOT LIKE 'a%'") ===
      """FROM t
        || WHERE NOT g IN ( "x" , "y" ) AND NOT p LIKE "a*"
        || KEEP a""".stripMargin)
    // compound left side rejects loudly (mis-grouping the negation)
    assert(intercept[IllegalArgumentException](
      t("SELECT a FROM t WHERE v + w NOT IN (1, 2)")).getMessage
      .contains("NOT IN/LIKE on this shape"))
    // IS NOT NULL is untouched by the NOT-op rewrite
    assert(t("SELECT a FROM t WHERE b IS NOT NULL AND g NOT IN ('x')")
      .contains("WHERE b IS NOT NULL AND NOT g IN ( \"x\" )"))
    import spark.implicits._
    val base = Seq((1L, "x", "ab"), (2L, "y", "cd"), (3L, "z", "ae"))
      .toDF("id", "g", "p")
    val got = EsSql.run(Map("t" -> base),
      "SELECT id FROM t WHERE g NOT IN ('x') AND p NOT LIKE 'a%' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L))
  }

  test("ORDER BY NULLS FIRST/LAST passes through to the pipe's SORT") {
    assert(t("SELECT a FROM t ORDER BY a ASC NULLS FIRST, b DESC NULLS LAST") ===
      """FROM t
        || SORT a ASC NULLS FIRST, b DESC NULLS LAST
        || KEEP a""".stripMargin)
    // bare NULLS form (no ASC/DESC) works too
    assert(t("SELECT a FROM t ORDER BY a NULLS LAST").contains(
      "SORT a NULLS LAST"))
    import spark.implicits._
    val base = Seq((1L, Some(5L)), (2L, None), (3L, Some(1L)))
      .toDF("id", "v")
    val got = EsSql.run(Map("t" -> base),
      "SELECT id FROM t ORDER BY v ASC NULLS FIRST")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L, 1L)) // null first, then 1, 5
  }

  test("documented bounds reject loudly with named reasons") {
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(err("SELECT * FROM t").contains("SELECT *"))
    assert(err("SELECT DISTINCT a FROM t").contains("DISTINCT"))
    assert(err("SELECT a FROM t JOIN u").contains("JOIN"))
    assert(err("SELECT a FROM (SELECT a FROM t)").contains("subqueries"))
    assert(err("SELECT a + 1 FROM t").contains("explicit alias"))
    assert(err("SELECT SUM(a) / SUM(b) AS r FROM t GROUP BY g")
      .contains("compound aggregate"))
    assert(err("SELECT SCORE(x) AS sc FROM t").contains("SCORE"))
    assert(err("SELECT a FROM t OFFSET 5").contains("OFFSET without ORDER BY"))
    // GROUP BY ordinals are now SUPPORTED (1-based SELECT references);
    // what still rejects: out-of-range, and an ordinal naming an aggregate
    assert(t("SELECT g, SUM(v) AS s FROM t GROUP BY 1")
      .contains("STATS s = SUM ( v ) BY g"))
    assert(err("SELECT g, SUM(v) AS s FROM t GROUP BY 3").contains("out of range"))
    assert(err("SELECT g, SUM(v) AS s FROM t GROUP BY 2")
      .contains("references an aggregate"))
    assert(err("SELECT a FROM t HAVING a > 1").contains("HAVING without GROUP BY"))
    assert(err("SELECT g, SUM(v) AS s FROM t GROUP BY g HAVING v > 1")
      .contains("SELECT aliases"))
    assert(err("SELECT a FROM t WHERE p LIKE 'a*'").contains("LIKE"))
    // SCORE() is legal only in SELECT/ORDER BY — in WHERE it would test
    // the unscored 0 seed (score accumulates after the filter), in HAVING
    // it is not an aggregate; both reject instead of silently returning
    // wrong rows
    assert(err("SELECT id, SCORE() AS sc FROM t " +
      "WHERE MATCH(txt, 'x') AND SCORE() > 1").contains("SCORE()/_score in WHERE"))
    assert(err("SELECT g, COUNT(*) AS n FROM t GROUP BY g HAVING SCORE() > 1")
      .contains("SCORE()/_score in HAVING"))
    // compound BETWEEN operands reject (only `b` would be rewritten,
    // mis-grouping `a + b BETWEEN 1 AND 2` as `a + (b >= 1 AND b <= 2)`)
    assert(err("SELECT a FROM t WHERE v + w BETWEEN 1 AND 2")
      .contains("BETWEEN on this shape"))
    assert(err("SELECT a FROM t WHERE v + w NOT BETWEEN 1 AND 2")
      .contains("BETWEEN on this shape"))
  }

  test("r15 aggregate tail: FIRST/LAST (+_VALUE synonyms), SKEWNESS/" +
    "KURTOSIS, PERCENTILE_RANK lower onto STATS entries") {
    val got = t("""SELECT g, FIRST(v, ts) AS f, LAST_VALUE(v) AS l,
                  |  SKEWNESS(v) AS sk, PERCENTILE_RANK(v, 25) AS pr
                  |FROM t GROUP BY g ORDER BY g""".stripMargin)
    assert(got ===
      """FROM t
        || STATS f = FIRST ( v , ts ), l = LAST ( v ), sk = SKEWNESS ( v ), pr = PERCENTILE_RANK ( v , 25 ) BY g
        || SORT g
        || KEEP g, f, l, sk, pr""".stripMargin)
  }

  test("r15 FIRST/LAST semantics: nulls ignored, ordering ties break by " +
    "value (the documented deterministic deviation)") {
    import spark.implicits._
    val base = Seq(
      (1L, Option("b"), 10L), (1L, Option("a"), 10L), // tie on ord → min val
      (1L, None, 1L),                                  // null value ignored
      (1L, Option("z"), 99L),
      (2L, Option("only"), 5L)).toDF("g", "v", "ord")
    val got = EsSql.run(Map("t" -> base),
      "SELECT g, FIRST(v, ord) AS f, LAST(v, ord) AS l FROM t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1L, "a", "z"), (2L, "only", "only")))
  }

  test("r15 SELECT TOP n is the LIMIT alias; TOP+LIMIT rejects; a column " +
    "named top still parses") {
    assert(t("SELECT TOP 7 a, b FROM t ORDER BY a") ===
      """FROM t
        || SORT a
        || LIMIT 7
        || KEEP a, b""".stripMargin)
    assert(intercept[IllegalArgumentException](
      t("SELECT TOP 7 a FROM t ORDER BY a LIMIT 3")).getMessage
      .contains("TOP and LIMIT"))
    // TOP not followed by an integer = an ordinary select item
    assert(t("SELECT top FROM t") ===
      """FROM t
        || KEEP top""".stripMargin)
  }

  test("r15 INTERVAL arithmetic lowers onto DATE_ADD; chains left-fold; " +
    "compound/commuted forms reject by name") {
    def err(sql: String): String =
      intercept[IllegalArgumentException](t(sql)).getMessage
    assert(t("SELECT id, ts + INTERVAL 1 DAY AS nd FROM t ORDER BY id") ===
      """FROM t
        || EVAL nd = DATE_ADD ( "day" , 1 , ts )
        || SORT id
        || KEEP id, nd""".stripMargin)
    // quoted quantity + chained subtraction: the emitted DATE_ADD(...) is
    // the next term's left atom
    assert(t("SELECT ts + INTERVAL 1 DAY - INTERVAL '2' HOUR AS x FROM t")
      .contains("""EVAL x = DATE_ADD ( "hour" , - 2 , DATE_ADD ( "day" , 1 , ts ) )"""))
    assert(err("SELECT ts + INTERVAL '1-2' YEAR TO MONTH AS x FROM t")
      .contains("INTERVAL quantity must be an integer"))
    assert(err("SELECT INTERVAL 1 DAY + ts AS x FROM t")
      .contains("INTERVAL must follow + or -"))
    assert(err("SELECT ts + INTERVAL 1 FORTNIGHT AS x FROM t")
      .contains("INTERVAL unit"))
    assert(err("SELECT a * b + INTERVAL 1 DAY AS x FROM t")
      .contains("un-parenthesized arithmetic"))
    // DATEADD/TIMESTAMP_ADD spellings ride the same scalar
    assert(t("SELECT DATEADD('month', 2, ts) AS m FROM t")
      .contains("""EVAL m = DATE_ADD ( "month" , 2 , ts )"""))
  }

  test("r15 TIMESTAMP/DATE literals fold to epoch-micros constants at " +
    "translate time; junk rejects; a column named date is untouched") {
    def us(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    assert(t("SELECT a FROM t WHERE ts >= TIMESTAMP '2024-01-10 12:30:00'")
      .contains(s"WHERE ts >= ${us("2024-01-10T12:30:00Z")}"))
    assert(t("SELECT a FROM t WHERE ts >= DATE '2024-01-10'")
      .contains(s"WHERE ts >= ${us("2024-01-10T00:00:00Z")}"))
    // fractional seconds carry through at micros grain
    assert(t("SELECT a FROM t WHERE ts < TIMESTAMP '2024-01-10 00:00:00.123456'")
      .contains(s"WHERE ts < ${us("2024-01-10T00:00:00Z") + 123456L}"))
    // folded literals are plain numbers, so they compose as BETWEEN and
    // INTERVAL operands
    assert(t("SELECT a FROM t WHERE ts BETWEEN DATE '2024-01-01' AND " +
      "DATE '2024-01-02'").contains(
      s"( ts >= ${us("2024-01-01T00:00:00Z")} AND ts <= ${us("2024-01-02T00:00:00Z")} )"))
    assert(intercept[IllegalArgumentException](
      t("SELECT a FROM t WHERE ts > TIMESTAMP 'last tuesday'")).getMessage
      .contains("cannot parse TIMESTAMP literal"))
    assert(t("SELECT date FROM t") ===
      """FROM t
        || KEEP date""".stripMargin)
    // wall-clock functions are named rejects (an oracle-gated engine
    // cannot reproduce now()); a column merely NAMED now is untouched
    assert(intercept[IllegalArgumentException](
      t("SELECT a FROM t WHERE ts < CURRENT_TIMESTAMP")).getMessage
      .contains("CURRENT_TIMESTAMP"))
    assert(intercept[IllegalArgumentException](
      t("SELECT a FROM t WHERE ts < NOW()")).getMessage
      .contains("NOW()"))
    assert(t("SELECT now FROM t") ===
      """FROM t
        || KEEP now""".stripMargin)
  }
}
