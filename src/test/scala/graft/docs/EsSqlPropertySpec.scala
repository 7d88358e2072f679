package graft.docs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style equivalence for the ES SQL translator: seeded random
  * SELECT statements (row path with BETWEEN/LIKE/OFFSET, aggregate path
  * with GROUP BY + HAVING) each check against the hand-built DataFrame
  * twin — the SQL→ES|QL→Catalyst chain must add nothing and lose nothing
  * relative to writing the plan directly. Seeded → deterministic, no
  * extra test deps (the EsqlPropertySpec pattern). */
class EsSqlPropertySpec extends SparkSpec {

  private lazy val base = {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    (1 to 400).map { i =>
      (i.toLong, s"g${rnd.nextInt(6)}", rnd.nextInt(1000).toLong,
        s"p${rnd.nextInt(4)}x${rnd.nextInt(3)}")
    }.toDF("id", "g", "v", "tag")
  }

  test("25 random aggregate SELECTs equal their hand-built twins") {
    val rnd = new scala.util.Random(5L)
    (1 to 25).foreach { _ =>
      val lo = rnd.nextInt(400)
      val hi = lo + 100 + rnd.nextInt(400)
      val hav = rnd.nextInt(8) + 1
      val lim = rnd.nextInt(5) + 1
      val desc = rnd.nextBoolean()
      val (aggE, aggD) = rnd.nextInt(3) match {
        case 0 => ("SUM(v)", sum(col("v")).cast("long"))
        case 1 => ("MAX(v)", max(col("v")))
        case _ => ("COUNT(DISTINCT tag)", count_distinct(col("tag")).cast("long"))
      }
      val dir = if (desc) "DESC" else "ASC"
      // half the time sort on the aggregate EXPRESSION itself (the
      // Kibana-generated shape), in random case — must resolve to the
      // SELECT alias via the canonical (case-insensitive fn/keyword) match
      val orderKey = rnd.nextInt(3) match {
        case 0 => "a"
        case 1 => aggE
        case _ => aggE.toLowerCase // fixture columns are lowercase already
      }
      val q = s"""SELECT g, COUNT(*) AS n, $aggE AS a FROM t
                 |WHERE v BETWEEN $lo AND $hi
                 |GROUP BY g HAVING n > $hav
                 |ORDER BY $orderKey $dir, g ASC LIMIT $lim""".stripMargin
      val got = EsSql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("v") >= lo && col("v") <= hi)
        .groupBy("g")
        .agg(count(lit(1)).cast("long").as("n"), aggD.as("a"))
        .filter(col("n") > hav)
        .select("g", "n", "a")
        .orderBy(if (desc) col("a").desc else col("a").asc, col("g").asc)
        .limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"statement diverged from its twin: $q")
    }
  }

  test("ordinals + unSELECTed HAVING aggregates: 15 random statements equal twins") {
    val rnd = new scala.util.Random(31L)
    (1 to 15).foreach { _ =>
      val lo = rnd.nextInt(300)
      val havSum = 500 + rnd.nextInt(20000)
      val lim = rnd.nextInt(5) + 1
      // GROUP BY 1 (ordinal), ORDER BY 2 (ordinal → COUNT alias), HAVING
      // on aggregates that are NOT select items (SUM lift + compound avg)
      val q = s"""SELECT g, COUNT(*) AS n FROM t
                 |WHERE v >= $lo
                 |GROUP BY 1
                 |HAVING SUM(v) > $havSum AND SUM(v) / COUNT(*) > 100
                 |ORDER BY 2 DESC, g ASC LIMIT $lim""".stripMargin
      val got = EsSql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("v") >= lo)
        .groupBy("g")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("v")).cast("long").as("_s"))
        .filter(col("_s") > havSum &&
          col("_s").cast("double") / col("n") > 100)
        .select("g", "n")
        .orderBy(col("n").desc, col("g").asc)
        .limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"statement diverged from its twin: $q")
    }
  }

  test("ORDER BY on an unselected aggregate lifts into STATS (shared with " +
    "HAVING's lift when the aggregate is the same)") {
    val rnd = new scala.util.Random(47L)
    (1 to 10).foreach { _ =>
      val lo = rnd.nextInt(300)
      val lim = rnd.nextInt(4) + 1
      // SUM(v) appears in HAVING and ORDER BY but never in SELECT: one
      // synthetic _h0 entry serves both; MAX(v) lifts as _h1 for the sort
      val q = s"""SELECT g, COUNT(*) AS n FROM t
                 |WHERE v >= $lo
                 |GROUP BY g
                 |HAVING SUM(v) > 1000
                 |ORDER BY SUM(v) DESC, MAX(v) ASC, g ASC LIMIT $lim""".stripMargin
      val got = EsSql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("v") >= lo)
        .groupBy("g")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("v")).cast("long").as("_s"), max(col("v")).as("_m"))
        .filter(col("_s") > 1000)
        .orderBy(col("_s").desc, col("_m").asc, col("g").asc)
        .select("g", "n")
        .limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"statement diverged from its twin: $q")
      // the shared lift really is shared: the pipe names _h0 once in STATS
      val pipe = EsSql.translate(q.replace("LIMIT " + lim, "LIMIT 5"))
      assert(pipe.linesIterator.count(_.contains("_h0 =")) === 1, pipe)
    }
  }

  test("date extract scalars rewrite onto DATE_EXTRACT; WEEK rejects loudly") {
    import spark.implicits._
    // one row per hour over 3 ISO weeks of Jan 2024 (epoch micros)
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val ev = (0 until 21 * 24).map { h =>
      (h.toLong, t0 + h * 3600L * 1000000L, (h % 7).toLong)
    }.toDF("id", "ts_us", "v")
    val q =
      """SELECT DAY_OF_WEEK(ts_us) AS dow, COUNT(*) AS n
        |FROM t WHERE HOUR(ts_us) < 6 AND QUARTER(ts_us) = 1
        |  AND YEAR(ts_us) = 2024 AND MONTH(ts_us) = 1
        |GROUP BY 1 ORDER BY 1 ASC""".stripMargin
    val got = EsSql.run(Map("t" -> ev), q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 2024-01-01 is a MONDAY: ISO dow 1..7, 3 weeks × 6 qualifying hours
    assert(got === (1L to 7L).map(d => (d, 18L)))
    val e = intercept[IllegalArgumentException](EsSql.run(Map("t" -> ev),
      "SELECT WEEK_OF_YEAR(ts_us) AS w, COUNT(*) AS n FROM t GROUP BY 1"))
    assert(e.getMessage.contains("WEEK_OF_YEAR"))
    // a COLUMN named like a date fn passes through untouched (no call)
    val ev2 = ev.withColumnRenamed("v", "year")
    val r2 = EsSql.run(Map("t" -> ev2),
      "SELECT id, year FROM t WHERE year = 3 ORDER BY id ASC LIMIT 2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r2 === Seq((3L, 3L), (10L, 3L)))
  }

  test("20 random CASE/NULLIF/concat/NOT-IN statements equal their twins") {
    val rnd = new scala.util.Random(31L)
    (1 to 20).foreach { _ =>
      val th1 = rnd.nextInt(700)
      val th2 = th1 + 1 + rnd.nextInt(250)
      val exG = s"g${rnd.nextInt(6)}"
      val nifG = s"g${rnd.nextInt(6)}"
      val notP = s"p${rnd.nextInt(4)}"
      val lim = 20 + rnd.nextInt(60)
      // searched CASE with a nested simple-form CASE in a branch, a ||
      // chain, a NULLIF projection, and NOT IN / NOT LIKE filters — the
      // round-14 rewrites composed in one statement
      val q =
        s"""SELECT id,
           |  CASE WHEN v >= $th2 THEN 'hi'
           |       WHEN v >= $th1 THEN
           |         CASE g WHEN 'g0' THEN 'mid0' ELSE 'mid' END
           |       ELSE 'lo' END AS band,
           |  g || ':' || tag AS gt,
           |  NULLIF(g, '$nifG') AS gx
           |FROM t
           |WHERE g NOT IN ('$exG') AND tag NOT LIKE '$notP%'
           |ORDER BY id ASC LIMIT $lim""".stripMargin
      val got = EsSql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base
        .filter(!col("g").isin(exG) && !col("tag").startsWith(notP))
        .select(col("id"),
          when(col("v") >= th2, "hi")
            .when(col("v") >= th1,
              when(col("g") === "g0", "mid0").otherwise("mid"))
            .otherwise("lo").as("band"),
          concat(concat(col("g"), lit(":")), col("tag")).as("gt"),
          when(col("g") === nifG, lit(null)).otherwise(col("g")).as("gx"))
        .orderBy(col("id").asc).limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"statement diverged from its twin: $q")
    }
  }

  test("15 random r15-tail statements (TOP, FIRST/LAST, PERCENTILE_RANK, " +
    "date literal + INTERVAL bound) equal their twins") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val rnd0 = new scala.util.Random(11L)
    val ev = (0 until 600).map { i =>
      (i.toLong, t0 + rnd0.nextInt(21 * 24) * 3600L * 1000000L,
        rnd0.nextInt(1000).toLong, s"g${rnd0.nextInt(5)}")
    }.toDF("id", "ts_us", "v", "g")
    val rnd = new scala.util.Random(59L)
    (1 to 15).foreach { _ =>
      val lim = rnd.nextInt(4) + 2
      val pv = rnd.nextInt(900) + 50
      val days = rnd.nextInt(10) + 1
      // upper bound = a folded date literal + an INTERVAL term — the two
      // r15 date rewrites composed; TOP replaces LIMIT
      val q =
        s"""SELECT TOP $lim g, FIRST(v, id) AS f, LAST(v, id) AS l,
           |  PERCENTILE_RANK(v, $pv) AS pr, COUNT(*) AS n
           |FROM t
           |WHERE ts_us >= DATE '2024-01-03'
           |  AND ts_us < TIMESTAMP '2024-01-05 00:00:00' + INTERVAL $days DAY
           |GROUP BY g
           |ORDER BY g ASC""".stripMargin
      val got = EsSql.run(Map("t" -> ev), q).collect().map(_.toSeq).toSeq
      val d3 = t0 + 2L * 86400L * 1000000L
      val hi = t0 + (4L + days) * 86400L * 1000000L
      val cd = col("v").cast("double")
      val twin = ev.filter(col("ts_us") >= d3 && col("ts_us") < hi)
        .groupBy("g")
        .agg(
          min(struct(col("id").as("o"), col("v").as("v"))).getField("v").as("f"),
          max(struct(col("id").as("o"), col("v").as("v"))).getField("v").as("l"),
          (sum(when(cd <= pv.toDouble, lit(1L))
            .otherwise(when(cd.isNotNull, lit(0L)))).cast("double") * lit(100.0) /
            count(col("v")).cast("double")).as("pr"),
          count(lit(1)).cast("long").as("n"))
        .orderBy(col("g").asc).limit(lim)
        .select("g", "f", "l", "pr", "n")
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"statement diverged from its twin: $q")
    }
  }

  test("25 random row SELECTs (LIKE, computed alias, OFFSET paging) equal twins") {
    val rnd = new scala.util.Random(17L)
    (1 to 25).foreach { _ =>
      val th = rnd.nextInt(800)
      val p = rnd.nextInt(4)
      val div = rnd.nextInt(9) + 2
      val lim = rnd.nextInt(12) + 3
      val off = rnd.nextInt(10)
      val q = s"""SELECT id, v / $div AS vd FROM t
                 |WHERE tag LIKE 'p$p%' AND v > $th
                 |ORDER BY vd DESC, id ASC LIMIT $lim OFFSET $off""".stripMargin
      val got = EsSql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("tag").like(s"p$p%") && col("v") > th)
        .select(col("id"), (col("v") / div).as("vd"))
        .orderBy(col("vd").desc, col("id").asc)
        .limit(lim + off)
        .offset(off)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"statement diverged from its twin: $q")
    }
  }
}
