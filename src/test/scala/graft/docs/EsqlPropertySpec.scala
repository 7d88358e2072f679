package graft.docs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style equivalence for the ES|QL compiler: a seeded generator
  * produces random simple pipes (WHERE thresholds, EVAL arithmetic, agg
  * choice, sort direction, limit) and each is checked against the
  * hand-built DataFrame twin — the compiler must add nothing and lose
  * nothing relative to writing the plan directly. Seeded → deterministic,
  * no extra test deps (the DocPropertySpec pattern). */
class EsqlPropertySpec extends SparkSpec {

  private lazy val base = {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    (1 to 400).map { i =>
      (i.toLong, s"u${rnd.nextInt(7)}", rnd.nextInt(1000) / 10.0,
        rnd.nextInt(100).toLong)
    }.toDF("id", "tag", "v", "n")
  }

  test("40 random pipes equal their hand-built DataFrame twins") {
    val rnd = new scala.util.Random(42L)
    (1 to 40).foreach { _ =>
      val th = rnd.nextInt(90) + 5
      val mul = rnd.nextInt(5) + 1
      val desc = rnd.nextBoolean()
      val lim = rnd.nextInt(20) + 1
      val (aggE, aggD) = rnd.nextInt(4) match {
        case 0 => ("SUM(n)", sum(col("n")).cast("long"))
        case 1 => ("MIN(v)", min(col("v")))
        case 2 => ("MAX(v)", max(col("v")))
        case _ => ("COUNT(*)", count(lit(1)).cast("long"))
      }
      val dir = if (desc) "DESC" else "ASC"
      val q = s"FROM t | WHERE v > $th AND n < 90 | EVAL w = v * $mul | " +
        s"STATS a = $aggE, hi = MAX(w) BY tag | SORT tag $dir | LIMIT $lim"
      val got = Esql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("v") > th && col("n") < 90)
        .withColumn("w", col("v") * mul)
        .groupBy("tag").agg(aggD.as("a"), max(col("w")).as("hi"))
        .orderBy(if (desc) col("tag").desc else col("tag").asc)
        .limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"pipe diverged from its twin: $q")
    }
  }

  test("random INLINESTATS pipes equal their window-aggregate twins") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(99L)
    (1 to 15).foreach { _ =>
      val th = rnd.nextInt(70) + 10
      val lim = rnd.nextInt(25) + 5
      val (aggE, aggD) = rnd.nextInt(3) match {
        case 0 => ("MAX(v)", max(col("v")).over(Window.partitionBy(col("tag"))))
        case 1 => ("MIN(n)", min(col("n")).over(Window.partitionBy(col("tag"))))
        case _ => ("COUNT(*)",
          count(lit(1)).over(Window.partitionBy(col("tag"))).cast("long"))
      }
      val q = s"FROM t | WHERE v < $th | INLINESTATS g = $aggE BY tag | " +
        s"KEEP id, g | SORT id ASC | LIMIT $lim"
      val got = Esql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("v") < th)
        .withColumn("g", aggD)
        .select("id", "g")
        .orderBy(col("id").asc)
        .limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"pipe diverged from its twin: $q")
    }
  }

  test("INLINESTATS COUNT_DISTINCT at several thousand distincts per group " +
    "equals countDistinct (the documented state bound is per-group distincts)") {
    import spark.implicits._
    // 3 groups × ~4000 distinct values each — the collect_set window state
    // the Esql.scala cardinality note documents, well past toy sizes
    val wide = (1 to 12000).map { i =>
      (i.toLong, s"g${i % 3}", s"val_${(i * 2654435761L) % 4001}")
    }.toDF("id", "tag", "s")
    val got = Esql.run(Map("t" -> wide),
      "FROM t | INLINESTATS u = COUNT_DISTINCT(s) BY tag | " +
        "STATS mx = MAX(u), mn = MIN(u) BY tag | SORT tag ASC")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val twin = wide.groupBy("tag").agg(countDistinct(col("s")).as("u"))
      .orderBy("tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(1))).toSeq
    assert(got === twin)
  }

  test("row pipes: WHERE + EVAL + KEEP + SORT + LIMIT equal the direct plan") {
    val rnd = new scala.util.Random(7L)
    (1 to 20).foreach { _ =>
      val th = rnd.nextInt(900) / 10.0
      val lim = rnd.nextInt(30) + 1
      val q = s"FROM t | WHERE v >= $th | EVAL r = v - n | " +
        s"KEEP id, r | SORT r DESC, id ASC | LIMIT $lim"
      val got = Esql.run(Map("t" -> base), q).collect().map(_.toSeq).toSeq
      val twin = base.filter(col("v") >= th)
        .withColumn("r", col("v") - col("n"))
        .select("id", "r")
        .orderBy(col("r").desc, col("id").asc)
        .limit(lim)
        .collect().map(_.toSeq).toSeq
      assert(got === twin, s"pipe diverged from its twin: $q")
    }
  }
}
