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
      | [ event where event_type == "click" ]
      | [ event where value > 5 ]""".stripMargin)
      .contains("unsupported eql step syntax"))
  }

  test("maxspan is optional: unbounded sequence matches beyond any span") {
    import spark.implicits._
    // view→click separated by ~11 days: a 1h maxspan prunes it, no
    // maxspan keeps it — same plan, the span predicate just never fires
    val ev = Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 1000000000000L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val q =
      """sequence by user_id
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]""".stripMargin
    val sq = Eql.parse(q)
    assert(sq.maxspanUs === Long.MaxValue)
    assert(Eql.run(ev, q).count() === 1L)
    assert(Eql.run(ev,
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]""".stripMargin).count() === 0L)
  }

  test("all-matches mode: every chain; last-prefix output is a subset; bounds reject") {
    import spark.implicits._
    // user 1: views at 10, 20; clicks at 30, 40 → 4 chains (every pair);
    // last-prefix emits only (20,30) and (20,40) — the freshest prefix
    val ev = Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "view", 20L),
      (3L, 1L, "click", 30L), (4L, 1L, "click", 40L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val q =
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]""".stripMargin
    val all = Eql.runAllMatches(ev, q)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(all === Seq((10L, 30L), (10L, 40L), (20L, 30L), (20L, 40L)))
    val lastPrefix = Eql.run(ev, q)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(lastPrefix === Set((20L, 30L), (20L, 40L)))
    assert(lastPrefix.subsetOf(all.toSet))
    // maxspan prunes chains, and spans crossing the bin boundary survive
    // (the exploded-bin join): view at 3599s before a click still pairs
    val edge = Seq(
      (1L, 7L, "view", 1000000L), (2L, 7L, "click", 3600000000L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    assert(Eql.runAllMatches(edge, q).count() === 1L)
    // same-microsecond events chain by event_id (row-strict, like the
    // window-carry mode) — so last-prefix stays a subset even on ties
    val tied = Seq(
      (1L, 9L, "view", 100L), (2L, 9L, "click", 100L),
      (3L, 9L, "click", 99L)) // id 3 is BEFORE the view in (ts, id) order
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val tiedAll = Eql.runAllMatches(tied, q)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(tiedAll === Seq((100L, 100L)))
    val tiedLast = Eql.run(tied, q)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(tiedLast.subsetOf(tiedAll.toSet))
    // bounds: maxspan stays mandatory (all-chains output over an
    // unbounded span is unbounded)
    assert(intercept[IllegalArgumentException](Eql.runAllMatches(ev,
      """sequence by user_id
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]""".stripMargin)).getMessage
      .contains("requires maxspan"))
    // until in all-matches (the r12 v1 bound, now closed): an error at 25
    // kills chains whose view prefix formed at-or-before it — the
    // (10, 30)/(10, 40) chains die (expiry 25 ≥ view 10, before both
    // clicks); the (20, ...) chains survive only if the expiry predates
    // the view... 25 >= 20, so they die too; a fresh view at 28 pairs.
    val withErr = Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "view", 20L),
      (5L, 1L, "error", 25L), (6L, 1L, "view", 28L),
      (3L, 1L, "click", 30L), (4L, 1L, "click", 40L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val qU =
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]
        | until [ event where event_type == "error" ]""".stripMargin
    val guarded = Eql.runAllMatches(withErr, qU)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(guarded === Seq((28L, 30L), (28L, 40L)))
    // missing gap: a "signup" between view and click violates that pair
    val withGap = Seq(
      (1L, 2L, "view", 10L), (2L, 2L, "signup", 15L),
      (3L, 2L, "click", 20L), (4L, 2L, "view", 18L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val qM =
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ]
        | ![ event where event_type == "signup" ]
        | [ event where event_type == "click" ]""".stripMargin
    val gapped = Eql.runAllMatches(withGap, qM)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // the view at 10 is blocked (signup 15 > 10 before the click); the
    // view at 18 is clean (signup 15 ≤ 18 — at-or-before does not violate)
    assert(gapped === Seq((18L, 20L)))
  }

  test("until clause parses into the expiry step") {
    val sq = Eql.parse("""sequence by user_id with maxspan=1h
      | [ event where event_type == "view" ]
      | [ event where event_type == "click" ] until [ event where event_type == "error" ]""".stripMargin)
    assert(sq.steps.map(_.value) === Seq("view", "click"))
    assert(sq.until.map(_.value) === Some("error"))
  }

  test("until kills in-progress partials; a fresh stage-1 after the expiry restarts") {
    import spark.implicits._
    // key 1: view(10) click(20) — no error: matches
    // key 2: view(10) ERROR(15) click(20) — partial killed: no match
    // key 3: view(10) ERROR(15) view(16) click(20) — fresh view survives
    val ev = Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L),
      (3L, 2L, "view", 10L), (4L, 2L, "error", 15L), (5L, 2L, "click", 20L),
      (6L, 3L, "view", 10L), (7L, 3L, "error", 15L), (8L, 3L, "view", 16L),
      (9L, 3L, "click", 20L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Eql.run(ev,
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]
        | until [ event where event_type == "error" ]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, 10L, 20L), (3L, 16L, 20L)))
    // same events without until: keys 2 and 3 (stale view) match too
    val all = Eql.run(ev,
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ]
        | [ event where event_type == "click" ]""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(all === Seq(1L, 2L, 3L))
  }

  test("event query pipes: head/tail keep canonical ascending order; count collapses") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "view", 10L, 1.0), (2L, 1L, "click", 20L, 2.0),
      (3L, 2L, "view", 30L, 3.0), (4L, 2L, "view", 40L, 9.0),
      (5L, 3L, "view", 50L, 5.0))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    def ids(q: String): Seq[Long] =
      Eql.runEvent(ev, q).collect().map(_.getLong(0)).toSeq
    assert(ids("""view where value >= 1 | head 2""") === Seq(1L, 3L))
    // tail keeps the LAST n but still emits ascending
    assert(ids("""view where value >= 1 | tail 2""") === Seq(4L, 5L))
    assert(ids("""any where user_id == 2""") === Seq(3L, 4L))
    val n = Eql.runEvent(ev, """view where value >= 3 and value <= 9 | count""")
      .collect()
    assert(n.head.getLong(0) === 3L)
    // boolean structure: or + parens + not
    assert(ids("""any where (user_id == 1 or user_id == 3) and not value == 2""")
      === Seq(1L, 5L))
  }

  test("event query rejections: bad pipes, pipes after count, bad operators") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "view", 10L, 1.0))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    def badE(q: String): String =
      intercept[IllegalArgumentException](Eql.runEvent(ev, q)).getMessage
    assert(badE("""view where value == 1 | sort value""").contains("unsupported eql pipe"))
    assert(badE("""view where value == 1 | count | head 2""").contains("follow count"))
    assert(badE("""where value == 1""").contains("unsupported eql event query"))
    assert(badE("""view where value ~ 1""").contains("cannot tokenize"))
  }

  test("sample by: one earliest tuple per key; keys missing a step drop; runs rejected") {
    import spark.implicits._
    val ev = Seq(
      // key 1 has both steps (earliest view 10, earliest error 25)
      (1L, 1L, "view", 10L), (2L, 1L, "view", 12L), (3L, 1L, "error", 25L),
      // key 2 has only views
      (4L, 2L, "view", 30L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Eql.runSample(ev,
      """sample by user_id
        | [ event where event_type == "view" ]
        | [ event where event_type == "error" ]""".stripMargin).collect()
    assert(out.length === 1)
    assert((out.head.getLong(0), out.head.getLong(1), out.head.getLong(2)) === (1L, 10L, 25L))
    assert(intercept[IllegalArgumentException](Eql.runSample(ev,
      """sample by user_id
        | [ event where event_type == "view" ] with runs=2
        | [ event where event_type == "error" ]""".stripMargin)).getMessage
      .contains("runs is not valid"))
  }

  test("missing (!) steps: in-between occurrence kills; boundary at the prefix allowed") {
    import spark.implicits._
    val ev = Seq(
      // key 1: clean view→purchase — matches
      (1L, 1L, "view", 10L), (2L, 1L, "purchase", 20L),
      // key 2: error strictly between — killed
      (3L, 2L, "view", 10L), (4L, 2L, "error", 15L), (5L, 2L, "purchase", 20L),
      // key 3: error AT the view's timestamp — boundary, allowed
      (6L, 3L, "error", 10L), (7L, 3L, "view", 10L), (8L, 3L, "purchase", 20L),
      // key 4: stale view killed, fresh view after the error matches
      (9L, 4L, "view", 10L), (10L, 4L, "error", 15L), (11L, 4L, "view", 16L),
      (12L, 4L, "purchase", 20L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Eql.run(ev,
      """sequence by user_id with maxspan=1h
        |  [ event where event_type == "view" ]
        |  ![ event where event_type == "error" ]
        |  [ event where event_type == "purchase" ]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 10L), (3L, 10L), (4L, 16L)))
  }

  test("missing (!) parse guards: not first, not last, one per gap, no runs") {
    assert(bad("""sequence by u with maxspan=1h
      | ![ event where t == "e" ] [ event where t == "a" ] [ event where t == "b" ]""".stripMargin)
      .contains("cannot be first"))
    assert(bad("""sequence by u with maxspan=1h
      | [ event where t == "a" ] [ event where t == "b" ] ![ event where t == "e" ]""".stripMargin)
      .contains("cannot be last"))
    assert(bad("""sequence by u with maxspan=1h
      | [ event where t == "a" ] ![ event where t == "e" ] ![ event where t == "f" ] [ event where t == "b" ]""".stripMargin)
      .contains("one missing"))
    assert(bad("""sequence by u with maxspan=1h
      | [ event where t == "a" ] ![ event where t == "e" ] with runs=2 [ event where t == "b" ]""".stripMargin)
      .contains("not valid on a missing"))
  }

  test("with runs=N expands to N step copies; bounds enforced") {
    val sq = Eql.parse(
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ] with runs=2
        | [ event where event_type == "purchase" ]""".stripMargin)
    assert(sq.steps.map(_.value) === Seq("view", "view", "purchase"))
    assert(bad(
      """sequence by user_id with maxspan=1h
        | [ event where event_type == "view" ] with runs=9
        | [ event where event_type == "purchase" ]""".stripMargin)
      .contains("runs must be 1-4"))
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
