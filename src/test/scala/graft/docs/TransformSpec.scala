package graft.docs

import graft.SparkSpec

/** Transform latest-form guards (pivot-form numbers ride the d209 oracle
  * gate; latest-form numbers ride d239). */
class TransformSpec extends SparkSpec {

  test("latest keeps the max-(sort,tiebreak) row per key; ties broken deterministically") {
    import spark.implicits._
    // key 1: latest ts 30 wins; key 2: ts tie at 10 — higher event_id
    // wins (the declared tiebreak)
    val src2 = Seq(
      (1L, 10L, "a", 1.0, 100L), (1L, 30L, "b", 2.0, 101L), (1L, 20L, "c", 3.0, 102L),
      (2L, 10L, "d", 4.0, 103L), (2L, 10L, "e", 5.0, 104L))
      .toDF("user_id", "ts_us", "event_type", "value", "event_id")
    val l = Transform.parseLatest(
      """{"source": {"index": "events"},
        | "latest": {"unique_key": ["user_id"], "sort": "ts_us",
        |            "graft_tiebreak": "event_id"},
        | "dest": {"index": "out"}}""".stripMargin)
    val out = Transform.runLatest(src2, l)
      .orderBy("user_id")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("event_id"))).toSeq
    assert(out === Seq((1L, "b", 101L), (2L, "e", 104L)))
  }

  test("downsample: per-(dims, bucket) min/max/sum/count; guards") {
    import spark.implicits._
    val src = Seq(
      ("h1", 0L, 1.0), ("h1", 5L, 3.0), ("h1", 10L, 2.0), // buckets 0,0,10
      ("h2", 12L, 7.0))
      .toDF("host", "ts_us", "v")
    val out = Transform.downsample(src, Seq("host"), "ts_us", 10L, Seq("v"))
      .orderBy("host", "_ts_bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(out === Seq(
      ("h1", 0L, 1.0, 3.0, 4.0, 2L),
      ("h1", 10L, 2.0, 2.0, 2.0, 1L),
      ("h2", 10L, 7.0, 7.0, 7.0, 1L)))
    assert(intercept[IllegalArgumentException](
      Transform.downsample(src, Nil, "ts_us", 10L, Seq("v"))).getMessage
      .contains("dimension"))
    assert(intercept[IllegalArgumentException](
      Transform.downsample(src, Seq("host"), "ts_us", 0L, Seq("v"))).getMessage
      .contains("positive"))
  }

  test("latest rejections: unknown keys, missing parts, bad types") {
    def bad(body: String): String =
      intercept[IllegalArgumentException](Transform.parseLatest(body)).getMessage
    assert(bad("""{"source":{"index":"e"},"latest":{"unique_key":["k"],"sort":"t","retention":1},"dest":{"index":"o"}}""")
      .contains("unsupported latest key"))
    assert(bad("""{"source":{"index":"e"},"latest":{"sort":"t"},"dest":{"index":"o"}}""")
      .contains("unique_key"))
    assert(bad("""{"source":{"index":"e"},"latest":{"unique_key":[],"sort":"t"},"dest":{"index":"o"}}""")
      .contains("unique_key"))
    assert(bad("""{"source":{"index":"e"},"latest":{"unique_key":["k"]},"dest":{"index":"o"}}""")
      .contains("sort"))
    assert(bad("""{"source":{"index":"e"},"pivot":{},"dest":{"index":"o"}}""")
      .contains("unsupported transform key"))
  }
}
