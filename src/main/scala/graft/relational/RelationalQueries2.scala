package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational surface, part 2 — grouping-set/cube, pivot, event-time
  * sessionization, as-of join, and exact percentiles (SURVEY §2D
  * dispositions that round 1 left to built-ins, now exercised as declared
  * queries so the driver's oracle locks them).
  *
  * Oracle-parity rules are RelationalQueries' (decimal-cast sums, total
  * ORDER BY, IEEE-deterministic per-row math).
  */
object RelationalQueries2 {

  type Q = (SparkSession, String) => DataFrame

  private def m(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dbl(c: Column): Column = c.cast(DecimalType(28, 6)).cast("double")
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // ---------------------------------------------------------------- q21
  /** CUBE grouping sets over (mktsegment, nation) — all four grouping
    * combinations in one pass (Spark expands to a single shuffle). */
  private def q21(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dbl(sum(m(col("c_acctbal")))).as("total_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q21Sql =
    """SELECT c_mktsegment, n_name, COUNT(*) AS n_cust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE (c_mktsegment, n_name)
      |ORDER BY c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Pivot: order counts per nation × priority — Spark `pivot` with an
    * explicit value list (no extra distinct-scan), equivalent to manual
    * CASE aggregation; one shuffle on the groupBy key. */
  private def q22(s: SparkSession, d: String): DataFrame = {
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot(col("o_orderpriority"), pris)
      .agg(count(lit(1)))
      .select(col("n_name"),
        coalesce(col("1-URGENT"), lit(0L)).as("p_urgent"),
        coalesce(col("2-HIGH"), lit(0L)).as("p_high"),
        coalesce(col("3-MEDIUM"), lit(0L)).as("p_medium"),
        coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p_notspec"),
        coalesce(col("5-LOW"), lit(0L)).as("p_low"))
      .orderBy(col("n_name"))
  }

  private val q22Sql =
    """SELECT n_name,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
      |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
      |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
      |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
      |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Event-time sessionization (gaps-and-islands): per-user sessions split
    * at >30-min gaps — lag + cumulative-sum window, then per-session and
    * per-user aggregation. All windows partition by user_id: one shuffle,
    * no cross-user data movement, scales with user count. */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us").as("us"))
    val flagged = ev.select(col("user_id"), col("event_id"), col("us"),
      when(col("us") - lag(col("us"), 1).over(wOrd) > 30L * 60 * 1000000, 1L)
        .otherwise(0L).as("new_sess"))
    val sess = flagged.select(col("user_id"), col("us"),
      sum(col("new_sess")).over(wOrd).as("sess_id"))
    sess.groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long").as("dur_sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_sess_events"),
        sum(col("dur_sec")).as("total_dur_sec"))
      .orderBy(col("user_id"))
  }

  private val q23Sql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN us - LAG(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |              > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM ev),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess_id
      |  FROM flagged),
      |per_sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS n_events,
      |    (MAX(us) - MIN(us)) // 1000000 AS dur_sec
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  MAX(n_events) AS max_sess_events,
      |  CAST(SUM(dur_sec) AS BIGINT) AS total_dur_sec
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q24
  /** As-of join: each purchase event picks the latest view event of the
    * same user at-or-before its time. Spark has no as-of operator, so it is
    * composed as the scalable union-and-window trick — tag both streams,
    * one window pass per user — instead of a range join (which would
    * explode to |purchases|×|views| pairs before filtering at scale). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("ts_us").as("us"), col("event_type"), col("value"))
    // side 0 = view (the reference stream), side 1 = purchase (the probe):
    // at equal us, view sorts first, so a simultaneous view IS visible.
    val tagged = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us"), lit(0).as("side"), col("event_id"), col("value"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), lit(1).as("side"), col("event_id"), col("value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = tagged.select(
      col("user_id"), col("us"), col("side"), col("event_id"), col("value"),
      last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w).as("view_id"),
      last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w).as("view_us"))
    joined.filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("purchase_value"), col("view_id"),
        ((col("us") - col("view_us")) / lit(1000000L)).cast("long").as("lag_sec"))
      .orderBy(col("purchase_id"))
  }

  private val q24Sql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value FROM events),
      |tagged AS (
      |  SELECT user_id, us, 0 AS side, event_id, value FROM ev WHERE event_type = 'view'
      |  UNION ALL
      |  SELECT user_id, us, 1 AS side, event_id, value FROM ev WHERE event_type = 'purchase'),
      |joined AS (
      |  SELECT user_id, us, side, event_id, value,
      |    LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, side, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
      |    LAST_VALUE(CASE WHEN side = 0 THEN us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, side, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_us
      |  FROM tagged)
      |SELECT event_id AS purchase_id, user_id, value AS purchase_value,
      |  view_id, (us - view_us) // 1000000 AS lag_sec
      |FROM joined WHERE side = 1 ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Exact percentiles (binary-exact fractions over integer inputs, so the
    * linear interpolation is IEEE-exact in any engine). Spark computes all
    * three in one aggregation pass. */
  private def q25(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(CAST(l_quantity AS BIGINT), 0.25)").as("p25"),
        expr("percentile(CAST(l_quantity AS BIGINT), 0.5)").as("p50"),
        expr("percentile(CAST(l_quantity AS BIGINT), 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val q25Sql =
    """SELECT l_returnflag,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS p50,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q45
  /** APPROXIMATE percentiles via Spark's mergeable Greenwald-Khanna
    * sketch (`approx_percentile`) beside the exact values, with an
    * IN-QUERY rank-error audit — the q27 HLL pattern applied to
    * quantiles. At 100 TB an exact percentile needs every group value
    * sorted (the q25 path); the GK sketch is one pass, partial-combines
    * map-side like any agg, and holds O(accuracy) memory per group — the
    * scale path for quantile dashboards. The audit counts each sketch
    * result's actual rank in a second bounded pass (broadcast of the
    * |groups|-row sketch frame) and asserts it landed within 0.5% of the
    * target rank (5× the sketch's ε=1/1000 guarantee, slack for
    * duplicate values at the cut). Oracle pins the exact values; the
    * audit column must be uniformly true. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val price = expr("CAST(FLOOR(l_extendedprice) AS BIGINT)")
    val agg = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(CAST(FLOOR(l_extendedprice) AS BIGINT), 0.5)").as("exact_p50"),
        expr("percentile(CAST(FLOOR(l_extendedprice) AS BIGINT), 0.95)").as("exact_p95"),
        expr("approx_percentile(CAST(FLOOR(l_extendedprice) AS BIGINT), 0.5, 1000)").as("_a50"),
        expr("approx_percentile(CAST(FLOOR(l_extendedprice) AS BIGINT), 0.95, 1000)").as("_a95"),
        count(lit(1)).cast("long").as("n"))
    // the returned value occupies the RANK INTERVAL [count(<)+1, count(≤)]
    // (duplicates make it a run); the audit passes iff that interval
    // intersects the target band — counting only ≤ would fail a correct
    // answer whose duplicate run extends past the band
    val ranks = t(s, d, "lineitem")
      .join(broadcast(agg.select(col("l_returnflag"), col("_a50"), col("_a95"))),
        "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(sum(when(price < col("_a50"), 1L).otherwise(0L)).as("_lt50"),
        sum(when(price <= col("_a50"), 1L).otherwise(0L)).as("_le50"),
        sum(when(price < col("_a95"), 1L).otherwise(0L)).as("_lt95"),
        sum(when(price <= col("_a95"), 1L).otherwise(0L)).as("_le95"))
    def ok(lt: String, le: String, p: Double) =
      col(lt) + 1 <= col("n") * p + (col("n") * 0.005 + 1) &&
        col(le) >= col("n") * p - (col("n") * 0.005 + 1)
    agg.join(ranks, "l_returnflag")
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"), col("n"),
        (ok("_lt50", "_le50", 0.5) && ok("_lt95", "_le95", 0.95))
          .as("gk_within_bound"))
      .orderBy(col("l_returnflag"))
  }

  private val q45Sql =
    """SELECT l_returnflag,
      |  quantile_cont(CAST(FLOOR(l_extendedprice) AS BIGINT), 0.5) AS exact_p50,
      |  quantile_cont(CAST(FLOOR(l_extendedprice) AS BIGINT), 0.95) AS exact_p95,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  TRUE AS gk_within_bound
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q26
  /** JSON functions over a JSON-string column (`events.props`): extraction,
    * typed cast, aggregation by extracted value — per-row codegen'd path
    * functions, no shuffle until the final groupBy. */
  private def q26(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), countDistinct(col("k")).as("n_distinct"))
      .orderBy(col("k_mod"))

  private val q26Sql =
    """SELECT k % 10 AS k_mod, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k,
      |  COUNT(DISTINCT k) AS n_distinct
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY k % 10 ORDER BY k_mod""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Approximate distinct (HyperLogLog++): THE cardinality operator at
    * 100 TB — fixed-size sketches merge map-side, so the shuffle carries
    * one sketch per group instead of the distinct values. Raw sketch
    * estimates are engine-specific, so they can't be hash-compared to a
    * DuckDB oracle; instead the query emits the EXACT distinct counts
    * (oracle-checked) plus `hll_within_bound` — the HLL estimates tested
    * in-query against those exact counts at 5× the configured rsd (0.02 →
    * ±10%, generous: HLL++ at rsd 0.02 is overwhelmingly within ±6%).
    * The oracle asserts the same column is TRUE, so the sketch path is
    * exercised AND gated, not merely rows-counted; ExtSpec bounds the
    * error more tightly. */
  private def q27(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("_ao"),
        approx_count_distinct(col("l_partkey"), 0.02).as("_ap"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("_ao") - col("exact_orders")) <= col("exact_orders") * 0.10 &&
          abs(col("_ap") - col("exact_parts")) <= col("exact_parts") * 0.10)
          .as("hll_within_bound"))
      .orderBy(col("l_returnflag"))

  private val q27Sql =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS hll_within_bound
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Range (interval) join via BIN BUCKETING — the operator Spark lacks
    * natively: probe rows (lineitem ship events) joined to time intervals
    * (maintenance windows derived from orders) on `lo <= t <= hi`.
    *
    * The naive plan is a BroadcastNestedLoopJoin — O(|probe|·|intervals|)
    * comparisons, a scale-killer. Composing built-ins instead (preference
    * (a) over a custom operator): pick the bin width = the MAXIMUM interval
    * length, explode each interval to the ≤2 bins it can overlap, map each
    * probe to its single bin, equi-join on the bin, then apply the exact
    * range predicate as a post-join filter. The join becomes a hash join
    * on `bin` — one shuffle, candidates ∝ rows per bin, never the cross
    * product. Each (interval, probe) pair meets in exactly the probe's own
    * bin, so no dedup is needed. All bin arithmetic on integer epoch
    * microseconds — exact in any engine.
    */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val binW = 72L * 3600 * 1000000 // 72 h in µs = max interval length
    val iv = t(s, d, "orders").filter(col("o_orderkey") % 37 === 0)
      // parquet timestamps read as TIMESTAMP_NTZ; the session is pinned to
      // UTC so the cast matches DuckDB's naive epoch_us exactly
      .select(col("o_orderkey").as("iv_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("lo"))
      .withColumn("hi", col("lo") + (col("iv_id") % 72 + 1) * 3600L * 1000000)
    val probes = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ts"))
    val ivB = iv.withColumn("bin",
      explode(sequence(floor(col("lo") / binW), floor(col("hi") / binW))))
    val prB = probes.withColumn("bin", floor(col("ts") / binW))
    ivB.join(prB, Seq("bin"))
      .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
      .groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n_hits"),
        dbl(sum(m(col("l_quantity")))).as("sum_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))
      .orderBy(col("iv_id"))
  }

  private val q28Sql =
    """WITH iv AS (
      |  SELECT o_orderkey AS iv_id, epoch_us(o_orderdate) AS lo,
      |    epoch_us(o_orderdate) + (o_orderkey % 72 + 1) * 3600 * 1000000 AS hi
      |  FROM orders WHERE o_orderkey % 37 = 0)
      |SELECT iv_id, COUNT(*) AS n_hits,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
      |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
      |FROM iv JOIN lineitem
      |  ON epoch_us(l_shipdate) BETWEEN lo AND hi
      |GROUP BY iv_id ORDER BY iv_id""".stripMargin

  // ---------------------------------------------------------------- registry

  // ---------------------------------------------------------------- q29
  /** CSV source/sink round-trip — the interchange format every ingest
    * pipeline still meets. Writes a frame whose string column embeds the
    * three CSV hazards (comma, double-quote, leading space) plus an
    * exact-decimal money column, reads it back with an explicit schema,
    * and aggregates: `n_text_ok` counts rows whose string survived
    * byte-exactly (re-derived from the key, so any quoting/escaping loss
    * shows up as a count drop, which the oracle — computed without any
    * CSV hop — would expose). Decimal, not double, crosses the text
    * boundary: decimal text is exact by construction.
    *
    * Scale shape: CSV write/read is an embarrassingly parallel scan —
    * one file per partition, no shuffle until the final aggregate. CSV
    * reads get no pushdown/pruning (flat text) — the reason the engine's
    * canonical storage is parquet and CSV appears only at the edges. */
  private def q29(s: SparkSession, d: String): DataFrame = {
    def note(key: Column): Column =
      concat(lit("p,\"q\" "), key.cast("string"), lit(" end"))
    val src = t(s, d, "orders").select(
      col("o_orderkey"),
      m(col("o_totalprice")).as("price"),
      note(col("o_orderkey")).as("note"))
    val dir = graft.TempDirs.create("graft-csv-").toString
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = s.read.option("header", "true").schema(src.schema).csv(dir)
    back.agg(
      count(lit(1)).as("n_rows"),
      dbl(sum(col("price"))).as("total_price"),
      count(when(col("note") === note(col("o_orderkey")), 1)).as("n_text_ok"),
      countDistinct(col("o_orderkey")).as("n_keys"))
  }

  private val q29Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total_price,
      |  CAST(COUNT(*) AS BIGINT) AS n_text_ok,
      |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q30
  /** Explicit GROUPING SETS — the general form behind rollup (q11) and
    * cube (q21): an arbitrary set list ((priority, status), (priority),
    * ()) with `grouping_id` disambiguating which level a row belongs to
    * (NULL-as-key vs NULL-as-subtotal). Spark expands the sets into ONE
    * Expand + hash aggregation — one shuffle regardless of set count. */
  private def q30(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dbl(sum(m(col("o_totalprice")))).as("total"))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("gid"), col("n"), col("total"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  private val q30Sql =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q31
  /** UNPIVOT (melt) — wide measure columns to (measure, value) rows, then
    * a per-measure profile. Spark `unpivot` is a zero-shuffle Expand (4
    * rows out per row in); the only shuffle is the final 4-group
    * aggregate. Values go through the decimal cast BEFORE the melt so
    * the per-measure sums are order-independent. */
  private def q31(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        m(col("l_quantity")).as("l_quantity"),
        m(col("l_extendedprice")).as("l_extendedprice"),
        m(col("l_discount")).as("l_discount"),
        m(col("l_tax")).as("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "v")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), dbl(min(col("v"))).as("v_min"),
        dbl(max(col("v"))).as("v_max"), dbl(sum(col("v"))).as("v_sum"))
      .orderBy(col("measure"))

  private val q31Sql = {
    def leg(c: String) =
      s"SELECT '$c' AS measure, CAST($c AS DECIMAL(12,2)) AS v FROM lineitem"
    s"""WITH u AS (
       |${Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
           .map(leg).mkString("\nUNION ALL ")})
       |SELECT measure, COUNT(*) AS n,
       |  CAST(CAST(MIN(v) AS DECIMAL(28,6)) AS DOUBLE) AS v_min,
       |  CAST(CAST(MAX(v) AS DECIMAL(28,6)) AS DOUBLE) AS v_max,
       |  CAST(CAST(SUM(v) AS DECIMAL(28,6)) AS DOUBLE) AS v_sum
       |FROM u GROUP BY measure ORDER BY measure""".stripMargin
  }

  // ---------------------------------------------------------------- q32
  /** Ordered string aggregation (LISTAGG/string_agg) — `collect_set` is
    * unordered under partial aggregation, so determinism comes from
    * `array_sort` BEFORE the join; one shuffle on the group key, the
    * dimension broadcast. */
  private def q32(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))

  private val q32Sql =
    """SELECT n_name,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  COUNT(*) AS n_cust
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Correlated LATERAL subquery — top-2 customers per nation via a
    * correlated ORDER BY ... LIMIT, the SQL:2016 lateral shape. Catalyst
    * rewrites the correlation into a join + per-group limit rather than
    * executing the subquery per row — the plan, not the syntax, is what
    * runs at scale. */
  private def q33(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT n_name, c_name, c_acctbal
         |FROM parquet.`$d/nation.parquet` n,
         |LATERAL (SELECT c_name, c_acctbal FROM parquet.`$d/customer.parquet` c
         |         WHERE c.c_nationkey = n.n_nationkey
         |         ORDER BY c_acctbal DESC, c_name LIMIT 2)
         |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)

  private val q33Sql =
    """SELECT n_name, c_name, c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) s
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Distribution window functions — ntile / percent_rank / cume_dist per
    * segment (ranked by balance, key-tiebroken so the ordering is total).
    * percent_rank = (rank-1)/(n-1) and cume_dist = rows≤cur / n are each
    * ONE double division of exact integers — engine-bit-identical. One
    * shuffle on the partition key. */
  private def q34(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .filter(col("c_custkey") % 20 === 0)
      .orderBy(col("c_custkey"))
  }

  private val q34Sql =
    """SELECT c_custkey, c_mktsegment, c_acctbal, quartile, pr, cd FROM (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    NTILE(4) OVER w AS quartile,
      |    PERCENT_RANK() OVER w AS pr,
      |    CUME_DIST() OVER w AS cd
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
      |WHERE c_custkey % 20 = 0 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Interval RANGE window frame — the trailing-24 h rolling aggregate
    * per key (rate limiting, rolling load, anomaly baselines). The frame
    * is a NUMERIC range over epoch micros, so the DataFrame API's
    * `rangeBetween` expresses it directly (no interval literal needed)
    * and both engines share the frame semantics exactly, ties (RANGE
    * peers) included. The rolling sum goes through the exact
    * decimal-cast bridge — a sliding double sum would depend on each
    * engine's incremental-evaluation order. One shuffle on the partition
    * key; the frame scan is sort-local per partition. */
  private def q35(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"))
      .rangeBetween(-86400000000L, 0L) // trailing 24 h in epoch micros
    graft.Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .select(col("event_id"), col("event_type"),
        count(lit(1)).over(w).as("n_24h"),
        dbl(sum(m(col("value"))).over(w)).as("sum_24h"))
      .filter(col("event_id") % 97 === 0)
      .orderBy(col("event_id"))
  }

  private val q35Sql =
    """SELECT event_id, event_type, n_24h, sum_24h FROM (
      |  SELECT event_id, event_type,
      |    COUNT(*) OVER w AS n_24h,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DECIMAL(28,6)) AS DOUBLE)
      |      AS sum_24h
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
      |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
      |WHERE event_id % 97 = 0 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q36
  /** The SQL front door: ONE dialect-portable ANSI string (TPC-H Q5's
    * local-supplier-volume shape, decimal-exact revenue) registered over
    * temp views and executed verbatim by `spark.sql` — and, unchanged,
    * by the DuckDB oracle. Proves a SQL-speaking user of the reference
    * can run textual queries against this engine with no translation
    * layer; Catalyst plans the six-table join with the same broadcast/
    * AQE decisions as the DataFrame surface (nation/region broadcast,
    * fact side never shuffled for them). */
  private def q36(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q36Sql)
  }

  private val q36Sql =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4))))
      |    AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Linear-regression aggregates (regr_slope / regr_intercept / regr_r2
    * / corr) per group — computed from EXACT integer moment sums (one
    * hash aggregation; Σx, Σy, Σxy, Σx², Σy² are exact longs at any
    * scale that fits 2^63, then ONE double division each) rather than
    * the builtins: Spark's regr_* merge Welford co-moments in partition
    * order, which is floating-point ORDER-DEPENDENT across runs — the
    * moment form is bit-stable and engine-portable. Same answer, exact. */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val x = col("l_linenumber").cast("long")
    val y = col("l_quantity").cast("long")
    val g = t(s, d, "lineitem").groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) =
      (col("sx").cast("double"), col("sy").cast("double"),
        col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    val covN = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    g.select(col("l_returnflag"), col("n"),
        (covN / varX).as("slope"),
        ((sy - (covN / varX) * sx) / n).as("intercept"),
        (covN * covN / (varX * varY)).as("r2"),
        (covN / sqrt(varX * varY)).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  private val q37Sql =
    """WITH g AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(l_linenumber) AS BIGINT) AS sx,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy,
      |    CAST(SUM(l_linenumber * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxy,
      |    CAST(SUM(l_linenumber * l_linenumber) AS BIGINT) AS sxx,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
      |  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS intercept,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |       * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr
      |FROM g ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Batch MERGE (CDC apply onto a snapshot) with the per-action AUDIT a
    * lakehouse writer emits — distinct from st1's empty-state streaming
    * upsert: here a populated SNAPSHOT (each user's last event in the
    * log's first half) receives the second half as a changelog, and the
    * output is the merge-stats row set: `inserted` (changelog-only key),
    * `updated` (both, last change not a delete), `deleted` (existing key
    * whose last change is an `error`), `unchanged` (snapshot-only key).
    * Shape: one windowed compaction per side + ONE full-outer equi-join
    * on the key + one tiny aggregation — at 100 TB exactly two shuffles
    * on user_id, the Delta/Iceberg MERGE audit shape. The split point
    * (the log's last 2% as the changelog) and the planted NEW users
    * (id shifted by max+1 — the m5 collision-proof rule — so `inserted`
    * is exercised; the corpus's 150 users all predate any split) are
    * 1-row aggregates broadcast into the predicates. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val bounds = broadcast(ev.agg(
      ((max(col("event_id")) + 1L) * 49L / 50L).cast("long").as("_mid"),
      (max(col("user_id")) + 1L).as("_ushift")))
    val halved = ev.crossJoin(bounds)
    def lastPerUser(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("event_type"))
    }
    val snapshot = lastPerUser(halved.filter(col("event_id") < col("_mid")))
      .select(col("user_id").as("s_user"), col("event_type").as("s_type"))
    val changelog = halved.filter(col("event_id") >= col("_mid"))
    val newUsers = changelog.filter(col("event_id") % 3 === 0)
      .withColumn("user_id", col("user_id") + col("_ushift"))
    val changes = lastPerUser(changelog.unionByName(newUsers))
      .select(col("user_id").as("c_user"), col("event_type").as("c_type"))
    snapshot.join(changes, col("s_user") === col("c_user"), "full_outer")
      .select(
        when(col("s_user").isNull, "inserted")
          .when(col("c_user").isNull, "unchanged")
          .when(col("c_type") === "error", "deleted")
          .otherwise("updated").as("action"))
      .groupBy(col("action")).agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy(col("action"))
  }

  private val q38Sql =
    """WITH b AS (SELECT (MAX(event_id) + 1) * 49 // 50 AS m,
      |    MAX(user_id) + 1 AS ush FROM events),
      |snap AS (SELECT user_id AS s_user, event_type AS s_type FROM (
      |    SELECT user_id, event_type, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rk
      |    FROM events, b WHERE event_id < b.m) WHERE rk = 1),
      |clog AS (SELECT user_id, event_type, ts, event_id FROM events, b
      |    WHERE event_id >= b.m
      |  UNION ALL
      |  SELECT user_id + b.ush, event_type, ts, event_id FROM events, b
      |    WHERE event_id >= b.m AND event_id % 3 = 0),
      |chg AS (SELECT user_id AS c_user, event_type AS c_type FROM (
      |    SELECT user_id, event_type, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rk
      |    FROM clog) WHERE rk = 1)
      |SELECT CASE WHEN s_user IS NULL THEN 'inserted'
      |            WHEN c_user IS NULL THEN 'unchanged'
      |            WHEN c_type = 'error' THEN 'deleted'
      |            ELSE 'updated' END AS action,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM snap FULL OUTER JOIN chg ON s_user = c_user
      |GROUP BY 1 ORDER BY action""".stripMargin

  // ---------------------------------------------------------------- q39
  /** SALTED skew join — the hand-rolled mitigation for a hot key that
    * would otherwise pin one reducer (AQE's skew-join split handles
    * sort-merge spills, but a broadcast-ineligible hot key against a
    * small dim is still the classic salting case): the fact side is
    * ~90% one synthetic key; the dim side REPLICATES each key × 8 salts
    * (|dim|×8 rows — still tiny), the fact side draws a deterministic
    * salt, and the join runs on (key, salt) so the hot key spreads over
    * 8 reducers. The salt is semantically neutral: the oracle is the
    * PLAIN join — equality IS the correctness proof of the rewrite.
    * Plan-pinned (PlanAuditSpec): the join condition carries the salt. */
  private def q39(s: SparkSession, d: String): DataFrame = {
    val salts = 8
    val fact = t(s, d, "lineitem").select(
      when(col("l_orderkey") % 100 < 90, 0L)
        .otherwise(col("l_orderkey") % 7 + 1L).as("k"),
      pmod(col("l_orderkey") + col("l_linenumber"), lit(salts.toLong)).as("salt"),
      m(col("l_extendedprice")).as("price"))
    val dim = s.createDataFrame(
      (0L to 7L).map(k => (k, if (k == 0) "hot" else s"cold_$k"))).toDF("k", "label")
    val saltedDim = dim.crossJoin(
      s.range(salts.toLong).select(col("id").as("salt")))
    fact.join(saltedDim, Seq("k", "salt"))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n_items"), dbl(sum(col("price"))).as("total"))
      .orderBy(col("label"))
  }

  private val q39Sql =
    """WITH fact AS (SELECT
      |    CASE WHEN l_orderkey % 100 < 90 THEN 0 ELSE l_orderkey % 7 + 1 END AS k,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      |  FROM lineitem),
      |dim AS (SELECT * FROM (VALUES (0, 'hot'), (1, 'cold_1'), (2, 'cold_2'),
      |    (3, 'cold_3'), (4, 'cold_4'), (5, 'cold_5'), (6, 'cold_6'),
      |    (7, 'cold_7')) AS d(k, label))
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(CAST(SUM(price) AS DECIMAL(28,6)) AS DOUBLE) AS total
      |FROM fact JOIN dim USING (k)
      |GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q40
  /** INCREMENTAL aggregate maintenance — the materialized-view refresh
    * op: a pre-aggregated partial state (count/sum per key over the
    * log's first ~80%) absorbs a fresh delta by aggregating ONLY the
    * delta and merging partials (sum of counts, sum of sums) — never
    * re-reading the historical corpus. avg derives from merged partials
    * (decomposable-aggregate algebra; the same rule EsAggs uses for
    * non-leaf split metrics). The oracle is the FULL aggregation over
    * everything — equality proves the incremental path exact. At 100 TB
    * the delta-side cost is O(delta); the state side is a co-partitioned
    * table (the st1 bucketing shape). */
  private def q40(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val cut = broadcast(li.agg(((max(col("l_orderkey")) + 1L) * 4L / 5L)
      .cast("long").as("_cut")))
    val tagged = li.crossJoin(cut)
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).cast("long").as("pn"),
          sum(m(col("l_quantity"))).cast(DecimalType(20, 2)).as("pq"))
    val state = partials(tagged.filter(col("l_orderkey") < col("_cut")))
    val delta = partials(tagged.filter(col("l_orderkey") >= col("_cut")))
    state.unionByName(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("pn")).cast("long").as("n_items"),
        dbl(sum(col("pq"))).as("sum_qty"),
        (sum(col("pq")).cast(DecimalType(28, 6)) / sum(col("pn")))
          .cast(DecimalType(28, 6)).cast("double").as("avg_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q40Sql =
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE)
      |    AS sum_qty,
      |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,6))
      |    / COUNT(*) AS DECIMAL(28,6)) AS DOUBLE) AS avg_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q41
  /** SCD Type-2 history build — the warehouse-standard "slowly changing
    * dimension" derivation: collapse each user's event stream into
    * validity intervals of the tracked attribute (`event_type` as the
    * changing segment): consecutive same-value runs merge, each run gets
    * `valid_from`/`valid_to` (next run's start; NULL = current), a
    * 1-based `version`, and an `is_current` flag.
    *
    * Scale shape: everything rides ONE user-partitioned sort (lag →
    * run-id prefix sum → per-run aggregate → lead), so the corpus
    * shuffles once on the dimension key — the same plan builds a 100 TB
    * history table. Deterministic run order via the (ts_us, event_id)
    * tiebreak. */
  /** The SCD2 core over any (user_id, event_id, ts_us, event_type) change
    * log — shared by q41 (full build) and q43 (incremental maintenance). */
  private def scd2(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val runs = ev
      .withColumn("_chg", when(lag(col("event_type"), 1).over(wOrd).isNull ||
        lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("_chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("ts_us")).as("valid_from"),
        min(col("event_type")).as("segment"), // all equal within a run; min = the value, order-free
        count(lit(1)).cast("long").as("n_events"))
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wNext))
      .select(col("user_id"), col("version"), col("segment"),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
  }

  private def q41(s: SparkSession, d: String): DataFrame =
    scd2(Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type")))
      .orderBy(col("user_id"), col("version"))

  // ---------------------------------------------------------------- q43
  /** INCREMENTAL SCD2 maintenance — the production delta: a late batch of
    * changes (the last ~20% of event time, the q40 split) arrives against
    * an existing history table. Only AFFECTED users (those present in the
    * batch) are rebuilt from their full change log; everyone else's rows
    * pass through untouched — the cost is proportional to the delta's
    * user set, not the dimension. The ORACLE is the FULL recompute (the
    * q41 SQL verbatim), so the gate itself proves incremental == full —
    * the q40/d201 equivalence-proof pattern. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
    val cut = broadcast(ev.agg((min(col("ts_us")) +
      ((max(col("ts_us")) - min(col("ts_us"))) * 4L) / 5L).as("_cut")))
    val tagged = ev.crossJoin(cut)
    val base = tagged.filter(col("ts_us") < col("_cut")).drop("_cut")
    val delta = tagged.filter(col("ts_us") >= col("_cut")).drop("_cut")
    val affected = delta.select(col("user_id")).distinct()
    val untouched = scd2(base).join(affected, Seq("user_id"), "left_anti")
    val rebuilt = scd2(ev.join(affected, Seq("user_id"), "left_semi"))
    untouched.unionByName(rebuilt).orderBy(col("user_id"), col("version"))
  }

  private val q41Sql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |chg AS (
      |  SELECT *, CASE WHEN LAG(event_type) OVER w IS NULL
      |                   OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS _chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |runs0 AS (
      |  SELECT *, CAST(SUM(_chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM chg),
      |runs AS (
      |  SELECT user_id, version, MIN(ts_us) AS valid_from,
      |    MIN(event_type) AS segment, CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM runs0 GROUP BY user_id, version)
      |SELECT user_id, version, segment, valid_from,
      |  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
      |  n_events,
      |  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
      |    AS is_current
      |FROM runs ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Ordered funnel analysis (view → click → purchase) — the product-
    * analytics standard: a user converts to stage k only via an event
    * AFTER their stage-(k-1) entry time. Sequential dependency rides
    * CHAINED window expressions over ONE user partitioning (t1 = first
    * view; t2 = first click after t1; t3 = first purchase after t2) —
    * the three windows share the same partition spec, so Catalyst plans
    * a single shuffle + one Window operator chain, no self-joins. Output:
    * per-stage entered-user counts and step conversion rates. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts_us"), col("event_type"))
    val staged = ev
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts_us") > col("t1"), col("ts_us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts_us") > col("t2"), col("ts_us"))).over(w))
    val perUser = staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    val funnel = perUser.agg(
      count(lit(1)).cast("long").as("n_users"),
      count(col("t1")).cast("long").as("s1_view"),
      count(col("t2")).cast("long").as("s2_click"),
      count(col("t3")).cast("long").as("s3_purchase"))
    funnel.select(col("n_users"), col("s1_view"), col("s2_click"), col("s3_purchase"),
      (col("s2_click").cast("double") / col("s1_view")).as("conv_1_2"),
      (col("s3_purchase").cast("double") / col("s2_click")).as("conv_2_3"))
  }

  private val q42Sql =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
      |         OVER (PARTITION BY user_id) AS t1 FROM ev),
      |s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
      |         OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
      |         OVER (PARTITION BY user_id) AS t3 FROM s2),
      |pu AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      |       FROM s3 GROUP BY user_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(COUNT(t1) AS BIGINT) AS s1_view,
      |  CAST(COUNT(t2) AS BIGINT) AS s2_click,
      |  CAST(COUNT(t3) AS BIGINT) AS s3_purchase,
      |  CAST(COUNT(t2) AS DOUBLE) / COUNT(t1) AS conv_1_2,
      |  CAST(COUNT(t3) AS DOUBLE) / COUNT(t2) AS conv_2_3
      |FROM pu""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Z-order clustering (the lakehouse OPTIMIZE ZORDER BY shape): both
    * dimensions min-max-quantized to 8 bits (fixed IEEE op sequence — the
    * oracle mirror is bit-exact), bit-interleaved into a 16-bit z-value,
    * bucketed by z-range. Rows close in z are close in BOTH dimensions,
    * so sorting the table by z before writing gives parquet row-group
    * min/max stats that prune on EITHER filter column — the write side is
    * `repartitionByRange($"z").sortWithinPartitions($"z")` and costs one
    * range shuffle at any scale. The gate checks the z math + the
    * per-bucket dimension envelopes (the quantity pruning depends on).
    * The only join is the hinted 1-row min/max broadcast. */
  private def zInterleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** (c, day, z) for every order — the frame the z-ordered WRITE sorts by
    * (exposed for ZOrderSpec's layout assertion). */
  private[graft] def zFrame(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(
      col("o_custkey").as("c"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"))
    val mm = o.agg(min("c").as("minc"), max("c").as("maxc"),
      min("day").as("mind"), max("day").as("maxd"))
    o.crossJoin(broadcast(mm))
      .select(col("c"), col("day"),
        expr("CAST(floor((c - minc) * 255.0 / greatest(maxc - minc, 1)) AS BIGINT)").as("n1"),
        expr("CAST(floor((day - mind) * 255.0 / greatest(maxd - mind, 1)) AS BIGINT)").as("n2"))
      .withColumn("z", expr(zInterleaveSql("n1", "n2", 8)))
  }

  private def q44(s: SparkSession, d: String): DataFrame =
    zFrame(s, d)
      .withColumn("bucket", expr("z DIV 4096"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        min("c").as("min_cust"), max("c").as("max_cust"),
        min("day").as("min_day"), max("day").as("max_day"))
      .orderBy(col("bucket"))

  private val q44Sql =
    s"""WITH o AS (
       |  SELECT o_custkey AS c, epoch_us(o_orderdate) // 86400000000 AS day
       |  FROM orders),
       |mm AS (SELECT MIN(c) AS minc, MAX(c) AS maxc,
       |  MIN(day) AS mind, MAX(day) AS maxd FROM o),
       |q AS (SELECT c, day,
       |    CAST(floor((c - minc) * 255.0 / greatest(maxc - minc, 1)) AS BIGINT) AS n1,
       |    CAST(floor((day - mind) * 255.0 / greatest(maxd - mind, 1)) AS BIGINT) AS n2
       |  FROM o, mm),
       |z AS (SELECT c, day, ${zInterleaveSql("n1", "n2", 8)} AS z FROM q)
       |SELECT z // 4096 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(c) AS min_cust, MAX(c) AS max_cust,
       |  MIN(day) AS min_day, MAX(day) AS max_day
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q44_zorder" -> q44 _,
    "q42_funnel" -> q42 _,
    "q43_scd2_incremental" -> q43 _,
    "q41_scd2_history" -> q41 _,
    "q40_incremental_agg" -> q40 _,
    "q39_salted_join" -> q39 _,
    "q37_regression" -> q37 _,
    "q38_cdc_apply" -> q38 _,
    "q36_sql_front_door" -> q36 _,
    "q35_range_frame" -> q35 _,
    "q34_dist_windows" -> q34 _,
    "q32_string_agg" -> q32 _,
    "q33_lateral" -> q33 _,
    "q30_grouping_sets" -> q30 _,
    "q31_unpivot" -> q31 _,
    "q29_csv_roundtrip" -> q29 _,
    "q27_approx_distinct" -> q27 _,
    "q28_range_join" -> q28 _,
    "q21_cube" -> q21 _,
    "q22_pivot" -> q22 _,
    "q23_sessionize" -> q23 _,
    "q24_asof_join" -> q24 _,
    "q25_percentiles" -> q25 _,
    "q26_json_fns" -> q26 _,
    "q45_approx_percentiles" -> q45 _)

  val oracle: Map[String, String] = Map(
    "q44_zorder" -> q44Sql,
    "q42_funnel" -> q42Sql,
    "q43_scd2_incremental" -> q41Sql, // full recompute IS the oracle: incremental == full
    "q41_scd2_history" -> q41Sql,
    "q40_incremental_agg" -> q40Sql,
    "q39_salted_join" -> q39Sql,
    "q37_regression" -> q37Sql,
    "q38_cdc_apply" -> q38Sql,
    "q36_sql_front_door" -> q36Sql,
    "q35_range_frame" -> q35Sql,
    "q34_dist_windows" -> q34Sql,
    "q32_string_agg" -> q32Sql,
    "q33_lateral" -> q33Sql,
    "q30_grouping_sets" -> q30Sql,
    "q31_unpivot" -> q31Sql,
    "q29_csv_roundtrip" -> q29Sql,
    "q27_approx_distinct" -> q27Sql,
    "q28_range_join" -> q28Sql,
    "q21_cube" -> q21Sql,
    "q22_pivot" -> q22Sql,
    "q23_sessionize" -> q23Sql,
    "q24_asof_join" -> q24Sql,
    "q25_percentiles" -> q25Sql,
    "q26_json_fns" -> q26Sql,
    "q45_approx_percentiles" -> q45Sql)
}
