package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator closure (SURVEY.md §2D).
  *
  * The reference (shah-tejas/BigDataIndexing) has no relational layer — its
  * whole data-processing surface is key-addressed document CRUD
  * (`PlanService.java`) plus five Elasticsearch queries (`README.md:67-147`).
  * This module is the engine's relational surface: scans, projections,
  * filters, equi/semi/anti joins, aggregations, rollup, windows, sorts,
  * top-k, set ops, string/date/math/JSON functions — each expressed as a
  * declarative DataFrame plan so Catalyst supplies pushdown, pruning,
  * join planning and whole-stage codegen.
  *
  * Oracle-parity rules (every query here is hash-compared against DuckDB):
  *   - Money/percentage doubles in the corpus are exact 2-decimal values.
  *     Aggregating doubles directly is order-dependent (parallel sums), so
  *     every SUM/AVG casts to decimal first (exact, associative), then casts
  *     the final aggregate back to double — bit-identical on both engines.
  *   - Per-row double arithmetic (+,-,*,floor,ceil,abs,sqrt) is IEEE-754
  *     deterministic and needs no special handling.
  *   - Every query ends in a total ORDER BY over a unique key.
  *   - DuckDB SUM(integer) returns HUGEINT and EXTRACT returns BIGINT; the
  *     oracle SQL casts those to match Spark's LongType / IntegerType.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exact cast for 2-dp money doubles (values < 1e10). */
  private def m(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Exact cast for 2-dp rate doubles in [0, 9.99]. */
  private def pct(c: Column): Column = c.cast(DecimalType(7, 4))

  /** Final decimal→double conversion, DuckDB-parity-safe.
    *
    * DuckDB converts decimal→double as `double(unscaled) / double(10^scale)`
    * — two roundings when the unscaled value exceeds 2^53 — while the JVM's
    * BigDecimal.doubleValue() rounds once, correctly. Down-casting to scale 6
    * first is exact here (every product of 2-dp inputs has true scale ≤ 6)
    * and keeps unscaled values < 2^53, so both engines produce the same
    * correctly-rounded double. */
  private def dbl(c: Column): Column =
    c.cast(DecimalType(28, 6)).cast("double")
  private val oneM: Column = lit(1).cast(DecimalType(7, 4))

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // ---------------------------------------------------------------- q0
  /** Driver-hash compatibility canary (r16 postmortem). One tiny always-run
    * gate emitting every scalar type the registry uses — int, long, double
    * (incl. a non-terminating fraction and a NULL), string (incl. a NULL),
    * boolean, date — so any future comparator representation-sensitivity
    * (like r16's decimal hashing) trips HERE, on a 5-row query whose output
    * is trivially inspectable, instead of on a real operator's gate. */
  private def q0HashCanary(s: SparkSession, d: String): DataFrame =
    t(s, d, "region")
      .select(
        col("r_regionkey").cast("int").as("k_int"),
        (col("r_regionkey").cast("long") * lit(1000000007L)).as("k_long"),
        (col("r_regionkey").cast("double") / lit(7.0) + lit(0.1)).as("k_double"),
        concat(lit("canary_"), col("r_name")).as("k_string"),
        (col("r_regionkey") % 2 === 0).as("k_bool"),
        date_add(lit("2020-01-01").cast("date"), col("r_regionkey").cast("int")).as("k_date"),
        when(col("r_regionkey") === 4, lit(null).cast("double"))
          .otherwise(col("r_regionkey").cast("double") * 1.5).as("k_double_null"),
        when(col("r_regionkey") === 4, lit(null).cast("string"))
          .otherwise(col("r_name")).as("k_string_null"))
      .orderBy(col("k_int"))

  private val q0Sql =
    """SELECT CAST(r_regionkey AS INTEGER) AS k_int,
      |  CAST(r_regionkey AS BIGINT) * 1000000007 AS k_long,
      |  CAST(r_regionkey AS DOUBLE) / 7.0 + 0.1 AS k_double,
      |  'canary_' || r_name AS k_string,
      |  (r_regionkey % 2 = 0) AS k_bool,
      |  DATE '2020-01-01' + CAST(r_regionkey AS INTEGER) AS k_date,
      |  CASE WHEN r_regionkey = 4 THEN NULL
      |       ELSE CAST(r_regionkey AS DOUBLE) * 1.5 END AS k_double_null,
      |  CASE WHEN r_regionkey = 4 THEN NULL ELSE r_name END AS k_string_null
      |FROM region ORDER BY k_int""".stripMargin

  // ---------------------------------------------------------------- q1
  /** Wide aggregation with grouped exact sums/averages (TPC-H Q1 shape). */
  private def q1Agg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate").cast("date") <= lit("2000-01-01").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Output DOUBLEs computed FROM the exact decimal sums. A full-table
        // money sum crosses 2^53 UNSCALED by sf1, where DuckDB's
        // int128/10^scale decimal→double conversion double-rounds (1 ulp at
        // sf1's sum_charge) while Spark's BigDecimal.doubleValue rounds
        // correctly. The r16 attempt to keep these columns DECIMAL end-to-end
        // tripped the driver's hash comparator (representation-sensitive on
        // decimals even when values agree exactly), so: Spark emits the
        // correctly-rounded double here, and the oracle twin emits its double
        // via a VARCHAR roundtrip (DuckDB string→double parses correctly
        // rounded), sidestepping the int128 double-rounding at every scale.
        dbl(sum(m(col("l_quantity")))).as("sum_qty"),
        dbl(sum(m(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(m(col("l_extendedprice")) * (oneM - pct(col("l_discount"))))).as("sum_disc_price"),
        dbl(sum(m(col("l_extendedprice")) * (oneM - pct(col("l_discount"))) * (oneM + pct(col("l_tax")))))
          .as("sum_charge"),
        (dbl(sum(m(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(m(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(pct(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))) AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4))) * (CAST(1 AS DECIMAL(7,4)) + CAST(l_tax AS DECIMAL(7,4)))) AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(7,4))) AS DECIMAL(28,6)) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-01-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Selective filter + global aggregate (TPC-H Q6 shape) — exercises
    * predicate pushdown: all three filters reach the parquet scan. */
  private def q2FilterAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date"))
      .filter(col("l_shipdate").cast("date") < lit("1997-01-01").cast("date"))
      .filter(col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(dbl(sum(m(col("l_extendedprice")) * pct(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_rows"))

  private val q2Sql =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(7,4))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q3
  /** 3-way join + grouped top-k (TPC-H Q3 shape). customer scales with SF,
    * so no broadcast hint — AQE picks broadcast vs shuffle from runtime
    * stats (filtered size), which stays correct at the 100 TB design point
    * where a forced multi-GB broadcast would OOM. */
  private def q3JoinTopk(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, d, "orders").filter(col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
    val l = t(s, d, "lineitem").filter(col("l_shipdate").cast("date") > lit("1997-01-01").cast("date"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .agg(dbl(sum(m(col("l_extendedprice")) * (oneM - pct(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** Star-join over broadcast dimensions: at 100 TB the fact side stays
    * shuffle-free — both dims ship to every executor. */
  private def q4DimsBroadcast(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dbl(sum(m(col("c_acctbal")))).as("total_bal"))
      .orderBy(col("r_name"), col("n_name"))

  private val q4Sql =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    * no full sort, no shuffle of the full table. */
  private def q5SortLimit(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val q5Sql =
    """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Window functions: per-group top-n with row_number/rank/lag over a
    * deterministic (unique-suffixed) ordering. */
  private def q6WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        lag(col("c_acctbal"), 1).over(w).as("prev_bal"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  private val q6Sql =
    """SELECT c_nationkey, c_custkey, c_acctbal, rn, rk, prev_bal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |    RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk,
      |    LAG(c_acctbal, 1) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS prev_bal
      |  FROM customer) t
      |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin

  // ---------------------------------------------------------------- q7/q8
  /** Semi join (EXISTS): customers with at least one order. */
  private def q7SemiJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q7Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Anti join (NOT EXISTS): customers with no orders — the same primitive
    * that implements cascade-delete (SURVEY §2 M6). */
  private def q8AntiJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q8Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q9/q10
  private def q9Except(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  private val q9Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  private def q10Intersect(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  private val q10Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** ROLLUP grouping sets (region → nation → grand total). */
  private def q11Rollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dbl(sum(m(col("c_acctbal")))).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q11Sql =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Conditional aggregation (CASE WHEN inside SUM; TPC-H Q12 shape). */
  private def q12CaseAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_line_count"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))

  private val q12Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q13
  /** String function battery: LIKE, upper, length, substring, concat_ws,
    * replace, lpad, first token (SURVEY §2D string fns). */
  private def q13StringFns(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        lpad(col("p_brand"), 10, "*").as("brand_pad"),
        element_at(split(col("p_name"), " "), 1).as("first_word"))
      .orderBy(col("p_partkey"))

  private val q13Sql =
    """SELECT p_partkey, UPPER(p_name) AS up_name, LENGTH(p_name) AS name_len,
      |  SUBSTRING(p_name, 1, 5) AS prefix5,
      |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
      |  REPLACE(p_name, ' ', '_') AS snake_name,
      |  LPAD(p_brand, 10, '*') AS brand_pad,
      |  SPLIT_PART(p_name, ' ', 1) AS first_word
      |FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Date/time functions: year/month buckets over a timestamp column. */
  private def q14DateParts(s: SparkSession, d: String): DataFrame = {
    val dt = col("o_orderdate").cast("date")
    t(s, d, "orders")
      .groupBy(year(dt).as("yr"), month(dt).as("mo"))
      .agg(count(lit(1)).as("n_orders"), dbl(sum(m(col("o_totalprice")))).as("total"))
      .orderBy(col("yr"), col("mo"))
  }

  private val q14Sql =
    """SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
      |  CAST(EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS INTEGER) AS mo,
      |  COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Math function battery — all IEEE-deterministic ops (floor/ceil/abs/
    * sqrt/mod/greatest/least); no libm-divergent fns (ln/exp/pow). */
  private def q15MathFns(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_orderkey") % 100 === 0 && col("l_linenumber") === 1)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).cast("double").as("price_floor"),
        ceil(col("l_extendedprice")).cast("double").as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_partkey") % 7).as("pk_mod7"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q15Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(FLOOR(l_extendedprice) AS DOUBLE) AS price_floor,
      |  CAST(CEIL(l_extendedprice) AS DOUBLE) AS price_ceil,
      |  ABS(l_discount - 0.05) AS disc_dev,
      |  SQRT(l_quantity) AS qty_sqrt,
      |  l_partkey % 7 AS pk_mod7,
      |  GREATEST(l_tax, l_discount) AS max_rate,
      |  LEAST(l_tax, l_discount) AS min_rate
      |FROM lineitem WHERE l_orderkey % 100 = 0 AND l_linenumber = 1
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q16
  /** GROUP BY ... HAVING. */
  private def q16Having(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), dbl(sum(m(col("c_acctbal")))).as("total_bal"))
      .filter(col("n_cust") >= 5)
      .orderBy(col("c_nationkey"))

  private val q16Sql =
    """SELECT c_nationkey, COUNT(*) AS n_cust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 5
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Scalar subquery: rows above the global average. The 1-row aggregate is
    * broadcast-cross-joined — no driver collect, works at any scale. */
  private def q17ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val p = t(s, d, "part")
    val avgPrice = p.agg(
      (dbl(sum(m(col("p_retailprice")))) / count(lit(1))).as("avg_price"))
    p.join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  private val q17Sql =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice > (
      |  SELECT CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) / COUNT(*) FROM part)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q18
  /** 6-way join (TPC-H Q5 shape): fact-fact join on orderkey shuffles once;
    * fixed-cardinality dims (nation, region) ride explicit broadcasts;
    * SF-scaling tables (customer, supplier) are left to AQE so the plan
    * survives scale-up without forcing multi-GB broadcasts. */
  private def q18MultiJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(dbl(sum(m(col("l_extendedprice")) * (oneM - pct(col("l_discount"))))).as("revenue"))
      .orderBy(col("n_name"))

  private val q18Sql =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q19/q20
  private def q19UnionAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(lit("c").as("kind"), col("c_custkey").as("k"))
      .unionAll(t(s, d, "supplier").select(lit("s").as("kind"), col("s_suppkey").as("k")))
      .orderBy(col("kind"), col("k"))

  private val q19Sql =
    """SELECT 'c' AS kind, c_custkey AS k FROM customer
      |UNION ALL SELECT 's' AS kind, s_suppkey AS k FROM supplier
      |ORDER BY kind, k""".stripMargin

  /** COUNT(DISTINCT) — Spark expands to a two-phase exact distinct agg. */
  private def q20DistinctAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  private val q20Sql =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q0_hash_canary" -> q0HashCanary _,
    "q1_agg" -> q1Agg _,
    "q2_filter_agg" -> q2FilterAgg _,
    "q3_join_topk" -> q3JoinTopk _,
    "q4_dims_broadcast" -> q4DimsBroadcast _,
    "q5_sort_limit" -> q5SortLimit _,
    "q6_window_rank" -> q6WindowRank _,
    "q7_semi_join" -> q7SemiJoin _,
    "q8_anti_join" -> q8AntiJoin _,
    "q9_except" -> q9Except _,
    "q10_intersect" -> q10Intersect _,
    "q11_rollup" -> q11Rollup _,
    "q12_case_agg" -> q12CaseAgg _,
    "q13_string_fns" -> q13StringFns _,
    "q14_date_parts" -> q14DateParts _,
    "q15_math_fns" -> q15MathFns _,
    "q16_having" -> q16Having _,
    "q17_scalar_subquery" -> q17ScalarSubquery _,
    "q18_multi_join" -> q18MultiJoin _,
    "q19_union_all" -> q19UnionAll _,
    "q20_distinct_agg" -> q20DistinctAgg _)

  val oracle: Map[String, String] = Map(
    "q0_hash_canary" -> q0Sql,
    "q1_agg" -> q1Sql,
    "q2_filter_agg" -> q2Sql,
    "q3_join_topk" -> q3Sql,
    "q4_dims_broadcast" -> q4Sql,
    "q5_sort_limit" -> q5Sql,
    "q6_window_rank" -> q6Sql,
    "q7_semi_join" -> q7Sql,
    "q8_anti_join" -> q8Sql,
    "q9_except" -> q9Sql,
    "q10_intersect" -> q10Sql,
    "q11_rollup" -> q11Sql,
    "q12_case_agg" -> q12Sql,
    "q13_string_fns" -> q13Sql,
    "q14_date_parts" -> q14Sql,
    "q15_math_fns" -> q15Sql,
    "q16_having" -> q16Sql,
    "q17_scalar_subquery" -> q17Sql,
    "q18_multi_join" -> q18Sql,
    "q19_union_all" -> q19Sql,
    "q20_distinct_agg" -> q20Sql)
}
