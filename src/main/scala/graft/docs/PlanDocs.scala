package graft.docs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic "plan" document corpus derived from the driver's TPC-H-ish
  * tables (TESTDATA.md), shaped exactly like the reference's plan documents
  * (`usecase.json`, `plan-schema.json` — see PlanSchema): one plan per
  * customer, one `linkedPlanServices` element per order (ordered by
  * o_orderkey, the array-order invariant of `PlanService.java:52-66`).
  *
  * Customers with `c_custkey % 113 == 0` get a present-but-EMPTY services
  * array (their orders are withheld) so the empty-array marker path is
  * exercised end-to-end. All derived fields are integer/string arithmetic —
  * bit-exact in any engine — so every document operator can be
  * DuckDB-oracle-checked by reconstructing the same values in SQL.
  */
object PlanDocs {

  private def str(c: Column): Column = c.cast("string")

  /** The planservice element for one order row. */
  private def serviceElem: Column = struct(
    struct(
      lit("example.com").as("_org"),
      concat(lit("svc-"), str(col("o_orderkey"))).as("objectId"),
      lit("service").as("objectType"),
      concat(lit("Service "), col("o_orderpriority")).as("name")).as("linkedService"),
    struct(
      (col("o_orderkey") % 1000).cast("long").as("deductible"),
      lit("example.com").as("_org"),
      (col("o_custkey") % 200).cast("long").as("copay"),
      concat(lit("pcs-"), str(col("o_orderkey"))).as("objectId"),
      lit("membercostshare").as("objectType")).as("planserviceCostShares"),
    lit("example.com").as("_org"),
    concat(lit("ps-"), str(col("o_orderkey"))).as("objectId"),
    lit("planservice").as("objectType"))

  /** Build the corpus: one row, column `doc` (struct matching
    * PlanSchema.plan). */
  def docs(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders").filter(col("o_custkey") % 113 =!= 0)

    val services = o
      .select(col("o_custkey"), struct(col("o_orderkey").as("k"), serviceElem.as("v")).as("kv"))
      .groupBy(col("o_custkey"))
      .agg(transform(sort_array(collect_list(col("kv"))), x => x("v")).as("lps"))

    c.join(services, col("c_custkey") === col("o_custkey"), "left")
      .select(struct(
        struct(
          (col("c_nationkey") * 100L).cast("long").as("deductible"),
          lit("example.com").as("_org"),
          (col("c_custkey") % 50).cast("long").as("copay"),
          concat(lit("cs-"), str(col("c_custkey"))).as("objectId"),
          lit("membercostshare").as("objectType")).as("planCostShares"),
        coalesce(col("lps"), array().cast(graft.model.PlanSchema.plan("linkedPlanServices").dataType))
          .as("linkedPlanServices"),
        concat(lit("org-"), str(col("c_nationkey")), lit(".example.com")).as("_org"),
        concat(lit("plan-"), str(col("c_custkey"))).as("objectId"),
        lit("plan").as("objectType"),
        col("c_mktsegment").as("planType"),
        lit("12-12-2017").as("creationDate")).as("doc"))
  }
}
