package graft.model

import org.apache.spark.sql.types._

/** Document model for hierarchical "plan" documents.
  *
  * Mirrors the reference's declared JSON-Schema
  * (`/root/reference/bdi-demo/src/main/resources/plan-schema.json:7-15,21-27,87-93,99-105`)
  * as a Spark `StructType` (SURVEY §1.3): every entity node carries
  * `objectId` / `objectType` / `_org`; `deductible`/`copay` are integers
  * (widened to Long for 100 TB headroom); everything else is string.
  *
  * The engine is schema-generic — `Shredder`/`Assembler`/`MergePatch` walk
  * any `StructType` whose object nodes contain `objectId` — and this object
  * is just the registry entry for the reference's fixed schema plus its
  * validation rules (required / pattern), replacing the reference's
  * JSON-Schema-draft-07 engine (everit, `PlanController.java:87-95`).
  */
object PlanSchema {

  val costShare: StructType = StructType(Seq(
    StructField("deductible", LongType),
    StructField("_org", StringType),
    StructField("copay", LongType),
    StructField("objectId", StringType),
    StructField("objectType", StringType)))

  val service: StructType = StructType(Seq(
    StructField("_org", StringType),
    StructField("objectId", StringType),
    StructField("objectType", StringType),
    StructField("name", StringType)))

  val planService: StructType = StructType(Seq(
    StructField("linkedService", service),
    StructField("planserviceCostShares", costShare),
    StructField("_org", StringType),
    StructField("objectId", StringType),
    StructField("objectType", StringType)))

  val plan: StructType = StructType(Seq(
    StructField("planCostShares", costShare),
    StructField("linkedPlanServices", ArrayType(planService)),
    StructField("_org", StringType),
    StructField("objectId", StringType),
    StructField("objectType", StringType),
    StructField("planType", StringType),
    StructField("creationDate", StringType)))

  /** Validation rules distilled from plan-schema.json: the exact `required`
    * arrays per node (root `plan-schema.json:7-15`; costShare nodes
    * `:21-27` and linkedPlanServices items' planserviceCostShares; items
    * `:87-93`; linkedService `:99-105`) + the `^(.*)$` string pattern
    * (vacuous — kept for shape) and integer-typed cost fields (type errors
    * surface as nulls after cast). */
  val requiredPaths: Seq[String] = Seq(
    "planCostShares", "linkedPlanServices",
    "_org", "objectId", "objectType", "planType", "creationDate",
    "planCostShares.deductible", "planCostShares._org",
    "planCostShares.copay", "planCostShares.objectId",
    "planCostShares.objectType")

  /** Paths inside each linkedPlanServices element that must be non-null
    * (items, linkedService, and planserviceCostShares `required` arrays). */
  val requiredInPlanService: Seq[String] = Seq(
    "linkedService", "planserviceCostShares",
    "_org", "objectId", "objectType",
    "linkedService._org", "linkedService.objectId",
    "linkedService.objectType", "linkedService.name",
    "planserviceCostShares.deductible", "planserviceCostShares._org",
    "planserviceCostShares.copay", "planserviceCostShares.objectId",
    "planserviceCostShares.objectType")
}
