package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M9 — JSON merge-patch with array-upsert-by-objectId (SURVEY §2 M9).
  *
  * Re-expresses `PlanService.mergeJson` (`PlanService.java:218-261`) as a
  * single codegen'd column expression built once per schema — no per-row
  * interpretation, no driver loops. Semantics (from the reference, with the
  * latent bugs dispositioned per SURVEY §7.4):
  *
  *   - scalar field in patch → overwrite (`PlanService.java:253-255`);
  *     a NULL/absent patch field keeps the stored value (the RFC-7386
  *     "null deletes" rule is NOT reference behavior and not implemented).
  *   - object field: same `objectId` → replace wholesale
  *     (`PlanService.java:231-235`); different `objectId` → recursive
  *     field-wise merge (the reference recurses via a DB fetch at `:236-239`;
  *     we merge against the stored sub-object, the evident intent).
  *   - array field: upsert by `objectId` — stored elements matched by a
  *     patch element are REMOVED and every patch element is APPENDED in
  *     patch order (`PlanService.java:240-252`), so an updated element moves
  *     to the array's tail. Faithful to the reference; locked by tests.
  *   - key absent in stored doc → insert (`PlanService.java:227-229`; the
  *     reference's `.get()` would throw — `opt()` was the evident intent).
  */
object MergePatch {

  /** Column-level merge of two same-schema documents. */
  def merge(stored: Column, patch: Column, schema: StructType): Column =
    when(patch.isNull, stored)
      .when(stored.isNull, patch)
      .otherwise(mergeStruct(stored, patch, schema))

  private def mergeStruct(s: Column, p: Column, schema: StructType): Column =
    struct(schema.fields.toSeq.map { f =>
      val sf = s.getField(f.name)
      val pf = p.getField(f.name)
      (f.dataType match {
        case sub: StructType =>
          when(pf.isNull, sf)
            .when(sf.isNull, pf)
            .when(sf.getField("objectId") === pf.getField("objectId"), pf)
            .otherwise(mergeStruct(sf, pf, sub))
        case ArrayType(_: StructType, _) =>
          when(pf.isNull, sf)
            .when(sf.isNull, pf)
            .otherwise(concat(
              filter(sf, e => !exists(pf, x =>
                x.getField("objectId") === e.getField("objectId"))),
              pf))
        case _ => coalesce(pf, sf)
      }).as(f.name)
    }: _*)

  /** Frame-level merge: full-outer join stored docs with patches on the root
    * `objectId`; keys only in `patches` are inserts, keys only in `stored`
    * pass through, both → merged (M9 ∘ M8: the caller re-shreds the result
    * to persist, mirroring `PlanController.patchPlan` → `updatePlan`). */
  def apply(stored: DataFrame, patches: DataFrame, schema: StructType,
            docCol: String = "doc"): DataFrame = {
    val s = stored.select(col(s"$docCol.objectId").as("__sid"), col(docCol).as("__s"))
    val p = patches.select(col(s"$docCol.objectId").as("__pid"), col(docCol).as("__p"))
    s.join(p, col("__sid") === col("__pid"), "full_outer")
      .select(merge(col("__s"), col("__p"), schema).as(docCol))
  }
}
