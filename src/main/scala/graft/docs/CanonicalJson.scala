package graft.docs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M7 — content-addressed ETags (SURVEY §2 M7).
  *
  * The reference caches `JSONObject.hashCode()` as the ETag
  * (`PlanController.java:111,141`); `org.json.JSONObject` does not override
  * `hashCode`, so that is a JVM identity hash — two GETs of identical
  * content return different tags. We implement the evident *intent*: a
  * content hash over a canonical serialization.
  *
  * Canonical form: struct fields sorted by name recursively (arrays keep
  * element order — order is semantic, `PlanService.java:52-66`), serialized
  * with `to_json`, hashed with `xxhash64`. `to_json` omits null fields, so
  * an explicit-null and an absent field hash identically — acceptable for a
  * cache-validator. Everything is codegen'd built-ins; at 100 TB the etag is
  * one narrow column computed at write time, and conditional requests
  * (`If-Match` / `If-None-Match`, `PlanController.java:127-131,156-165`)
  * become equality filters against it.
  */
object CanonicalJson {

  /** Recursively sort struct fields by name (arrays preserve order). */
  def canonicalize(c: Column, dt: DataType): Column = dt match {
    case s: StructType =>
      struct(s.fields.sortBy(_.name).toSeq.map(f =>
        canonicalize(c.getField(f.name), f.dataType).as(f.name)): _*)
    case ArrayType(elem, _) =>
      transform(c, x => canonicalize(x, elem))
    case _ => c
  }

  /** 64-bit content hash of the canonical JSON serialization. */
  def etag(c: Column, dt: DataType): Column =
    xxhash64(to_json(canonicalize(c, dt)))
}
