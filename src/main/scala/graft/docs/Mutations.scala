package graft.docs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** M6/M7/M8 — cascade delete, replace, and conditional-mutation guard
  * (SURVEY §2).
  *
  * Cascade delete re-expresses `PlanService.deletePlan`
  * (`PlanService.java:135-200`) — per-key recursive Redis deletes driven by
  * `KEYS planKey_*` glob scans — as graph reachability over the `edges`
  * table: a fixed number of equi-join rounds (the document schema's depth,
  * known statically) expands the root keys to the full reachable closure,
  * then one anti-join removes them from `entities` and `edges`. No driver
  * loop over documents, no `collect()` — deleting one doc or a billion is
  * the same plan.
  */
object Mutations {

  /** Static nesting depth of a document schema (number of join rounds a
    * reachability expansion needs). */
  def depth(schema: StructType): Int = {
    def d(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case s: StructType => 1 + s.fields.map(f => d(f.dataType)).foldLeft(0)(math.max)
      case org.apache.spark.sql.types.ArrayType(e, _) => d(e)
      case _ => 0
    }
    d(schema)
  }

  /** All keys reachable from `rootKeys` (single column `key`), inclusive.
    * `maxDepth` bounds the join rounds — pass `depth(schema)`. */
  def reachable(sh: Shredded, rootKeys: DataFrame, maxDepth: Int): DataFrame = {
    val edges = sh.edges.filter(col("child_key").isNotNull)
      .select(col("parent_key"), col("child_key"))
    var frontier = rootKeys.select(col("key")).distinct()
    var all = frontier
    for (_ <- 1 to maxDepth) {
      frontier = edges.join(frontier, col("parent_key") === col("key"))
        .select(col("child_key").as("key")).distinct()
      all = all.unionAll(frontier)
    }
    all.distinct()
  }

  /** M6 — remove the reachable closure of `rootKeys` from both tables. */
  def cascadeDelete(sh: Shredded, rootKeys: DataFrame, maxDepth: Int): Shredded = {
    val gone = reachable(sh, rootKeys, maxDepth)
    Shredded(
      sh.entities.join(gone, Seq("key"), "left_anti"),
      sh.edges.join(gone.select(col("key").as("parent_key")), Seq("parent_key"), "left_anti"))
  }

  /** M8 — full-document replace: cascade-delete the incoming docs' root keys,
    * then union the fresh shred (`PlanService.updatePlan`,
    * `PlanService.java:202-215` = delete-then-save). */
  def replace(sh: Shredded, newDocs: DataFrame, maxDepth: Int,
              docCol: String = "doc"): Shredded = {
    val rootKeys = newDocs.select(
      concat(col(s"$docCol.objectType"), lit("_"), col(s"$docCol.objectId")).as("key"))
    val cleaned = cascadeDelete(sh, rootKeys, maxDepth)
    val fresh = Shredder.shred(newDocs, docCol)
    Shredded(
      cleaned.entities.unionAll(fresh.entities),
      cleaned.edges.unionAll(fresh.edges))
  }

  /** M7 — conditional-mutation guard (`If-Match`, `PlanController.java:
    * 156-165`): keep only the requests whose provided etag matches the
    * current document content. `requests` must carry (`key`, `if_match`);
    * `current` carries (`key`, `etag`). Mismatches are the engine's HTTP 412. */
  def etagGuard(requests: DataFrame, current: DataFrame): (DataFrame, DataFrame) = {
    val joined = requests.join(current, Seq("key"), "left")
    (joined.filter(col("if_match") === col("etag")),
     joined.filter(col("if_match").isNull || col("etag").isNull ||
       col("if_match") =!= col("etag")))
  }
}
