package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES parent-join (`has_child` / `has_parent`) over the shredded corpus.
  *
  * The reference's shredded edge store (one Redis key per parent→child
  * relation, `PlanService.java:41-44` — our `edges` table, SURVEY §1.1) IS
  * a parent-child index: ES's join field materializes exactly this
  * parent/child relation inside one index. The relation NAME here is the
  * edge `field` (e.g. `linkedPlanServices`), the child/parent documents are
  * `entities` rows, and both query types compile to semi-join shapes:
  *
  *  - `has_child`: child predicate filters `entities` FIRST (the pruned
  *    side — at 100 TB most children fail the predicate before any join),
  *    equi-join to `edges.child_key`, hash-aggregate per `parent_key`
  *    (which de-duplicates AND counts, so ES's `min_children` /
  *    `max_children` are a free HAVING on the same pass), then a semi-join
  *    back to the parent entities. Two key shuffles, no corpus fan-out.
  *  - `has_parent`: parent predicate filters `entities`, equi-join to
  *    `edges.parent_key`, semi-join to child entities. A parent with many
  *    children fans out only on the edge table — the ES score_mode=none
  *    contract (has_parent never aggregates children).
  *
  * Child predicates are column expressions over the entity row (`key`,
  * `type_tag`, and the scalar residue via `get_json_object(json, …)`), so
  * a JSON-path filter prunes at the entity scan. Nested relations chain by
  * feeding one result's keys into the next call — ES's has_child inside
  * has_child.
  */
object ParentJoin {

  /** Parent keys (with matching-child counts) for children of relation
    * `field` whose entity row satisfies `childPred`. `minChildren` /
    * `maxChildren` are ES's has_child bounds (counting MATCHING children,
    * the ES contract). Output: `parent_key`, `n_matching`. */
  def hasChild(sh: Shredded, field: String, childPred: Column,
               minChildren: Int = 1, maxChildren: Int = Int.MaxValue): DataFrame =
    hasChildKeys(sh, field, sh.entities.filter(childPred).select(col("key")),
      minChildren, maxChildren)

  /** has_child over an already-resolved matching-child KEY SET (one `key`
    * column) — the chaining form: a nested has_child feeds its parents
    * straight into the next hop without re-reading entities. */
  def hasChildKeys(sh: Shredded, field: String, childKeys: DataFrame,
                   minChildren: Int = 1, maxChildren: Int = Int.MaxValue): DataFrame = {
    require(minChildren >= 1, s"min_children must be >= 1: $minChildren")
    sh.edges
      .filter(col("field") === field && col("child_key").isNotNull)
      .select(col("parent_key"), col("child_key"))
      .join(childKeys.select(col("key").as("child_key")), "child_key")
      .groupBy(col("parent_key"))
      .agg(count(lit(1)).as("n_matching"))
      .filter(col("n_matching") >= minChildren && col("n_matching") <= maxChildren)
  }

  /** ES `parent_id` query — the children of ONE named parent in relation
    * `field`: a point equi-filter on the edge table (both predicates are
    * scan-pushed — at 100 TB this reads the parent's edge rows' row
    * groups, the Redis `GET planKey_…` of the reference's layout but with
    * columnar pruning instead of a key glob). Output: `child_key`. */
  def parentId(sh: Shredded, field: String, parentKey: String): DataFrame =
    sh.edges
      .filter(col("field") === field && col("parent_key") === parentKey &&
        col("child_key").isNotNull)
      .select(col("child_key"))

  /** Child entity keys of relation `field` whose PARENT entity satisfies
    * `parentPred`. Output: `child_key`, `parent_key`. */
  def hasParent(sh: Shredded, field: String, parentPred: Column): DataFrame = {
    val parents = sh.entities.filter(parentPred).select(col("key").as("parent_key"))
    sh.edges
      .filter(col("field") === field && col("child_key").isNotNull)
      .select(col("parent_key"), col("child_key"))
      .join(parents, "parent_key")
      .select(col("child_key"), col("parent_key"))
  }
}
