package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M3 — document reassembly (SURVEY §2 M3).
  *
  * Re-expresses `PlanService.getPlan` (`PlanService.java:87-133`) — the
  * reference's N+1 recursive Redis fetch with `KEYS planKey_*` glob scans —
  * as bottom-up set-oriented joins: per nesting level, one equi-join of the
  * edge table against the child entities, `collect_list(struct(ord, node))`
  * + `sort_array` to restore array order (the reference keeps order by
  * key-array position, `PlanService.java:52-66`), and a `struct(...)` to
  * rebuild the node.
  *
  * Two execution shapes from one plan builder:
  *   - full-corpus assembly (`rootKeys = None`, the indexing/search-build
  *     path): every level is restricted by `type_tag` pushdown filters
  *     only — no key-set joins, no distincts; O(levels) equi-joins total.
  *   - point/subset reads (`rootKeys = Some(keys)`, M4): the key set is
  *     threaded down the recursion so each level touches only reachable
  *     rows — with pushed-down key predicates, partition pruning makes a
  *     single-doc GET a point read. No plan changes between "read one doc"
  *     and "read all docs".
  *
  * Scale shape: each level is an equi-join on `key` (shuffle
  * co-partitioned) plus one aggregation per array field — O(levels)
  * shuffles total, independent of corpus size, vs the reference's O(nodes)
  * round-trips.
  */
object Assembler {

  /** Reassemble all documents of `rootTag`, or only `rootKeys` if given.
    * Returns `(key, doc)` with `doc` matching `schema` exactly. */
  def assemble(sh: Shredded, schema: StructType, rootTag: String,
               rootKeys: Option[DataFrame] = None): DataFrame = {
    val roots = sh.entities.filter(col("type_tag") === rootTag)
    val restricted = rootKeys match {
      case Some(k) => roots.join(
        k.select(col("key").as("__k")).distinct(), col("key") === col("__k"))
        .drop("__k")
      case None => roots
    }
    nodesFor(restricted, sh, schema, restrict = rootKeys.isDefined)
      .select(col("key"), col("node").as("doc"))
  }

  /** Rebuild the nodes present in `base` (rows of `entities` already
    * restricted to this level). `restrict` = thread key-sets downward
    * (subset read); false = full corpus, children restricted by tag/join
    * only. */
  private def nodesFor(base: DataFrame, sh: Shredded, schema: StructType,
                       restrict: Boolean): DataFrame = {
    val scalars = Shredder.scalarFields(schema)
    val parsed = base.select(col("key"),
      from_json(col("json"), StructType(scalars)).as("scal"))

    val nested: Seq[(StructField, DataFrame)] = schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case sub: StructType =>
          // Object-valued field: children are tagged with the FIELD NAME
          // (Shredder/PlanService.java:36) → exact type_tag restriction.
          val e0 = sh.edges.filter(col("field") === f.name)
            .select(col("parent_key"), col("child_key"))
          val e = if (restrict)
            e0.join(base.select(col("key").as("__pk")), col("parent_key") === col("__pk"))
              .drop("__pk")
          else e0
          val childBase0 = sh.entities.filter(col("type_tag") === f.name)
          val childBase = if (restrict)
            childBase0.join(e.select(col("child_key").as("__ck")).distinct(),
              col("key") === col("__ck")).drop("__ck")
          else childBase0
          val children = nodesFor(childBase, sh, sub, restrict)
          Some(f -> e.join(children, e("child_key") === children("key"))
            .select(col("parent_key").as("key"), col("node").as(f.name)))
        case ArrayType(sub: StructType, _) =>
          // Array elements are tagged with their objectType (data-driven):
          // restrict children via the edge child-keys (the reachable set).
          val e0 = sh.edges.filter(col("field") === f.name)
            .select(col("parent_key"), col("ord"), col("child_key"))
          val e = if (restrict)
            e0.join(base.select(col("key").as("__pk")), col("parent_key") === col("__pk"))
              .drop("__pk")
          else e0
          // Full-corpus mode needs NO key-set restriction: the inner join
          // on child_key below already selects exactly the element
          // entities (keys embed the tag, so no cross-type collisions),
          // and a distinct-join here would add an edge-table shuffle +
          // dedup per array level. Only subset reads thread the key set.
          val childBase =
            if (restrict)
              sh.entities.join(
                e.filter(col("child_key").isNotNull)
                  .select(col("child_key").as("__ck")).distinct(),
                col("key") === col("__ck")).drop("__ck")
            else sh.entities
          val children = nodesFor(childBase, sh, sub, restrict)
          // Left join keeps the empty-array marker rows (ord/child NULL);
          // they are dropped after the sort, leaving a genuinely empty array.
          val joined = e.join(children, e("child_key") === children("key"), "left")
          Some(f -> joined.groupBy(col("parent_key").as("key"))
            .agg(transform(
              filter(
                sort_array(collect_list(struct(col("ord"), col("node")))),
                x => x("ord").isNotNull),
              x => x("node")).as(f.name)))
        case _ => None
      }
    }

    val joined = nested.foldLeft(parsed) { case (acc, (f, df)) => acc.join(df, Seq("key"), "left") }
    val docCol: Column = struct(schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: StructType => col(f.name).as(f.name)
        case ArrayType(_: StructType, _) => col(f.name).as(f.name)
        case _ => col(s"scal.${f.name}").as(f.name)
      }
    }: _*)
    joined.select(col("key"), docCol.as("node"))
  }
}
