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
  * rebuild the node. A single-document GET (M4 point lookup) is the same
  * plan with `rootKeys` filtered to one key — Parquet min/max and partition
  * pruning reduce it to a point read; no plan changes between "read one doc"
  * and "read all docs".
  *
  * Scale shape: each level is an equi-join on `key` (shuffle co-partitioned)
  * plus one aggregation per array field — O(levels) shuffles total,
  * independent of corpus size, vs the reference's O(nodes) round-trips.
  */
object Assembler {

  /** Reassemble all documents of `rootTag`, or only `rootKeys` if given.
    * Returns `(key, doc)` with `doc` matching `schema` exactly. */
  def assemble(sh: Shredded, schema: StructType, rootTag: String,
               rootKeys: Option[DataFrame] = None): DataFrame = {
    val keys = rootKeys.getOrElse(
      sh.entities.filter(col("type_tag") === rootTag).select(col("key")))
    nodesFor(sh, keys, schema).select(col("key"), col("node").as("doc"))
  }

  /** Rebuild the nodes whose keys are in `keys` (single column `key`). */
  private def nodesFor(sh: Shredded, keys: DataFrame, schema: StructType): DataFrame = {
    val scalars = Shredder.scalarFields(schema)
    val scalarSchema = StructType(scalars)
    val k = keys.select(col("key").as("__k")).distinct()
    val base = sh.entities.join(k, col("key") === col("__k"))
      .select(col("key"), from_json(col("json"), scalarSchema).as("scal"))

    // One (key, <field>) frame per nested field, joined back at the end.
    val nested: Seq[(StructField, DataFrame)] = schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case sub: StructType =>
          val e = sh.edges.filter(col("field") === f.name)
            .join(k, col("parent_key") === col("__k"))
            .select(col("parent_key"), col("child_key"))
          val children = nodesFor(sh, e.select(col("child_key").as("key")), sub)
          Some(f -> e.join(children, e("child_key") === children("key"))
            .select(col("parent_key").as("key"), col("node").as(f.name)))
        case ArrayType(sub: StructType, _) =>
          val e = sh.edges.filter(col("field") === f.name)
            .join(k, col("parent_key") === col("__k"))
            .select(col("parent_key"), col("ord"), col("child_key"))
          val children = nodesFor(sh,
            e.filter(col("child_key").isNotNull).select(col("child_key").as("key")), sub)
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

    val joined = nested.foldLeft(base) { case (acc, (f, df)) => acc.join(df, Seq("key"), "left") }
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
