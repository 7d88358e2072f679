package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shredded (normalized) representation of a document corpus — the engine's
  * equivalent of the reference's Redis KV layout (SURVEY §1.1):
  *
  *   - `entities`: one row per document node — `key` = `{typeTag}_{objectId}`
  *     (`PlanService.java:78`), `type_tag`, and the node's scalar residue as a
  *     JSON string (children stripped, `PlanService.java:72-82`).
  *   - `edges`: one row per parent→child relation — `(parent_key, field, ord,
  *     child_key)`. The reference stores one Redis key per relation
  *     (`PlanService.java:41-44,63-67`); we keep array order explicitly in
  *     `ord` (the reference relies on key-array position,
  *     `PlanService.java:52-57`). An array field that is present-but-empty is
  *     recorded as a single marker edge with `ord` and `child_key` both NULL
  *     (the reference stores the literal string `"[]"`), so reassembly can
  *     distinguish an empty array from an absent one.
  *
  * At 100 TB both tables are plain columnar datasets; every downstream access
  * is an equi-join or equi-filter on `key`/`parent_key` (never a key-glob
  * scan like the reference's `KEYS k_*`), so partition pruning and shuffle
  * co-partitioning do the work of Redis point-gets at any scale.
  */
final case class Shredded(entities: DataFrame, edges: DataFrame)

/** M2 — recursive document shredder (SURVEY §2 M2).
  *
  * Re-expresses `PlanService.savePlan` (`PlanService.java:26-85`) as a
  * statically-walked tree of DataFrame transforms, in one of two shapes
  * chosen by HOW EXPENSIVE THE INPUT IS TO RE-READ (r19, guide §1/§4/§6 —
  * both measured at sf0.1 before choosing):
  *
  *   - [[Shredder.shred]] — one DataFrame branch per schema node, glued
  *     with `unionAll` (≈11 branches for the plan schema across the two
  *     outputs). Every branch is pure whole-stage codegen; the input is
  *     read once per branch. This WINS when the input is an at-rest
  *     parquet table (the warm-corpus ingest: 11 cheap column-pruned
  *     scans beat one interpreted pass — 4.3 s vs 7.5 s for the sf0.1
  *     shred step).
  *   - [[Shredder.shredComputed]] — ONE expression per output table that
  *     emits every node (resp. relation) of a document as an array
  *     element, exploded once: the input plan executes exactly once per
  *     output. This WINS when the input is a computed frame — the
  *     mutation paths (update/delete-by-query, `_bulk`, `_reindex`) shred
  *     a freshly merge-patched corpus whose recomputation per branch
  *     dominated their cost (d175 5.6→3.3 s at sf0.1). The price is that
  *     higher-order functions are CodegenFallback, so the per-element
  *     lambdas evaluate interpreted — cheap next to recomputing the
  *     input, expensive next to a parquet scan; hence two shapes.
  *
  * Both produce identical tables (ShredderSpec pins equality on the real
  * corpus and on adversarial null/empty fixtures; the oracle gates cover
  * each shape through its callers: d1/d2/d3 the at-rest walk, the
  * d12/d14/d17x/d19x mutation families the computed walk).
  *
  * Type-tag subtlety reproduced from the reference (SURVEY §1.1): the root
  * and array elements are tagged with their declared `objectType`
  * (`PlanService.java:55`), while object-valued fields are tagged with the
  * **field name** (`PlanService.java:36`) — so the canonical sample document
  * yields keys like `planCostShares_1234vxc2324sdf-501`, not
  * `membercostshare_…`.
  */
object Shredder {

  private[docs] val edgeSchema = StructType(Seq(
    StructField("parent_key", StringType),
    StructField("field", StringType),
    StructField("ord", IntegerType),
    StructField("child_key", StringType)))

  private val entitySchema = StructType(Seq(
    StructField("key", StringType),
    StructField("type_tag", StringType),
    StructField("json", StringType)))

  private def isStruct(dt: DataType): Boolean = dt.isInstanceOf[StructType]
  private def isStructArray(dt: DataType): Boolean = dt match {
    case ArrayType(_: StructType, _) => true
    case _ => false
  }
  private[docs] def scalarFields(s: StructType): Seq[StructField] =
    s.fields.toSeq.filterNot(f => isStruct(f.dataType) || isStructArray(f.dataType))

  /** Shred `docs(docCol)` (a struct column) into entity + edge tables —
    * per-schema-node branch shape, for AT-REST inputs (see class doc).
    * The root tag is read from the data (`doc.objectType`), matching
    * `PlanController.savePlan`'s `savePlan(plan, plan.get("objectType"))`.
    */
  def shred(docs: DataFrame, docCol: String = "doc"): Shredded = {
    val schema = docs.schema(docCol).dataType.asInstanceOf[StructType]
    val nodes = docs.select(col(s"$docCol.objectType").as("tag"), col(docCol).as("node"))
    val (ents, edgs) = walk(nodes, schema)
    val emptyEdges = docs.sparkSession.createDataFrame(
      docs.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], edgeSchema)
    // One row per key: the reference's Redis SET is idempotent per key
    // (`PlanService.java:78-82`), so a child shared by many parents (e.g.
    // one customer in many order docs) stores once — without this, every
    // reassembly join fans out by the duplicate count.
    Shredded(
      ents.reduce(_ unionAll _).dropDuplicates("key"),
      edgs.foldLeft(emptyEdges)(_ unionAll _))
  }

  /** One recursion level: `nodes` is `(tag: string, node: struct)`. Returns
    * (entity DFs, edge DFs) for this node set and everything beneath it. */
  private def walk(nodes: DataFrame, schema: StructType): (Seq[DataFrame], Seq[DataFrame]) = {
    val key: Column = concat(col("tag"), lit("_"), col("node.objectId"))
    val scalars = scalarFields(schema)
    val entity = nodes.select(
      key.as("key"),
      col("tag").as("type_tag"),
      to_json(struct(scalars.map(f => col(s"node.${f.name}").as(f.name)): _*)).as("json"))

    val childResults = schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case sub: StructType =>
          // Object-valued field: child tagged by FIELD NAME (PlanService.java:36).
          val present = nodes.filter(col(s"node.${f.name}").isNotNull)
          val edge = present.select(
            key.as("parent_key"),
            lit(f.name).as("field"),
            lit(null).cast(IntegerType).as("ord"),
            concat(lit(f.name), lit("_"), col(s"node.${f.name}.objectId")).as("child_key"))
          val children = present.select(lit(f.name).as("tag"), col(s"node.${f.name}").as("node"))
          val (e, g) = walk(children, sub)
          Some((e, edge +: g))
        case ArrayType(sub: StructType, _) =>
          // Array field: elements tagged by their objectType (PlanService.java:55);
          // posexplode_outer turns a present-but-empty array into the (NULL, NULL)
          // marker row so emptiness survives the round trip.
          val present = nodes.filter(col(s"node.${f.name}").isNotNull)
          val exploded = present.select(
            key.as("parent_key"),
            posexplode_outer(col(s"node.${f.name}")).as(Seq("pos", "elem")))
          val edge = exploded.select(
            col("parent_key"),
            lit(f.name).as("field"),
            col("pos").cast(IntegerType).as("ord"),
            when(col("elem").isNull, lit(null).cast(StringType))
              .otherwise(concat(col("elem.objectType"), lit("_"), col("elem.objectId")))
              .as("child_key"))
          val children = exploded.filter(col("elem").isNotNull)
            .select(col("elem.objectType").as("tag"), col("elem").as("node"))
          val (e, g) = walk(children, sub)
          Some((e, edge +: g))
        case _ => None
      }
    }
    (entity +: childResults.flatMap(_._1), childResults.flatMap(_._2))
  }

  // ------------------------------------------------------------------
  // single-pass shape, for COMPUTED inputs (see class doc)
  // ------------------------------------------------------------------

  /** Shred with the input plan executed exactly ONCE per output table:
    * the whole node tree of a document comes out of one nested-array
    * expression, exploded. Use for computed inputs (merge-patched or
    * script-transformed corpora); for at-rest tables prefer [[shred]].
    * NULL-safety: NULL fields/arrays become typed empty arrays BEFORE
    * `concat`/`flatten` see them (either would propagate the NULL and
    * wipe the whole document's array). */
  def shredComputed(docs: DataFrame, docCol: String = "doc"): Shredded = {
    val schema = docs.schema(docCol).dataType.asInstanceOf[StructType]
    val root = col(docCol)
    val rootTag = root.getField("objectType")
    val ents = docs
      .select(explode(entityArray(root, rootTag, schema)).as("e"))
      .select(col("e.key").as("key"), col("e.type_tag").as("type_tag"),
        col("e.json").as("json"))
      .dropDuplicates("key")
    val edgs = docs
      .select(explode(edgeArray(root, rootTag, schema)).as("g"))
      .select(col("g.parent_key").as("parent_key"), col("g.field").as("field"),
        col("g.ord").as("ord"), col("g.child_key").as("child_key"))
    Shredded(ents, edgs)
  }

  private def key(node: Column, tag: Column): Column =
    concat(tag, lit("_"), node.getField("objectId"))

  private def noEnts = array().cast(ArrayType(entitySchema))
  private def noEdges = array().cast(ArrayType(edgeSchema))

  /** All entity rows of the tree rooted at `node`, as
    * `array<struct<key,type_tag,json>>` — self first, then each child
    * field's subtree in schema order (union order is immaterial: the
    * caller dedups by key and every consumer sorts or joins). Lambdas
    * only where the document fans out: struct children are plain
    * `when(isNotNull, …)` concats (HOFs are CodegenFallback). */
  private def entityArray(node: Column, tag: Column, schema: StructType): Column = {
    val scalars = scalarFields(schema)
    val self = struct(
      key(node, tag).as("key"),
      tag.as("type_tag"),
      to_json(struct(scalars.map(f => node.getField(f.name).as(f.name)): _*)).as("json"))
    val childParts: Seq[Column] = schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case sub: StructType =>
          // Object-valued field: child tagged by FIELD NAME (PlanService.java:36).
          val child = node.getField(f.name)
          Some(when(child.isNotNull, entityArray(child, lit(f.name), sub))
            .otherwise(noEnts))
        case ArrayType(sub: StructType, _) =>
          // Array field: elements tagged by their objectType (PlanService.java:55);
          // a NULL element emits no entity (its edge keeps the NULL child_key).
          val arr = node.getField(f.name)
          Some(flatten(transform(
            coalesce(arr, array().cast(ArrayType(sub))),
            c => when(c.isNotNull, entityArray(c, c.getField("objectType"), sub))
              .otherwise(noEnts))))
        case _ => None
      }
    }
    childParts.foldLeft(array(self))((acc, p) => concat(acc, p))
  }

  /** All edge rows of the tree rooted at `node`, as
    * `array<struct<parent_key,field,ord,child_key>>`. Mirrors [[walk]]
    * exactly: absent (NULL) fields emit nothing, a present-but-empty
    * array emits the single (NULL ord, NULL child_key) marker row, a
    * NULL array element emits an edge with NULL child_key but no child
    * subtree. */
  private def edgeArray(node: Column, tag: Column, schema: StructType): Column = {
    val parentKey = key(node, tag)
    val parts: Seq[Column] = schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case sub: StructType =>
          val child = node.getField(f.name)
          val ownEdge = struct(
            parentKey.as("parent_key"),
            lit(f.name).as("field"),
            lit(null).cast(IntegerType).as("ord"),
            concat(lit(f.name), lit("_"), child.getField("objectId")).as("child_key"))
          Some(when(child.isNotNull,
              concat(array(ownEdge), edgeArray(child, lit(f.name), sub)))
            .otherwise(noEdges))
        case ArrayType(sub: StructType, _) =>
          val arr = node.getField(f.name)
          val marker = array(struct(
            parentKey.as("parent_key"),
            lit(f.name).as("field"),
            lit(null).cast(IntegerType).as("ord"),
            lit(null).cast(StringType).as("child_key")))
          // one lambda per array field: the element's own edge plus its
          // whole subtree come out of a single transform+flatten pass
          val perElem = flatten(transform(arr, (c, i) => concat(
            array(struct(
              parentKey.as("parent_key"),
              lit(f.name).as("field"),
              i.cast(IntegerType).as("ord"),
              when(c.isNull, lit(null).cast(StringType))
                .otherwise(concat(c.getField("objectType"), lit("_"),
                  c.getField("objectId")))
                .as("child_key"))),
            when(c.isNotNull, edgeArray(c, c.getField("objectType"), sub))
              .otherwise(noEdges))))
          Some(when(arr.isNull, noEdges)
            .when(size(arr) === 0, marker)
            .otherwise(perElem))
        case _ => None
      }
    }
    if (parts.isEmpty) noEdges
    else parts.reduce((a, b) => concat(a, b))
  }
}
