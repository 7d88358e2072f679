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
  * statically-unrolled tree of DataFrame transforms: the schema is walked
  * once at plan-build time in Scala, so a corpus of any size shreds in one
  * pass per nesting level (the reference pays n+e Redis round-trips per
  * document).
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

  private def isStruct(dt: DataType): Boolean = dt.isInstanceOf[StructType]
  private def isStructArray(dt: DataType): Boolean = dt match {
    case ArrayType(_: StructType, _) => true
    case _ => false
  }
  private[docs] def scalarFields(s: StructType): Seq[StructField] =
    s.fields.toSeq.filterNot(f => isStruct(f.dataType) || isStructArray(f.dataType))

  /** Shred `docs(docCol)` (a struct column) into entity + edge tables.
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
}
