package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ES `_bulk` — the ordered mixed-action batch (index / create / update /
  * delete), the transport every real ES ingest pipeline actually uses. The
  * reference mutates one document per HTTP verb (`PlanController.java:
  * 156-301`); `_bulk` is the set-oriented form with EXACT sequential
  * semantics: within one batch, action k sees the effects of actions
  * 1..k-1 on the same `_id` (a create after an index conflicts; an index
  * after a delete re-creates).
  *
  * Execution shape: the batch is a REQUEST-side literal (bounded like the
  * msearch legs and rank_eval requests — never corpus-scale data), so the
  * per-id action chain is folded at plan-build time in Scala under BOTH
  * initial-existence assumptions ("the corpus has this id" / "it does
  * not"). Everything data-dependent collapses to that one bit, resolved by
  * ONE broadcast equi-join of the batch ids against the corpus:
  *
  *   - per-action results: `when(exists, <folded-present-status>)
  *     .otherwise(<folded-absent-status>)` — a pure column CASE.
  *   - final per-id content: `absent` / `corpus` (untouched) / a base doc
  *     (batch literal or the stored doc) with the surviving update patches
  *     replayed IN ORDER as a statically-unrolled MergePatch column chain
  *     (M9 semantics per patch — exactly what repeated PATCH requests
  *     would do).
  *
  * The index mutation itself is the existing set machinery: deletions ride
  * M6 cascadeDelete, upserts ride M8 replace — one plan for a 10-action
  * batch or a 10-million-action one (the batch build is the only
  * driver-side cost, linear in request size; ES bulks are MB-bounded for
  * the same reason).
  *
  * Per-action results use ES's vocabulary: `created` 201, `updated` 200,
  * `deleted` 200, `not_found` 404 (update/delete on a missing doc),
  * `version_conflict` 409 (create on an existing doc). A failed action
  * never changes state — exactly ES's per-item error contract.
  */
object Bulk {

  /** One parsed batch action. `payload`: the doc JSON (index/create), the
    * partial-doc JSON (update), None (delete). */
  final case class Action(seq: Int, op: String, id: String, payload: Option[String])

  /** Parse the NDJSON `_bulk` request body: alternating action-metadata
    * lines `{"<op>": {"_index": "plan", "_id": …}}` and (for
    * index/create/update) source lines. Update sources must be
    * `{"doc": {…partial…}}` — the script form is rejected loudly. */
  def parse(ndjson: String): Seq[Action] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.{compact, render, parse => jparse}
    val lines = ndjson.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    val out = Seq.newBuilder[Action]
    var i = 0
    var seq = 0
    while (i < lines.length) {
      val (op, id) = jparse(lines(i)) match {
        case JObject(List((op0, JObject(meta)))) =>
          require(Set("index", "create", "update", "delete")(op0),
            s"unsupported _bulk op: $op0")
          val m = meta.toMap
          val unknown = m.keySet -- Set("_index", "_id")
          require(unknown.isEmpty,
            s"unsupported _bulk metadata key(s): ${unknown.mkString(", ")}")
          m.get("_index").foreach {
            case JString("plan") => ()
            case other => throw new IllegalArgumentException(
              s"_bulk _index must name this corpus (\"plan\"): $other")
          }
          m.get("_id") match {
            case Some(JString(id0)) => (op0, id0)
            case other => throw new IllegalArgumentException(s"_bulk needs string _id: $other")
          }
        case other => throw new IllegalArgumentException(s"bad _bulk action line: $other")
      }
      i += 1
      val payload = op match {
        case "delete" => None
        case "update" =>
          require(i < lines.length, s"_bulk update for $id missing its source line")
          jparse(lines(i)) match {
            case JObject(List(("doc", d @ JObject(_)))) =>
              i += 1; Some(compact(render(d)))
            case other => throw new IllegalArgumentException(
              s"_bulk update source must be {\"doc\": {…}} (script form not implemented): $other")
          }
        case _ =>
          require(i < lines.length, s"_bulk $op for $id missing its source line")
          val d = jparse(lines(i))
          require(d.isInstanceOf[JObject], s"_bulk $op source must be an object: $d")
          // the payload's identity must MATCH the action line — the
          // response keys on _id while the mutation keys on the payload's
          // objectType_objectId, so a mismatch would silently desync the
          // two (reject loudly, the module contract)
          val dm = d.asInstanceOf[JObject].obj.toMap
          dm.get("objectId") match {
            case Some(JString(oid)) => require(oid == id,
              s"_bulk $op payload objectId $oid does not match _id $id")
            case _ => throw new IllegalArgumentException(
              s"_bulk $op payload for $id must carry its objectId")
          }
          dm.get("objectType") match {
            case Some(JString("plan")) | None => ()
            case other => throw new IllegalArgumentException(
              s"_bulk $op payload objectType must be plan: $other")
          }
          i += 1; Some(compact(render(d)))
      }
      out += Action(seq, op, id, payload)
      seq += 1
    }
    out.result()
  }

  /** Final per-id content under one initial-existence assumption:
    * `kind` = "absent" | "corpus" | "doc"; for "doc", `base` is the last
    * full-doc literal (None = the stored corpus doc) and `patches` the
    * update patches applied after it, in order. */
  private[docs] final case class Content(kind: String, base: Option[String],
                                         patches: Seq[String])

  private[docs] final case class Branch(exists: Boolean, content: Content,
                                        statuses: Vector[(String, Int)])

  /** Fold one id's actions under one initial-existence assumption —
    * the exact ES sequential semantics. */
  private[docs] def fold(actions: Seq[Action], initiallyExists: Boolean): Branch =
    actions.foldLeft(Branch(initiallyExists,
      Content(if (initiallyExists) "corpus" else "absent", None, Nil), Vector.empty)) {
      case (b, a) => a.op match {
        case "index" =>
          Branch(exists = true, Content("doc", a.payload, Nil),
            b.statuses :+ (if (b.exists) ("updated", 200) else ("created", 201)))
        case "create" =>
          if (b.exists) b.copy(statuses = b.statuses :+ ("version_conflict", 409))
          else Branch(exists = true, Content("doc", a.payload, Nil),
            b.statuses :+ ("created", 201))
        case "update" =>
          if (!b.exists) b.copy(statuses = b.statuses :+ ("not_found", 404))
          else {
            val c = b.content match {
              case Content("corpus", _, _) => Content("doc", None, a.payload.toSeq)
              case Content("doc", base, ps) => Content("doc", base, ps ++ a.payload.toSeq)
              case other => throw new IllegalStateException(s"update on $other")
            }
            Branch(exists = true, c, b.statuses :+ ("updated", 200))
          }
        case "delete" =>
          if (!b.exists) b.copy(statuses = b.statuses :+ ("not_found", 404))
          else Branch(exists = false, Content("absent", None, Nil),
            b.statuses :+ ("deleted", 200))
        case other => throw new IllegalArgumentException(s"unsupported _bulk op: $other")
      }
    }

  /** The batch's outcome: the per-action response frame (`seq`, `id`,
    * `op`, `result`, `status`, in request order), the post-bulk index,
    * and the fresh shred of the upserted docs (plan-local — its roots and
    * children key the touched closures without a reachability pass). */
  final case class Outcome(resp: DataFrame, after: Shredded, fresh: Shredded)

  def run(assembled: DataFrame, sh: Shredded, ndjson: String,
          schema: StructType, maxDepth: Int,
          docCol: String = "doc"): Outcome = {
    val spark = assembled.sparkSession
    val actions = parse(ndjson)
    require(actions.nonEmpty, "_bulk batch is empty")
    val byId = actions.groupBy(_.id)
    val folded: Map[String, (Branch, Branch)] =
      byId.map { case (id, as) => id -> (fold(as, initiallyExists = true),
        fold(as, initiallyExists = false)) }

    val doc = col(docCol)
    // ONE broadcast equi-join resolves every id's initial-existence bit
    // (the batch side is request-bounded; the corpus side prunes to the
    // joined ids). `_stored` rides along for patch bases.
    val corpus = assembled.select(doc.getField("objectId").as("_cid"), doc.as("_stored"))

    // ---- per-action response ------------------------------------------
    val respRows = actions.map { a =>
      val (bp, ba) = folded(a.id)
      val k = byId(a.id).indexWhere(_.seq == a.seq)
      val (rp, sp) = bp.statuses(k)
      val (ra, sa) = ba.statuses(k)
      (a.seq.toLong, a.id, a.op, rp, sp, ra, sa)
    }
    import spark.implicits._
    val resp = broadcast(respRows.toDF("seq", "id", "op", "_rp", "_sp", "_ra", "_sa"))
      .join(corpus.select(col("_cid")), col("id") === col("_cid"), "left")
      .select(col("seq"), col("id"), col("op"),
        when(col("_cid").isNotNull, col("_rp")).otherwise(col("_ra")).as("result"),
        when(col("_cid").isNotNull, col("_sp")).otherwise(col("_sa")).as("status"))

    // ---- the index mutation -------------------------------------------
    val idRows = folded.toSeq.sortBy(_._1).map { case (id, (bp, ba)) =>
      (id, bp.content.kind, bp.content.base, bp.content.patches,
        ba.content.kind, ba.content.base, ba.content.patches)
    }
    val ids = broadcast(idRows.toDF("id", "_kp", "_bp", "_pp", "_ka", "_ba", "_pa"))
      .join(corpus, col("id") === col("_cid"), "left")
    val exists = col("_cid").isNotNull
    val kind = when(exists, col("_kp")).otherwise(col("_ka"))
    val base = when(exists, col("_bp")).otherwise(col("_ba"))
    val patches = when(exists, col("_pp")).otherwise(col("_pa"))

    // ids whose final state is absent but whose closure is in the index.
    // PINNED (batch-bounded driver rows): the cascade's fixed-depth
    // expansion embeds its root frame in every join round, and the fresh
    // shred embeds the doc frame once per schema node — left lazy, the
    // broadcast-join + patch-chain plan is duplicated ~15× and re-executed
    // per copy (measured 30 s vs ~5 s at sf0.1). The batch is request-
    // bounded by contract, so the collect is ES's own bulk-body bound.
    val deleteRoots = graft.Eager.pin(ids.filter(kind === "absent" && exists)
      .select(concat(lit("plan_"), col("id")).as("key")))

    // final docs: base (batch literal or the stored doc) + the ordered
    // patch chain, statically unrolled (batches carry few patches per id)
    val maxPatches = folded.valuesIterator
      .flatMap { case (p, a) => Iterator(p.content.patches.size, a.content.patches.size) }
      .max
    val base0 = when(base.isNotNull, from_json(base, schema)).otherwise(col("_stored"))
    val patched = (1 to maxPatches).foldLeft(base0) { (acc, i) =>
      when(size(patches) >= i,
        MergePatch.merge(acc, from_json(element_at(patches, i), schema), schema))
        .otherwise(acc)
    }
    val newDocs = graft.Eager.pin(ids.filter(kind === "doc").select(patched.as(docCol)))

    // ONE cascade for both the final deletions and the replaced docs' old
    // closures (M8 replace = cascade + fresh shred; running its cascade
    // separately from the delete cascade would double the fixed-depth
    // join rounds — both root sets are pinned literals, so their union is
    // free), then the fresh shred unions in.
    val newRoots = newDocs.select(
      concat(col(s"$docCol.objectType"), lit("_"), col(s"$docCol.objectId")).as("key"))
    val cleaned = Mutations.cascadeDelete(sh, deleteRoots.unionByName(newRoots), maxDepth)
    val fresh = Shredder.shred(newDocs, docCol)
    Outcome(resp.orderBy(col("seq")), Shredded(
      cleaned.entities.unionAll(fresh.entities),
      cleaned.edges.unionAll(fresh.edges)), fresh)
  }
}
