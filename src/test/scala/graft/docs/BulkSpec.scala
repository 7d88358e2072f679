package graft.docs

import graft.SparkSpec

/** `_bulk` parse + sequential-fold semantics (the behavioral surface rides
  * the d191 oracle gate; these pin the state machine's edges). */
class BulkSpec extends SparkSpec {

  private def acts(ndjson: String) = Bulk.parse(ndjson)

  test("parse: alternating metadata/source lines; delete carries no source") {
    val a = acts(
      """{"index": {"_index": "plan", "_id": "a"}}
        |{"objectId": "a"}
        |{"delete": {"_id": "b"}}
        |{"update": {"_id": "c"}}
        |{"doc": {"x": 1}}""".stripMargin)
    assert(a.map(x => (x.op, x.id, x.payload.isDefined)) ===
      Seq(("index", "a", true), ("delete", "b", false), ("update", "c", true)))
  }

  test("parse rejections: bad op, wrong index, script update, missing source") {
    def bad(s: String): String =
      intercept[IllegalArgumentException](Bulk.parse(s)).getMessage
    assert(bad("""{"upsert": {"_id": "a"}}""").contains("unsupported _bulk op"))
    assert(bad("""{"index": {"_index": "other", "_id": "a"}}
                 |{"objectId": "a"}""".stripMargin).contains("_index"))
    assert(bad("""{"update": {"_id": "a"}}
                 |{"script": {"source": "x"}}""".stripMargin).contains("doc"))
    assert(bad("""{"index": {"_id": "a"}}""").contains("missing its source"))
    assert(bad("""{"index": {"_id": "a", "routing": "r"}}
                 |{}""".stripMargin).contains("unsupported _bulk metadata"))
  }

  test("fold: ES sequential semantics under both initial-existence branches") {
    def f(ops: (String, Option[String])*): (Seq[String], Seq[String]) = {
      val as = ops.zipWithIndex.map { case ((op, p), i) => Bulk.Action(i, op, "x", p) }
      (Bulk.fold(as, initiallyExists = true).statuses.map(_._1),
        Bulk.fold(as, initiallyExists = false).statuses.map(_._1))
    }
    // index always wins; create conflicts on present
    assert(f("index" -> Some("{}"), "create" -> Some("{}")) ===
      (Seq("updated", "version_conflict"), Seq("created", "version_conflict")))
    // delete then index re-creates; delete on absent is not_found
    assert(f("delete" -> None, "index" -> Some("{}"), "delete" -> None) ===
      (Seq("deleted", "created", "deleted"), Seq("not_found", "created", "deleted")))
    // update touches only present docs and never changes existence
    assert(f("update" -> Some("{}"), "delete" -> None) ===
      (Seq("updated", "deleted"), Seq("not_found", "not_found")))
  }

  test("fold: final content chains base + ordered patches") {
    val as = Seq(
      Bulk.Action(0, "index", "x", Some("""{"a":1}""")),
      Bulk.Action(1, "update", "x", Some("""{"p":1}""")),
      Bulk.Action(2, "update", "x", Some("""{"p":2}""")))
    val b = Bulk.fold(as, initiallyExists = true)
    assert(b.content === Bulk.Content("doc", Some("""{"a":1}"""),
      Seq("""{"p":1}""", """{"p":2}""")))
    // update on the stored corpus doc patches base=None
    val b2 = Bulk.fold(as.tail, initiallyExists = true)
    assert(b2.content === Bulk.Content("doc", None, Seq("""{"p":1}""", """{"p":2}""")))
    // a delete resets the chain
    val b3 = Bulk.fold(as :+ Bulk.Action(3, "delete", "x", None), initiallyExists = true)
    assert(b3.content === Bulk.Content("absent", None, Nil))
  }
}
