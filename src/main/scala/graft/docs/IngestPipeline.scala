package graft.docs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** ES ingest pipelines — the index-time processor chain (`PUT
  * _ingest/pipeline/...` + `?pipeline=` on writes). Each processor is one
  * document rewrite; the whole pipeline compiles to ONE composed column
  * expression (a fold of schema-aware struct rebuilds — the
  * BulkByQuery.setField machinery), so a million-doc ingest batch pays a
  * single codegen'd projection, not a per-processor pass.
  *
  * Supported processors (schema-preserving subset — this engine's
  * documents are typed structs, so shape-changing processors are out of
  * contract): `set` (literal), `lowercase`/`uppercase`/`trim`, `gsub`
  * (regex replace), `remove` (nulls the leaf — the typed-struct reading
  * of ES's key drop), and `script` (the d175 single-assignment Painless
  * subset). Unknown processors and option keys reject loudly; `if`
  * conditions are not implemented (reject, never silently run
  * unconditionally). */
object IngestPipeline {

  sealed trait Processor { def path: Seq[String] }
  final case class SetLit(path: Seq[String], value: String) extends Processor
  final case class MapStr(path: Seq[String], kind: String) extends Processor
  final case class Gsub(path: Seq[String], pattern: String, replacement: String)
    extends Processor
  final case class Remove(path: Seq[String]) extends Processor
  final case class Script(us: BulkByQuery.UpdateScript) extends Processor {
    def path: Seq[String] = us.path
  }


  def parse(body: String, schema: StructType): Seq[Processor] = {
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case other => throw new IllegalArgumentException(s"pipeline must be an object: $other")
    }
    val unknown = root.keySet -- Set("description", "processors")
    require(unknown.isEmpty, s"unsupported pipeline key(s): ${unknown.mkString(", ")}")
    val procs = root.get("processors") match {
      case Some(JArray(ps)) => ps
      case other => throw new IllegalArgumentException(s"pipeline needs processors: $other")
    }
    def opts(kind: String, j: JValue, allowed: Set[String]): Map[String, JValue] = j match {
      case JObject(fs) =>
        val m = fs.toMap
        val u = m.keySet -- allowed
        require(u.isEmpty, s"unsupported $kind option(s): ${u.mkString(", ")}")
        m
      case other => throw new IllegalArgumentException(s"bad $kind processor: $other")
    }
    def fieldOf(kind: String, m: Map[String, JValue], strLeaf: Boolean): Seq[String] = {
      val p = m.get("field") match {
        case Some(JString(f)) => f.split('.').toSeq
        case other => throw new IllegalArgumentException(s"$kind needs field: $other")
      }
      val (arr, _) = SearchQuery.splitArrayPath(p, schema)
      require(arr.isEmpty, s"$kind on array path ${p.mkString(".")} is not implemented")
      val lt = SearchQuery.leafType(p, schema, kind)
      if (strLeaf) require(lt == StringType, s"$kind needs a string field, got $lt")
      p
    }
    procs.map {
      case JObject(List(("set", spec))) =>
        val m = opts("set", spec, Set("field", "value"))
        val v = m.get("value") match {
          case Some(JString(v0)) => v0
          case other => throw new IllegalArgumentException(
            s"set needs a string value (typed leaves go through script): $other")
        }
        SetLit(fieldOf("set", m, strLeaf = true), v)
      case JObject(List((kind @ ("lowercase" | "uppercase" | "trim"), spec))) =>
        MapStr(fieldOf(kind, opts(kind, spec, Set("field")), strLeaf = true), kind)
      case JObject(List(("gsub", spec))) =>
        val m = opts("gsub", spec, Set("field", "pattern", "replacement"))
        (m.get("pattern"), m.get("replacement")) match {
          case (Some(JString(p0)), Some(JString(r0))) =>
            Gsub(fieldOf("gsub", m, strLeaf = true), p0, r0)
          case other => throw new IllegalArgumentException(
            s"gsub needs pattern + replacement: $other")
        }
      case JObject(List(("remove", spec))) =>
        Remove(fieldOf("remove", opts("remove", spec, Set("field")), strLeaf = false))
      case JObject(List(("script", spec))) =>
        val m = opts("script", spec, Set("source"))
        m.get("source") match {
          case Some(JString(src)) => Script(BulkByQuery.parseUpdateScript(src, schema))
          case other => throw new IllegalArgumentException(s"script needs source: $other")
        }
      case JObject(List((kind, _))) =>
        throw new IllegalArgumentException(s"unsupported processor: $kind")
      case other => throw new IllegalArgumentException(s"bad processor entry: $other")
    }
  }

  /** The whole pipeline as one composed doc rewrite. */
  def apply(doc: Column, schema: StructType, procs: Seq[Processor]): Column =
    procs.foldLeft(doc) { (c, p) =>
      def cur(path: Seq[String]): Column = path.foldLeft(c)((x, f) => x.getField(f))
      val v: Column = p match {
        case SetLit(path, value) => lit(value)
        case MapStr(path, "lowercase") => lower(cur(path))
        case MapStr(path, "uppercase") => upper(cur(path))
        case MapStr(path, _) => trim(cur(path))
        case Gsub(path, pat, rep) => regexp_replace(cur(path), pat, rep)
        case Remove(path) => lit(null)
        case Script(us) => SearchQuery.compileScriptWith(us.expr,
          path => path.foldLeft(c)((x, f) => x.getField(f)), lit(null).cast("double"))
      }
      BulkByQuery.setField(c, p.path, v, schema)
    }
}
