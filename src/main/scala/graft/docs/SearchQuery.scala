package graft.docs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's query AST — the structured equivalent of the reference's
  * Elasticsearch DSL surface (`README.md:67-147`), compiled to a single
  * Catalyst predicate `Column` (SURVEY §3.3: "DSL-shaped query surface
  * compiles to DataFrame predicates").
  *
  * Each AST node maps 1:1 onto a canonical query form (Q1-Q6, SearchOps);
  * `And`/`Or`/`Not` compose them the way ES `bool`
  * `must`/`should`/`must_not` clauses do. Compilation is pure expression
  * building — the result participates in pushdown/pruning like any
  * hand-written filter.
  */
sealed trait SearchQuery

object SearchQuery {

  /** Q1 — match every document. */
  case object MatchAll extends SearchQuery
  /** Q3/Q4 — glob wildcard on a (possibly nested-scalar) field path. */
  final case class Wildcard(path: Seq[String], glob: String) extends SearchQuery
  /** Q5 — inclusive numeric range on a field path. */
  final case class Range(path: Seq[String], lo: Long, hi: Long) extends SearchQuery
  /** Q2 — SOME element of the array field matches `field == value`. */
  final case class NestedTerm(arrayPath: Seq[String], field: Seq[String], value: String) extends SearchQuery
  /** Q4 — SOME element of the array field matches a glob on `field`. */
  final case class NestedWildcard(arrayPath: Seq[String], field: Seq[String], glob: String) extends SearchQuery
  /** Q5 nested — SOME element's numeric `field` is within [lo, hi]. */
  final case class NestedRange(arrayPath: Seq[String], field: Seq[String], lo: Long, hi: Long) extends SearchQuery
  /** Q6 — whitespace-tokenized term match on a text field. */
  final case class TermMatch(path: Seq[String], term: String) extends SearchQuery
  /** ES bool must / should / must_not. */
  final case class And(qs: SearchQuery*) extends SearchQuery
  final case class Or(qs: SearchQuery*) extends SearchQuery
  final case class Not(q: SearchQuery) extends SearchQuery

  private def field(root: Column, path: Seq[String]): Column =
    path.foldLeft(root)((c, f) => c.getField(f))

  // ------------------------------------------------------------ ES JSON

  /** Parse the reference's Kibana/ES query JSON (`README.md:67-147` — its
    * de-facto query language) into the AST, so a reference user can run
    * their existing query bodies verbatim.
    *
    * Supported forms (everything the reference README exercises, plus
    * `bool`/`term` for composition): `match_all`, `match`, `term`,
    * `wildcard` (with the ES `{"value": …}` object or a bare string, and
    * `.keyword` path suffixes), `range` (`gte`/`lte`), `nested` (the
    * wrapper is transparent for the predicate — field paths are absolute
    * in ES — and `inner_hits` projection is SearchOps.innerHits, applied
    * separately), and `bool` (`must` → And, `should` → Or, `must_not` →
    * Not; the must+should interaction is simplified to conjunction).
    *
    * ES `nested.path` names any nested *mapping object* — the reference
    * maps structs AND arrays as `nested` (`IndexingListener.java:71-96`)
    * — so array-ness cannot be read off the query. The parser resolves it
    * from the document schema: the first path component typed ArrayType
    * splits the path into (arrayPath, elementField) → Nested* nodes;
    * struct-only paths compile to plain field access (README query 5:
    * `nested` over `planCostShares` is just `planCostShares.copay`).
    */
  /** A fully-parsed ES body: the filter AST plus every `inner_hits`
    * request carried by a `nested` wrapper — `(wrapperPath, innerQuery)`,
    * compiled to a matched-children array column by [[innerHitCol]]
    * (`README.md:84-93`: ES re-extracts the matching children). */
  final case class Parsed(query: SearchQuery, hits: Seq[(Seq[String], SearchQuery)])

  def fromJson(body: String, schema: org.apache.spark.sql.types.StructType): SearchQuery =
    parseBody(body, schema).query

  def parseBody(body: String, schema: org.apache.spark.sql.types.StructType): Parsed = {
    import org.json4s._
    val q = org.json4s.jackson.JsonMethods.parse(body) \ "query"
    require(q != JNothing, "ES query body must contain a top-level \"query\"")
    val hits = scala.collection.mutable.ListBuffer.empty[(Seq[String], SearchQuery)]
    val ast = parseNode(q, schema, hits)
    Parsed(ast, hits.toList)
  }

  private def parseNode(jv: org.json4s.JValue,
                        schema: org.apache.spark.sql.types.StructType,
                        hits: scala.collection.mutable.ListBuffer[(Seq[String], SearchQuery)]): SearchQuery = {
    import org.json4s._
    def asLong(v: JValue): Long = v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDecimal(d) => d.toLong
      case JDouble(d) => d.toLong
      case JString(s) => s.toLong
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    }
    def asString(v: JValue): String = v match {
      case JString(s) => s
      case JInt(i) => i.toString
      case other => throw new IllegalArgumentException(s"not a string: $other")
    }
    def path(p: String): Seq[String] =
      p.stripSuffix(".keyword").split('.').toSeq
    def children(v: JValue): Seq[JValue] = v match {
      case JArray(xs) => xs
      case JNothing => Nil
      case single => Seq(single)
    }
    jv match {
      case JObject(List(("match_all", _))) => MatchAll
      case JObject(List(("nested", JObject(fields)))) =>
        // transparent wrapper for the predicate: inner field paths are
        // absolute in ES. An `inner_hits` key records a matched-children
        // projection request against the wrapper path.
        val inner = fields.collectFirst { case ("query", q) => q }
          .getOrElse(throw new IllegalArgumentException("nested without query"))
        val ast = parseNode(inner, schema, hits)
        if (fields.exists(_._1 == "inner_hits")) {
          val wrapperPath = fields.collectFirst { case ("path", p) => path(asString(p)) }
            .getOrElse(throw new IllegalArgumentException("nested without path"))
          hits += ((wrapperPath, ast))
        }
        ast
      case JObject(List(("bool", JObject(fields)))) =>
        val f = fields.toMap
        val musts = children(f.getOrElse("must", JNothing)).map(parseNode(_, schema, hits))
        val shoulds = children(f.getOrElse("should", JNothing)).map(parseNode(_, schema, hits))
        val nots = children(f.getOrElse("must_not", JNothing)).map(parseNode(_, schema, hits))
        // ES semantics: with at least one `must`/`filter` clause present,
        // `minimum_should_match` defaults to 0 — `should` only boosts
        // scores and must NOT filter the hit set. It filters (as a
        // disjunction) only when it stands alone, or when the body pins
        // minimum_should_match >= 1 explicitly.
        val msm = f.get("minimum_should_match").map(asLong).getOrElse(
          if (musts.isEmpty) 1L else 0L)
        require(msm <= 1,
          s"minimum_should_match=$msm unsupported (only 0 and 1)")
        val shouldFilters = shoulds.nonEmpty && msm >= 1
        val parts = musts ++
          (if (shouldFilters) Seq(if (shoulds.size == 1) shoulds.head else Or(shoulds: _*)) else Nil) ++
          nots.map(Not)
        if (parts.isEmpty) MatchAll
        else if (parts.size == 1) parts.head
        else And(parts: _*)
      case JObject(List((op @ ("match" | "term"), JObject(List((p, spec)))))) =>
        val value = spec match {
          case JObject(f) => f.toMap.get("query").orElse(f.toMap.get("value"))
            .map(asString).getOrElse(throw new IllegalArgumentException(s"$op needs query/value"))
          case v => asString(v)
        }
        splitArrayPath(path(p), schema) match {
          case (Nil, full) if op == "match" => TermMatch(full, value)
          case (Nil, full) => Wildcard(full, value) // term = untokenized exact
          case (arr, rest) => NestedTerm(arr, rest, value)
        }
      case JObject(List(("wildcard", JObject(List((p, spec)))))) =>
        val glob = spec match {
          case JObject(f) => f.toMap.get("value").map(asString)
            .getOrElse(throw new IllegalArgumentException("wildcard needs value"))
          case v => asString(v)
        }
        splitArrayPath(path(p), schema) match {
          case (Nil, full) => Wildcard(full, glob)
          case (arr, rest) => NestedWildcard(arr, rest, glob)
        }
      case JObject(List(("range", JObject(List((p, JObject(bounds))))))) =>
        val b = bounds.toMap
        // Reject bound forms this engine does not implement rather than
        // silently widening the range: {"gt": 5} parsed as unbounded-below
        // would return a SUPERSET of the correct rows.
        val unsupported = b.keySet -- Set("gte", "lte")
        require(unsupported.isEmpty,
          s"unsupported range bound(s) ${unsupported.mkString(", ")} on $p (only gte/lte)")
        val lo = b.get("gte").map(asLong).getOrElse(Long.MinValue)
        val hi = b.get("lte").map(asLong).getOrElse(Long.MaxValue)
        splitArrayPath(path(p), schema) match {
          case (Nil, full) => Range(full, lo, hi)
          case (arr, rest) => NestedRange(arr, rest, lo, hi)
        }
      case other => throw new IllegalArgumentException(s"unsupported ES query node: $other")
    }
  }

  /** Split a dotted field path at its first ArrayType component:
    * `(arrayPath, fieldWithinElement)`; `(Nil, path)` when no array. */
  private def splitArrayPath(p: Seq[String],
                             schema: org.apache.spark.sql.types.StructType): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.types._
    var dt: DataType = schema
    p.zipWithIndex.foreach { case (f, i) =>
      dt match {
        case st: StructType => st.fields.find(_.name == f).map(_.dataType) match {
          case Some(ArrayType(elem, _)) => return (p.take(i + 1), p.drop(i + 1))
          case Some(other) => dt = other
          case None => return (Nil, p)
        }
        case _ => return (Nil, p)
      }
    }
    (Nil, p)
  }

  /** Compile the AST to a boolean Column over document column `doc`. */
  def compile(q: SearchQuery, doc: Column): Column = q match {
    case MatchAll => lit(true)
    case Wildcard(p, g) => SearchOps.wildcard(field(doc, p), g)
    case Range(p, lo, hi) => SearchOps.range(field(doc, p), lo, hi)
    case NestedTerm(ap, f, v) =>
      SearchOps.nestedMatch(field(doc, ap), x => field(x, f) === lit(v))
    case NestedWildcard(ap, f, g) =>
      SearchOps.nestedMatch(field(doc, ap), x => SearchOps.wildcard(field(x, f), g))
    case NestedRange(ap, f, lo, hi) =>
      SearchOps.nestedMatch(field(doc, ap), x => field(x, f).between(lo, hi))
    case TermMatch(p, t) => SearchOps.tokenMatch(field(doc, p), t)
    case And(qs @ _*) => qs.map(compile(_, doc)).reduce(_ && _)
    case Or(qs @ _*) => qs.map(compile(_, doc)).reduce(_ || _)
    case Not(sub) => !compile(sub, doc)
  }

  /** Compile one `inner_hits` request to an array Column of the matching
    * nested children (`README.md:84-93`). For a query over an array path
    * (Nested* nodes) the hits are the elements satisfying the per-element
    * predicate; for a struct-path `nested` wrapper (the reference maps
    * structs as `nested` too — README query 5 over `planCostShares`) the
    * hit is the struct itself when the predicate holds, as a 0/1-element
    * array. Both are pure expressions — no join, no shuffle. */
  def innerHitCol(wrapperPath: Seq[String], inner: SearchQuery, doc: Column): Column =
    inner match {
      case NestedTerm(ap, f, v) =>
        SearchOps.innerHits(field(doc, ap), x => field(x, f) === lit(v))
      case NestedWildcard(ap, f, g) =>
        SearchOps.innerHits(field(doc, ap), x => SearchOps.wildcard(field(x, f), g))
      case NestedRange(ap, f, lo, hi) =>
        SearchOps.innerHits(field(doc, ap), x => field(x, f).between(lo, hi))
      case other =>
        SearchOps.innerHits(array(field(doc, wrapperPath)), _ => compile(other, doc))
    }
}
