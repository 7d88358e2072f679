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
}
