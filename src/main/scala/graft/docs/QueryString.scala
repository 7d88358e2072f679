package graft.docs

import org.apache.spark.sql.types.StructType

/** The Kibana search-bar syntax (ES `query_string`), compiled into the
  * existing [[SearchQuery]] AST — no new leaf types, so everything the
  * grammar produces inherits the leaves' pushdown/pruning behavior.
  *
  * Supported subset (everything else is REJECTED loudly — the engine's
  * no-silent-superset rule):
  *
  *   - `field:value`      — analyzed single-term match (TermMatch /
  *                          NestedTerm through array paths)
  *   - `field:"a phrase"` — consecutive-token phrase (MatchPhrase)
  *   - `field:val*`       — trailing-star prefix (Prefix — pushes down as
  *                          StringStartsWith); any other `*`/`?` placement
  *                          compiles to the glob Wildcard
  *   - `field:*`          — field exists (ES semantics for a bare star)
  *   - `AND` / `OR` / `NOT` (UPPERCASE, as ES requires), standard
  *     precedence NOT > AND > OR, parentheses for grouping
  *   - adjacency (two clauses with no operator) uses the body's
  *     `default_operator` (ES default: OR)
  *
  * Bare terms (no `field:`) need a default field, which this engine does
  * not implement — rejected with a message saying so.
  */
object QueryString {

  import SearchQuery._

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class ClauseTok(field: String, value: String, phrase: Boolean) extends Tok

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else {
        // one atom: runs to whitespace/paren, honoring quoted segments
        val sb = new StringBuilder
        var done = false
        while (i < n && !done) {
          q(i) match {
            case '"' =>
              val close = q.indexOf('"', i + 1)
              require(close >= 0, s"unterminated quote in query_string at offset $i")
              sb.append(q.substring(i, close + 1)); i = close + 1
            case w if w.isWhitespace => done = true
            case '(' | ')' => done = true
            case ch => sb.append(ch); i += 1
          }
        }
        sb.toString match {
          case "AND" => out += AndTok
          case "OR" => out += OrTok
          case "NOT" => out += NotTok
          case atom =>
            val ci = atom.indexOf(':')
            require(ci > 0,
              s"query_string clause must be field:value — bare term \"$atom\" needs a " +
                "default field, which is not implemented")
            val f = atom.substring(0, ci)
            val v = atom.substring(ci + 1)
            require(v.nonEmpty, s"query_string clause \"$atom\" has an empty value")
            if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
              out += ClauseTok(f, v.substring(1, v.length - 1), phrase = true)
            else {
              require(!v.contains('"'), s"misplaced quote in query_string clause \"$atom\"")
              out += ClauseTok(f, v, phrase = false)
            }
        }
      }
    }
    out.result()
  }

  /** Parse `q` into the AST. `defaultAnd` = the body's
    * `default_operator` is `and` (adjacency binds as AND at AND
    * precedence; the ES default OR binds at OR precedence). */
  def parse(q: String, schema: StructType, defaultAnd: Boolean = false): SearchQuery = {
    val toks = lex(q)
    require(toks.nonEmpty, "query_string is empty")
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def startsPrimary(t: Tok): Boolean = t match {
      case LP | NotTok | _: ClauseTok => true
      case _ => false
    }
    def orExpr(): SearchQuery = {
      // Lucene level semantics, not binary association: every clause at
      // this level is a SHOULD unless NOT-prefixed, and the prohibited
      // clauses apply level-globally — `a NOT b` and `a OR NOT b` both
      // mean (a) AND NOT (b), and `a NOT b OR c` means (a OR c) AND NOT
      // (b). A left-assoc Or(a, Not(b)) would instead match almost the
      // whole corpus.
      val shoulds = scala.collection.mutable.ListBuffer.empty[SearchQuery]
      val nots = scala.collection.mutable.ListBuffer.empty[SearchQuery]
      def item(): Unit = peek match {
        case Some(NotTok) => pos += 1; nots += andExpr()
        case _ => shoulds += andExpr()
      }
      item()
      var go = true
      while (go) peek match {
        case Some(OrTok) => pos += 1; item()
        case Some(t) if !defaultAnd && startsPrimary(t) => item()
        case _ => go = false
      }
      val positive =
        if (shoulds.isEmpty) None
        else if (shoulds.size == 1) Some(shoulds.head)
        else Some(Or(shoulds.toSeq: _*))
      val negative = nots.toList.map(n => Not(n))
      (positive, negative) match {
        case (Some(p), Nil) => p
        case (Some(p), ns) => And(p +: ns: _*)
        case (None, n :: Nil) => n
        case (None, ns) => And(ns: _*)
      }
    }
    def andExpr(): SearchQuery = {
      var left = unary()
      var go = true
      while (go) peek match {
        case Some(AndTok) => pos += 1; left = And(left, unary())
        case Some(t) if defaultAnd && startsPrimary(t) => left = And(left, unary())
        case _ => go = false
      }
      left
    }
    def unary(): SearchQuery = peek match {
      case Some(NotTok) => pos += 1; Not(unary())
      case _ => primary()
    }
    def primary(): SearchQuery = peek match {
      case Some(LP) =>
        pos += 1
        val inner = orExpr()
        require(peek.contains(RP), s"unbalanced parentheses in query_string at token $pos")
        pos += 1
        inner
      case Some(ClauseTok(f, v, phrase)) => pos += 1; leaf(f, v, phrase, schema)
      case other => throw new IllegalArgumentException(
        s"query_string expected a clause or group, got $other")
    }
    val ast = orExpr()
    require(pos == toks.length,
      s"query_string has trailing tokens from position $pos: ${toks.drop(pos).mkString(" ")}")
    ast
  }

  /** ES `simple_query_string` — the end-user search-box syntax: `+` AND,
    * `|` OR, `-term` negation, `"..."` phrase, `term*` prefix, `(...)`
    * grouping. Terms carry NO `field:` prefix; the body's `fields` list
    * names the targets, a term expanding to an OR across them (each leaf
    * built by the same schema-driven [[leaf]] as query_string, so every
    * clause inherits pushdown).
    *
    * Operator semantics follow Lucene's SimpleQueryParser: `+`/`|`
    * combine LEFT-ASSOCIATIVELY in input order (`a | b + c` = (a OR b)
    * AND c — the parser has no precedence ladder), adjacency uses the
    * body's `default_operator` (ES default OR), and `-` clauses are
    * prohibited LEVEL-GLOBALLY (`a -b` = a AND NOT b even under OR — a
    * MUST_NOT beside SHOULDs in the Lucene boolean, the same convention
    * as query_string's NOT). `-` only negates at a clause start; inside
    * a word it is literal (`1-URGENT`).
    *
    * Engine deviation, documented: ES's parser is LENIENT — malformed
    * syntax degrades to literal terms. This engine rejects loudly (the
    * no-silent-superset rule); a query that parses is interpreted
    * identically. */
  def parseSimple(q: String, fields: Seq[String], schema: StructType,
                  defaultAnd: Boolean = false): SearchQuery = {
    require(fields.nonEmpty, "simple_query_string needs a non-empty fields list " +
      "(engine deviation: no index-level default field exists to fall back to)")
    // lex: ( ) + | are standalone operator tokens wherever unquoted; a
    // term runs to whitespace/operator, honoring one quoted segment
    sealed trait STok
    case object SLP extends STok; case object SRP extends STok
    case object SAnd extends STok; case object SOr extends STok
    case object SNeg extends STok
    case class STerm(value: String, phrase: Boolean) extends STok
    val toks = {
      val out = Vector.newBuilder[STok]
      var i = 0
      val n = q.length
      var atClauseStart = true // after start/operator/'(' a '-' negates
      while (i < n) {
        q(i) match {
          case c if c.isWhitespace => i += 1; atClauseStart = true
          case '(' => out += SLP; i += 1; atClauseStart = true
          case ')' => out += SRP; i += 1; atClauseStart = false
          case '+' => out += SAnd; i += 1; atClauseStart = true
          case '|' => out += SOr; i += 1; atClauseStart = true
          case '-' if atClauseStart => out += SNeg; i += 1; atClauseStart = false
          case '"' =>
            val close = q.indexOf('"', i + 1)
            require(close >= 0, s"unterminated quote in simple_query_string at offset $i")
            out += STerm(q.substring(i + 1, close), phrase = true)
            i = close + 1; atClauseStart = false
          case _ =>
            val sb = new StringBuilder
            var done = false
            while (i < n && !done) q(i) match {
              case c if c.isWhitespace => done = true
              case '(' | ')' | '+' | '|' | '"' => done = true
              case c => sb.append(c); i += 1
            }
            out += STerm(sb.toString, phrase = false); atClauseStart = false
        }
      }
      out.result()
    }
    require(toks.nonEmpty, "simple_query_string is empty")
    var pos = 0
    def peek: Option[STok] = if (pos < toks.length) Some(toks(pos)) else None
    /** One term/phrase across the fields list: OR over per-field leaves. */
    def expand(v: String, phrase: Boolean): SearchQuery = {
      val leaves = fields.map(f => leaf(f, v, phrase, schema))
      if (leaves.size == 1) leaves.head else Or(leaves: _*)
    }
    def primary(): SearchQuery = peek match {
      case Some(SLP) =>
        pos += 1
        val inner = level()
        require(peek.contains(SRP), s"unbalanced parentheses in simple_query_string at token $pos")
        pos += 1
        inner
      case Some(STerm(v, ph)) => pos += 1; expand(v, ph)
      case other => throw new IllegalArgumentException(
        s"simple_query_string expected a term or group, got $other")
    }
    /** One paren level: left-assoc `+`/`|` over positives, `-` clauses
      * prohibited level-globally (see the contract above). */
    def level(): SearchQuery = {
      var positive: Option[SearchQuery] = None
      val nots = scala.collection.mutable.ListBuffer.empty[SearchQuery]
      var nextOpAnd: Option[Boolean] = None // operator waiting for the next clause
      def clause(): Unit = {
        val negated = peek.contains(SNeg)
        if (negated) pos += 1
        val p = primary()
        if (negated) {
          require(nextOpAnd.isEmpty,
            "simple_query_string: an explicit +/| before a -clause is not implemented " +
              "(prohibited clauses are level-global, an operator there has no meaning)")
          nots += p
        } else positive = positive match {
          case None => Some(p)
          case Some(l) =>
            if (nextOpAnd.getOrElse(defaultAnd)) Some(And(l, p)) else Some(Or(l, p))
        }
        nextOpAnd = None
      }
      clause()
      var go = true
      while (go) peek match {
        case Some(SAnd) => pos += 1; nextOpAnd = Some(true); clause()
        case Some(SOr) => pos += 1; nextOpAnd = Some(false); clause()
        case Some(SLP) | Some(SNeg) | Some(_: STerm) => clause()
        case _ => go = false
      }
      (positive, nots.toList) match {
        case (Some(p), Nil) => p
        case (Some(p), ns) => And(p +: ns.map(Not(_)): _*)
        case (None, n :: Nil) => Not(n)
        case (None, ns) => And(ns.map(Not(_)): _*)
      }
    }
    val ast = level()
    require(pos == toks.length,
      s"simple_query_string has trailing tokens from position $pos: ${toks.drop(pos).mkString(" ")}")
    ast
  }

  private def leaf(f: String, v: String, phrase: Boolean, schema: StructType): SearchQuery = {
    // path resolution identical to the JSON DSL's (schema-driven array
    // split, `.keyword` suffix transparent)
    val p = f.stripSuffix(".keyword").split('.').toSeq
    splitArrayPath(p, schema) match {
      case (Nil, full) =>
        if (phrase) MatchPhrase(full, v)
        else if (v == "*") ExistsField(full, isArray = false)
        else if (v.contains('*') || v.contains('?')) {
          if (v.endsWith("*") && !v.dropRight(1).exists(ch => ch == '*' || ch == '?'))
            Prefix(full, v.dropRight(1))
          else Wildcard(full, v)
        }
        else TermMatch(full, v) // analyzed single-term match
      case (arr, Nil) if v == "*" => ExistsField(arr, isArray = true)
      case (arr, rest) =>
        if (phrase) NestedMatchPhrase(arr, rest, v)
        else if (v == "*") NestedExistsField(arr, rest)
        else if (v.contains('*') || v.contains('?')) {
          if (v.endsWith("*") && !v.dropRight(1).exists(ch => ch == '*' || ch == '?'))
            NestedPrefix(arr, rest, v.dropRight(1))
          else NestedWildcard(arr, rest, v)
        }
        // analyzed element match, same as the JSON DSL's `match` through
        // an array path; an explicit `.keyword` keeps exact equality
        else if (f.endsWith(".keyword")) NestedTerm(arr, rest, v)
        else NestedTokenMatch(arr, rest, v)
    }
  }
}
