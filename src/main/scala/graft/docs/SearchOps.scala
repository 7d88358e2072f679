package graft.docs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C — the search surface (SURVEY §2 Q1-Q6), re-expressed as Column
  * builders over the denormalized document table (the engine's analogue of
  * the `planindex` Elasticsearch index maintained by P3-P5).
  *
  * The reference's de-facto query language is the five canonical Kibana
  * queries in `README.md:67-147`; each maps to a declarative predicate that
  * Catalyst pushes into the scan:
  *
  *   - Q1 match_all          → no predicate (full scan)
  *   - Q2 nested match       → `exists(arr, _.path == v)`; inner_hits =
  *                             `filter(arr, pred)` projection
  *   - Q3 wildcard           → glob→`LIKE` translation
  *   - Q4 nested wildcard    → `exists(arr, _.path LIKE p)` (`.keyword`
  *                             semantics = raw string compare = `LIKE`)
  *   - Q5 numeric range      → `between(lo, hi)`
  *   - Q6 full-text match    → tokenized `array_contains` (the analyzer
  *                             chain proper lives in graft.ext.TextAnalysis)
  */
object SearchOps {

  /** ES/glob wildcard → SQL LIKE pattern: `*`→`%`, `?`→`_`, with SQL
    * wildcard characters in the glob escaped (`README.md:96-127`). */
  def globToLike(glob: String): String =
    glob.flatMap {
      case '*' => "%"
      case '?' => "_"
      case '%' => "\\%"
      case '_' => "\\_"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Q3/Q4 — wildcard match on a keyword field. */
  def wildcard(c: Column, glob: String): Column = c.like(globToLike(glob))

  /** Q5 — inclusive numeric range (`gte`/`lte`, `README.md:136-141`). */
  def range(c: Column, lo: Long, hi: Long): Column = c.between(lo, hi)

  /** Q5 with per-bound exclusivity (ES `gt`/`lt`). Both conjuncts are
    * simple comparisons against literals — pushdown-eligible either way. */
  def range(c: Column, lo: Long, hi: Long, loIncl: Boolean, hiIncl: Boolean): Column =
    (if (loIncl) c >= lo else c > lo) && (if (hiIncl) c <= hi else c < hi)

  /** ES `minimum_should_match` = n of the given clauses — a sum of boolean
    * casts compared to n (one linear pass, no 2^M expansion). Each cast is
    * coalesced to 0: a clause whose predicate evaluates to NULL (missing /
    * null field) counts as UNMATCHED, as in ES — without the coalesce one
    * NULL clause would nullify the whole sum and drop a document that
    * satisfies >= n other clauses. */
  def atLeast(n: Int, preds: Seq[Column]): Column =
    if (n > preds.size) lit(false)
    else preds.map(p => coalesce(p.cast("int"), lit(0))).reduce(_ + _) >= lit(n)

  /** ES `terms` — keyword membership in a literal value list. Compiles to
    * an `In` predicate — pushdown-eligible like any hand-written `isin`. */
  def termsIn(c: Column, values: Seq[String]): Column = c.isin(values: _*)

  /** ES `prefix` — LITERAL prefix on a keyword field (no glob characters;
    * `startsWith` maps to the `StringStartsWith` pushdown filter). */
  def prefix(c: Column, v: String): Column = c.startsWith(v)

  /** ES `exists` — the field has an indexed value. ES indexes NOTHING for
    * an empty array, so for array fields `exists` requires non-empty, not
    * just non-null (the reference's empty-`linkedPlanServices` plans are
    * exactly this case). */
  def existsField(c: Column, isArray: Boolean): Column =
    if (isArray) c.isNotNull && size(c) > 0 else c.isNotNull

  /** ES `match_phrase` — the analyzed tokens of `phrase` appear
    * CONSECUTIVELY in the analyzed text. Whitespace analyzer: normalize
    * both sides to single-space-joined lowercase tokens and test padded
    * containment (tokens contain no spaces, so ` a b ` ⊆ ` … ` is exactly
    * consecutive-token adjacency — no false substring hits across token
    * boundaries). Pure string expressions, codegen-friendly. */
  def phraseMatch(text: Column, phrase: String): Column = {
    val norm = phrase.toLowerCase.trim.split("\\s+").mkString(" ")
    contains(
      concat(lit(" "),
        array_join(filter(split(lower(text), "\\s+"), t => length(t) > 0), " "),
        lit(" ")),
      lit(s" $norm "))
  }

  /** ES `match_phrase_prefix`: the analyzed tokens appear CONSECUTIVELY
    * with the LAST as a PREFIX of its doc token (autocomplete). One
    * regex find over the same normalized ' t1 t2 … '-joined token string
    * phraseMatch uses — query tokens regex-quoted, the last extended by
    * `[^ ]*` to its token boundary. ES's `max_expansions` truncates the
    * inverted index's prefix expansion list (an index artifact a scan
    * has no analogue of): this match is exact-unbounded, a SUPERSET of
    * any truncated expansion — documented deviation, never fewer hits. */
  def phrasePrefixMatch(text: Column, phrase: String): Column = {
    val toks = phrase.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val joined = concat(lit(" "),
      array_join(filter(split(lower(text), "\\s+"), t => length(t) > 0), " "),
      lit(" "))
    val pat = " " + toks.map(java.util.regex.Pattern.quote).mkString(" ") + "[^ ]* "
    joined.rlike(pat)
  }

  /** ES `regexp` — ANCHORED full-value regex (ES/Lucene semantics: the
    * pattern must match the whole keyword value, unlike SQL rlike's
    * substring search — hence the `^(?:…)$` wrap). */
  def regexMatch(c: Column, pattern: String): Column =
    c.rlike(s"^(?:$pattern)$$")

  /** ES `fuzzy` — unanalyzed term within `fuzziness` edits. Levenshtein
    * (ES uses Damerau — transpositions count 1 there, 2 here; documented
    * divergence, same metric in the oracle). `levenshtein`'s 3-arg form
    * bounds the computation at the threshold. */
  def fuzzyMatch(c: Column, v: String, fuzziness: Int): Column =
    levenshtein(c, lit(v), fuzziness) >= 0 // 3-arg form returns -1 past the bound

  /** Q2 — nested match: does SOME element of `arr` satisfy `pred`? */
  def nestedMatch(arr: Column, pred: Column => Column): Column = exists(arr, pred)

  /** Q2 inner_hits — project the matching nested elements
    * (`README.md:84-93`: ES re-extracts the matching children). */
  def innerHits(arr: Column, pred: Column => Column): Column = filter(arr, pred)

  /** Q6 — tokenized full-text term match (whitespace analyzer). */
  def tokenMatch(text: Column, term: String): Column =
    array_contains(split(lower(text), "\\s+"), term.toLowerCase)

  /** `match_bool_prefix`'s last-term semantics: SOME analyzed token
    * starts with the (lowercased) prefix — the search-as-you-type
    * contract. Pure array expression, codegen-friendly. */
  def tokenPrefix(text: Column, prefix: String): Column =
    exists(split(lower(text), "\\s+"), t => t.startsWith(prefix.toLowerCase))

  /** Analyzed positions of `term` in `text` (0-based token indexes). */
  private def tokenPositions(text: Column, term: String): Column =
    filter(
      transform(split(lower(text), "\\s+"),
        (t, i) => when(t === lit(term.toLowerCase), i).otherwise(lit(-1))),
      x => x >= 0)

  /** Sloppy two-term phrase (Lucene move-count): an (a, b) position pair
    * within `slop` moves — ordered gap g costs g (adjacent = 0),
    * transposed costs distance + 1 (adjacent transposition = 2, ES's
    * documented example). O(occ(a)·occ(b)) per row as a pure array
    * expression — no explode, no positional index needed. */
  def phraseSlop(text: Column, a: String, b: String, slop: Int): Column = {
    val pa = tokenPositions(text, a)
    val pb = tokenPositions(text, b)
    exists(pa, x => exists(pb, y =>
      when(y > x, y - x - 1 <= slop).otherwise(x - y + 1 <= slop)))
  }

  /** ES `intervals` `match` rule (Lucene interval semantics over the
    * whitespace analyzer): SOME assignment of one position per term
    * whose minimal covering span wastes at most `maxGaps` non-term
    * positions (`span - |terms| <= max_gaps`; `maxGaps < 0` = unbounded,
    * the ES default), positions strictly increasing in term order when
    * `ordered`. 1-3 DISTINCT terms (distinctness makes the positions
    * automatically distinct — parse rejects repeats) as pure nested
    * array expressions — O(∏ occurrences) per row, no explode, no
    * positional index. This is the proximity shape the d111 phrase-slop
    * move-count CANNOT express: slop pays for transpositions, while
    * `ordered` forbids them outright and `max_gaps` prices only the
    * wasted positions. */
  /** ES `span_first`: the analyzed term appears within the first `end`
    * token positions (0-based position < end ⇔ span end ≤ end). */
  def spanFirst(text: Column, term: String, end: Int): Column =
    exists(tokenPositions(text, term), p => p < lit(end))

  def intervalMatch(text: Column, terms: Seq[String], ordered: Boolean, maxGaps: Int): Column = {
    val ps = terms.map(tokenPositions(text, _))
    def spanOk(lo: Column, hi: Column): Column =
      if (maxGaps < 0) lit(true) else (hi - lo + lit(1) - lit(terms.size)) <= lit(maxGaps)
    terms.size match {
      case 1 => size(ps(0)) > 0
      case 2 if ordered =>
        exists(ps(0), x => exists(ps(1), y => y > x && spanOk(x, y)))
      case 2 =>
        exists(ps(0), x => exists(ps(1), y => spanOk(least(x, y), greatest(x, y))))
      case 3 if ordered =>
        exists(ps(0), x => exists(ps(1), y => y > x &&
          exists(ps(2), z => z > y && spanOk(x, z))))
      case 3 =>
        exists(ps(0), x => exists(ps(1), y => exists(ps(2), z =>
          spanOk(least(least(x, y), z), greatest(greatest(x, y), z)))))
      case n => throw new IllegalArgumentException(
        s"intervals match supports 1-3 terms, got $n") // parse re-checks
    }
  }
}
