package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The analyzer chain + deterministic relevance scoring — the engine-side
  * equivalent of the reference's ES `match` semantics (`README.md:85-90`:
  * `match` analyzes the query/field text and ranks hits by `_score`; the
  * analyzer itself is ES-internal there, so this module defines a fully
  * specified, engine-portable one).
  *
  * Analyzer chain (classic lowercase/strip/stop/stem):
  *   1. lowercase
  *   2. strip non-alphanumerics to spaces
  *   3. whitespace split, empties dropped
  *   4. stopword removal (fixed published list below)
  *   5. S-stemmer (Harman 1991, "How Effective Is Suffixing?"):
  *      `-ies`→`-y` (unless `-eies`/`-aies`), else `-es`→`-e`-less (drop
  *      the `s`, unless `-aes`/`-ees`/`-oes`), else drop final `-s`
  *      (unless `-us`/`-ss`).
  *
  * Scoring is TF×IDF-shaped but all-INTEGER so the DuckDB oracle
  * reproduces it bit-exactly: `score(q, d) = Σ_t tf(t, d) · (N − df_t)`
  * over analyzed query terms `t` — no logarithms, no doubles, same
  * ranking monotonicity (rarer term ⇒ larger weight).
  *
  * Scale shape: analysis is a pure per-row expression chain (no UDFs, no
  * shuffle); df is one broadcast-sized aggregate over the exploded terms;
  * scoring is one equi-join on term + one groupBy on doc — constant
  * shuffles at any corpus size, and top-k ranking is `ORDER BY … LIMIT k`
  * (TakeOrderedAndProject, never a global sort).
  */
object TextAnalysis {

  /** Fixed stopword list (subset of the classic Snowball English list —
    * fixed here so both engines share it verbatim). */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "with")

  /** S-stemmer on one lowercase token. */
  def stem(t: Column): Column =
    when(t.endsWith("ies") && !t.endsWith("eies") && !t.endsWith("aies"),
      concat(t.substr(lit(1), length(t) - 3), lit("y")))
      .when(t.endsWith("es") && !t.endsWith("aes") && !t.endsWith("ees") && !t.endsWith("oes"),
        t.substr(lit(1), length(t) - 1))
      .when(t.endsWith("s") && !t.endsWith("us") && !t.endsWith("ss"),
        t.substr(lit(1), length(t) - 1))
      .otherwise(t)

  /** Full analyzer: text column → array of analyzed terms (duplicates
    * kept — term frequency is the point). */
  def analyze(c: Column): Column =
    transform(
      filter(
        split(trim(regexp_replace(lower(c), "[^a-z0-9 ]", " ")), " +"),
        t => t =!= "" && !t.isin(Stopwords.map(lit): _*)),
      stem(_))

  /** Scala-side analyzer for query strings (must agree with `analyze` —
    * same chain evaluated at plan-build time). */
  def analyzeQuery(q: String): Seq[String] = {
    def stem1(t: String): String =
      if (t.endsWith("ies") && !t.endsWith("eies") && !t.endsWith("aies"))
        t.dropRight(3) + "y"
      else if (t.endsWith("es") && !t.endsWith("aes") && !t.endsWith("ees") && !t.endsWith("oes"))
        t.dropRight(1)
      else if (t.endsWith("s") && !t.endsWith("us") && !t.endsWith("ss"))
        t.dropRight(1)
      else t
    q.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim.split(" +").toSeq
      .filter(t => t.nonEmpty && !Stopwords.contains(t)).map(stem1)
  }

  /** DuckDB mirror of `stem` over token expression `t`. */
  def stemSql(t: String): String =
    s"""CASE WHEN $t LIKE '%ies' AND $t NOT LIKE '%eies' AND $t NOT LIKE '%aies'
       |       THEN substr($t, 1, len($t) - 3) || 'y'
       |     WHEN $t LIKE '%es' AND $t NOT LIKE '%aes' AND $t NOT LIKE '%ees' AND $t NOT LIKE '%oes'
       |       THEN substr($t, 1, len($t) - 1)
       |     WHEN $t LIKE '%s' AND $t NOT LIKE '%us' AND $t NOT LIKE '%ss'
       |       THEN substr($t, 1, len($t) - 1)
       |     ELSE $t END""".stripMargin.replaceAll("\\s+", " ")

  private def stopListSql: String =
    Stopwords.map(s => s"'$s'").mkString("(", ",", ")")

  /** DuckDB mirror of `analyze` over text expression `x` (a list expr). */
  def analyzeSql(x: String): String =
    s"""list_transform(
       |  list_filter(
       |    regexp_split_to_array(trim(regexp_replace(lower($x), '[^a-z0-9 ]', ' ', 'g')), ' +'),
       |    t -> t <> '' AND t NOT IN $stopListSql),
       |  t -> ${stemSql("t")})""".stripMargin.replaceAll("\\s+", " ")
}
