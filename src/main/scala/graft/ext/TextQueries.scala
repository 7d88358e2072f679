package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import TextFunctions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline extensions (language-ID, quality scoring, token counting,
  * fingerprinting). The reference has no text pipeline (SURVEY §2 D:
  * full-text is Q6's ES analyzer, external); these are the north-star
  * extensions, built set-oriented so each runs as a constant number of
  * shuffles regardless of corpus size.
  *
  * Every query's arithmetic is integer or single-division double so the
  * DuckDB oracle reproduces values bit-exactly (see TextFunctions).
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  // ---------------------------------------------------------------- t1
  /** Token counting: whitespace tokens, unique tokens, a BPE-ish regex
    * token count, and the chars/4 subword estimate. Pure per-row map —
    * no shuffle; at 100 TB this is a single scan. */
  private def t1(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    docs(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_ws_tokens"),
      size(array_distinct(toks)).cast("long").as("n_unique_tokens"),
      regexp_count(col("text"), lit(BpePattern)).cast("long").as("n_bpe_tokens"),
      ((col("n_chars") + 3L) / lit(4)).cast("long").as("n_subword_est"))
      .orderBy(col("doc_id"))
  }

  private val t1Sql =
    s"""SELECT doc_id,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS n_ws_tokens,
       |  len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))) AS n_unique_tokens,
       |  len(regexp_extract_all(text, '$BpePattern')) AS n_bpe_tokens,
       |  (n_chars + 3) // 4 AS n_subword_est
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t2
  /** Quality scoring: length, lexical diversity, stopword ratio, mean token
    * length — the CCNet/Gopher-style heuristics. Ratios are one double
    * division of exact integers (bit-identical in any engine). */
  private def t2(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val stop = Seq("a", "the", "of", "and")
    docs(s, d)
      .select(col("doc_id"), col("n_chars"), toks.as("toks"))
      .select(
        col("doc_id"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique"),
        size(filter(col("toks"), t => t.isin(stop.map(lit): _*))).cast("long").as("n_stop"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("sum_tok_len"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"),
        (col("n_unique").cast("double") / col("n_tokens")).as("diversity"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("sum_tok_len").cast("double") / col("n_tokens")).as("mean_tok_len"),
        when(col("n_chars") < 180, "short")
          .when(col("n_unique") * 2 < col("n_tokens"), "low_diversity")
          .otherwise("ok").as("quality_flag"))
      .orderBy(col("doc_id"))
  }

  private val t2Sql =
    """WITH t AS (
      |  SELECT doc_id, n_chars,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_chars,
      |    len(toks) AS n_tokens,
      |    len(list_distinct(toks)) AS n_unique,
      |    len(list_filter(toks, x -> x IN ('a','the','of','and'))) AS n_stop,
      |    list_sum(list_transform(toks, x -> length(x))) AS sum_tok_len
      |  FROM t)
      |SELECT doc_id, n_chars, n_tokens,
      |  CAST(n_unique AS DOUBLE) / n_tokens AS diversity,
      |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
      |  CAST(sum_tok_len AS DOUBLE) / n_tokens AS mean_tok_len,
      |  CASE WHEN n_chars < 180 THEN 'short'
      |       WHEN n_unique * 2 < n_tokens THEN 'low_diversity'
      |       ELSE 'ok' END AS quality_flag
      |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t3
  /** Language-ID: corpus-trained token-profile classifier. Train = top-20
    * tokens per language by frequency (broadcast-sized profile: langs ×
    * 20 rows regardless of corpus size); score = how many of the doc's
    * token instances hit the profile; predict = argmax.
    *
    * Scale shape: one groupBy to train, one broadcast join + groupBy to
    * score — the profile is tiny at any corpus size, so the join never
    * shuffles the corpus side. */
  private def t3(s: SparkSession, d: String): DataFrame = {
    val tok = docs(s, d)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
    val profile = tok.groupBy(col("lang").as("p_lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_lang")).orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rn") <= 20)
      .select(col("p_lang"), col("tok"))
    val scored = tok.join(broadcast(profile), Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("p_lang"))
      .agg(count(lit(1)).as("score"))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("p_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("p_lang").as("pred_lang"),
        col("score"),
        when(col("lang") === col("p_lang"), 1L).otherwise(0L).as("correct"))
      .orderBy(col("doc_id"))
  }

  private val t3Sql =
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |profile AS (
      |  SELECT p_lang, tok FROM (
      |    SELECT lang AS p_lang, tok, COUNT(*) AS cnt,
      |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tok) AS rn
      |    FROM tok GROUP BY lang, tok) WHERE rn <= 20),
      |scored AS (
      |  SELECT doc_id, lang, p_lang, COUNT(*) AS score
      |  FROM tok JOIN profile USING (tok)
      |  GROUP BY doc_id, lang, p_lang)
      |SELECT doc_id, lang, p_lang AS pred_lang, score,
      |  CASE WHEN lang = p_lang THEN 1 ELSE 0 END AS correct
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rn
      |      FROM scored) WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t4
  /** Document fingerprinting: winnowing (Schleimer et al., SIGMOD 2003) —
    * 8-char k-gram rolling hashes, minimum per window of 4 consecutive
    * grams, distinct survivors are the doc's fingerprint set.
    *
    * Scale shape: the k-gram explode fans out to ~n_chars rows per doc, the
    * window-min is partition-local per doc (no cross-doc shuffle), and the
    * final per-doc aggregate collapses it back — one shuffle on doc_id. */
  private def t4(s: SparkSession, d: String): DataFrame = {
    val grams = docs(s, d).select(
      col("doc_id"), col("n_chars"),
      posexplode(transform(
        sequence(lit(1), greatest(col("n_chars").cast("int") - 7, lit(0))),
        i => stableHash32(col("text").substr(i, lit(8))))).as(Seq("p", "h")))
      .select(col("doc_id"), col("n_chars"), (col("p") + 1).as("pos"), col("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, 3)
    val winnowed = grams
      .select(col("doc_id"), col("n_chars"), col("pos"), min(col("h")).over(w).as("fp"))
      .filter(col("pos") <= col("n_chars") - 7 - 3) // full windows only
      .select(col("doc_id"), col("fp")).distinct()
    winnowed.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_fp"),
      min(col("fp")).as("min_fp"),
      max(col("fp")).as("max_fp"),
      sum(col("fp")).as("sum_fp"))
      .orderBy(col("doc_id"))
  }

  private val t4Sql =
    """WITH g AS (
      |  SELECT doc_id, n_chars, CAST(i AS INTEGER) AS pos,
      |    CAST(('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 8)) AS BIGINT) AS h
      |  FROM documents, unnest(range(1, n_chars - 6)) AS t(i)),
      |wmin AS (
      |  SELECT doc_id, pos, n_chars,
      |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM g),
      |fps AS (
      |  SELECT DISTINCT doc_id, fp FROM wmin WHERE pos <= n_chars - 7 - 3)
      |SELECT doc_id, COUNT(*) AS n_fp, MIN(fp) AS min_fp, MAX(fp) AS max_fp,
      |       CAST(SUM(fp) AS BIGINT) AS sum_fp
      |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t5
  /** Text normalization: case-fold, strip punctuation, squeeze whitespace —
    * the canonicalization pass every dedup/quality pipeline runs first.
    * The corpus is already clean, so the query dirties it deterministically
    * (uppercased prefix + injected punctuation) and asserts the normalizer
    * restores the original content hash. Pure per-row map, no shuffle. */
  private def t5(s: SparkSession, d: String): DataFrame = {
    val dirty = concat(upper(substring(col("text"), 1, 10)), lit("!! "),
      substring(col("text"), 11, 1000000), lit(" ??"))
    val norm = (c: Column) => trim(
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
    docs(s, d).select(
      col("doc_id"),
      md5(norm(dirty)).as("norm_hash"),
      when(md5(norm(dirty)) === md5(norm(col("text"))), 1L).otherwise(0L).as("restored"),
      length(norm(dirty)).cast("long").as("norm_len"))
      .orderBy(col("doc_id"))
  }

  private val t5Sql =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    upper(substr(text, 1, 10)) || '!! ' || substr(text, 11, 1000000) || ' ??' AS dirty
      |  FROM documents),
      |n AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(dirty), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nd,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
      |  FROM t)
      |SELECT doc_id, md5(nd) AS norm_hash,
      |  CASE WHEN md5(nd) = md5(nt) THEN 1 ELSE 0 END AS restored,
      |  length(nd) AS norm_len
      |FROM n ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t6
  /** Analyzed full-text relevance — the reference's ES `match` + `_score`
    * semantics (`README.md:85-90`) with a fully specified analyzer
    * (TextAnalysis: lowercase/strip/stop/stem) and an all-integer
    * TF×IDF-shaped score `Σ tf·(N−df)` so ranking is bit-reproducible.
    * The query exercises every analyzer stage: "The" is a stopword,
    * "DUP-merge" strips to two tokens, "queries" stems to "query".
    *
    * Scale shape: df is a term-count aggregate (broadcast-sized — bounded
    * by query terms), scoring one equi-join + groupBy on doc_id, and
    * top-k is ORDER BY + LIMIT (TakeOrderedAndProject, no global sort). */
  private val T6Query = "The DUP-merge queries!"

  private def t6(s: SparkSession, d: String): DataFrame = {
    val terms = TextAnalysis.analyzeQuery(T6Query) // dup, merge, query
    val tf = docs(s, d)
      .select(col("doc_id"), explode(TextAnalysis.analyze(col("text"))).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "t").crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * (col("n_docs") - col("df"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  private val t6Sql = {
    val termList = TextAnalysis.analyzeQuery(T6Query)
      .map(t => s"'$t'").mkString("(", ",", ")")
    s"""WITH an AS (
       |  SELECT doc_id, unnest(${TextAnalysis.analyzeSql("text")}) AS t
       |  FROM documents),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM an
       |  WHERE t IN $termList GROUP BY doc_id, t),
       |dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT doc_id, CAST(SUM(tf * (n_docs - df)) AS BIGINT) AS score
       |FROM tf JOIN dfreq USING (t) CROSS JOIN n
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "t5_normalize" -> t5 _,
    "t6_relevance" -> t6 _,
    "t1_token_stats" -> t1 _,
    "t2_quality" -> t2 _,
    "t3_langid" -> t3 _,
    "t4_fingerprint" -> t4 _)

  val oracle: Map[String, String] = Map(
    "t5_normalize" -> t5Sql,
    "t6_relevance" -> t6Sql,
    "t1_token_stats" -> t1Sql,
    "t2_quality" -> t2Sql,
    "t3_langid" -> t3Sql,
    "t4_fingerprint" -> t4Sql)
}
