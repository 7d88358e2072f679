package graft.docs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 `_score` mode (the similarity upgrade closing the d23/d251
  * documented deviation): pins the fixed-point formula on hand-computed
  * values, and — the round's "done" criterion — a literal case where
  * BM25 ordering PROVABLY differs from term-count ordering in both the
  * Query DSL and ES|QL, plus the loud v1 bounds. */
class Bm25Spec extends SparkSpec {

  //  doc 1: long, two COMMON terms ("alpha beta" + 18 fillers)
  //  doc 2: short, one RARE term ("zeta")
  //  docs 3-6: filler docs containing alpha/beta (making them common)
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta " + Seq.fill(18)("filler").mkString(" ")),
      (2L, "zeta word"),
      (3L, "alpha beta word"), (4L, "alpha beta word"),
      (5L, "alpha beta word"), (6L, "alpha beta word")
    ).toDF("id", "body")
  }

  test("fixed-point formula matches the hand-computed integer values") {
    // N=6, total tokens = 20+2+3*4 = 34, avgdl100 = 3400/6 = 566
    // term "zeta": df=1, doc 2: tf=1, dl=2
    //   num = (6-1)*1*22000*566 = 62,260,000
    //   den = 10000*566*1 + 3000*566 + 900000*2 = 5,660,000+1,698,000+1,800,000
    //       = 9,158,000 → score = 6 (floor 6.798)
    val toks = split(lower(col("body")), "\\s+")
    val st = Bm25.stats(corpus, toks, Seq("zeta"))
    assert(st.nDocs === 6L && st.avgdl100 === 566L && st.df("zeta") === 1L)
    val scored = Bm25.withScore(corpus, toks, Seq("zeta"), st, "s")
    val byId = scored.select("id", "s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(2L) === 6L)
    assert(byId(1L) === 0L) // no zeta
    // helper columns are dropped
    assert(scored.columns.toSeq === Seq("id", "body", "s"))
  }

  test("DSL: bm25 ordering provably differs from term-count ordering") {
    import org.apache.spark.sql.types.StructType
    val docs = corpus.select(struct(
      col("id").cast("string").as("objectId"), col("body")).as("doc"))
    val schema = docs.schema("doc").dataType.asInstanceOf[StructType]
    val body =
      """{"query": {"bool": {"should": [{"match": {"body": "zeta alpha beta"}}],
        |          "minimum_should_match": 1}}, "size": 6,
        | "_source": ["objectId"]}""".stripMargin
    def order(sim: String): Seq[String] =
      SearchExec.search(docs, "doc", body, schema, similarity = sim)
        .collect().map(_.getAs[String]("objectId")).toSeq
    // boolean: one satisfied should clause each → all tie at 1, objectId
    // ascending puts doc 1 (long, common terms) first
    val bool = order("boolean")
    assert(bool.head === "1")
    // bm25: doc 2's single RARE term in a 2-token doc outranks doc 1's
    // two COMMON terms in a 20-token doc — the short-doc-beats-long case
    val bm = order("bm25")
    assert(bm.head === "2")
    assert(bm !== bool)
  }

  test("ES|QL: bm25 ordering provably differs from term-count ordering") {
    val src = Map("t" -> corpus)
    val q =
      """FROM t METADATA _score
        || WHERE MATCH(body, "zeta alpha beta")
        || KEEP id, _score
        || SORT _score DESC, id ASC""".stripMargin
    def order(mode: String): Seq[Long] =
      Esql.run(src, q, scoreMode = mode).collect().map(_.getLong(0)).toSeq
    // terms mode: doc 1 matches 2 terms (score 2) and beats doc 2 (1)
    val terms = order("terms")
    assert(terms.head === 1L)
    // bm25: doc 2's rare short-doc hit wins
    val bm = order("bm25")
    assert(bm.head === 2L)
    assert(bm !== terms)
  }

  test("v1 bounds reject loudly; stats handle the empty corpus") {
    import org.apache.spark.sql.types.StructType
    val docs = corpus.select(struct(
      col("id").cast("string").as("objectId"), col("body")).as("doc"))
    val schema = docs.schema("doc").dataType.asInstanceOf[StructType]
    val fsBody =
      """{"query": {"function_score": {
        |  "query": {"match": {"body": "zeta"}},
        |  "functions": [{"filter": {"match": {"body": "word"}}, "weight": 2}]}},
        | "size": 3, "_source": ["objectId"]}""".stripMargin
    val e = intercept[IllegalArgumentException](
      SearchExec.search(docs, "doc", fsBody, schema, similarity = "bm25")
        .collect()).getMessage
    assert(e.contains("bm25 similarity v1"))
    assert(intercept[IllegalArgumentException](
      SearchExec.search(docs, "doc", fsBody, schema, similarity = "BM25"))
      .getMessage.contains("similarity must be"))
    assert(intercept[IllegalArgumentException](
      Esql.run(Map("t" -> corpus), "FROM t | LIMIT 1", scoreMode = "tfidf"))
      .getMessage.contains("scoreMode must be"))
    val empty = corpus.filter(lit(false))
    val st = Bm25.stats(empty, split(lower(col("body")), "\\s+"), Seq("x"))
    assert(st.nDocs === 0L)
    val z = Bm25.withScore(corpus, split(lower(col("body")), "\\s+"),
      Seq("x"), st, "s").select("s").collect().map(_.getLong(0))
    assert(z.forall(_ === 0L))
  }
}
