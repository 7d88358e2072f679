package graft.docs

import graft.SparkSpec
import graft.model.PlanSchema

/** Retriever-tree parse guards (ranking rides the d196 oracle gate). */
class RetrieverSpec extends SparkSpec {

  private def bad(body: String): String =
    intercept[IllegalArgumentException](
      Retriever.search(spark.emptyDataFrame, "doc", body, PlanSchema.plan)).getMessage

  test("rejections: unknown keys, vector-less knn, <2 legs, size beyond window") {
    assert(bad("""{"retriever": {"rrf": {"retrievers": []}}, "from": 5}""")
      .contains("unsupported retriever body key"))
    // a knn leg without a supplied vector side table rejects loudly
    assert(bad(
      """{"retriever": {"rrf": {"retrievers": [
        |  {"standard": {"query": {"match_all": {}}}},
        |  {"knn": {"field": "embedding", "query_vector": [1.0], "k": 5}}]}}}""".stripMargin)
      .contains("no vector side table"))
    // reranker legs are out of contract (inference service)
    assert(bad(
      """{"retriever": {"rrf": {"retrievers": [
        |  {"standard": {"query": {"match_all": {}}}},
        |  {"text_similarity_reranker": {"field": "t"}}]}}}""".stripMargin)
      .contains("unsupported retriever type"))
    assert(bad("""{"retriever": {"rrf": {"retrievers": [
        |  {"standard": {"query": {"match_all": {}}}}]}}}""".stripMargin)
      .contains(">= 2 retrievers"))
    assert(bad(
      """{"retriever": {"rrf": {"retrievers": [
        |  {"standard": {"query": {"match_all": {}}}},
        |  {"standard": {"query": {"match_all": {}}}}],
        |  "rank_window_size": 5}}, "size": 9}""".stripMargin)
      .contains("exceeds rank_window_size"))
    assert(bad(
      """{"retriever": {"rrf": {"retrievers": [
        |  {"standard": {"query": {"match_all": {}}, "sort": [{"x": "asc"}]}},
        |  {"standard": {"query": {"match_all": {}}}}]}}}""".stripMargin)
      .contains("unsupported standard retriever key"))
  }

  test("a bare standard retriever ranks by score with objectId tiebreak") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(("b", "X"), ("a", "X"), ("c", "Y")).toDF("id", "t")
      .select(struct(col("id").as("objectId"), col("t").as("planType")).as("doc"))
    val schema = docs.schema("doc").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val out = Retriever.search(docs, "doc",
      """{"retriever": {"standard": {"query":
        |  {"bool": {"should": [{"term": {"planType": "X"}}]}}}}, "size": 3}""".stripMargin,
      schema).collect()
    // "c" is not a hit: a should-only bool requires >= 1 should (the ES
    // minimum_should_match default when no must/filter is present)
    assert(out.map(r => (r.getAs[Long]("rn"), r.getAs[String]("objectId"))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }
}
