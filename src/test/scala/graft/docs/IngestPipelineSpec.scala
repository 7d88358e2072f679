package graft.docs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ingest-pipeline parse guards + processor semantics (the corpus-wide
  * behavior rides the d200 oracle gate). */
class IngestPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def toyDocs = Seq(("P1", " MixedCase ", 7L)).toDF("id", "t", "v")
    .select(struct(col("id").as("objectId"), lit("plan").as("objectType"),
      col("t").as("tag"), col("v").as("num")).as("doc"))
  private def toySchema = toyDocs.schema("doc").dataType
    .asInstanceOf[org.apache.spark.sql.types.StructType]

  test("processors apply IN ORDER as one composed rewrite; remove nulls the leaf") {
    val procs = IngestPipeline.parse(
      """{"processors": [
        |  {"trim": {"field": "tag"}},
        |  {"lowercase": {"field": "tag"}},
        |  {"gsub": {"field": "tag", "pattern": "^mixed", "replacement": "x"}},
        |  {"script": {"source": "ctx._source.num = ctx._source.num * 3"}},
        |  {"remove": {"field": "objectType"}}
        |]}""".stripMargin, toySchema)
    val out = toyDocs.select(IngestPipeline(col("doc"), toySchema, procs).as("doc"))
      .select(col("doc.tag"), col("doc.num"), col("doc.objectType")).head()
    assert(out.getString(0) === "xcase") // trim -> lower -> gsub, in order
    assert(out.getLong(1) === 21L)
    assert(out.isNullAt(2))
  }

  test("rejections: unknown processor, if-condition, typed set, non-string gsub") {
    def bad(body: String): String =
      intercept[IllegalArgumentException](
        IngestPipeline.parse(body, toySchema)).getMessage
    assert(bad("""{"processors": [{"grok": {"field": "tag"}}]}""")
      .contains("unsupported processor"))
    assert(bad("""{"processors": [{"lowercase": {"field": "tag", "if": "x"}}]}""")
      .contains("unsupported lowercase option"))
    assert(bad("""{"processors": [{"set": {"field": "num", "value": 3}}]}""")
      .contains("string value"))
    assert(bad("""{"processors": [{"gsub": {"field": "num",
      | "pattern": "a", "replacement": "b"}}]}""".stripMargin)
      .contains("string field"))
    assert(bad("""{"pipeline": "x"}""").contains("unsupported pipeline key"))
  }
}
