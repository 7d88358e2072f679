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

  test("grok + dissect add root keys; convert sees grok's evolved schema") {
    val (procs, schOut) = IngestPipeline.parseEvolving(
      """{"processors": [
        |  {"grok": {"field": "objectId", "patterns": ["%{WORD:pid_kind}%{INT:pid_num}"]}},
        |  {"dissect": {"field": "tag", "pattern": " %{t_head}Case %{t_tail}"}},
        |  {"convert": {"field": "pid_num", "type": "long"}}
        |]}""".stripMargin, toySchema)
    val (c, _) = IngestPipeline.applyEvolving(col("doc"), toySchema, procs)
    assert(schOut("pid_num").dataType ===
      org.apache.spark.sql.types.LongType) // convert ran on the grok'd key
    val out = toyDocs.select(c.as("doc"))
      .select(col("doc.pid_kind"), col("doc.pid_num"),
        col("doc.t_head"), col("doc.t_tail")).head()
    assert(out.getString(0) === "P" && out.getLong(1) === 1L)
    assert(out.getString(2) === "Mixed" && out.getString(3) === "")
  }

  test("rejections: unknown processor, if-condition, typed set, non-string gsub") {
    def bad(body: String): String =
      intercept[IllegalArgumentException](
        IngestPipeline.parse(body, toySchema)).getMessage
    assert(bad("""{"processors": [{"geoip": {"field": "tag"}}]}""")
      .contains("unsupported processor"))
    assert(bad("""{"processors": [{"json": {"field": "tag"}}]}""")
      .contains("json needs graft_schema"))
    assert(bad("""{"processors": [{"grok": {"field": "tag"}}]}""")
      .contains("grok needs patterns"))
    assert(bad("""{"processors": [{"grok": {"field": "tag",
      | "patterns": ["(%{WORD:w})"]}}]}""".stripMargin)
      .contains("must not contain capture groups"))
    assert(bad("""{"processors": [{"dissect": {"field": "num",
      | "pattern": "%{a}-%{b}"}}]}""".stripMargin)
      .contains("string field"))
    assert(bad("""{"processors": [{"lowercase": {"field": "tag", "if": "x"}}]}""")
      .contains("unsupported lowercase option"))
    assert(bad("""{"processors": [{"set": {"field": "num", "value": 3}}]}""")
      .contains("string value"))
    assert(bad("""{"processors": [{"gsub": {"field": "num",
      | "pattern": "a", "replacement": "b"}}]}""".stripMargin)
      .contains("string field"))
    assert(bad("""{"pipeline": "x"}""").contains("unsupported pipeline key"))
  }

  test("convert/date evolve the schema: later processors see the new type, " +
    "formats try in order, target field appends") {
    val (procs, schOut) = IngestPipeline.parseEvolving(
      """{"processors": [
        |  {"convert": {"field": "num", "type": "string"}},
        |  {"gsub": {"field": "num", "pattern": "7", "replacement": "8"}},
        |  {"convert": {"field": "num", "type": "long"}},
        |  {"set": {"field": "tag", "value": "03-01-2026"}},
        |  {"date": {"field": "tag", "formats": ["yyyy/MM/dd", "MM-dd-yyyy"],
        |            "target_field": "ts"}}
        |]}""".stripMargin, toySchema)
    assert(schOut("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(schOut("num").dataType === org.apache.spark.sql.types.LongType)
    val (c, _) = IngestPipeline.applyEvolving(col("doc"), toySchema, procs)
    val out = toyDocs.select(c.as("doc"))
      .select(col("doc.num"), date_format(col("doc.ts"), "yyyy-MM-dd")).head()
    assert(out.getLong(0) === 8L) // gsub ran on the string form
    assert(out.getString(1) === "2026-03-01") // second format matched
  }

  test("rename moves the leaf (old field gone, value+type preserved); split " +
    "produces array<string>; rename onto an existing field rejects") {
    val (procs, schOut) = IngestPipeline.parseEvolving(
      """{"processors": [
        |  {"rename": {"field": "num", "target_field": "amount"}},
        |  {"split": {"field": "tag", "separator": "x"}}
        |]}""".stripMargin, toySchema)
    assert(!schOut.fieldNames.contains("num"))
    assert(schOut("amount").dataType === org.apache.spark.sql.types.LongType)
    assert(schOut("tag").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val (c, _) = IngestPipeline.applyEvolving(col("doc"), toySchema, procs)
    val out = toyDocs.select(c.as("doc"))
      .select(col("doc.amount"), size(col("doc.tag"))).head()
    assert(out.getLong(0) === 7L)
    assert(out.getInt(1) === 2) // " MixedCase " splits once on 'x'
    assert(intercept[IllegalArgumentException](IngestPipeline.parse(
      """{"processors": [{"rename": {"field": "num", "target_field": "tag"}}]}""",
      toySchema)).getMessage.contains("already exists"))
  }

  test("evolving rejections: string processor before the convert, unknown " +
    "convert type, missing date target parent") {
    def bad(body: String): String =
      intercept[IllegalArgumentException](
        IngestPipeline.parse(body, toySchema)).getMessage
    // gsub on the still-long leaf rejects even though a later convert
    // WOULD make it a string — order is the contract
    assert(bad("""{"processors": [
        |  {"gsub": {"field": "num", "pattern": "7", "replacement": "8"}},
        |  {"convert": {"field": "num", "type": "string"}}]}""".stripMargin)
      .contains("string field"))
    assert(bad("""{"processors": [{"convert": {"field": "num", "type": "ip"}}]}""")
      .contains("unsupported convert type"))
    assert(bad("""{"processors": [{"date": {"field": "tag",
        | "formats": ["MM-dd-yyyy"], "target_field": "nope.ts"}}]}""".stripMargin)
      .contains("target_field parent"))
  }
}
