package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.PlanSchema

/** M1 — ingest validation (SURVEY §2 M1).
  *
  * The reference validates every POST/PUT/PATCH body against
  * `plan-schema.json` with the everit JSON-Schema engine
  * (`PlanController.java:87-95`) and rejects with HTTP 400. The engine's
  * equivalent is a row-level rule set compiled to codegen'd predicates:
  * `required` paths → null checks (a type mismatch also surfaces as null
  * after `from_json` with the typed schema, covering the schema's
  * `"type": "integer"` rules), `pattern` → `rlike`. Valid rows continue;
  * invalid rows land in a quarantine frame with per-row error strings
  * (the batch engine's 400 response).
  *
  * Scales trivially: validation is a projection + filter, no shuffle.
  */
object Validator {

  /** Rules for the reference's plan schema: (path, error) pairs where the
    * path is checked non-null; array item paths are checked with `exists`. */
  private def errorsCol(doc: Column): Column = {
    val rootErrs: Seq[Column] = PlanSchema.requiredPaths.map { p =>
      when(path(doc, p).isNull, lit(s"missing required: $p"))
    }
    val itemErrs: Seq[Column] = PlanSchema.requiredInPlanService.map { p =>
      when(doc.getField("linkedPlanServices").isNotNull &&
        exists(doc.getField("linkedPlanServices"), x => path(x, p).isNull),
        lit(s"missing required: linkedPlanServices[].$p"))
    }
    // The schema's string `pattern` is `^(.*)$` (vacuous); shown here as the
    // pattern-rule hook with the one non-vacuous shape worth enforcing.
    val patternErrs: Seq[Column] = Seq(
      when(doc.getField("creationDate").isNotNull &&
        !doc.getField("creationDate").rlike("^(.*)$"),
        lit("pattern mismatch: creationDate")))
    filter(array((rootErrs ++ itemErrs ++ patternErrs): _*), _.isNotNull)
  }

  private def path(c: Column, p: String): Column =
    p.split('.').foldLeft(c)((acc, f) => acc.getField(f))

  /** Split `docs` into (valid, quarantine). Quarantine rows keep the doc and
    * carry `errors: array<string>`. */
  def validate(docs: DataFrame, docCol: String = "doc"): (DataFrame, DataFrame) = {
    val withErrs = docs.withColumn("errors", errorsCol(col(docCol)))
    (withErrs.filter(size(col("errors")) === 0).drop("errors"),
     withErrs.filter(size(col("errors")) > 0))
  }
}
