package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 optimization-measurement harness: time sub-steps of the
  * bench's most expensive queries in isolation (guide §1 — measure first,
  * noop-sink the timed computation). Not part of the driver contract; the
  * numbers land in OPTIMIZATION_r19.md.
  *
  * Usage: runMain graft.ProfileR19 <sfDir> <case>[,<case>...]
  */
object ProfileR19 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cases = args(1).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmCollation(spark)
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    def mat(tag: String)(df: DataFrame): DataFrame = {
      val dir = graft.TempDirs.create(s"profile-$tag-")
      df.write.mode("overwrite").parquet(dir.toString)
      spark.read.parquet(dir.toString)
    }

    if (cases("warm")) {
      // split warm_corpus: docs → shred(entities+edges) → assemble
      val docs = time("docs (build+mat)") {
        mat("docs")(graft.docs.PlanDocs.docs(spark, sfDir)) }
      val sh = time("shred (build+mat both tables)") {
        val s0 = graft.docs.Shredder.shred(docs)
        graft.docs.Shredded(mat("ents")(s0.entities), mat("edges")(s0.edges)) }
      time("assemble (build+mat)") {
        mat("asm")(graft.docs.Assembler.assemble(
          sh, graft.model.PlanSchema.plan, "plan")) ; () }
      // second pass to split shred into plan-only vs execution
      val sh2 = graft.docs.Shredder.shred(docs)
      time("shred entities planning only") { sh2.entities.queryExecution.executedPlan }
      time("shred entities noop exec") { noop(sh2.entities) }
      val asm = graft.docs.Assembler.assemble(sh, graft.model.PlanSchema.plan, "plan")
      time("assemble planning only") { asm.queryExecution.executedPlan }
      time("assemble noop exec") { noop(asm) }
    }
    if (cases("t29split")) {
      graft.docs.DocQueries.warm(spark, sfDir) // not needed, but parity with bench env
      val p = graft.ext.TextQueries.t29Plan(spark, sfDir)
      time("t29 planning only") { p.queryExecution.executedPlan }
      time("t29 noop exec") { noop(p) }
      val p2 = graft.ext.TextQueries.t29Plan(spark, sfDir)
      time("t29 planning only (2nd)") { p2.queryExecution.executedPlan }
      time("t29 noop exec (2nd)") { noop(p2) }
    }
    if (cases("d175split")) {
      // rebuild the shared corpora the way DocQueries does, then time the
      // three halves of an update_by_query: mutation plan, materialize,
      // reassemble
      val docs = mat("docs")(graft.docs.PlanDocs.docs(spark, sfDir))
      val sh0 = graft.docs.Shredder.shred(docs)
      val sh = graft.docs.Shredded(mat("ents")(sh0.entities), mat("edges")(sh0.edges))
      val schema = graft.model.PlanSchema.plan
      val asm = mat("asm")(graft.docs.Assembler.assemble(sh, schema, "plan"))
      val body =
        """{
          |  "query": { "bool": {
          |    "must": [ { "range": { "planCostShares.copay": { "gte": 30 } } } ],
          |    "must_not": [ { "term": { "planType": "FURNITURE" } } ] } },
          |  "script": { "source":
          |    "ctx._source.planCostShares.copay = ctx._source.planCostShares.copay * 2 + 7" }
          |}""".stripMargin
      (1 to 2).foreach { r =>
        val after = time(s"updateByQuery build (r$r)") {
          graft.docs.BulkByQuery.updateByQuery(asm, sh, body,
            schema, graft.docs.Mutations.depth(schema)) }
        time(s"  noop entities (mutation exec, r$r)") { noop(after.entities) }
        time(s"  noop edges (r$r)") { noop(after.edges) }
        val matted = time(s"  materialize both (r$r)") {
          graft.docs.Shredded(mat("d175e")(after.entities), mat("d175g")(after.edges)) }
        val out = graft.docs.Assembler.assemble(matted, schema, "plan")
          .select(col("doc.objectId").as("object_id"))
        time(s"  reassemble noop (r$r)") { noop(out) }
      }
    }
    if (cases("query")) {
      val names = sys.env.getOrElse("PROFILE_QUERIES", "").split(",").filter(_.nonEmpty)
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        time(s"$n run1") { fn(spark, sfDir).count() }
        time(s"$n run2") { fn(spark, sfDir).count() }
        time(s"$n run3") { fn(spark, sfDir).count() }
      }
    }
    spark.stop()
  }
}
