package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Wall-time matters here: the driver budgets the whole gate, so the dump
  * (a) defaults to every core on the box, (b) materializes the shared
  * document corpora ONCE up front, and (c) runs independent queries on a
  * small thread pool — Spark's scheduler interleaves their jobs, so the
  * many small queries hide each other's latency instead of serializing
  * 60+ job submissions.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional 3rd arg: comma-separated name prefixes (local iteration only;
    // the driver always passes 2 args = all queries).
    val prefixes = args.drop(2).headOption.map(_.split(",").toSeq)
    def selected(name: String): Boolean =
      prefixes.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One-time ICU collation class-init, single-partition — see
    // Bench.warmCollation (32 threads racing the initializer stalled d16
    // by minutes, nondeterministically).
    Bench.warmCollation(spark)
    new java.io.File(outDir).mkdirs()
    // Build docs → shredded → assembled once, sequentially, before the
    // parallel phase: ~15 queries read these tables. (Skipped when a local
    // prefix filter selects no document queries.)
    if (SparkEntry.queries.keys.exists(n => n.matches("d\\d.*") && selected(n)))
      try graft.docs.DocQueries.warm(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] warm failed: ${e.getMessage}") }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).map { case (name, fn) =>
        scala.concurrent.Future {
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            // Gate constraint: the driver's pandas comparator sorts rows,
            // which cannot factorize array/map/struct cells — every output
            // column must be scalar. Fail loudly HERE, not as an opaque
            // comparator TypeError three stages later.
            val nonScalar = df.schema.fields.filterNot { f =>
              f.dataType match {
                case _: org.apache.spark.sql.types.ArrayType |
                     _: org.apache.spark.sql.types.MapType |
                     _: org.apache.spark.sql.types.StructType => false
                case _ => true
              }
            }
            require(nonScalar.isEmpty,
              s"non-scalar output column(s) ${nonScalar.map(_.name).mkString(", ")}" +
                " — render arrays as joined strings (oracle-gate constraint)")
            // Gate constraint 2 (r16 postmortem): the driver's hash
            // comparator normalizes floats but is REPRESENTATION-sensitive
            // on decimals — r16's q1_agg emitted DECIMAL(28,6) columns that
            // matched DuckDB value-for-value yet hashed red. Decimals are
            // for exact INTERNAL arithmetic; outputs must land on double
            // (cast from the exact decimal — correctly rounded) or an
            // integral type.
            val decimalOut = df.schema.fields.filter(
              _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
            require(decimalOut.isEmpty,
              s"DECIMAL output column(s) ${decimalOut.map(_.name).mkString(", ")}" +
                " — cast exact decimal aggregates to DOUBLE before output" +
                " (driver hash comparator is representation-sensitive on decimals)")
            df.coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 120.minutes)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
