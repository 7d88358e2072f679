package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once standing indexes over a fixture corpus (the dd7 / s15 /
  * Bm25.standing pattern): an expensive corpus-grain derivation — IVF
  * assignments, LSH band tables, PQ/BBQ codes — is built ONCE per
  * (session, corpus) and written as parquet; every later query in the JVM
  * serves from the parquet read (probe-only cost, the honest 100 TB
  * serving shape — on a real lake the table is maintained incrementally
  * at ingest, exactly like an ES segment merge or a FAISS add()).
  *
  * The memo key folds in a FINGERPRINT of the corpus files (sorted
  * (path, size, mtime) of the backing parquet dir — ADVICE r17): if the
  * fixture is regenerated in place within one JVM the key changes and the
  * index rebuilds instead of silently serving a stale assignment. The
  * entries themselves live for the owning session's JVM lifetime by
  * design — the value is a write-once temp dir, and a standing index is
  * meant to outlive every query (a stopped session's entries are dead
  * weight only until process exit, the same lifecycle as Bm25.standing).
  */
object StandingIndex {

  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, Long), DataFrame]

  /** Test hook: how many builds ran (specs pin write-once per corpus). */
  private[ext] val builds = new java.util.concurrent.atomic.AtomicLong

  /** Fingerprint of the files backing `dir/table.parquet`: a fold of the
    * sorted (relative path, size, mtime) triples. Bounded driver work —
    * a directory listing, no data read. */
  private[ext] def corpusFingerprint(dir: String, table: String): Long = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir, s"$table.parquet")
    if (!java.nio.file.Files.exists(root)) return 0L
    val stream = java.nio.file.Files.walk(root)
    try stream.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => (root.relativize(p).toString, java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toSeq.sorted
      .foldLeft(1125899906842597L)((acc, t) => acc * 31L + t.hashCode())
    finally stream.close()
  }

  /** The standing table for (`s`, `d`, `tag`): built by `build` on first
    * use, parquet-backed (partitioned by `partitionCols` when non-empty —
    * a probe's equi-filter on those columns prunes to its partitions'
    * files before any scan), then served from the parquet read. */
  def apply(s: SparkSession, d: String, table: String, tag: String,
            partitionCols: Seq[String] = Nil)(build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((s, d, tag, corpusFingerprint(d, table)), {
      builds.incrementAndGet()
      val dir = graft.TempDirs.create(s"graft-$tag-")
      val w = build.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(dir.toString)
      s.read.parquet(dir.toString)
    })
}
