package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Persist discipline for multi-consumer query internals.
  *
  * Several queries persist intermediate frames because two or more plan
  * branches consume them (sketch + verify sides of a dedup, both sides of a
  * band self-join). Those blocks must not outlive the query: the harnesses
  * run 70+ queries in one session, and leaked persists crowd the storage
  * pool until later queries measurably degrade (streaming state stores ran
  * 3× slower after the dedup queries in the round-3 bench: st2 14.7 s alone
  * vs 46.5 s in sequence).
  *
  * `finish` eagerly materializes the query's ANSWER (always a small sorted
  * frame — pair lists, counts, top-k) on the driver, then releases every
  * intermediate. The returned frame is a LocalRelation: unlike the previous
  * `localCheckpoint(eager = true)` approach it pins NO block-manager blocks,
  * so a 75-query session accumulates zero storage residue (round 3 leaked
  * ~75 checkpoint blocks this way). Bench asserts `getPersistentRDDs` is
  * empty after every query on the back of this.
  */
object Eager {
  /** Give a to-be-persisted frame a CANONICALLY UNIQUE analyzed plan.
    *
    * Spark's CacheManager keys cache entries by plan equivalence
    * (`sameResult` on the normalized plan), so two queries that persist
    * the SAME-SHAPED intermediate (t29/t31/t32 all persist the identical
    * word-frequency table; dd2/dd13 the identical shingle tables) share
    * ONE cache entry — and the first query to reach `finish` unpersists
    * it out from under the other, which under the 6-way verify pool
    * produced a corrupted 10-of-20-row t29 artifact (sf0.01, 2026-08-14).
    * An always-true filter on a per-owner literal makes the analyzed plan
    * unique (distinct cache keys, no sharing) while folding to nothing in
    * the optimizer — zero schema change, zero runtime cost. */
  def keyed(df: DataFrame, owner: String): DataFrame =
    df.filter(org.apache.spark.sql.functions.lit(owner).isNotNull)

  /** Materialize a small final answer on the driver as a LocalRelation,
    * detaching it from whatever (temp dirs, persisted frames, streaming
    * tables) its plan read from. Row order is preserved. */
  def pin(result: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(result.collect(): _*)
    result.sparkSession.createDataFrame(rows, result.schema)
  }

  def finish(result: DataFrame, cached: Dataset[_]*): DataFrame = {
    val out = pin(result) // collect BEFORE releasing what it reads from
    cached.foreach(_.unpersist(false))
    out
  }
}
