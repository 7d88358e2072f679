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
  * frame — pair lists, counts, top-k) via `localCheckpoint(eager = true)`,
  * then releases every intermediate. The caller's returned frame reads from
  * the checkpointed blocks; the heavy intermediates are recomputed never.
  */
object Eager {
  def finish(result: DataFrame, cached: Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }
}
