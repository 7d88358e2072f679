package graft

import org.apache.spark.storage.StorageLevel

/** The persist-sharing hazard and its fix (Eager.keyed).
  *
  * Spark's CacheManager keys entries by plan equivalence, so two queries
  * persisting the same-shaped intermediate share ONE entry — and either
  * owner's unpersist drops it for both (under the concurrent verify pool
  * this corrupted a t29 artifact mid-flight, 2026-08-14). */
class EagerSpec extends SparkSpec {

  private def freq = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq("a", "b", "a").toDF("w").groupBy(col("w")).agg(count(lit(1)).as("n"))
  }

  test("unkeyed same-shaped persists SHARE one cache entry (the hazard)") {
    val x = freq.persist(); val y = freq.persist()
    try {
      x.count(); y.count()
      x.unpersist(true)
      // y's entry is gone too — this is exactly the cross-query race
      assert(y.storageLevel == StorageLevel.NONE)
    } finally { x.unpersist(true); y.unpersist(true) }
  }

  test("Eager.keyed persists are independent: one owner's release leaves the other cached") {
    val a = Eager.keyed(freq, "owner-a").persist()
    val b = Eager.keyed(freq, "owner-b").persist()
    try {
      a.count(); b.count()
      assert(a.storageLevel != StorageLevel.NONE)
      assert(b.storageLevel != StorageLevel.NONE)
      a.unpersist(true)
      assert(b.storageLevel != StorageLevel.NONE, "keyed entries must not be shared")
      // the keying filter folds away — results identical
      assert(b.collect().map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
    } finally { a.unpersist(true); b.unpersist(true) }
  }
}
