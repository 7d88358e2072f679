package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native aHash kernel (r19) to the pre-r19 reference pipeline —
  * split("") → ascii per char → chunk = pos/q → sum — on adversarial
  * strings: too-short (q=0 → NULL), exactly 32 chars, length not divisible
  * by 32 (tail ignored), multi-byte codepoints, and the real corpus. */
class ChunkCodepointSumsSpec extends SparkSpec {

  private def referenceSums(text: String): Option[Seq[Long]] = {
    val cps = text.codePoints().toArray
    val q = cps.length / 32
    if (q == 0) None
    else Some((0 until 32).map(c =>
      cps.slice(c * q, (c + 1) * q).map(_.toLong).sum))
  }

  test("matches the split+ascii reference on adversarial strings") {
    GraftFunctions.ensure(spark)
    val cases = Seq(
      "",                                   // empty → NULL
      "short",                              // q = 0 → NULL
      "a" * 31,                             // one short of a chunk → NULL
      "b" * 32,                             // exactly one char per chunk
      "c" * 33,                             // tail char ignored (pos >= q*32)
      ('a' to 'z').mkString * 5,            // q = 4, tail 2
      "näïve βεta 语言模型 " * 20,           // multi-byte codepoints
      "x" * 1000 + "y" * 24)                // uneven content across chunks
    import spark.implicits._
    val df = cases.toDF("text")
      .select(col("text"), GraftFunctions.chunkCodepointSums(col("text")).as("cs"))
    df.collect().foreach { r =>
      val expect = referenceSums(r.getString(0))
      val got = if (r.isNullAt(1)) None else Some(r.getSeq[Long](1))
      assert(got === expect, s"text of length ${r.getString(0).length}")
    }
  }

  test("matches the reference on the sf0.001 documents corpus") {
    GraftFunctions.ensure(spark)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val rows = docs
      .select(col("doc_id"), col("text"),
        GraftFunctions.chunkCodepointSums(col("text")).as("cs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = referenceSums(r.getString(1))
      val got = if (r.isNullAt(2)) None else Some(r.getSeq[Long](2))
      assert(got === expect, s"doc ${r.getLong(0)}")
    }
  }
}
