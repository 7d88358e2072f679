package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a 60-bit SimHash from token hashes — the
  * engine's custom-UDAF surface (SURVEY §2D: `Aggregator[IN,BUF,OUT]` for
  * custom aggs), used by the dd3 dedup query.
  *
  * Semantics (must stay bit-identical to the SQL-expressible form the
  * DuckDB oracle runs): per bit j, vote +1 if bit j of the token hash is
  * set else -1; the output sets bit j iff the vote sum is positive.
  * Integer vote sums are associative/commutative, so merge order across
  * partitions cannot change the result — the property that makes a
  * parallel UDAF deterministic.
  *
  * Scale shape: constant 60-long buffer per group, partial aggregation on
  * the map side — the shuffle carries one small buffer per (group,
  * partition), never the token rows.
  *
  * 60 bits (not the classic 64): the token hash is the first 15 hex chars
  * of md5 — the widest prefix that a SIGNED 64-bit cast can hold in every
  * engine, so the DuckDB oracle reproduces it exactly (TextFunctions
  * .stableHash60).
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  val Bits = 60

  override def zero: Array[Long] = new Array[Long](Bits)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < Bits) {
      buf(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(votes: Array[Long]): Long = {
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
