package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash primitives for the training-data-pipeline operators
  * (dedup, similarity, text analysis — the scale extensions named in
  * BASELINE.json's north_star; the reference itself has no text pipeline,
  * SURVEY §2 D).
  *
  * Every primitive here is chosen to be **bit-reproducible in any SQL
  * engine** (the DuckDB oracle replays the same arithmetic):
  *
  *   - `tokens`: whitespace split, empties dropped.
  *   - `stableHash32`: first 8 hex chars of md5 as an unsigned 32-bit value
  *     in a long — md5 is engine-independent, so every downstream sketch
  *     (MinHash perms, SimHash bits, LSH planes) is deterministic
  *     everywhere. Deliberately NOT Spark's `xxhash64` (fast but
  *     Spark-private semantics → un-oracle-able).
  *
  * Scale shape: all pure column expressions — codegen'd, no UDFs, no
  * driver-side state; they ride whole-stage codegen inside whatever
  * operator uses them.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Engine-portable 32-bit hash in [0, 2^32) as a long. */
  def stableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Engine-portable 60-bit hash in [0, 2^60) as a long — 15 hex chars of
    * md5, the widest prefix that can never overflow a SIGNED 64-bit cast
    * in any engine (16 chars could exceed 2^63-1). Used by SimHash, where
    * 32 bits over a shared vocabulary yields mostly-colliding signatures. */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash permutation `(a*h + b) mod p` — `h` must already be < p so the
    * product stays < 2^62 (no overflow divergence between engines). */
  val MinhashPrime = 1000000007L
  def perm(h: Column, a: Long, b: Long): Column =
    (h % MinhashPrime * lit(a) + lit(b)) % MinhashPrime

  /** The (a, b) parameter pairs of the MinHash permutation family — small
    * fixed odd multipliers; any fixed family works, this one is shared with
    * the oracle SQL verbatim. */
  val MinhashParams: Seq[(Long, Long)] = Seq(
    (131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L),
    (151L, 19L), (157L, 23L), (163L, 29L), (167L, 31L),
    (173L, 37L), (179L, 41L), (181L, 43L), (191L, 47L))

  /** Word n-gram shingles: `n`-token windows joined by a single space.
    * Pure array expression; the `when` guard matters — Spark's
    * `sequence(1, 0)` DESCENDS to [1, 0] rather than yielding [], which
    * would probe past the array on short inputs. */
  def shingles(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    when(count < 1, array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
      .otherwise(transform(sequence(lit(1), count), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
  }

  /** Deterministic pseudo-random hyperplane weight for LSH plane `p`,
    * dimension `d`: an LCG step mapped to [-1, 1). Exact integer arithmetic
    * (< 2^62) then one exact double division — identical in any engine. */
  def planeWeight(p: Int, d: Column): Column = {
    val m = (lit(1103515245L) * (lit(p.toLong * 97L) + d + 1L) + 12345L) % 1000003L
    (m - 500001L).cast("double") / lit(500001.0)
  }

  /** Per-token stable hashes, reduced mod the MinHash prime — hashing at
    * the TOKEN level (|tokens| md5s) instead of the shingle level
    * (|tokens|×n md5s + string builds); shingle hashes combine these
    * arithmetically. */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => stableHash32(t) % MinhashPrime)

  /** n-gram shingle hashes from a token-hash array: polynomial combination
    * `fold(acc*131 + h) mod p` over each n-window — exact long arithmetic
    * (values < p·131 + p < 2^38), identical in any engine. */
  def shingleHashes(hs: Column, n: Int): Column = {
    val count = size(hs) - (n - 1)
    when(count < 1, array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
      .otherwise(transform(sequence(lit(1), count), i =>
        (1 until n).foldLeft(element_at(hs, i))((acc, j) =>
          (acc * 131L + element_at(hs, i + j)) % MinhashPrime)))
  }

  /** `shingleHashes` in ZIP form — identical values, built from shifted
    * array copies via `zip_with` instead of per-position `element_at`.
    * The positional form's lambda closes over the whole `hs` expression,
    * so WITHOUT a materialization boundary (persist) every window element
    * re-runs the md5 token-hash chain — O(tokens²) per doc (the dd2
    * lesson). zip_with consumes its operand arrays ONCE, so this form is
    * safe where no boundary is possible — inside a STREAMING select
    * (st14). `hs` is still referenced n times (array-level, not
    * element-level): O(n·tokens), and whole-stage codegen's subexpression
    * elimination collapses the repeats. */
  def shingleHashesFlat(hs: Column, n: Int): Column = {
    val cnt = size(hs) - (n - 1)
    val combined = (1 until n).foldLeft(hs) { (acc, j) =>
      // shifted copy j: elements j+1..len; zip_with null-pads the tail,
      // which the final slice drops
      zip_with(acc, slice(hs, lit(j + 1), greatest(size(hs) - j, lit(0))),
        (a, b) => (a * 131L + b) % MinhashPrime)
    }
    when(cnt < 1, array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
      .otherwise(slice(combined, lit(1), cnt))
  }

  /** DuckDB mirror of `shingleHashes` for window position `i` (1-based)
    * over hash-list column `hs`. */
  def shingleHashSql(hs: String, n: Int): String =
    (1 until n).foldLeft(s"$hs[CAST(i AS INTEGER)]")((acc, j) =>
      s"(($acc) * 131 + $hs[CAST(i AS INTEGER) + $j]) % $MinhashPrime")

  /** Scala-side evaluation of `planeWeight` — identical arithmetic, used to
    * bake literal hyperplane arrays into codegen'd `vec_dot` calls. */
  def planeWeightValue(p: Int, d: Int): Double = {
    val m = (1103515245L * (p.toLong * 97L + d + 1L) + 12345L) % 1000003L
    (m - 500001L).toDouble / 500001.0
  }
}
