package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Installable extension point: `spark.sql.extensions=graft.functions.GraftExtensions`
  * registers the engine's native functions in every session built from that
  * config (cluster deployments, spark-sql shells, thrift servers). Sessions
  * the engine only receives at call time get the same functions via
  * `GraftFunctions.ensure` — both paths share one builder list.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.GeoBoxRule)
  }
}

object GraftExtensions {
  /** All native functions: (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))),
    // Spark's own runtime-filter bloom machinery (BloomFilterAggregate /
    // BloomFilterMightContain — the exact expressions InjectRuntimeFilter
    // plants) is NOT in the public FunctionRegistry; surface it so the
    // dedup family can build STANDING membership sketches over content
    // fingerprints. Deterministic: bloom bit-or is commutative, so the
    // sketch is partial-order independent — and every probe survivor is
    // re-verified by an exact join, so results stay oracle-exact.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_bloom_agg(hashCol, estimatedNumItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_might_contain(bloom, hashCol)")
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }),
    (FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long"),
      (children: Seq[Expression]) => VecDotLong(children.head, children(1))),
    (FunctionIdentifier("chunk_codepoint_sums"),
      new ExpressionInfo(classOf[ChunkCodepointSums].getName, "chunk_codepoint_sums"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "chunk_codepoint_sums(text)")
        ChunkCodepointSums(children.head)
      }),
    (FunctionIdentifier("unigram_viterbi"),
      new ExpressionInfo(classOf[UnigramViterbi].getName, "unigram_viterbi"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "unigram_viterbi(word, vocabMap)")
        UnigramViterbi(children.head, children(1))
      }),
    (FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[HaversineM].getName, "haversine_m"),
      (children: Seq[Expression]) => {
        // cast every child to double at build time: plain SQL decimal
        // literals and float/int coordinate columns work without the
        // 10.0D spelling; constant folding collapses literal casts to the
        // double literals GeoBoxRule pattern-matches
        val c = children.map(ch =>
          org.apache.spark.sql.catalyst.expressions.Cast(ch,
            org.apache.spark.sql.types.DoubleType))
        HaversineM(c.head, c(1), c(2), c(3))
      }))
}
