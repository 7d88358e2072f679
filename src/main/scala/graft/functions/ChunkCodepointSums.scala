package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The aHash chunk-sum kernel as one native expression (r19, guide §4):
  * 32 sums of character codepoints over equal chunks of the first
  * `q*32` characters, `q = numChars/32` — NULL when the string is too
  * short for even one full chunk (q = 0).
  *
  * Replaces m6's `split(text, "") → ascii per char → posexplode →
  * two-level aggregation` pipeline, which allocated one single-character
  * string per character and fanned every payload out to char-grain rows
  * before summing (measured 3.7 s of m6's 4.9 s hash build at sf0.1 for
  * the explode alone). Bit-identical arithmetic: `ascii()` of a split
  * character is exactly the character's codepoint, chunk index is the
  * same integer division `pos / q`, and the sums are exact longs.
  * CodegenFallback is deliberate (the UnigramViterbi rule): one compiled
  * per-row call whose inner loop is plain Scala — the per-row overhead
  * is nothing next to the O(chars) work inside. */
case class ChunkCodepointSums(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"chunk_codepoint_sums expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "chunk_codepoint_sums"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val nChars = s.codePointCount(0, s.length)
    val q = nChars / 32
    if (q == 0) null
    else {
      val sums = new Array[Long](32)
      val limit = q * 32
      var pos = 0 // codepoint index
      var i = 0   // UTF-16 offset
      while (pos < limit) {
        val cp = s.codePointAt(i)
        sums(pos / q) += cp
        i += Character.charCount(cp)
        pos += 1
      }
      new GenericArrayData(sums)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
