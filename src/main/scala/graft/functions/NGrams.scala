package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as one native pass (the fused form of
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(words, i+1, n))))` — bit-identical output including the
  * short-doc partial-shingle edge and first-occurrence dedup order).
  *
  * Exists for the same reason as [[MinHashMd5Sig]]: shingling sits under
  * every near-dup query and the HOF formulation interprets four lambda
  * chains per shingle.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string> and n>0, got $other, n=$n")
  }

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val sz = words.numElements()
    val last = math.max(sz - n, 0) // sequence(0, greatest(size-n, 0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, sz) // slice takes up to n available words
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        // concat_ws skips nulls; split() never yields them
        parts(j - i) = if (words.isNullAt(j)) UTF8String.EMPTY_UTF8 else words.getUTF8String(j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
