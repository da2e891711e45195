package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-histogram L1 pre-verify for edit-distance candidate pairs
  * (guide §1.2 step 2: make the per-task work cheap before asking for a
  * cheaper algorithm). Soundness: one edit operation moves at most two
  * units of histogram mass — an insert/delete changes one code point's
  * bucket count by 1, a substitution decrements one bucket and
  * increments another — so L1(hist(a), hist(b)) <= 2 * levenshtein(a, b)
  * for ANY deterministic code-point → bucket map (coarser buckets only
  * shrink the L1). Contrapositive: a candidate pair with
  * L1 > 2 * maxDist can never verify, and dropping it before the exact
  * banded levenshtein changes nothing. The histogram is computed ONCE
  * per string (64 buckets, code point & 63) and the per-pair check is a
  * 64-int codegen'd loop — ~100x cheaper than the banded O(d*len) DP it
  * short-circuits, which is what makes it worth running on the raw
  * emitted pair stream BEFORE the dedup shuffle (the surviving stream is
  * near-output-sized, so the distinct and the verify become free).
  */
case class CharHistNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_hist64"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_hist64 requires a string, got $dt")
  }

  override def nullSafeEval(s: Any): Any =
    CharHistNative.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharHistNative.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): CharHistNative =
    copy(child = newChild)
}

object CharHistNative {
  /** 64 counts bucketed by (code point & 63). Shared by interpreted and
    * generated code. */
  def compute(s: UTF8String): ArrayData = {
    val counts = new Array[Int](64)
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts(cp & 63) += 1
      i += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

/** L1 distance of two int arrays — the fold of
  * `aggregate(zip_with(a, b, (x,y)=>abs(x-y)), 0, +)`, as one codegen'd
  * loop. Null for null inputs or a length mismatch (the zip_with padding
  * outcome of the HOF spec). */
case class HistL1Native(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hist_l1"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hist_l1 requires int arrays, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HistL1Native.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("histL1")
      s"""
        Object $tmp = graft.functions.HistL1Native.compute($a, $b);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Integer) $tmp).intValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistL1Native =
    copy(left = newLeft, right = newRight)
}

object HistL1Native {
  def compute(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += math.abs(a.getInt(i) - b.getInt(i))
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }
}
