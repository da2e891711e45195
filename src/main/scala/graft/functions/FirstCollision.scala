package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Index of the first position where two bigint arrays hold equal
  * non-null values; −1 if none. Codegen'd.
  *
  * This is the pair-dedup primitive for multi-table LSH: a colliding
  * pair is emitted only from its FIRST shared bucket
  * (`first_collision(a.bkts, b.bkts) = collision_table`), so candidate
  * pairs are unique by construction and the O(candidates × multiplicity)
  * `dropDuplicates` shuffle disappears — the standard "emit in first
  * matching band" trick from MapReduce MinHash dedup. Null slots (capped
  * buckets, see [[graft.operators.Similarity.lshNearDupPairs]]) never
  * match, so dropped buckets neither produce nor suppress pairs.
  */
case class FirstCollision(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_collision"

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_collision requires array<bigint>, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    FirstCollision.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.FirstCollision.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstCollision =
    copy(left = newLeft, right = newRight)
}

object FirstCollision {
  /** Shared by interpreted + generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }
}
