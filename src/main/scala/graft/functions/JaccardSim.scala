package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string arrays as one native pass — the fused
  * form of `size(array_intersect(a,b)) / size(array_union(a,b))` with
  * identical set semantics (distinct elements; integer sizes divided in
  * double space ⇒ bit-identical results). Sits in the verify stage of
  * every near-dup pipeline, O(pairs × shingles) — worth a native loop.
  *
  * `sortedInputs = true` (use via [[graft.functions.TextFunctions.jaccardSorted]])
  * switches to an allocation-free merge count. PRECONDITION: both arrays
  * sorted ascending (binary string order, i.e. `array_sort`) and
  * duplicate-free — sort once per ROW upstream, save the two HashSet
  * builds on every PAIR of the O(n²)/O(candidates) verify stage. Same
  * value as the unsorted form on inputs meeting the precondition. */
case class JaccardSim(left: Expression, right: Expression,
    sortedInputs: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  private def ok(e: Expression) = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim requires array<string>, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    if (sortedInputs)
      JaccardSim.computeSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (sortedInputs) "computeSorted" else "compute"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardSim.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var j = 0
    while (j < b.numElements()) {
      if (!b.isNullAt(j)) setB.add(b.getUTF8String(j))
      j += 1
    }
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) if (setB.contains(it.next())) inter += 1
    val union = setA.size + setB.size - inter
    if (union == 0) Double.NaN else inter.toDouble / union.toDouble
  }

  /** Merge count over sorted-distinct arrays (nulls sort last in
    * `array_sort` and are treated as absent, like [[compute]]). */
  def computeSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var sizeA = 0
    var sizeB = 0
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; sizeA += 1; sizeB += 1; i += 1; j += 1 }
      else if (cmp < 0) { sizeA += 1; i += 1 }
      else { sizeB += 1; j += 1 }
    }
    while (i < na && !a.isNullAt(i)) { sizeA += 1; i += 1 }
    while (j < nb && !b.isNullAt(j)) { sizeB += 1; j += 1 }
    val union = sizeA + sizeB - inter
    if (union == 0) Double.NaN else inter.toDouble / union.toDouble
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FnRegistry.once(spark, "jaccard_sim")(exprs => JaccardSim(exprs(0), exprs(1)))
}
