package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two vector columns as a native codegen'd
  * Catalyst expression (SURVEY §4: "custom codegen'd Expression for
  * cosine only if profiling demands" — it does: Spark's higher-order
  * functions are CodegenFallback, so the HOF formulation interprets its
  * lambdas per element; this fuses dot + both norms into one typed loop).
  *
  * Semantics are EXACTLY the sequential double fold of
  * [[graft.operators.Similarity.cosineHof]] (dot_i accumulated left to
  * right, then dot/(sqrt(na)*sqrt(nb))), so results are bit-identical to
  * the DuckDB-oracled baseline.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double>, got ${left.dataType}, ${right.dataType}")
    }

  private lazy val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.compute($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Shared by interpreted + generated code. One fused loop; element
    * loads specialized by the (compile-time-constant) isFloat flags. */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // norms must cover the FULL vectors (match the HOF formulation even
    // for unequal lengths)
    var j = n
    while (j < a.numElements()) {
      val x = if (aFloat) a.getFloat(j).toDouble else a.getDouble(j)
      na += x * x
      j += 1
    }
    var k = n
    while (k < b.numElements()) {
      val y = if (bFloat) b.getFloat(k).toDouble else b.getDouble(k)
      nb += y * y
      k += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def register(spark: SparkSession): Unit =
    FnRegistry.once(spark, "cosine_sim")(exprs => CosineSim(exprs(0), exprs(1)))
}
