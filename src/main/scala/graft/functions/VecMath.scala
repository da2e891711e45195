package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused native vector arithmetic for the similarity/quantization hot
  * paths (the [[CosineSim]]/[[PqCodes]]/[[LshBuckets]] pattern): each
  * expression is the EXACT sequential double fold of a higher-order-
  * function formulation kept in [[graft.operators.Similarity]] as the
  * readable spec — bit-identical results (same element order, same
  * double operations), parity-tested — but one typed codegen'd loop
  * per row instead of interpreted per-element lambdas. Spark's HOFs
  * (`aggregate`/`zip_with`/`transform`) are CodegenFallback: a scan
  * whose projection carries them drops out of whole-stage codegen and
  * pays lambda-variable binding per element, which profiling shows
  * dominating the IVF/PQ query family at every scale.
  *
  * Null semantics reproduce the HOF folds exactly: a null input array
  * → null; a null element or a length mismatch (zip_with pads with
  * nulls, and `acc + null` poisons the fold) → null.
  */
private object VecMath {
  final val KDouble = 0
  final val KFloat = 1
  final val KLong = 2
  final val KInt = 3

  def kindOf(dt: DataType): Option[Int] = dt match {
    case ArrayType(DoubleType, _) => Some(KDouble)
    case ArrayType(FloatType, _) => Some(KFloat)
    case ArrayType(LongType, _) => Some(KLong)
    case ArrayType(IntegerType, _) => Some(KInt)
    case _ => None
  }

  /** Element at i as double (cast-to-double-first semantics). The
    * caller has already checked isNullAt. */
  def elem(a: ArrayData, i: Int, kind: Int): Double = kind match {
    case KDouble => a.getDouble(i)
    case KFloat => a.getFloat(i).toDouble
    case KLong => a.getLong(i).toDouble
    case _ => a.getInt(i).toDouble
  }
}

/** Squared L2 distance — the fold of
  * `aggregate(zip_with(toDouble(v), toDouble(w), (x,y)=>(x-y)*(x-y)), 0.0, +)`. */
case class SqDistNative(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (VecMath.kindOf(left.dataType), VecMath.kindOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq_dist requires numeric arrays, got ${left.dataType}, ${right.dataType}")
    }

  private lazy val lk = VecMath.kindOf(left.dataType).get
  private lazy val rk = VecMath.kindOf(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistNative.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lk, rk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("sqDist")
      s"""
        Object $tmp = graft.functions.SqDistNative.compute($a, $b, $lk, $rk);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Double) $tmp).doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistNative =
    copy(left = newLeft, right = newRight)
}

object SqDistNative {
  /** Shared by interpreted and generated code. Null (boxed) for a
    * length mismatch or a null element — the zip_with padding / fold
    * poisoning outcome of the HOF spec. */
  def compute(a: ArrayData, b: ArrayData, lk: Int, rk: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = VecMath.elem(a, i, lk) - VecMath.elem(b, i, rk)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** L2 norm — for float/double arrays the fold of
  * `sqrt(aggregate(transform(v, x=>x.cast(double)*x.cast(double)), 0.0, +))`
  * (cast each element, then square in double); for int/long arrays the
  * fold of `sqrt(aggregate(v, 0.0, (a,q) => a + (q*q).cast(double)))`
  * (square in the integral type, then cast — exact for int8-code
  * magnitudes). */
case class VecNormNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VecMath.kindOf(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"vec_norm requires a numeric array, got ${child.dataType}")
    }

  private lazy val k = VecMath.kindOf(child.dataType).get

  override def nullSafeEval(input: Any): Any =
    VecNormNative.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("vecNorm")
      s"""
        Object $tmp = graft.functions.VecNormNative.compute($c, $k);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Double) $tmp).doubleValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormNative =
    copy(child = newChild)
}

object VecNormNative {
  def compute(a: ArrayData, kind: Int): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      kind match {
        case VecMath.KLong => val q = a.getLong(i); acc += (q * q).toDouble
        case VecMath.KInt => val q = a.getInt(i); acc += (q.toLong * q.toLong).toDouble
        case _ => val x = VecMath.elem(a, i, kind); acc += x * x
      }
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }
}

/** Dot product with cast-to-double-first element semantics — the fold
  * of `aggregate(zip_with(a, b, (x,y)=>x.cast(double)*y.cast(double)), 0.0, +)`. */
case class DotProdNative(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_prod"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (VecMath.kindOf(left.dataType), VecMath.kindOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_prod requires numeric arrays, got ${left.dataType}, ${right.dataType}")
    }

  private lazy val lk = VecMath.kindOf(left.dataType).get
  private lazy val rk = VecMath.kindOf(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProdNative.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lk, rk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotProd")
      s"""
        Object $tmp = graft.functions.DotProdNative.compute($a, $b, $lk, $rk);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Double) $tmp).doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProdNative =
    copy(left = newLeft, right = newRight)
}

object DotProdNative {
  def compute(a: ArrayData, b: ArrayData, lk: Int, rk: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += VecMath.elem(a, i, lk) * VecMath.elem(b, i, rk)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** ADC distance from a per-query distance table — the fold of
  * `aggregate(zip_with(sequence(0, m-1), codes,
  *    (j, code) => element_at(qtab, j*ksub + code + 1)), 0.0, +)`:
  * sum of the m table entries the codes select, ascending j. The
  * codes array must carry exactly m entries (the zip_with padding
  * outcome otherwise is null); a code outside [0, ksub) yields null
  * rather than a wrong distance. */
case class AdcSumNative(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_sum"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType | LongType, _), ArrayType(DoubleType, _))
          if m > 0 && ksub > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (array<int|long> codes, array<double> table), got $other")
    }

  private lazy val codesLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(codes: Any, qtab: Any): Any =
    AdcSumNative.compute(codes.asInstanceOf[ArrayData],
      qtab.asInstanceOf[ArrayData], m, ksub, codesLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val tmp = ctx.freshName("adcSum")
      s"""
        Object $tmp = graft.functions.AdcSumNative.compute($c, $t, $m, $ksub, $codesLong);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Double) $tmp).doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSumNative =
    copy(left = newLeft, right = newRight)
}

object AdcSumNative {
  def compute(codes: ArrayData, qtab: ArrayData, m: Int, ksub: Int,
      codesLong: Boolean): java.lang.Double = {
    if (codes.numElements() != m) return null
    val tn = qtab.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val code = if (codesLong) codes.getLong(j).toInt else codes.getInt(j)
      val idx = j * ksub + code
      if (code < 0 || code >= ksub || idx >= tn || qtab.isNullAt(idx)) return null
      acc += qtab.getDouble(idx)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
