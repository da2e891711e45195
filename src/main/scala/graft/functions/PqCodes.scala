package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All m product-quantizer codes for one vector in ONE fused codegen'd
  * pass: code(j) = argmin over the ksub sub-centroids of the
  * squared-L2 distance between subspace j of the vector and subspace j
  * of the centroid, ties to the LOWER position.
  *
  * Exactly the HOF formulation of
  * [[graft.operators.Similarity.pqEncode]] (per-subspace sequential
  * double fold ascending element index; argmin via the
  * (d2, position) struct sort whose NaN ordering is "NaN greatest" —
  * reproduced here with Double.compare) — but the HOF path interprets
  * m·ksub lambda folds per row; this is one typed loop over an
  * embedded flat codebook. Same fused-native-vs-HOF-spec pattern as
  * [[LshBuckets]]/[[CosineSim]].
  *
  * Precondition (as for the IVF family): fixed-length vectors with no
  * null elements; a wrong-length vector yields a null result rather
  * than silently wrong codes.
  *
  * `codebook` is the ksub centroid vectors in CELL-SORTED order,
  * flattened (cell, dim)-major — positions in that order ARE the
  * codes, matching the HOF path and the oracle's ROW_NUMBER codes.
  */
case class PqCodes(child: Expression, codebook: IndexedSeq[Double],
    m: Int, ksub: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if codebook.length == ksub * dim && m > 0 && ksub > 0 && dim % m == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float|double>, |codebook| == ksub*dim and " +
        s"dim % m == 0; got $other, |codebook|=${codebook.length}, " +
        s"m=$m, ksub=$ksub, dim=$dim")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flat: Array[Double] = codebook.toArray

  override def nullSafeEval(input: Any): Any =
    PqCodes.compute(input.asInstanceOf[ArrayData], flat, m, ksub, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqCodes")
      s"""
        Object $tmp = graft.functions.PqCodes.compute($c, $ref, $m, $ksub, $dim, $isFloat);
        if ($tmp == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null for malformed vectors (wrong length / null element). */
  def compute(v: ArrayData, cb: Array[Double], m: Int, ksub: Int,
      dim: Int, isFloat: Boolean): ArrayData = {
    if (v.numElements() != dim) return null
    var z = 0
    while (z < dim) {
      if (v.isNullAt(z)) return null
      z += 1
    }
    val dsub = dim / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var bestIdx = 0
      var best = Double.NaN
      var c = 0
      while (c < ksub) {
        val base = c * dim + off
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) v.getFloat(off + i).toDouble else v.getDouble(off + i)
          val d = x - cb(base + i)
          d2 += d * d
          i += 1
        }
        // strict-less via total ordering (NaN greatest) ≡ the HOF
        // (d2, position) struct sort's first element
        if (c == 0 || java.lang.Double.compare(d2, best) < 0) {
          best = d2; bestIdx = c
        }
        c += 1
      }
      out(j) = bestIdx
      j += 1
    }
    new GenericArrayData(out)
  }
}
