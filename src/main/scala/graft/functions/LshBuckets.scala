package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All L random-hyperplane LSH bucket ids for one vector in ONE fused
  * codegen'd pass: out(l) = Σ_j (dot(vec, plane_{l,j}) > 0) << j.
  *
  * Exactly the per-plane HOF formulation of
  * [[graft.operators.Similarity.lshBucket]] (sequential double fold per
  * dot, `> 0` sign test, disjoint-bit sum) — but the HOF path interprets
  * L·bits lambda folds per row (HigherOrderFunction is CodegenFallback);
  * this runs one typed loop over an embedded flat plane matrix. Same
  * fused-native-vs-HOF-spec pattern as [[CosineSim]]/[[MinHashMd5Sig]].
  *
  * `planes` is flattened in (table, bit, dim) order.
  */
case class LshBuckets(child: Expression, planes: IndexedSeq[Double],
    tables: Int, bits: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if planes.length == tables * bits * dim && tables > 0 && bits > 0 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<float|double> and |planes| == tables*bits*dim, " +
        s"got $other, |planes|=${planes.length}, tables=$tables, bits=$bits, dim=$dim")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flat: Array[Double] = planes.toArray

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], flat, tables, bits, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.compute($c, $ref, $tables, $bits, $dim, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(v: ArrayData, planes: Array[Double], tables: Int, bits: Int,
      dim: Int, isFloat: Boolean): ArrayData = {
    // HOF parity for degenerate rows: zip_with pads a length mismatch
    // with nulls and a null product poisons the fold to null, so both a
    // wrong-length vector and one containing a null element make every
    // `when(dot > 0)` false → bucket 0 in all tables.
    if (v.numElements() != dim)
      return new GenericArrayData(new Array[Long](tables))
    var z = 0
    while (z < dim) {
      if (v.isNullAt(z))
        return new GenericArrayData(new Array[Long](tables))
      z += 1
    }
    val n = dim
    val out = new Array[Long](tables)
    var l = 0
    while (l < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (l * bits + j) * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          dot += x * planes(base + i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(l) = bucket
      l += 1
    }
    new GenericArrayData(out)
  }
}
