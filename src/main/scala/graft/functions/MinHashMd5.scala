package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash-over-md5 signature: for seed i in 0..k-1, the
  * lexicographic minimum of md5Hex(s"$i:" + token) over the token array —
  * exactly the per-seed `array_min(transform(tokens, md5(concat(...))))`
  * column formulation (same strings, same hex), in ONE native loop with a
  * reused MessageDigest instead of k interpreted higher-order passes.
  *
  * Exists because HigherOrderFunction is CodegenFallback: the HOF
  * formulation interprets concat+md5 per (token, seed). This expression
  * is the production form of [[graft.operators.NearDup.Md5Hash]]'s
  * signature and stays bit-compatible with the DuckDB oracle.
  */
case class MinHashMd5Sig(child: Expression, k: Int)
    extends UnaryExpression {

  // containsNull: compute() yields null per-seed entries when the token
  // array is empty or all-null (array_min-of-empty HOF semantics), so the
  // declared element type must admit nulls.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 requires array<string> and k>0, got $other, k=$k")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashMd5Sig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashMd5Sig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5Sig =
    copy(child = newChild)
}

object MinHashMd5Sig {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, prefix: Array[Byte], token: Array[Byte]): UTF8String = {
    md.reset()
    md.update(prefix)
    md.update(token)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(i => s"$i:".getBytes(StandardCharsets.UTF_8))
    val mins = new Array[UTF8String](k)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t).getBytes
        var i = 0
        while (i < k) {
          val h = md5Hex(md, prefixes(i), tok)
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }
}
