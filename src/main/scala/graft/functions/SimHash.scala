package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC 2002) over a token array — a native
  * Catalyst expression with codegen (SURVEY §2.C C2; custom-Expression
  * tier of the build plan §4).
  *
  * SimHash folds every token's 64-bit hash into one signed bit-count
  * vector; near-duplicate documents land within a small Hamming distance.
  * One pass per row, no shuffle — the fingerprint-then-band pattern scales
  * to arbitrary corpus size.
  *
  * Token hash = Spark's own XXH64 (seed 42) over the UTF-8 bytes, so the
  * hot loop reuses the same hashing primitive as `xxhash64(...)`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hash64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** Register `simhash64(array<string>) -> bigint` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    FnRegistry.once(spark, "simhash64")(exprs => SimHash64(exprs.head))
}

/** 60-bit SimHash whose token hash is the top 60 bits of md5 — i.e. the
  * BIGINT value of the first 15 hex chars of `md5(token)`. Same algorithm
  * as [[SimHash64]], different hash primitive: md5 is replicable in ANSI
  * SQL (`('0x' || substr(md5(t), 1, 15))::BIGINT` in DuckDB), which makes
  * the full simhash near-dup pipeline oracle-checkable end to end. The
  * xxh64-based [[SimHash64]] stays the production fingerprint (faster,
  * 64 bits); this is its verification twin, same pattern as
  * [[MinHashMd5Sig]] vs the xxhash64 MinHash mode. */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5 requires array<string>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any =
    SimHashMd5.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {

  val Bits = 60

  // JCA provider lookup is synchronized — never per row in a hot path
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val md = mdLocal.get()
    val acc = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(md, tokens.getUTF8String(i))
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** BIGINT of the first 15 hex chars of md5(token): digest bytes 0..6
    * in full plus the high nibble of byte 7 (15 nibbles = 60 bits). */
  def hash60(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Register `simhash_md5(array<string>) -> bigint` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    FnRegistry.once(spark, "simhash_md5")(exprs => SimHashMd5(exprs.head))
}
