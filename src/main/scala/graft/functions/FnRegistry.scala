package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-once function registration. Re-registering the same name
  * used to go through `createOrReplaceTempFunction` unconditionally,
  * and every replace logs a `SimpleFunctionRegistry ... replaced a
  * previously registered function` WARN — per query in a bench run,
  * burying real warnings (VERDICT r7 #7). A name already present is
  * simply kept: all engine functions are pure and parameterized only
  * by their name, so an existing binding is always the right one. */
object FnRegistry {
  def once(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
