package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (Sessions.local is a
  * getOrCreate, so every suite reuses the same JVM-wide session). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test", "8")
  val sfDir = "/root/testdata/sf0.001"

  def resource(p: String): String =
    getClass.getResource(p).getPath
}
