package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one SparkSession per JVM (suites run sequentially in
  * the forked test JVM; getOrCreate hands every suite the same session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("graft-test")
  lazy val sf: String = "/root/testdata/sf0.001"
}
