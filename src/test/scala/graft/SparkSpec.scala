package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Graft

/** Shared local SparkSession for all specs (one JVM-wide session), built by
  * the same factory as every production entry point so tests exercise the
  * engine's real config (AQE, broadcast threshold, custom functions).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = Graft.session("graft-test")
}
