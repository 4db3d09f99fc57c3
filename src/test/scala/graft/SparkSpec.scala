package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM per `sbt test` fork). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test")
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SharedSpark.spark
}
