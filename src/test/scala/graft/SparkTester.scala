package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM (suites run in one forked JVM). */
object SparkTester {
  lazy val spark: SparkSession = Sessions.local("4")
}

trait SparkTester {
  lazy val spark: SparkSession = SparkTester.spark
  val sfTiny = "/root/testdata/sf0.001"
}
