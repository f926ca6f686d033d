package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
trait SparkSuite {
  lazy val spark: SparkSession = GraftSession.build(appName = "graft-test", master = "local[4]")
  val sfDir = "/root/testdata/sf0.001"
}
