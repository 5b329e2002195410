package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + sf0.001 tables for all specs. One session
  * per forked test JVM (getOrCreate), so suites don't pay startup.
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir: String            = "/root/testdata/sf0.001"
  def tables: Tables           = Tables(spark, sfDir)
}

object SparkSpecBase {
  lazy val session: SparkSession = GraftSession.local(4)
}
