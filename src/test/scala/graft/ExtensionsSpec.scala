package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The kernels must be reachable as plain SQL functions in a session
  * configured with spark.sql.extensions=graft.GraftExtensions (how a
  * cluster deployment would wire them).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions evaluate in plain SQL") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark
        .sql(
          """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
            |       vec_norm(array(3.0D, 4.0D)) AS n,
            |       size(minhash_sig(array(7L, 11L))) AS m,
            |       simhash64(array(0L)) AS s""".stripMargin
        )
        .collect()
        .head
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.getInt(2) == graft.functions.MinHashExpr.NumHashes)
      // all 64 bit-sums are -1 for feature hash 0 except none ≥ 0 → 0
      assert(row.getLong(3) == 0L)
    } finally spark.stop()
  }
}
