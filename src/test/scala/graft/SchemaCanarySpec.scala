package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** Testdata-regeneration drift canary.
  *
  * The driver regenerates /root/testdata between rounds, and a physical
  * layout change (round 9: events `ts` flipped TIMESTAMP(NANOS) →
  * TIMESTAMP_NTZ(MICROS)) broke dozens of specs at once with confusing
  * per-operator failures. This spec pins the NORMALIZED schema of every
  * table as seen through [[Tables]] (the only sanctioned read path), at
  * all three SFs — so the next layout drift fails in exactly one,
  * clearly-named place with the actual-vs-expected DDL in the message.
  *
  * If this spec fails after a round boundary and nothing else changed:
  * the fix belongs in [[Tables]] (normalize the new layout back to these
  * types), not in the operators.
  */
class SchemaCanarySpec extends SparkSpecBase {

  private val expected: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("region", _.region, "r_regionkey INT,r_name STRING"),
    ("nation", _.nation, "n_nationkey INT,n_name STRING,n_regionkey INT"),
    (
      "customer",
      _.customer,
      "c_custkey BIGINT,c_name STRING,c_nationkey INT,c_acctbal DOUBLE,c_mktsegment STRING"
    ),
    ("supplier", _.supplier, "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE"),
    (
      "part",
      _.part,
      "p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING,p_size INT,p_retailprice DOUBLE"
    ),
    (
      "orders",
      _.orders,
      "o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING,o_totalprice DOUBLE," +
        "o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"
    ),
    (
      "lineitem",
      _.lineitem,
      "l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT,l_linenumber INT,l_quantity DOUBLE," +
        "l_extendedprice DOUBLE,l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING," +
        "l_linestatus STRING,l_shipdate TIMESTAMP_NTZ"
    ),
    // events is the one Tables actively normalizes: whatever the physical
    // ts layout, operators must see session-local TimestampType
    ("events", _.events, "event_id BIGINT,ts TIMESTAMP,user_id BIGINT,event_type STRING," +
      "value DOUBLE,props STRING"),
    ("documents", _.documents, "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT"),
    ("embeddings", _.embeddings, "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")
  )

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val t = Tables(spark, s"/root/testdata/$sf")
    test(s"canary: $sf normalized schemas unchanged") {
      val drift = expected.flatMap { case (name, load, ddl) =>
        val actual = load(t).schema.toDDL
        if (actual == ddl) None
        else Some(s"$name.parquet drifted:\n  expected: $ddl\n  actual:   $actual")
      }
      assert(
        drift.isEmpty,
        "\nTESTDATA LAYOUT DRIFT (driver regenerated /root/testdata) — " +
          "normalize in Tables, not in operators:\n" + drift.mkString("\n")
      )
    }
  }
}
