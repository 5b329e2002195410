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

  test("canary: every embeddings.vec_id has a documents row (docs ⊇ vectors), at any SF") {
    // The C55/C56 oracles (modality agreement, paraphrase mining) join
    // embeddings to documents on vec_id = doc_id and ASSUME the doc
    // side covers every vector — a regenerated corpus that breaks the
    // containment would silently drop pairs from those operators while
    // their DuckDB oracles did the same, leaving the drift invisible
    // to the hash gate. This names it at the round boundary instead.
    for (sf <- availableSfDirs) {
      val t = Tables(spark, s"/root/testdata/$sf")
      val orphans = t.embeddings
        .select(org.apache.spark.sql.functions.col("vec_id"))
        .join(
          t.documents.select(org.apache.spark.sql.functions.col("doc_id")),
          org.apache.spark.sql.functions.col("vec_id") ===
            org.apache.spark.sql.functions.col("doc_id"),
          "left_anti"
        )
        .count()
      assert(
        orphans == 0L,
        s"$sf has $orphans embeddings.vec_id values with no documents row — " +
          "the docs ⊇ vectors invariant the C55/C56 oracles assume no longer holds"
      )
    }
  }

  // registration-time twin of availableSfDirs (info() is test-scoped,
  // so the filter is silent here): a checkout with only sf0.001 just
  // registers fewer per-SF tests instead of failing on a missing path
  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")
       if new java.io.File(s"/root/testdata/$sf").isDirectory) {
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
