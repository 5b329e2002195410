package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion operators mirroring the reference's s3_lambda stage:
  * CSV download → parse → bulk load (download.go:466-541) and the
  * synthetic device/subscription generator (download.go:127-190).
  */
object Ingest {

  /** Scratch directories removed by one JVM shutdown hook (repeated
    * Bench/Verify runs must not accumulate table copies in /tmp).
    */
  private val scratch = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
  private lazy val hook: Unit = {
    sys.addShutdownHook {
      scratch.foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(p.toFile)
      }
    }: Unit
  }

  private[graft] def scratchDir(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratch.synchronized(scratch += p)
    p.toString
  }

  /** A11: CSV round trip — serialize events rows to CSV lines the way
    * the reference's data.csv is laid out, parse them back with
    * from_csv (typed, codegen'd — the distributed equivalent of
    * encoding/csv + COPY in download.go:466-541), then aggregate on
    * the parsed columns. Proves parse correctness because the result
    * must match an oracle computed from the original table.
    */
  def csvRoundtrip(t: Tables): DataFrame = {
    val lines = t.events.select(
      concat_ws(",", col("event_id"), col("user_id"), col("event_type")).as("line")
    )
    val parsed = lines.select(
      from_csv(col("line"), org.apache.spark.sql.types.StructType.fromDDL(
        "event_id LONG, user_id LONG, event_type STRING"
      ), Map.empty[String, String]).as("r")
    )
    parsed
      .select(col("r.event_id").as("event_id"), col("r.user_id").as("user_id"), col("r.event_type").as("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_ids"))
      .orderBy("event_type")
  }

  /** True file-based CSV ingest (same parser config as csvRoundtrip)
    * for callers with real CSV input; spec-tested since the test
    * corpus ships parquet only.
    */
  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)).csv(path)

  /** A11b: columnar-format round trip — land events as ORC (the other
    * production columnar format; Spark's writer/reader, vectorized and
    * predicate-pushing like parquet), read them back, and aggregate.
    * The aggregate must match an oracle computed from the ORIGINAL
    * parquet, proving the write→read cycle is lossless for the typed
    * columns. Write is one narrow projection, task-parallel; the read
    * back prunes to the two aggregated columns.
    *
    * `dir` defaults to a JVM-local temp directory (removed on exit) —
    * correct for local[] testing ONLY; on a cluster pass a shared
    * filesystem path, exactly as you would for any Spark write.
    */
  def orcRoundtrip(t: Tables, dir: String = Ingest.scratchDir("graft-orc")): DataFrame = {
    t.events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write
      .mode("overwrite")
      .orc(dir)
    t.spark.read
      .orc(dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_ids"),
        Num.moneySum(col("value")).as("sum_value")
      )
      .orderBy("event_type")
  }

  /** A11c: JSON-lines round trip — serialize events rows to JSON the
    * way the Kinesis payloads carry them (to_json), parse back typed
    * (from_json), aggregate. With CSV (A11), ORC (A11b), parquet
    * (native), and the base64 envelope (A3), this completes the
    * serialization matrix; the aggregate matching the original-table
    * oracle proves the cycle lossless.
    */
  def jsonlRoundtrip(t: Tables): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("event_id LONG, user_id LONG, event_type STRING")
    val lines = t.events.select(
      to_json(struct(col("event_id"), col("user_id"), col("event_type"))).as("line")
    )
    lines
      .select(from_json(col("line"), schema).as("r"))
      .select(
        col("r.event_id").as("event_id"),
        col("r.user_id").as("user_id"),
        col("r.event_type").as("event_type")
      )
      .groupBy("event_type")
      // aggregate EVERY parsed field — an unused field would be pruned
      // out of from_json entirely and its round trip never validated
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_ids"),
        sum(col("user_id")).as("sum_users")
      )
      .orderBy("event_type")
  }

  /** A11e: XML round trip — serialize events rows to XML elements
    * (to_xml) the way a legacy enterprise feed carries them, parse
    * back typed (from_xml — Spark 4's built-in XML support, evaluated
    * in-plan like from_json), and aggregate EVERY parsed field plus
    * the id extremes. Completes the serialization matrix begun by CSV
    * (A11), ORC (A11b) and JSONL (A11c): all of Spark's built-in
    * text/columnar codecs now prove lossless write→parse cycles under
    * the same original-parquet oracle discipline. Map-only until the
    * per-type aggregate — scan-speed at any corpus size.
    */
  def xmlRoundtrip(t: Tables): DataFrame = xmlRoundtripOn(t.events)

  /** The round-trip kernel over any frame with (event_id, user_id,
    * event_type) — exposed so specs can drive XML-hostile inputs
    * (`&`, `<`, quotes: entity escaping is exactly where an XML cycle
    * silently corrupts, and the group keys would shift if it did).
    */
  private[graft] def xmlRoundtripOn(events: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("event_id LONG, user_id LONG, event_type STRING")
    val lines = events.select(
      to_xml(struct(col("event_id"), col("user_id"), col("event_type"))).as("line")
    )
    lines
      // ignoreSurroundingSpaces defaults TRUE and would trim padded
      // strings on parse — the one silent lossy default in the cycle
      // (entity escaping round-trips correctly out of the box;
      // whitespace fidelity needs the opt-out, spec-pinned)
      .select(from_xml(col("line"), schema,
        java.util.Collections.singletonMap("ignoreSurroundingSpaces", "false")).as("r"))
      .select(
        col("r.event_id").as("event_id"),
        col("r.user_id").as("user_id"),
        col("r.event_type").as("event_type")
      )
      .groupBy("event_type")
      // aggregate every parsed field — an unused field would be pruned
      // out of from_xml entirely and its round trip never validated
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_ids"),
        sum(col("user_id")).as("sum_users"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id")
      )
      .orderBy("event_type")
  }

  /** A11d: malformed-record audit — the PERMISSIVE-mode half of real
    * JSONL ingestion (the Lambda consumers assume well-formed
    * envelopes; a production reader cannot). A deterministic slice
    * (event_id % 31 == 0) of the serialized lines is truncated, which
    * always breaks the closing brace, and the parse must classify
    * EXACTLY those lines as corrupt while round-tripping every value
    * field of the survivors bit-exactly. The oracle pins the counts
    * from the corruption rule alone — equality proves the permissive
    * parser neither drops good records nor forgives bad ones.
    * Map-only until the per-type aggregate: scan-speed auditing.
    */
  def jsonlAudit(t: Tables): DataFrame = jsonlAuditOn(t.events)

  /** The audit kernel over any frame with (event_type, event_id,
    * user_id, value) — exposed so specs can drive crafted inputs (a
    * null `value` INSIDE the corrupt slice is exactly where the
    * parse-success gate below must hold; the corpus fixture has none).
    */
  def jsonlAuditOn(events: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("event_id LONG, user_id LONG, value DOUBLE")
    events
      .select(
        col("event_type"),
        col("event_id"),
        col("value"),
        to_json(struct(col("event_id"), col("user_id"), col("value"))).as("line")
      )
      .withColumn(
        "line",
        when(
          col("event_id") % 31 === 0,
          expr("substr(line, 1, length(line) - 5)")
        ).otherwise(col("line"))
      )
      .withColumn("parsed", from_json(col("line"), schema))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("parsed.event_id").isNull, 1L).otherwise(0L)).as("n_bad"),
        // Gated on the parse SUCCEEDING (parsed.event_id non-null), then
        // null-safe (<=>) on the value: a surviving line with a
        // legitimately-null value round-trips as null-equals-null, while
        // a corrupt line never counts — without the gate, a corrupt line
        // whose original value was null would false-pass (failed parse
        // yields null, and null <=> null is true).
        sum(
          when(col("parsed.event_id").isNotNull && (col("parsed.value") <=> col("value")), 1L)
            .otherwise(0L)
        ).as("n_value_ok")
      )
      .orderBy("event_type")
  }

  /** A12: deterministic device synthesis — the reference loops
    * user-by-user on the driver emitting 1-3 devices with random
    * tokens (download.go:127-190). Distributed re-expression:
    * `sequence` + `explode` generates rows executor-side (no driver
    * loop, no collect), token/arn are content-addressed md5s instead
    * of crypto-rand so the output is reproducible.
    */
  def deviceGen(t: Tables): DataFrame =
    t.customer
      .select(col("c_custkey"), explode(sequence(lit(1L), pmod(col("c_custkey"), lit(3)) + 1)).as("device_num"))
      .select(
        col("c_custkey"),
        col("device_num"),
        concat(
          lit("arn:"),
          substring(md5(concat(col("c_custkey"), lit("-"), col("device_num"))), 1, 16)
        ).as("endpoint_arn")
      )
      .orderBy("c_custkey", "device_num")

  /** A19: MERGE-INTO semantics as one relational plan — the nightly
    * "apply the delta to the snapshot" table-maintenance op (Delta/
    * Iceberg MERGE, SQL:2003 MERGE) without a table format: a FULL
    * OUTER join of base and delta on the key, coalescing delta-wins
    * columns. The deterministic stand-ins: base = events outside the
    * %5 slice, delta = the %3 slice with doubled value — so the delta
    * exercises BOTH arms: ids divisible by 3 but not 5 hit base rows
    * (updates), ids divisible by 15 are absent from base (inserts),
    * and the rest of base passes through (keeps). Emitted as a
    * per-type audit of the POST-merge table
    * (counts + decimal sums + action tallies) so the gate hashes the
    * merge's effect, not a 600k-row dump.
    *
    * Scale: one shuffle each side on the merge key — exactly the
    * copy-on-write MERGE join every lakehouse runs; AQE handles the
    * usually-tiny delta side by broadcasting it.
    */
  def mergeUpsert(t: Tables): DataFrame = {
    val base = t.events.filter(col("event_id") % 5 =!= 0)
      .select("event_id", "event_type", "value")
    val delta = t.events.filter(col("event_id") % 3 === 0)
      .select(col("event_id"), col("event_type"), (col("value") * 2).as("value"))
    base
      .as("b")
      .join(delta.as("d"), col("b.event_id") === col("d.event_id"), "full_outer")
      .select(
        coalesce(col("b.event_id"), col("d.event_id")).as("event_id"),
        coalesce(col("d.event_type"), col("b.event_type")).as("event_type"),
        coalesce(col("d.value"), col("b.value")).as("value"),
        when(col("d.event_id").isNull, "keep")
          .when(col("b.event_id").isNull, "insert")
          .otherwise("update")
          .as("action")
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        Num.moneySum(col("value")).as("sum_value"),
        sum(when(col("action") === "insert", 1L).otherwise(0L)).as("n_inserted"),
        sum(when(col("action") === "update", 1L).otherwise(0L)).as("n_updated"),
        sum(when(col("action") === "keep", 1L).otherwise(0L)).as("n_kept")
      )
      .orderBy("event_type")
  }

  /** A20: referential-integrity / domain-constraint audit — the
    * "expectations" pass every ingest runs before publishing a
    * snapshot: each rule is one row of (check, n_violations). FK
    * orphan checks are LEFT ANTI joins (lineitem→orders, lineitem→part,
    * orders→customer — each one keyed shuffle, no row ever widened);
    * domain checks are map-side filter counts on the same scans. A
    * healthy fixture audits to zeros for the FK rows — the point of the
    * gate is that the COUNTS, not just emptiness, reproduce: the
    * discount/quantity domain rows are non-zero by construction.
    */
  def integrityAudit(t: Tables): DataFrame = {
    def rule(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations")).select(lit(name).as("check"), col("n_violations"))
    // ONE plan (union of one-row aggregates), not a driver loop of
    // count() jobs: the scheduler runs the branches concurrently, and
    // per-branch column pruning keeps each scan to its key/domain
    // columns. The in-scan domain checks could fuse into one pass with
    // conditional sums; kept as rules so adding/removing a rule is a
    // one-line diff (the audit's actual change pattern).
    Seq(
      rule("lineitem_orphan_order",
        t.lineitem.select("l_orderkey")
          .join(t.orders.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")),
      rule("lineitem_orphan_part",
        t.lineitem.select("l_partkey")
          .join(t.part.select("p_partkey"), col("l_partkey") === col("p_partkey"), "left_anti")),
      rule("orders_orphan_customer",
        t.orders.select("o_custkey")
          .join(t.customer.select("c_custkey"), col("o_custkey") === col("c_custkey"), "left_anti")),
      rule("lineitem_discount_out_of_range",
        t.lineitem.filter(col("l_discount") < 0.0 || col("l_discount") > 0.1)),
      rule("lineitem_nonpositive_quantity", t.lineitem.filter(col("l_quantity") <= 0.0)),
      rule("lineitem_high_quantity", t.lineitem.filter(col("l_quantity") > 45.0)),
      rule("orders_null_priority", t.orders.filter(col("o_orderpriority").isNull)),
      rule("events_negative_value",
        t.events.filter(col("event_type") === "purchase" && col("value") < 0.0))
    ).reduce(_.unionByName(_)).orderBy("check")
  }

  /** A22: snapshot diff (CDC) — the row-level change feed between two
    * table snapshots, the primitive behind incremental downstream
    * refresh and audit ("what changed since yesterday's publish").
    * FULL OUTER join on the key classifies every row: in-new-only →
    * added, in-old-only → removed, both with different values →
    * changed, else unchanged; the deterministic stand-ins are two
    * modular slices of orders with a +1.00 price adjustment on the %3
    * slice, so every class is populated by construction. Emitted as
    * the per-(priority, class) audit — counts plus the DECIMAL net
    * value delta (added rows contribute +new, removed −old, changed
    * the exact +1.00 adjustment), so the gate hashes the diff's
    * effect, not a key dump.
    *
    * Scale: one keyed shuffle per snapshot — the same exchange the
    * lakehouse CDC join pays; the value compare happens post-join
    * row-at-a-time, never materializing the change set wider than the
    * classified row.
    */
  def snapshotDiff(t: Tables): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val old = t.orders
      .filter(col("o_orderkey") % 11 =!= 0)
      .select(
        col("o_orderkey").as("key"),
        col("o_orderpriority").as("prio_a"),
        col("o_totalprice").cast(dec).as("val_a")
      )
    val neu = t.orders
      .filter(col("o_orderkey") % 13 =!= 0)
      .select(
        col("o_orderkey").as("key"),
        col("o_orderpriority").as("prio_b"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice"))
          .cast(dec)
          .as("val_b")
      )
    old
      .join(neu, Seq("key"), "full_outer")
      .select(
        coalesce(col("prio_b"), col("prio_a")).as("priority"),
        when(col("val_a").isNull, "added")
          .when(col("val_b").isNull, "removed")
          .when(col("val_a") =!= col("val_b"), "changed")
          .otherwise("unchanged")
          .as("change_type"),
        (coalesce(col("val_b"), lit(0).cast(dec)) - coalesce(col("val_a"), lit(0).cast(dec)))
          .as("delta")
      )
      .groupBy("priority", "change_type")
      .agg(count(lit(1)).as("n_rows"), sum(col("delta")).cast("double").as("sum_delta"))
      .orderBy("priority", "change_type")
  }
}
