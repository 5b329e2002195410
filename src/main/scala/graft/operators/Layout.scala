package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout clustering (z-order) for scan pruning —
  * the data-layout lever that matters most at 100 TB: parquet
  * min/max (or manifest-level) statistics can only skip files when
  * rows that are close in QUERY space are close in FILE space, and a
  * single-column sort clusters exactly one dimension. Interleaving the
  * bits of two (or more) bucketized dimensions into a Morton code
  * gives every z-prefix a bounded range in EVERY dimension, so point
  * and range filters on either column prune files.
  *
  * `zorderLayout` simulates the layout the writer would produce:
  * bucketize user (8 bits) and event-hour (8 bits), interleave into a
  * 16-bit z-value, and group by the z-PREFIX (the logical file).
  * Everything is a codegen'd map + ONE shuffle on the file key — the
  * file assignment is pure arithmetic, deliberately NOT a global
  * row_number (a z-SORT at write time is a parallel range exchange;
  * a global window would funnel one task). Per-file min/max of both
  * dimensions make the clustering measurable: each file's span covers
  * a small fraction of each dimension, which IS the skipping
  * guarantee.
  */
object Layout {

  /** B46: hive-partitioned layout — the standard data-lake directory
    * scheme (`.../event_type=click/day=.../part-*.parquet`): the
    * writer `partitionBy`s the columns every consumer filters on, and
    * a filtered read then PRUNES whole directories at PLANNING time
    * (PartitionFilters, zero I/O for excluded partitions) — the
    * coarse-grained twin of z-order's intra-file skipping (B16). The
    * gate query writes events partitioned by (event_type, day), reads
    * one type's slice back, and aggregates — values must equal the
    * direct query (the layout changes the PLAN, never the values,
    * same contract as B19's bucketed join). PlanSpec asserts the
    * pruned scan shape.
    */
  def partitionedLayout(t: Tables, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    t.events
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      // repartition on the partition columns before a partitionBy write
      // (guide §6): each (type, day) group lands in exactly one task, so
      // the write parallelizes across tasks AND emits one file per
      // partition dir — without this, every input task writes a file
      // into every partition it holds rows for (task×partition file
      // spray at scale; here the single-split input serialized the
      // whole layout through one task). Explicit width (defaultParallelism,
      // scale-adaptive) — an N-less repartition is AQE-coalesced back to
      // one task at gate scale, resurrecting the serial write
      .repartition(t.spark.sparkContext.defaultParallelism, col("event_type"), col("day"))
      .write
      .mode("overwrite")
      .partitionBy("event_type", "day")
      .parquet(dir)
    t.spark.read
      .parquet(dir)
      .filter(col("event_type") === "purchase" && col("day") >= "2024-01-10" &&
        col("day") < "2024-01-20")
      // partition-column type inference reads `day` back as DATE;
      // normalize to the written string form for the schema contract
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Num.moneySum(col("value")).as("sum_value"))
      .orderBy("day")
  }

  /** B61: dynamic partition pruning — the RUNTIME twin of B46's
    * planning-time pruning, and the lever that makes dim-filtered fact
    * scans cheap at 100 TB. B46 prunes when the partition predicate is
    * a literal in the query; here the interesting partitions are only
    * known after running a sub-query (the "hot days" — days holding at
    * least 1/40 of all traffic), so static pruning can't help. Spark's
    * `PartitionPruning` rule instead injects a
    * `DynamicPruningExpression` into the fact scan's PartitionFilters:
    * the dim side's broadcast is REUSED as an IN-subquery over the
    * join key, and whole fact directories are skipped at execution
    * time. On a date-partitioned 100 TB fact table this is the
    * difference between scanning 3 hot days and scanning all of them.
    *
    * The hot-day rule is a cross-multiplied integer share
    * (`c * 40 >= total`) so the dim is deterministic at every SF, and
    * the values must equal the layout-free oracle (the layout changes
    * the PLAN, never the values — same contract as B46/B19). PlanSpec
    * asserts `dynamicpruningexpression` lands in the scan.
    */
  def dppJoin(t: Tables, dir: String): DataFrame = {
    t.events
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      // one task per day-partition at the write (see partitionedLayout)
      .repartition(t.spark.sparkContext.defaultParallelism, col("day"))
      .write
      .mode("overwrite")
      .partitionBy("day")
      .parquet(dir)
    // partition-column inference reads `day` back as DATE
    val fact = t.spark.read.parquet(dir)
    val byDay = t.events
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    // total-traffic denominator as a global window over the ~#days-row
    // aggregate (constant-partition window on dim-sized data, never the
    // fact). Deliberately NOT a joined-in scalar: a join absorbs the
    // share predicate into its condition, and Spark's PartitionPruning
    // rule only fires when the filtering side keeps a selective Filter
    // NODE — this formulation is what makes the DPP subquery plannable.
    val hot = byDay
      .withColumn(
        "tot",
        sum(col("c")).over(org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
      .filter(col("c") * 40 >= col("tot"))
      .select(to_date(col("d")).as("hot_day"))
    fact
      .join(broadcast(hot), col("day") === col("hot_day"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.moneySum(col("value")).as("sum_value")
      )
      .orderBy("event_type")
  }

  /** Morton-interleave the low `bits` of u (even positions) and v (odd
    * positions) — plain shift/mask arithmetic, whole-stage codegen'd.
    * Shared with the store's physical z-order layout
    * ([[graft.sources.ParquetEpochs.zcluster]]).
    */
  private[graft] def morton(u: Column, v: Column, bits: Int): Column =
    (0 until bits)
      .map { i =>
        (shiftleft(shiftright(u, i) % 2, 2 * i) + shiftleft(shiftright(v, i) % 2, 2 * i + 1))
      }
      .reduce(_ + _)

  def zorderLayout(t: Tables, prefixBits: Int = 8): DataFrame = {
    val bits = 8
    val e = t.events.select(
      (col("user_id") % (1 << bits)).as("ub"),
      (hour(col("ts")) * 31 + dayofmonth(col("ts"))).cast("long").%(1 << bits).as("hb")
    )
    e.withColumn("z", morton(col("ub"), col("hb"), bits))
      // logical file = z-prefix bucket: 2^prefixBits files, assignment
      // is a pure projection (no global sort, no window)
      .withColumn("file_id", shiftright(col("z"), 2 * bits - prefixBits).cast("long"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min("ub").as("min_ub"),
        max("ub").as("max_ub"),
        min("hb").as("min_hb"),
        max("hb").as("max_hb")
      )
      .orderBy("file_id")
  }

  /** Output-shard plan + skew audit: hash-assign every doc to one of
    * `nShards` output shards and report per-shard row/byte totals with
    * witness bounds. Balanced output files are a real 100 TB concern —
    * a hot shard serializes the whole write stage and produces the
    * pathological file a downstream reader chokes on; this is the
    * pre-write audit that catches it. The hash is the same
    * content-stable md5 the sampling family uses, so shard assignment
    * survives repartitioning and corpus growth. Map-only projection +
    * one tiny partial-agg'd shuffle (output = nShards rows at any
    * input scale).
    */
  def shardPlan(t: Tables, nShards: Int = 64): DataFrame =
    t.documents
      .select(col("doc_id"), col("n_chars"))
      .withColumn("shard", Sampling.hashBucket(nShards))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc")
      )
      .orderBy("shard")

  /** B58: small-file compaction planner — the maintenance pass every
    * streaming-ingested lake needs: thousands of per-micro-batch
    * files coalesce into target-sized output groups, adjacent in the
    * table's sort dimension so compaction preserves clustering. Each
    * (type, day) partition stands in for a file; the plan assigns
    * files to bins by `cum_before div target` over the day order — a
    * RUNNING-SUM window, not first-fit (first-fit's bin reset is a
    * sequential recurrence no window can express; the div form
    * over-fills a bin by at most one file, the standard size-tiered
    * compromise, and stays one window pass).
    *
    * The target is data-derived (⌈type total / binsPerType⌉, a tiny
    * per-type aggregate broadcast back) so the plan scales with the
    * partition, and everything downstream of the manifest aggregate
    * touches MANIFEST-sized data — at 100 TB the planner reads file
    * statistics, never file contents. All-integer arithmetic (`div`,
    * never `/`) keeps the bin ids exact in any engine.
    */
  def compactionPlan(t: Tables, binsPerType: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = t.events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_rows"))
    val target = files
      .groupBy(col("event_type").as("tt"))
      .agg(expr(s"(sum(n_rows) + ${binsPerType - 1}) div $binsPerType").as("target"))
    val w = Window
      .partitionBy("event_type")
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .join(broadcast(target), col("event_type") === col("tt"))
      .withColumn("cum_before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("bin", expr("cum_before div target"))
      .groupBy("event_type", "bin")
      .agg(
        count(lit(1)).as("n_files"),
        sum("n_rows").as("total_rows"),
        min("day").as("first_day"),
        max("day").as("last_day")
      )
      .orderBy("event_type", "bin")
  }

  /** B74: join-explosion forecast — the pre-flight audit for a
    * self-join (or any fact⋈fact) on a candidate key: output size is
    * EXACTLY Σₖ n(k)² rows, computable from per-key counts alone, so
    * the 100 TB engine answers "will events⋈events on user_id
    * explode?" from a key-histogram pass without ever running the
    * join — the diagnostic sibling of the shard-skew audit (C31) and
    * the skew-salting lever (B18): forecast first, salt or block the
    * hot key second.
    *
    * One partial-agg'd shuffle to per-key counts, then two branches
    * over that (key-cardinality-sized) aggregate: the global summary
    * and the hot-key census (keys AT the max product, min-key
    * witness) joined back via a broadcast single-row max — argmax
    * without a sort (B38's rule). All-integer output, one row.
    */
  def joinForecast(t: Tables): DataFrame = {
    val counts = t.events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"), (col("n") * col("n")).as("pairs"))
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum("n").as("n_rows"),
      sum("pairs").as("forecast_pairs"),
      max("pairs").as("max_pairs"))
    val hot = counts
      .crossJoin(broadcast(summary.select(col("max_pairs").as("mp"))))
      .filter(col("pairs") === col("mp"))
      .agg(count(lit(1)).as("n_max_keys"), min("user_id").as("witness_key"))
    summary.crossJoin(hot)
  }
}
