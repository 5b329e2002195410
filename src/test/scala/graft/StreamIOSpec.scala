package graft

import java.nio.file.Files

import graft.streaming.{KinesisLikePipeline, StreamIO}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamIOSpec extends SparkSpecBase {

  private def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  test("content-addressed sink lands decoded answers in prefix-partitioned parquet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in  = MemoryStream[(String, String)]
    val out = tmp("graft-s3-out")
    val q = StreamIO.contentAddressedSink(
      KinesisLikePipeline.addAnswers(
        KinesisLikePipeline.decodeEnvelope(in.toDF().toDF("partition_key", "data"))
      ),
      out,
      tmp("graft-s3-ckpt")
    )
    val env = (n1: Long, n2: Long) =>
      java.util.Base64.getEncoder.encodeToString(s"""{"Num1":$n1,"Num2":$n2}""".getBytes)
    in.addData(("a", env(1, 2)), ("b", env(30, 12)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 2)
    assert(rows.columns.contains("key_prefix"))
    assert(rows.filter(col("answer") === "30 + 12 = 42").count() == 1)
  }

  test("batched queue sink groups payloads into fixed-size send batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in  = MemoryStream[(Long, String)]
    val out = tmp("graft-sqs-out")
    val q = StreamIO.batchedQueueSink(
      in.toDF().toDF("topic_id", "payload_b64"),
      out,
      tmp("graft-sqs-ckpt"),
      batchSize = 3
    )
    in.addData((1L to 7L).map(i => (1L, s"p$i")) ++ Seq((2L, "x")): _*)
    q.processAllAvailable()
    q.stop()
    val batches = spark.read.json(out)
    val t1 = batches.filter(col("topic_id") === 1).select("entries").as[Seq[String]].collect()
    assert(t1.map(_.size).sorted.toSeq == Seq(1, 3, 3)) // 7 payloads → 3+3+1
    assert(batches.filter(col("topic_id") === 2).count() == 1)
  }

  test("end-to-end topic fan-out: message stream → page sequencer → batched queue sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in  = MemoryStream[KinesisLikePipeline.TopicMsg]
    val out = tmp("graft-e2e-out")
    // the full reference flow in one streaming plan: lambda_count's
    // page fan-out (stateful) feeding lambda_page's SQS batching
    val payloads = KinesisLikePipeline
      .pageSequencer(spark, in.toDS())
      .select(
        col("topic_id"),
        base64(concat_ws("|", col("topic_id"), col("page_num"), col("message")).cast("binary"))
          .as("payload_b64")
      )
    val q = StreamIO.batchedQueueSink(payloads, out, tmp("graft-e2e-ckpt"), batchSize = 2)
    in.addData(KinesisLikePipeline.TopicMsg(7, "hello", 45, 10)) // 45/10+1 = 5 pages
    q.processAllAvailable()
    q.stop()
    val batches = spark.read.json(out)
    val sizes   = batches.select("entries").as[Seq[String]].collect().map(_.size)
    assert(sizes.sum == 5, s"expected 5 page payloads, got ${sizes.sum}")
    assert(sizes.sorted.toSeq == Seq(1, 2, 2)) // 5 payloads in batches of 2
    assert(batches.select("topic_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("rate-source producer emits well-formed decodable envelopes") {
    val stream = StreamIO.mathProblemStream(spark, rowsPerSecond = 500)
    assert(stream.isStreaming)
    val q = KinesisLikePipeline
      .decodeEnvelope(stream)
      .writeStream
      .format("memory")
      .queryName("rate_probe")
      .option("checkpointLocation", tmp("graft-rate-ckpt"))
      .start()
    try {
      // wait until at least one non-empty micro-batch lands
      var tries = 0
      while (spark.table("rate_probe").isEmpty && tries < 50) { Thread.sleep(200); tries += 1 }
      val rows = spark.table("rate_probe").collect()
      assert(rows.nonEmpty, "rate source produced nothing in 10s")
      assert(rows.forall { r =>
        val n1 = r.getAs[Long]("num1"); val n2 = r.getAs[Long]("num2")
        n1 >= 0 && n1 < 100 && n2 >= 0 && n2 < 100
      })
    } finally q.stop()
  }
}
