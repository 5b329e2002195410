package graft

import java.nio.file.Files

import graft.sources.{ContentStore, ContentStoreWrite, StoreWriterFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.unsafe.types.UTF8String

/** The writable DSv2 connector's commit protocol: batch round trip,
  * zombie-attempt invisibility, epoch-replay idempotence, and the
  * writeStream path end to end.
  */
class ContentStoreSpec extends SparkSpecBase {

  private def tmp(): String = Files.createTempDirectory("graft-store").toString

  private def hconf            = spark.sessionState.newHadoopConf()
  private def sconf            = new org.apache.spark.util.SerializableConfiguration(hconf)
  private def factoryFor(dir: String) = new StoreWriterFactory(dir, 0, 1, sconf)

  private def readBack(dir: String): Set[(String, String)] =
    spark.read
      .format("graft.sources.ContentStore")
      .option("path", dir)
      .load()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet

  test("batch write + read back round-trips; appends accumulate") {
    import spark.implicits._
    val dir = tmp()
    val df = (1 to 100)
      .map(i => (s"add-key$i", s"payload $i with\ttabs and\nnewlines"))
      .toDF("result_key", "payload")
    df.write.format("graft.sources.ContentStore").option("path", dir).mode("append").save()
    val once = readBack(dir)
    assert(once.size == 100)
    assert(once.contains(("add-key7", "payload 7 with\ttabs and\nnewlines")))
    df.write.format("graft.sources.ContentStore").option("path", dir).mode("append").save()
    assert(
      spark.read.format("graft.sources.ContentStore").option("path", dir).load().count() == 200,
      "second append must add a second manifest"
    )
  }

  test("rows from a zombie task attempt are invisible to readers") {
    val dir     = tmp()
    val factory = factoryFor(dir)
    // attempt 1 writes rows, then the executor 'dies' (no commit)
    val zombie = factory.createWriter(0, 1L)
    zombie.write(InternalRow(UTF8String.fromString("k"), UTF8String.fromString("from-zombie")))
    // the retried attempt wins the commit coordinator and commits
    val winner = factory.createWriter(0, 2L)
    winner.write(InternalRow(UTF8String.fromString("k"), UTF8String.fromString("from-winner")))
    ContentStoreWrite.writeManifest(dir, "batch-test-0", Array(winner.commit()), hconf)
    zombie.abort()
    assert(readBack(dir) == Set(("k", "from-winner")))
  }

  test("replaying a committed streaming epoch is a no-op (exactly-once)") {
    val dir     = tmp()
    val factory = factoryFor(dir)
    val w1      = factory.createWriter(0, 1L, 7L)
    w1.write(InternalRow(UTF8String.fromString("k7"), UTF8String.fromString("v")))
    ContentStoreWrite.writeManifest(dir, "epoch-q-7", Array(w1.commit()), hconf, idempotent = true)
    // driver restarts and replays epoch 7: a fresh attempt rewrites the
    // same data and the sink sees a second commit for the same epoch
    val w2 = factory.createWriter(0, 2L, 7L)
    w2.write(InternalRow(UTF8String.fromString("k7"), UTF8String.fromString("v")))
    ContentStoreWrite.writeManifest(dir, "epoch-q-7", Array(w2.commit()), hconf, idempotent = true)
    assert(readBack(dir).size == 1, "epoch replay must not double rows")
    // and the replayed file must not linger as an orphan in data/
    val dataFiles = new java.io.File(s"$dir/data").list().filterNot(_.startsWith("."))
    assert(dataFiles.length == 1, s"replayed epoch left an orphan: ${dataFiles.toSeq}")
    // manifests commit via tmp-then-rename: no .tmp residue may remain
    // (.crc checksum sidecars are the local FileSystem's, not ours)
    val manifests = new java.io.File(s"$dir/_manifest").list()
    assert(manifests.forall(!_.contains(".tmp-")), s"temp manifest leaked: ${manifests.toSeq}")
  }

  test("writeStream lands micro-batches through epoch manifests") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val in  = MemoryStream[(String, String)]
    val q = in
      .toDF()
      .toDF("result_key", "payload")
      .writeStream
      .format("graft.sources.ContentStore")
      .option("path", dir)
      .option("checkpointLocation", tmp())
      .start()
    in.addData(("a", "1"), ("b", "2"))
    q.processAllAvailable()
    in.addData(("c", "3"))
    q.processAllAvailable()
    q.stop()
    assert(readBack(dir) == Set(("a", "1"), ("b", "2"), ("c", "3")))
    assert(ContentStore.committedFiles(dir).nonEmpty)
  }

  test("readStream tails the manifest log exactly-once across restarts") {
    import spark.implicits._
    val dir  = tmp()
    val ckpt = tmp()

    def writeBatch(rows: (String, String)*): Unit =
      rows.toSeq
        .toDF("result_key", "payload")
        .write
        .format("graft.sources.ContentStore")
        .option("path", dir)
        .mode("append")
        .save()

    val outDir = tmp()
    def drain(): Set[(String, String)] = {
      // file sink: the one sink that RESUMES from a checkpoint, so each
      // drain is a restart of the same logical query
      val q = spark.readStream
        .format("graft.sources.ContentStore")
        .option("path", dir)
        .load()
        .writeStream
        .format("json")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read
        .schema("result_key STRING, payload STRING")
        .json(outDir)
        .as[(String, String)]
        .collect()
        .toSet
    }

    writeBatch("a" -> "1", "b" -> "2")
    writeBatch("c" -> "3")
    assert(drain() == Set("a" -> "1", "b" -> "2", "c" -> "3"))

    // two more commits land while the reader is down; the restarted
    // reader (same checkpoint) must pick up ONLY the new manifests —
    // the cumulative sink grows to exactly five rows: nothing
    // replayed, nothing skipped
    writeBatch("d" -> "4")
    writeBatch("e" -> "5")
    assert(drain() == Set("a" -> "1", "b" -> "2", "c" -> "3", "d" -> "4", "e" -> "5"))

    // nothing new → an AvailableNow drain terminates without appending
    assert(drain().size == 5)
  }

  test("streaming relay: problem stream writes epochs, a second query tails them") {
    // the handoff the streaming read exists for: pipeline A's epochs
    // become pipeline B's micro-batches, with the store as the
    // exactly-once boundary between two independent queries
    val dir = tmp()
    val producer = graft.streaming.KinesisLikePipeline
      .addAnswers(
        graft.streaming.KinesisLikePipeline.decodeEnvelope(
          spark.readStream
            .format("graft.sources.ProblemSource")
            .option("numRows", 100)
            .option("rowsPerBatch", 25)
            .load()
        ),
        keyCol = "seq"
      )
      .select(
        org.apache.spark.sql.functions.col("result_key"),
        org.apache.spark.sql.functions.col("answer").as("payload")
      )
      .writeStream
      .format("graft.sources.ContentStore")
      .option("path", dir)
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    producer.awaitTermination()
    assert(ContentStore.manifestNames(dir, hconf).size == 4, "expected one manifest per epoch")

    val consumer = spark.readStream
      .format("graft.sources.ContentStore")
      .option("path", dir)
      .load()
      .writeStream
      .format("memory")
      .queryName("relay_out")
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    consumer.awaitTermination()
    val rows = spark.table("relay_out").collect()
    assert(rows.length == 100)
    assert(rows.map(_.getString(0)).distinct.length == 100, "content keys must be unique")
    assert(rows.forall(_.getString(1).matches("\\d+ \\+ \\d+ = \\d+")))
  }

  test("streaming offsets are an order-independent manifest set (JSON round trip)") {
    import graft.sources.StoreOffset
    val o = StoreOffset(Vector("epoch-q-10", "batch-x-2", "epoch-q-2"))
    assert(StoreOffset.fromJson(o.json()).manifests.toSet == o.manifests.toSet)
    assert(StoreOffset.fromJson(StoreOffset(Vector.empty).json()).manifests.isEmpty)
    // a manifest sorting BEFORE the high-water mark is still new data:
    // the set diff catches what a prefix counter would skip
    val seen = StoreOffset.fromJson(o.json()).manifests.toSet
    assert(!seen.contains("batch-a-1"), "UUID-keyed batch manifest sorts first yet must be unseen")
  }
}
