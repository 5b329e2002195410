package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2 C12-C13): media as opaque
  * binary columns with typed metadata, plus decode/feature-extract
  * plumbing.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — everything around it (schema,
  * batch iteration, partitioning, no driver collect) is the real
  * production shape: swap [[decodeKernel]] for an actual codec and
  * nothing else changes.
  */
object Multimodal {

  /** A decoded media record. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      sha256: String,
      width: Int,
      height: Int,
      format: String
  )

  /** C12: binary column + typed metadata — byte length and
    * content-address (sha256). Text bytes stand in for media payloads;
    * the expressions are identical for real blobs.
    */
  def mediaMeta(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
      )
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        sha2(col("media"), 256).as("sha256")
      )
      .orderBy("doc_id")

  /** STUB decode kernel — deterministic fake standing in for an image
    * codec (no media libraries in this container). Derives stable
    * pseudo-dimensions from the payload bytes. Replace with a real
    * decoder (e.g. javax.imageio / ffmpeg bindings) in production.
    */
  private[operators] def decodeKernel(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    val w = 16 + (if (n > 0) (bytes(0) & 0xff) % 640 else 0)
    val h = 16 + (if (n > 1) (bytes(1) & 0xff) % 480 else 0)
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    (w, h, fmt)
  }

  /** C13: decode/feature-extract over binary media — mapPartitions so
    * a real codec amortizes per-partition init (the Scala analog of
    * mapInPandas batches), executor-side only, returns a typed
    * Dataset. Partition count is preserved: upstream repartitioning
    * controls decode parallelism.
    */
  def decodeMedia(spark: SparkSession, t: Tables): Dataset[MediaMeta] = {
    import spark.implicits._
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real codec handle)
        rows.map { case (id, bytes) =>
          val (w, h, fmt) = decodeKernel(bytes)
          val sha = java.security.MessageDigest
            .getInstance("SHA-256")
            .digest(bytes)
            .map("%02x".format(_))
            .mkString
          MediaMeta(id, bytes.length.toLong, sha, w, h, fmt)
        }
      }
  }

  /** Frame sampling over decoded media: every k-th frame of each
    * clip as its own row, with a content-derived frame fingerprint.
    * The frame count is a stub derived from payload size (a real
    * decoder reports it); the PLUMBING — explode a codegen'd
    * `sequence` per clip, never a lambda array, one row per sampled
    * frame — is the production shape for video pipelines.
    */
  def sampleFrames(spark: SparkSession, t: Tables, everyK: Int = 4): DataFrame = {
    import spark.implicits._
    decodeMedia(spark, t)
      .withColumn("n_frames", (col("n_bytes") % 64 + 1).cast("long"))
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong))).as("frame_idx")
      )
      .withColumn("frame_key", sha2(concat_ws(":", col("doc_id"), col("frame_idx")), 256))
      .orderBy("doc_id", "frame_idx")
  }

  /** C14b: the full multimodal curation composition — decode → frame
    * sample → featurize → coarse-quantize → bucket — i.e. the
    * product-quantization (PQ) front half every media dedup/ANN
    * pipeline runs. Each sampled frame gets an 8-dim feature vector
    * (here derived from the frame's content key — a real pipeline
    * plugs an encoder into exactly this column), each dimension is
    * quantized to 2 bits, and the packed 16-bit code is the bucket:
    * frames sharing a code are near-dup candidates.
    *
    * Everything is declarative (the stub frame arithmetic is the same
    * one multimodal_frames gate-verifies), so the WHOLE composition is
    * under the DuckDB hash gate — and the plan is one explode + one
    * shuffle on the bucket key, which at 100 TB of video is the same
    * bucket-join shape as the LSH/IVF text paths: candidates ∝ code
    * collisions, never all-pairs.
    */
  def embedBuckets(t: Tables, everyK: Int = 4): DataFrame = {
    val frames = t.documents
      .select(
        col("doc_id"),
        (length(col("text").cast("binary")) % 64 + 1).cast("long").as("n_frames")
      )
      .select(
        col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong))).as("frame_idx")
      )
      .withColumn("frame_key", sha2(concat_ws(":", col("doc_id"), col("frame_idx")), 256))
    val dims = (0 until 8).map(i =>
      conv(substring(col("frame_key"), 2 * i + 1, 2), 16, 10).cast("int").as(s"e$i")
    )
    val code = (0 until 8)
      .map(i => shiftleft(shiftright(col(s"e$i"), 6), 2 * i))
      .reduce(_ + _)
      .cast("long")
    frames
      .select((col("doc_id") +: dims): _*)
      .withColumn("bucket", code)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("min_doc")
      )
      .orderBy("bucket")
  }

  /** Decoded-media metadata as a query: stub dimensions + format
    * distribution. rows-only oracle (stub kernel isn't SQL), spec
    * asserts determinism and batch shape.
    */
  def decodeSummary(spark: SparkSession, t: Tables): DataFrame =
    decodeMedia(spark, t)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n"),
        min("width").as("min_w"),
        max("width").as("max_w"),
        min("height").as("min_h"),
        max("height").as("max_h")
      )
      .orderBy("format")
}
