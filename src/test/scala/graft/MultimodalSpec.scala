package graft

import java.security.MessageDigest

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("decodeMedia is deterministic and sha256 matches an independent digest") {
    val a = Multimodal.decodeMedia(spark, tables).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeMedia(spark, tables).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "decode must be replay-deterministic")
    val text0 = tables.documents.filter("doc_id = 0").collect().head.getAs[String]("text")
    val expect = MessageDigest
      .getInstance("SHA-256")
      .digest(text0.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    assert(a.head.sha256 == expect)
    assert(a.head.n_bytes == text0.getBytes("UTF-8").length.toLong)
  }

  test("decode preserves upstream partitioning (parallelism is caller-controlled)") {
    import spark.implicits._
    val reparted = tables.documents
      .repartition(7)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text").cast("binary").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => Iterator.single(it.size))
    assert(reparted.collect().length == 7)
  }

  test("frame sampling emits every k-th frame with stable keys") {
    val rows = Multimodal.sampleFrames(spark, tables, everyK = 4).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, frames) =>
      val n    = frames.head.getLong(1)
      val idxs = frames.map(_.getLong(2)).sorted.toSeq
      assert(idxs == (0L until n by 4).toSeq, s"expected stride-4 of $n, got $idxs")
    }
    assert(rows.map(_.getString(3)).distinct.length == rows.length, "frame keys must be unique")
  }

  test("PQ embed buckets: codes are 16-bit, cover all frames, and surface cross-doc candidates") {
    val buckets = Multimodal.embedBuckets(tables).collect()
    assert(buckets.nonEmpty)
    buckets.foreach { b =>
      val code = b.getAs[Long]("bucket")
      assert(code >= 0 && code < (1 << 16), s"code out of 16-bit range: $code")
    }
    // every sampled frame lands in exactly one bucket
    val totalFrames = Multimodal.sampleFrames(spark, tables, everyK = 4).count()
    assert(buckets.map(_.getAs[Long]("n_frames")).sum == totalFrames)
    // with 2^16 codes and thousands of frames, some buckets must hold
    // frames from MULTIPLE docs — those are the near-dup candidates the
    // composition exists to surface
    assert(buckets.exists(_.getAs[Long]("n_docs") > 1), "no cross-doc candidates found")
  }

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"JDK must ship a $format writer")
    out.toByteArray
  }

  test("real PNG/JPEG bytes decode to their actual header dimensions") {
    val png = imageBytes(20, 10, "png")
    assert(Multimodal.decodeKernel(png) == ((20, 10, "png")))
    val jpg = imageBytes(33, 7, "jpeg")
    assert(Multimodal.decodeKernel(jpg) == ((33, 7, "jpeg")))
    // truncating the payload mid-header must fall back to the stub,
    // not fail the task
    val cut = png.take(12)
    val (w, h, fmt) = Multimodal.decodeKernel(cut)
    assert(w >= 16 && h >= 16 && Set("png", "jpeg", "webp")(fmt))
  }

  test("decodeBytes runs real images through the distributed mapPartitions path") {
    import spark.implicits._
    val media = Seq(
      (1L, imageBytes(64, 48, "png")),
      (2L, imageBytes(8, 8, "jpeg")),
      (3L, "not an image at all".getBytes("UTF-8"))
    ).toDF("doc_id", "media")
    val metas = Multimodal.decodeBytes(spark, media).collect().sortBy(_.doc_id)
    assert(metas(0).width == 64 && metas(0).height == 48 && metas(0).format == "png")
    assert(metas(1).width == 8 && metas(1).height == 8 && metas(1).format == "jpeg")
    // the non-image row takes the deterministic stub path alongside
    assert(metas(2).n_bytes == 19L && Set("png", "jpeg", "webp")(metas(2).format))
  }

  test("decode summary covers all stub formats with sane dimensions") {
    val rows = Multimodal.decodeSummary(spark, tables).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("png", "jpeg", "webp")))
    assert(rows.map(_.getAs[Long]("n")).sum == tables.documents.count())
    rows.foreach { r =>
      assert(r.getAs[Int]("min_w") >= 16 && r.getAs[Int]("max_w") < 16 + 640)
      assert(r.getAs[Int]("min_h") >= 16 && r.getAs[Int]("max_h") < 16 + 480)
    }
  }
}
