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

  test("binary-file ingest: one file per doc, id from the name, bytes content-addressed") {
    val dirP = java.nio.file.Files.createTempDirectory("graft-binspec")
    try {
      val rows = Multimodal.binaryIngest(tables, dirP.toString).collect()
      val nDocs = tables.documents.count()
      assert(rows.length.toLong == nDocs, s"${rows.length} rows for $nDocs docs")
      val files = dirP.toFile.listFiles().filter(_.getName.endsWith(".bin"))
      assert(files.length.toLong == nDocs, "one .bin file per document")
      // independent pin: doc 0's sha256 recomputed from the FILE bytes
      val fileBytes = java.nio.file.Files.readAllBytes(dirP.resolve("doc_0.bin"))
      val expect = MessageDigest.getInstance("SHA-256").digest(fileBytes)
        .map("%02x".format(_)).mkString
      val row0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
      assert(row0.getAs[String]("sha256") == expect)
      assert(row0.getAs[Long]("n_bytes") == fileBytes.length.toLong)
    } finally deleteTree(dirP)
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

  test("resize kernel really scales PNG pixels into the fit box; stub passthrough for text") {
    import spark.implicits._
    // 100x50 → longest side 64 → 64x32, re-encoded PNG whose HEADER
    // confirms the new dimensions through the decode kernel
    val (w, h, nw, nh, out) = Multimodal.resizeKernel(imageBytes(100, 50, "png"), 64)
    assert((w, h, nw, nh) == ((100, 50, 64, 32)))
    assert(Multimodal.decodeKernel(out) == ((64, 32, "png")))
    // already-fits image passes through byte-identical (no generation loss)
    val small = imageBytes(20, 10, "png")
    val r2    = Multimodal.resizeKernel(small, 64)
    assert((r2._1, r2._2, r2._3, r2._4) == ((20, 10, 20, 10)) && (r2._5 eq small))
    // JPEG decodes and rescales through the same path
    val r3 = Multimodal.resizeKernel(imageBytes(128, 128, "jpeg"), 64)
    assert((r3._1, r3._2, r3._3, r3._4) == ((128, 128, 64, 64)))
    // distributed path over mixed payloads
    val media = Seq((1L, imageBytes(100, 50, "png")), (2L, "just words".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val rows = Multimodal.resizeBytes(spark, media).collect().sortBy(_.doc_id)
    assert(rows(0).new_w == 64 && rows(0).new_h == 32)
    assert(rows(1).n_bytes_out == 10L, "stub must pass bytes through unchanged")
  }

  private def wavBytes(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    val fmt  = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val pcm  = new Array[Byte](nFrames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong
    )
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio kernel parses real WAV headers; stub for text") {
    import spark.implicits._
    assert(Multimodal.audioKernel(wavBytes(16000f, 1, 320)) == ((true, 16000L, 1L, 320L)))
    assert(Multimodal.audioKernel(wavBytes(44100f, 2, 1000)) == ((true, 44100L, 2L, 1000L)))
    val text = "RIFF but not really a wave file, just words".getBytes("UTF-8")
    val (isAudio, rate, ch, frames) = Multimodal.audioKernel(text)
    assert(!isAudio && rate >= 8000 && ch >= 1 && frames == text.length.toLong)
    // distributed path
    val media = Seq((1L, wavBytes(8000f, 1, 100)), (2L, "hello".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val rows = Multimodal.audioBytes(spark, media).collect().sortBy(_.doc_id)
    assert(rows(0).is_audio && rows(0).sample_rate == 8000L && rows(0).frames == 100L)
    assert(!rows(1).is_audio)
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

  /** A smooth gradient whose dHash is stable under resize/re-encode;
    * `dir` flips the gradient so unrelated images are far in hamming.
    */
  private def gradientBytes(w: Int, h: Int, dir: Int, format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach { x =>
      (0 until h).foreach { y =>
        val v = if (dir > 0) (x * 255) / (w - 1) else 255 - (x * 255) / (w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out))
    out.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dhash: invariant under resize, far for reversed gradient, robust to a small edit") {
    val base = Multimodal.dhashKernel(gradientBytes(64, 64, 1))
    // rising gradient → every left<right comparison false → all-zero
    // pattern; the REVERSED gradient sets all 64 bits
    val reversed = Multimodal.dhashKernel(gradientBytes(64, 64, -1))
    assert(hamming(base, reversed) == 64, s"gradient direction must dominate the hash")
    // resize invariance: the same gradient at half size hashes equal —
    // that is the point of perceptual over cryptographic hashing
    val small = Multimodal.dhashKernel(gradientBytes(32, 32, 1))
    assert(hamming(base, small) == 0, s"resize changed the hash by ${hamming(base, small)} bits")
    // a small local edit (one bright square) flips few comparisons
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gradientBytes(64, 64, 1)))
    (28 until 36).foreach(x => (28 until 36).foreach(y => img.setRGB(x, y, 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val edited = Multimodal.dhashKernel(out.toByteArray)
    val d      = hamming(base, edited)
    assert(d > 0 && d <= 6, s"small edit moved $d bits — expected a handful")
  }

  test("phash pairs: banding join surfaces the near-dup image, not the unrelated one") {
    import spark.implicits._
    val media = Seq(
      (1L, gradientBytes(64, 64, 1)),
      (2L, gradientBytes(48, 48, 1)),   // same scene, different size → near-dup of 1
      (3L, gradientBytes(64, 64, -1)),  // reversed → unrelated
      (4L, "just some text payload".getBytes("UTF-8"))
    ).toDF("doc_id", "media")
    val pairs = Multimodal.phashPairs(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, hm) => a == 1L && b == 2L && hm <= 3 },
      s"resized twin not found in ${pairs.toSeq}")
    assert(!pairs.exists { case (a, b, _) => Set(a, b).contains(3L) },
      s"reversed gradient wrongly paired: ${pairs.toSeq}")
    // band recall argument: any pair ≤ 3 bits apart shares an intact
    // 16-bit band — verified brute-force on the fixture
    val hashes = Multimodal.perceptualHashes(spark, media).collect()
      .map(m => m.doc_id -> m.dhash).toMap
    for (a <- hashes.keys; b <- hashes.keys if a < b && hamming(hashes(a), hashes(b)) <= 3)
      assert(pairs.exists(p => p._1 == a && p._2 == b), s"banding missed ($a,$b)")
  }

  test("phash components equal a driver-side union-find over the gate's pair graph") {
    val pairs = Multimodal.phashPairsGate(spark, tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture produced no pairs — component spec is vacuous")
    // union-find replay
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(id => id -> find(id)).toMap
    val got = Multimodal.phashComponents(spark, tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-label propagation labels each component by its min member id;
    // path-compressed union-by-min does the same
    assert(got == expected, s"missing=${expected.keySet -- got.keySet} diff=${
      got.collect { case (k, v) if expected.get(k) != Some(v) => (k, v, expected.get(k)) }.take(5)}")
    // every twin pair is resolved into one group
    pairs.foreach { case (a, b) => assert(got(a) == got(b), s"pair ($a,$b) split across groups") }
  }
}
