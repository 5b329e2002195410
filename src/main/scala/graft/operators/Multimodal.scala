package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2 C12-C13): media as opaque
  * binary columns with typed metadata, plus decode/feature-extract
  * plumbing.
  *
  * The decode kernel is REAL for images: payloads carrying a PNG or
  * JPEG signature are decoded with the JDK's own `javax.imageio`
  * readers (header-only — width/height/format come from the container
  * metadata without materializing pixels), which ship in every JRE and
  * are headless-safe. GIF/BMP are deliberately NOT sniffed (see
  * `looksLikeImage` — their magics are printable ASCII). Everything
  * else (the synthetic text corpus, GIF/BMP, audio/video containers
  * this JDK has no codec for) falls through to a clearly-marked
  * deterministic stub, so the surrounding plumbing — schema, batch
  * iteration, partitioning, no driver collect — exercises the exact
  * production shape either way: plug an ffmpeg-style binding into
  * [[decodeKernel]]'s fallback and nothing else changes.
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

  /** C12b: raw media FILES through Spark's `binaryFile` source — the
    * ingest path real multimodal pipelines start from (a directory of
    * image/audio blobs, one row per file with path/length/content),
    * where every other multimodal op here starts from an
    * already-ingested binary COLUMN. One deterministic .bin file per
    * document is materialized executor-side (fixture generator — the
    * corpus ships parquet; a production lake already HAS the files),
    * then `format("binaryFile")` scans them and the typed metadata is
    * recomputed from the file CONTENT — matching the original-table
    * oracle proves the file write→scan cycle byte-lossless, the
    * serialization-matrix discipline applied to raw blobs.
    *
    * Scale shape: the binaryFile scan parallelizes per file (driver
    * lists paths — bounded by file count, the content-store manifest
    * rule), content never shuffles before the narrow (id, length,
    * sha256) projection, and the id comes from the file NAME so the
    * join back to catalog metadata is a pure column parse, no lookup.
    */
  def binaryIngest(t: Tables): DataFrame =
    binaryIngestFrom(t, sharedBinaryFixture(t))

  /** [[binaryIngest]] over an explicit landing directory — writes a
    * fresh fixture there; specs use it for isolated runs.
    */
  def binaryIngest(t: Tables, dir: String): DataFrame = {
    writeBinaryFixture(t, dir)
    binaryIngestFrom(t, dir)
  }

  private def binaryIngestFrom(t: Tables, dir: String): DataFrame =
    binaryMetaProjection(
      t.spark.read
        .format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(dir)
    ).orderBy("doc_id")

  /** One fixture directory per corpus per JVM (the StreamReplay
    * slice-cache rule): the .bin files are a pure function of the
    * documents table, so the batch ingest, the streaming drain, and
    * repeat bench iterations all read ONE write — at sf0.1 that is
    * 5000 small-file creations saved per extra reader.
    */
  private val fixtureDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def sharedBinaryFixture(t: Tables): String =
    fixtureDirs.computeIfAbsent(
      t.dir,
      _ => {
        val d = graft.operators.Ingest.scratchDir("graft-binfiles")
        writeBinaryFixture(t, d)
        d
      }
    )

  /** The deterministic one-.bin-per-doc fixture writer shared by the
    * batch and streaming binaryFile ingest drains.
    */
  private[graft] def writeBinaryFixture(t: Tables, dir: String): Unit =
    t.documents
      .select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          // content is deterministic but truncate+write is not atomic:
          // a task retry / speculative duplicate interleaving with the
          // first writer could expose a torn file. Stage under a
          // per-attempt temp name and rename into place — last full
          // write wins, readers never see a partial.
          val target = java.nio.file.Paths.get(dir, s"doc_${r.getLong(0)}.bin")
          val tmp = java.nio.file.Paths
            .get(dir, s".doc_${r.getLong(0)}.${java.util.UUID.randomUUID()}.tmp")
          java.nio.file.Files.write(tmp, r.getString(1).getBytes("UTF-8"))
          try
            java.nio.file.Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            // with ATOMIC_MOVE the other copy options are ignored and
            // replace-on-exists is implementation-specific (POSIX
            // rename replaces; other filesystems may throw or report
            // access-denied) — a loser racing an identical
            // deterministic write just stands down. Standing down is
            // legitimate ONLY when the target really exists; an
            // AccessDenied with no target is a genuine permission
            // failure that must fail the task, not silently drop the
            // blob from the landed corpus.
            case e @ (_: java.nio.file.FileAlreadyExistsException |
                _: java.nio.file.AccessDeniedException) =>
              if (!java.nio.file.Files.exists(target)) throw e
              java.nio.file.Files.deleteIfExists(tmp): Unit
          }
        }
      }

  /** C12c: the media blobs landed at ARCHIVE granularity — the
    * documented fix for [[binaryIngest]]'s one-object-per-record shape
    * (and its streaming sibling's measured ~2 ms/FILE admission): the
    * same blobs ride a ContentStore as K-blobs-per-data-file epochs,
    * so listing, admission and manifest bookkeeping are paid per
    * ARCHIVE, not per blob. Metadata is recomputed from the stored
    * CONTENT (byte length + sha256), so matching the original-table
    * oracle proves the archive write→scan cycle byte-lossless exactly
    * as the per-file key does — same oracle, 1/K the small-object
    * overhead. At 10⁹ blobs this is the difference between a listable
    * store and an unlistable one (the reference pays the per-object
    * cost on every S3 put — adder-labma/adder.go:58-76).
    */
  def archiveIngest(t: Tables): DataFrame =
    archiveMetaProjection(
      t.spark.read
        .format("graft.sources.ContentStore")
        .option("path", sharedArchiveStore(t))
        .load()
    ).orderBy("doc_id")

  /** Blobs per archive data file. 256 at gate scale keeps the store
    * multi-archive overall (sf0.001's 500 docs land as 4 single-
    * archive epochs — ceil(125/256) = 1 per epoch; sf0.01+ also go
    * multi-archive WITHIN an epoch); production sizes archives to
    * ~100 MB-1 GB. */
  val BlobsPerArchive = 256

  /** One archive store per corpus per JVM (the [[sharedBinaryFixture]]
    * rule), written as [[StreamReplay]]-compatible EPOCHS: 4 manifest
    * commits, each repartitioned so a task data file carries ~
    * [[BlobsPerArchive]] blobs — the batch read, the streaming tail,
    * and repeat bench iterations all read the ONE write.
    */
  private val archiveDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def sharedArchiveStore(t: Tables): String = {
    // the cache key is the corpus DIR — an overridden documents frame
    // cached under it would be served for later base-corpus reads
    // (the sharedBaseIndex rule)
    require(t.docsOverride.isEmpty, "sharedArchiveStore requires the on-disk corpus")
    archiveDirs.computeIfAbsent(
      t.dir,
      _ => {
        val d      = graft.operators.Ingest.scratchDir("graft-archives")
        val epochs = 4
        val n      = t.documents.count()
        val perEpoch    = (n + epochs - 1) / epochs
        val numArchives = math.max(1L, (perEpoch + BlobsPerArchive - 1) / BlobsPerArchive).toInt
        for (e <- 0 until epochs)
          t.documents
            .filter(pmod(col("doc_id"), lit(epochs)) === e)
            .select(
              concat(lit("doc-"), col("doc_id")).as("result_key"),
              col("text").as("payload")
            )
            .repartition(numArchives)
            .write
            .format("graft.sources.ContentStore")
            .option("path", d)
            .mode("append")
            .save()
        d
      }
    )
  }

  /** Typed-metadata projection over a ContentStore archive scan (batch
    * or stream): id parsed from the blob KEY, byte length and sha256
    * recomputed from the stored payload's UTF-8 bytes — the archive
    * twin of [[binaryMetaProjection]], same output contract.
    */
  private[graft] def archiveMetaProjection(scan: DataFrame): DataFrame =
    scan.select(
      regexp_extract(col("result_key"), "^doc-(\\d+)$", 1).cast("long").as("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256")
    )

  /** Typed-metadata projection over a binaryFile scan (batch or
    * stream): id parsed from the file name, byte length, sha256
    * content address — pure column work, no lookup.
    */
  private[graft] def binaryMetaProjection(scan: DataFrame): DataFrame =
    scan.select(
      regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
      col("length").as("n_bytes"),
      sha2(col("content"), 256).as("sha256")
    )

  /** Decode kernel: real `javax.imageio` header decode for payloads
    * whose magic bytes say image; deterministic stub for everything
    * else. The magic check runs FIRST so non-image bytes (the gate's
    * text corpus) never enter ImageIO — the gate result is a pure
    * function of the bytes either way.
    */
  private[graft] def decodeKernel(bytes: Array[Byte]): (Int, Int, String) =
    if (looksLikeImage(bytes)) decodeImageHeader(bytes).getOrElse(stubDecode(bytes))
    else stubDecode(bytes)

  /** Image signatures the JDK ships readers for, restricted to magics
    * whose FIRST byte cannot begin UTF-8 text: PNG (\x89PNG) and JPEG
    * (FFD8FF). GIF ("GIF8") and BMP ("BM") are deliberately excluded —
    * both are printable-ASCII prefixes, so a text document starting
    * "BMW…" would sail past a magic check into the BMP reader and come
    * back with garbage header dimensions instead of the deterministic
    * stub the oracle expects. PNG/JPEG misdetection is structurally
    * impossible on any text corpus.
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)

  /** Header-only image decode via the JRE's ImageIO readers:
    * width/height come from the container header (`reader.getWidth(0)`
    * never decodes pixel data), so malformed or truncated payloads
    * cost O(header) and fall back to the stub instead of failing the
    * task. Headless-safe — no AWT display is touched.
    */
  private def decodeImageHeader(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
    // the factory defaults to a FileCache stream (one tmpdir file
    // created and deleted PER PAYLOAD — per-row disk I/O in the decode
    // hot path, and a hard failure on a read-only tmpdir); the bytes
    // are already in memory
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes)
    )
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, /* seekForwardOnly = */ true, /* ignoreMetadata = */ true)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } catch {
          case _: Exception => None // truncated/corrupt header → stub
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Deterministic STUB for non-image payloads (this JDK has no
    * audio/video codecs): stable pseudo-dimensions derived from the
    * payload bytes. Replace with an ffmpeg-style binding in
    * production; the mapPartitions shape above is already the right
    * place to amortize that codec's init.
    */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, String) = {
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
  def decodeMedia(spark: SparkSession, t: Tables): Dataset[MediaMeta] =
    decodeBytes(spark, t.documents.select(col("doc_id"), col("text").cast("binary").as("media")))

  /** The decode pipeline over any `(doc_id LONG, media BINARY)` frame —
    * the entry point a real media table uses (and the spec feeds
    * generated PNG/JPEG bytes through).
    */
  def decodeBytes(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
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

  /** A resized media record. `n_bytes_out` is the re-encoded payload
    * size — deterministic for stub passthrough; encoder-specific for
    * real images (the spec checks those, the gate corpus has none).
    */
  final case class ResizedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      new_w: Int,
      new_h: Int,
      n_bytes_out: Long
  )

  /** Fit-to-box target dimensions in pure integer arithmetic (floor
    * division — no float rounding to drift between engines): identity
    * when the image already fits, else scaled so max(w,h) == maxDim.
    */
  private[graft] def fitBox(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
  }

  /** Resize kernel: REAL pixel resize for PNG/JPEG payloads — full
    * `ImageIO.read`, Graphics2D bilinear scale into the fit-box, PNG
    * re-encode — and stub passthrough (dims scaled by the same integer
    * arithmetic, bytes untouched) for everything else. An image that
    * already fits is passed through byte-identical: no decode-reencode
    * generation loss for the common thumbnail-already case.
    */
  private[graft] def resizeKernel(bytes: Array[Byte], maxDim: Int): (Int, Int, Int, Int, Array[Byte]) = {
    def stub = {
      val (w, h, _) = stubDecode(bytes)
      val (nw, nh)  = fitBox(w, h, maxDim)
      (w, h, nw, nh, bytes)
    }
    if (!looksLikeImage(bytes)) stub
    else {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) stub
        else {
          val (w, h)   = (img.getWidth, img.getHeight)
          val (nw, nh) = fitBox(w, h, maxDim)
          if ((nw, nh) == ((w, h))) (w, h, nw, nh, bytes)
          else {
            val out = new java.awt.image.BufferedImage(nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g   = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
            )
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            (w, h, nw, nh, buf.toByteArray)
          }
        }
      } catch { case _: Exception => stub }
    }
  }

  /** Resize over any `(doc_id, media)` frame — same mapPartitions
    * batch shape as [[decodeBytes]], executor-side only.
    */
  def resizeBytes(spark: SparkSession, media: DataFrame, maxDim: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, nw, nh, out) = resizeKernel(bytes, maxDim)
        ResizedMedia(id, w, h, nw, nh, out.length.toLong)
      })
  }

  /** C13b gate query: resize dimensions per document (stub arithmetic
    * for the text corpus ⇒ full SQL oracle; real images exercised by
    * the spec through the same kernel).
    */
  def resizeDims(spark: SparkSession, t: Tables, maxDim: Int = 64): DataFrame =
    resizeBytes(spark, t.documents.select(col("doc_id"), col("text").cast("binary").as("media")), maxDim)
      .toDF()
      .orderBy("doc_id")

  /** A decoded audio record. */
  /** A doc's 64-bit perceptual hash. */
  final case class MediaHash(doc_id: Long, dhash: Long)

  /** Difference-hash (dHash) bit pack: 8 rows × 8 left-vs-right
    * comparisons over a 9×8 intensity grid → bits 0..63 (bit y·8+x set
    * iff grid(x,y) > grid(x+1,y)). Shared by the real-image and stub
    * paths so both produce the same bit layout.
    */
  private def packGrid(grid: (Int, Int) => Int): Long = {
    var bits = 0L
    var y    = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(x, y) > grid(x + 1, y)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Stub dHash for opaque payloads: the SAME 9×8 comparison structure
    * over unsigned bytes sampled evenly from the payload
    * (sample k = bytes[⌊k·n/72⌋]) — deterministic, total, and (for the
    * gate's ASCII corpus) reproducible in portable SQL, so the whole
    * kernel→hash path is hash-verified even though the real pixel leg
    * only runs on images.
    */
  private def stubDhash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) 0L
    else packGrid((x, y) => bytes((((y * 9 + x).toLong * n) / 72L).toInt) & 0xff)
  }

  /** C38: perceptual hash kernel — dHash over the 9×8 bilinear-scaled
    * LUMA grid for real images (the classic near-dup signature for
    * media: robust to re-encode, resize and small edits, 64 bits per
    * asset regardless of size), byte-sampled stub otherwise. Same
    * decode guards as [[decodeKernel]].
    */
  private[graft] def dhashKernel(bytes: Array[Byte]): Long =
    if (!looksLikeImage(bytes)) stubDhash(bytes)
    else {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) stubDhash(bytes)
        else {
          val sc = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g  = sc.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
          )
          g.drawImage(img, 0, 0, 9, 8, null)
          g.dispose()
          packGrid { (x, y) =>
            val rgb = sc.getRGB(x, y)
            (((rgb >> 16) & 255) * 299 + ((rgb >> 8) & 255) * 587 + (rgb & 255) * 114) / 1000
          }
        }
      } catch { case _: Exception => stubDhash(bytes) }
    }

  /** Perceptual hashes over a `(doc_id, media)` frame — the
    * [[decodeBytes]] mapPartitions shape (codec init amortized,
    * executor-side, partitioning preserved).
    */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MediaHash(id, dhashKernel(bytes)) })
  }

  /** C38 gate view: dHash of every document payload (text bytes take
    * the stub leg — same plumbing, SQL-reproducible).
    */
  def perceptualHashTable(spark: SparkSession, t: Tables): DataFrame =
    perceptualHashes(
      spark,
      t.documents.select(col("doc_id"), col("text").cast("binary").as("media"))
    ).orderBy("doc_id").toDF()

  /** C38b: perceptual near-dup pairs — assets within `maxHamming` bits
    * of each other, candidate-generated by pigeonhole banding on the
    * 64-bit hash (4 × 16-bit bands: any pair with hamming ≤ 3 shares
    * at least one intact band, so recall is EXACT at the default
    * threshold — the [[graft.operators.Dedup.simhashPairs]] argument
    * applied to media). Self-join is shuffle_hash for the one-exchange
    * ReusedExchange plan; never all-pairs.
    */
  def phashPairs(spark: SparkSession, media: DataFrame, maxHamming: Int = 3): DataFrame =
    phashPairsRaw(spark, media, maxHamming).orderBy("doc_a", "doc_b")

  /** [[phashPairs]] without the gate-facing output sort — for
    * consumers like the component resolution whose next step is a
    * shuffle that destroys order anyway.
    */
  private def phashPairsRaw(spark: SparkSession, media: DataFrame, maxHamming: Int): DataFrame = {
    val hashes = perceptualHashes(spark, media).toDF()
    val bands = hashes.select(
      col("doc_id"),
      col("dhash"),
      posexplode(expr("transform(sequence(0, 3), b -> (dhash >> (b * 16)) & 65535)"))
        .as(Seq("band_idx", "band_key"))
    )
    bands
      .as("a")
      .join(
        bands.as("b").hint("shuffle_hash"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        bit_count(expr("a.dhash ^ b.dhash")).cast("long").as("hamming")
      )
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** C38b's gate surface: [[phashPairs]] over the corpus PLUS a
    * deterministic near-dup fixture — the synthetic corpus has no
    * hamming-≤3 media pairs (spot-checked 0 at sf0.001/sf0.01), so,
    * like [[graft.operators.Dedup.containmentPairs]]'s quote fixture,
    * every doc_id % 37 == 0 document gets a twin with ONE character
    * substituted at its midpoint, id negated (collision-free at any
    * corpus size). A single in-place byte edit perturbs at most the
    * grid cells that sample it, so twins land within the banded
    * threshold and the pair surface is non-vacuous; the oracle
    * replays fixture, hash, and hamming join exactly.
    */
  def phashPairsGate(spark: SparkSession, t: Tables): DataFrame =
    phashPairs(spark, twinMedia(t))

  /** The C38b twin corpus as a media frame — shared by the pair gate
    * and the component resolution so the fixture rule cannot drift.
    */
  private def twinMedia(t: Tables): DataFrame = {
    val mutated = t.documents
      .filter(col("doc_id") % 37 === 0)
      .select(
        (-col("doc_id") - 1L).as("doc_id"),
        concat(
          expr("substring(text, 1, greatest(cast(length(text)/2 as int), 1) - 1)"),
          lit("z"),
          expr("substring(text, greatest(cast(length(text)/2 as int), 1) + 1)")
        ).as("text")
      )
    t.documents
      .select(col("doc_id"), col("text"))
      .unionAll(mutated)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
  }

  /** C38c: media duplicate GROUPS — connected components over the
    * perceptual near-dup pair graph, what an image/video dedup
    * actually ships (pairs under-merge: re-encode chains A≈B≈C must
    * collapse to one asset even when A's and C's hashes drift past
    * the pairwise threshold). The resolution loop is
    * [[graft.operators.Dedup.componentsFromPairs]] verbatim —
    * pointer-jumping min-label propagation, O(log diameter) rounds —
    * over [[phashPairsGate]]'s banded hamming edges (corpus + the
    * midpoint-mutation twins, so the group surface is non-vacuous).
    */
  def phashComponents(spark: SparkSession, t: Tables): DataFrame = {
    // the raw (unsorted) pair pipeline: the component loop's first step
    // is a shuffle, so the gate-facing output sort would be pure waste
    val pairs = phashPairsRaw(spark, twinMedia(t), maxHamming = 3)
      .select("doc_a", "doc_b")
      .localCheckpoint()
    graft.operators.Dedup.contractedComponents(pairs, df => df.localCheckpoint())
  }

  final case class AudioMeta(
      doc_id: Long,
      is_audio: Boolean,
      sample_rate: Long,
      channels: Long,
      frames: Long
  )

  /** RIFF/WAVE container signature: "RIFF" at 0 AND "WAVE" at 8 — both
    * checked, so natural text (which would need the exact 12-byte
    * header layout) cannot misroute; a false positive would still fail
    * header validation inside AudioSystem and fall back to the stub.
    */
  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Audio metadata kernel: REAL header parse via the JDK's own
    * `javax.sound.sampled` (WAV/AIFF readers ship in every JRE —
    * sample rate, channels, frame count from the fmt chunk, no PCM
    * materialized); deterministic stub for non-audio payloads.
    */
  private[graft] def audioKernel(bytes: Array[Byte]): (Boolean, Long, Long, Long) = {
    def stub = {
      val n = bytes.length
      (false, 8000L + (n % 3) * 4000L, 1L + n % 2, n.toLong)
    }
    if (!looksLikeWav(bytes)) stub
    else {
      try {
        val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes)
        )
        val fmt = ff.getFormat
        (true, fmt.getSampleRate.toLong, fmt.getChannels.toLong, ff.getFrameLength.toLong)
      } catch { case _: Exception => stub }
    }
  }

  /** C13c: audio metadata over any `(doc_id, media)` frame. */
  def audioBytes(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (isAudio, rate, ch, frames) = audioKernel(bytes)
        AudioMeta(id, isAudio, rate, ch, frames)
      })
  }

  def audioMeta(spark: SparkSession, t: Tables): DataFrame =
    audioBytes(spark, t.documents.select(col("doc_id"), col("text").cast("binary").as("media")))
      .toDF()
      .orderBy("doc_id")

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
    * distribution. The stub arm's byte arithmetic is expressible in
    * SQL, so this is hash-gated on the text-bytes corpus; the REAL
    * image-decode arm is spec territory (generated PNG/JPEG fixtures).
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
