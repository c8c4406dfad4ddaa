package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. Decode is REAL for all three
  * kinds: the JDK ships PNG/BMP/GIF codecs (`javax.imageio`) behind
  * [[decodeImage]], WAV parsing (`javax.sound.sampled`) behind the
  * mm6 audio-frame lane, and the Y4M video container parses from
  * bytes behind mm7 — each round-trip-tested against synthetically
  * encoded payloads. `decodeStub` remains only as the explicitly-fake
  * template for payload kinds with no JVM codec (it backs no query
  * lane). Everything Spark-side is shared and tested either way: the
  * binary schema, the batched per-partition processing shape (the
  * Scala analogue of mapInPandas: one iterator in, one iterator out,
  * no per-row setup cost), partitioning, and frame-sampling
  * arithmetic.
  *
  * At 100 TB payloads dominate row width — the rules encoded here:
  * never shuffle payload columns (drop/meta-project before any join),
  * decode per-partition with bounded batch memory, and carry only
  * extracted features forward.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int, mean_byte: Double)

  /** STUB decode (audio/video lane — no JVM codec): deterministic fake
    * dimensions + a real byte-mean so the pipeline shape (batch
    * iterator → features) stays testable for payload kinds
    * [[decodeImage]] cannot read. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val n = r.payload.length.toLong
      // codec goes here for non-image media; fake dims from byte length
      val width = (n % 64 + 1).toInt
      val height = (n / 64 % 64 + 1).toInt
      var s = 0L; var i = 0
      while (i < r.payload.length) { s += (r.payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else s.toDouble / n
      MediaFeatures(r.doc_id, n, width, height, 3, mean)
    }

  /** REAL image decode, pure JVM (`javax.imageio` — PNG/BMP/GIF ship
    * with the JDK): dimensions and band count from the decoded raster,
    * mean over every sample of every band. Rows no installed codec
    * accepts are DROPPED — curation semantics: undecodable media is
    * filtered, countable as input-minus-output. Runs inside one
    * partition task; payload bytes never cross a shuffle. */
  def decodeImage(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.flatMap { r =>
      // NonFatal, not just IOException: codecs throw RuntimeExceptions
      // (array/index errors) on crafted or truncated headers, and one
      // bad payload must be dropped, not fail the whole partition task
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        val raster = im.getRaster
        val bands = raster.getNumBands
        var s = 0L; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, bands,
          s.toDouble / (w.toLong * h * bands))
      }
    }

  /** Deterministic test/oracle image: a `w`×`h` 3-band image filled
    * with the constant gray `docId % 256`, encoded through a REAL
    * codec (`fmt` = png | bmp | gif). Decoding a png/bmp must recover
    * exactly (w, h, 3, gray) — the round trip the mm4 oracle checks;
    * gif decodes palette-indexed (1 band, index samples), so only its
    * dimensions round-trip exactly (spec-asserted). */
  def syntheticImage(docId: Long, w: Int, h: Int,
      fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = (docId % 256).toInt
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) {
      var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, baos),
      s"no JVM codec writes $fmt")
    baos.toByteArray
  }

  /** Deterministic CONTENT image for the perceptual-hash lane: a
    * (9·scale)×(8·scale) 3-band image of scale×scale constant-gray
    * blocks, block (X,Y) holding `((docId+1)·(7X + 11Y + 13)) mod 256`.
    * Lossless codecs (png/bmp) make every decoded pixel a pure function
    * of (docId, X, Y), and the 9×8 box-average downsample recovers the
    * block values EXACTLY — so [[dHash64]] over the decoded raster is
    * arithmetic the mm5/d14 oracles predict without decoding anything
    * (same trick as mm4's constant-gray round trip, extended to real
    * image content so the hash has bit diversity). */
  def syntheticPatternImage(docId: Long, scale: Int,
      fmt: String = "png"): Array[Byte] = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val img = new java.awt.image.BufferedImage(9 * scale, 8 * scale,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var yy = 0
    while (yy < 8 * scale) {
      var xx = 0
      while (xx < 9 * scale) {
        val g = (((docId + 1) * (7L * (xx / scale) + 11L * (yy / scale) + 13L))
          % 256).toInt
        img.setRGB(xx, yy, (g << 16) | (g << 8) | g)
        xx += 1
      }
      yy += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, baos),
      s"no JVM codec writes $fmt")
    baos.toByteArray
  }

  /** 64-bit dHash (difference hash) of a decoded image: box-average
    * the luma plane down to a 9×8 grid, then bit (y·8 + x) is set iff
    * cell (x+1, y) is brighter than cell (x, y) — the horizontal
    * gradient signature. Robust to uniform rescaling (the property the
    * scale-1-vs-3 spec pins) and to small pixel noise; 64 bits pack
    * into one long so banding and Hamming verification are integer
    * arithmetic, never image bytes. Luma = (299R + 587G + 114B)/1000,
    * so a gray image's luma IS its gray value — what makes the
    * synthetic oracle exact. */
  def dHash64(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth; val h = im.getHeight
    val grid = Array.ofDim[Double](9, 8)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9
        val x1 = math.min(w, math.max(x0 + 1, (gx + 1) * w / 9))
        val y0 = gy * h / 8
        val y1 = math.min(h, math.max(y0 + 1, (gy + 1) * h / 8))
        var s = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = im.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        grid(gx)(gy) = s.toDouble / (1000.0 * (x1 - x0) * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L; var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(x + 1)(y) > grid(x)(y)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Per-document perceptual hashes from REAL decode: (id, dhash).
    * Undecodable payloads drop, like [[decodeImage]]. Payload bytes
    * stay inside the partition task — only (id, 8-byte hash) rows come
    * out, which is what every downstream stage shuffles. */
  def imageDHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        Option(img).map(im => (r.doc_id, dHash64(im)))
      }).toDF("id", "dhash")
  }

  /** Near-duplicate image pairs by dHash Hamming distance ≤ `maxDist`,
    * via Hamming-ball banding — d5's SimHash machinery applied to the
    * image lane. The 64-bit hash splits into `bands` equal slices; two
    * hashes within distance < bands share at least one identical slice
    * (pigeonhole), so bucketing on (slice index, slice value) has
    * EXACT recall for maxDist ≤ bands−1 — this is not approximate.
    * Shuffle carries only (band long, id); hot buckets (many identical
    * images) split through [[graft.operators.Skew.boundedSelfPairs]]
    * so no task enumerates more than maxBucket² candidates. Verify is
    * one integer XOR+popcount per candidate pair. Output: (d1 < d2,
    * dist), exactly the brute-force pair set. */
  def dHashPairs(hashes: DataFrame, maxDist: Int = 3,
      bands: Int = 4, maxBucket: Int = 1024): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist < bands,
      s"exact recall needs maxDist < bands (got $maxDist >= $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // band value in the low bits, band INDEX above them — one long key
    val banded = hashes.select(col("id"),
      explode(array((0 until bands).map(b =>
        shiftrightunsigned(col("dhash"), b * width).bitwiseAND(lit(mask))
          + lit(b.toLong << (width + 1))): _*)).as("bh"))
      .repartition(col("bh"))
    val cand = graft.operators.Skew
      .boundedSelfPairs(banded, "bh", "id", maxBucket)
      .select("d1", "d2").distinct()
    cand
      .join(hashes.select(col("id").as("d1"), col("dhash").as("h1")), Seq("d1"))
      .join(hashes.select(col("id").as("d2"), col("dhash").as("h2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** One decoded row of the fused profile pass: byte features, raster
    * features, the perceptual hash, and the exact-byte digest — every
    * signal the image-curation pipeline needs, produced in ONE decode
    * so the payload is read (and decoded) exactly once. */
  case class MediaProfile(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int, mean_byte: Double, dhash: Long,
      payload_md5: String)

  /** Fused decode: [[decodeImage]]'s features + [[dHash64]] + the
    * payload md5, one codec invocation per row; undecodable rows drop.
    * Output rows are payload-free (~60 bytes) — this is the boundary
    * where a 100 TB image corpus becomes a shuffle-sized table. */
  def decodeProfile(rows: Iterator[MediaRow]): Iterator[MediaProfile] =
    rows.flatMap { r =>
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        val raster = im.getRaster
        val bands = raster.getNumBands
        var s = 0L; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString
        MediaProfile(r.doc_id, r.payload.length.toLong, w, h, bands,
          s.toDouble / (w.toLong * h * bands), dHash64(im), digest)
      }
    }

  def imageProfiles(spark: SparkSession, media: DataFrame): Dataset[MediaProfile] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(decodeProfile)
  }

  /** Per-stage survivor counts of one [[curateImages]] run. */
  final case class ImageReport(input: Long, decoded: Long,
      afterDims: Long, afterExact: Long, afterNear: Long)

  /** End-to-end image-corpus curation — the multimodal sibling of
    * [[Curate.curate]]: decode gate (undecodable payloads drop) →
    * dimension gate (thumbnails/trackers below `minWidth`×`minHeight`
    * drop) → exact byte dedup (payload md5, smallest id survives) →
    * perceptual near-dedup (dHash pairs at Hamming ≤ `maxDist` via
    * exact pigeonhole banding → connected components → the component's
    * min id survives). Returns the surviving profile rows (payload-
    * free: join payloads back by doc_id if needed) + the report.
    *
    * Scale shape: payloads are decoded once and never shuffled — the
    * single decode pass emits ~60-byte profile rows, and that slim
    * table is what the dedup stages (and the one localCheckpoint that
    * keeps four downstream actions from re-decoding the corpus)
    * operate on. Near-dup discovery shuffles (band, id) pairs only;
    * hot buckets are task-bounded. */
  def curateImages(media: DataFrame, minWidth: Int = 2, minHeight: Int = 2,
      maxDist: Int = 3, bands: Int = 4, maxBucket: Int = 1024)
      : (DataFrame, ImageReport) = {
    val spark = media.sparkSession
    val input = media.count()
    val prof = imageProfiles(spark, media).toDF().localCheckpoint()
    val decoded = prof.count()
    val dims = prof.filter(col("width") >= minWidth &&
      col("height") >= minHeight)
    val afterDims = dims.count()
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy("payload_md5").orderBy("doc_id")
    val exact = dims
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(wEx))
      .filter(col("rk") === 1).drop("rk")
    val afterExact = exact.count()
    val pairs = dHashPairs(
      exact.select(col("doc_id").as("id"), col("dhash")),
      maxDist, bands, maxBucket)
    val losers = Dedup.connectedComponents(pairs.select("d1", "d2"))
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val out = exact.join(losers, Seq("doc_id"), "left_anti")
    val afterNear = out.count()
    (out, ImageReport(input, decoded, afterDims, afterExact, afterNear))
  }

  /** The mapPartitions pipeline over a binary payload column (stub
    * lane — arbitrary payloads). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(decodeStub)
  }

  /** The same pipeline through the REAL image codec. */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(decodeImage)
  }

  /** documents.text rendered as a binary payload (the test surrogate for
    * an image/audio blob column). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  // ── audio lane ──────────────────────────────────────────────────────
  // REAL codec here too: the JDK ships a RIFF/WAV reader+writer
  // (`javax.sound.sampled`, headless-safe), so the audio lane parses
  // actual WAV containers — format fields come from the decoded header,
  // samples from the PCM body — not from trusting the synthesizer.
  // Features are the speech-pipeline front-end's first stage (VAD /
  // silence trimming / quality gating before any model): per-frame
  // zero-crossing count, absolute-amplitude sum, RMS energy. The float
  // contract is the cheapest in the repo: zc/sum_abs are exact integer
  // arithmetic; rms is ONE correctly-rounded IEEE division feeding ONE
  // correctly-rounded IEEE sqrt (the sp7 precedent) — bit-identical in
  // any engine, round(6) purely defensive.

  /** One frame's features. `n` = samples in the frame (tail frames are
    * short), `zc` = sign changes between consecutive samples WITHIN the
    * frame, `sum_abs` = Σ|x|, `rms` = √(Σx²/n). */
  case class AudioFrame(doc_id: Long, frame_idx: Long, n: Long,
      zc: Long, sum_abs: Long, rms: Double)

  /** Samples per analysis frame (mirrors mm2's 256-byte video frames). */
  val AudioFrameLen = 256

  /** Deterministic test/oracle PCM: doc `d` holds
    * 512 + (d%3)·256 + (d%5)·16 samples with
    * x_i = ((d+1)(7i+13) + i²) mod 65536 − 32768 — 16-bit range by
    * construction, sign-diverse (so zc is nontrivial), and pure
    * arithmetic DuckDB replays without any codec. */
  def syntheticPcm(docId: Long): Array[Short] = {
    val n = (512 + (docId % 3) * 256 + (docId % 5) * 16).toInt
    Array.tabulate(n) { i =>
      (((docId + 1) * (7L * i + 13) + i.toLong * i) % 65536 - 32768).toShort
    }
  }

  /** [[syntheticPcm]] sealed in a REAL WAV container (16 kHz mono
    * 16-bit signed little-endian PCM) through the JDK's RIFF writer. */
  def syntheticWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = syntheticPcm(docId)
    val bytes = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      bytes(2 * i) = (pcm(i) & 0xff).toByte
      bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode + frame featurization, per-partition batch shape
    * (the decodeImage contract): parse the WAV container via the JDK's
    * `AudioSystem`, take format truth from the HEADER (16-bit signed
    * PCM only — the synthesizer's format, and the common interchange
    * format; anything else or unparseable is DROPPED, curation
    * semantics), then one pass over the samples per frame. Payload
    * bytes never cross a shuffle — only frame features leave the
    * partition. */
  def decodeAudio(rows: Iterator[MediaRow]): Iterator[AudioFrame] =
    rows.flatMap { r =>
      import javax.sound.sampled._
      val parsed =
        try {
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val f = ais.getFormat
          if (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16 && f.getChannels == 1)
            Some((ais.readAllBytes(), f.isBigEndian))
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed.toSeq.flatMap { case (body, bigEndian) =>
        val n = body.length / 2
        val pcm = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = body(2 * i) & 0xff; val hi = body(2 * i + 1) & 0xff
          pcm(i) =
            if (bigEndian) ((body(2 * i) << 8) | (body(2 * i + 1) & 0xff))
            else ((body(2 * i + 1) << 8) | lo)
          i += 1
        }
        (0 until (n + AudioFrameLen - 1) / AudioFrameLen).map { f =>
          val lo = f * AudioFrameLen
          val hi = math.min(lo + AudioFrameLen, n)
          var zc = 0L; var sumAbs = 0L; var sumSq = 0L
          var j = lo
          while (j < hi) {
            val x = pcm(j)
            if (j > lo && ((pcm(j - 1) < 0) != (x < 0))) zc += 1
            sumAbs += math.abs(x)
            sumSq += x.toLong * x
            j += 1
          }
          val cnt = hi - lo
          AudioFrame(r.doc_id, f.toLong, cnt.toLong, zc, sumAbs,
            math.sqrt(sumSq.toDouble / cnt))
        }
      }
    }

  /** The audio pipeline: (doc_id, payload) → per-frame features. */
  def extractAudioFrames(spark: SparkSession,
      media: DataFrame): Dataset[AudioFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(decodeAudio)
  }

  // ── video lane ──────────────────────────────────────────────────────
  // REAL container here too: YUV4MPEG2 (y4m) is the raw-frame
  // mezzanine format video tooling interchanges (a plain-text header +
  // uncompressed planes) — parseable with zero codecs, which is
  // exactly the tier a JVM-only engine can own. Compressed codecs
  // (h264 et al.) stay behind [[decodeStub]]; a production deployment
  // swaps that one function for a JNI/ffmpeg binding while every
  // Spark-side contract in this file (batch iterator shape, payload
  // never shuffles, features-only output) is already exercised by the
  // real y4m path.

  /** One decoded video frame's features: dimensions from the HEADER,
    * mean luma over the frame's plane from the BODY. */
  case class VideoFrame(doc_id: Long, frame_idx: Long, width: Int,
      height: Int, mean_luma: Double)

  /** Deterministic test/oracle clip: a Cmono y4m with
    * w = 4+(d mod 3), h = 3+(d mod 2), 2+(d mod 3) frames, and
    * luma(f, y, x) = ((d+1)(x + 7y + 13f) + 5) mod 256 — header and
    * every plane byte a pure function of doc_id, so frame features
    * are arithmetic DuckDB replays without parsing anything. */
  def syntheticY4m(docId: Long): Array[Byte] = {
    val w = (4 + docId % 3).toInt; val h = (3 + docId % 2).toInt
    val frames = (2 + docId % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n"
      .getBytes("US-ASCII"))
    for (f <- 0 until frames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out.write((((docId + 1) * (x + 7L * y + 13L * f) + 5) % 256).toInt)
          x += 1
        }
        y += 1
      }
    }
    out.toByteArray
  }

  /** REAL y4m parse + frame featurization, per-partition batch shape:
    * dimensions come from the container HEADER (W/H tags; only the
    * codec-free Cmono layout is owned — C420 et al. would need chroma
    * plane math this lane doesn't claim), frames from the FRAME-
    * delimited planes. Truncated tails yield their complete frames
    * only; unparseable payloads drop (curation semantics). */
  def decodeVideo(rows: Iterator[MediaRow]): Iterator[VideoFrame] =
    rows.flatMap { r =>
      val header =
        try {
          val nl = r.payload.indexOf('\n'.toByte)
          if (nl < 0) None
          else {
            val line = new String(r.payload, 0, nl, "US-ASCII")
            val tags = line.split(" ")
            if (!line.startsWith("YUV4MPEG2") ||
              !tags.exists(_ == "Cmono")) None
            else for {
              w <- tags.find(_.startsWith("W")).map(_.drop(1).toInt)
              h <- tags.find(_.startsWith("H")).map(_.drop(1).toInt)
              // corrupt/hostile headers must DROP, not crash the task:
              // w·h beyond the payload can't hold one frame anyway, and
              // bounding it here keeps every later index in safe Int
              // range (a 50000×50000 header would overflow w*h)
              if w > 0 && h > 0 && w.toLong * h <= r.payload.length
            } yield (w, h, nl + 1)
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      header.toSeq.flatMap { case (w, h, body) =>
        val marker = "FRAME".getBytes("US-ASCII")
        val plane = w * h
        // frame header = "FRAME" + optional per-frame params up to the
        // newline (legal y4m — tools emit e.g. "FRAME Ip\n")
        def frameBodyStart(pos: Int): Option[Int] =
          if (pos + marker.length > r.payload.length ||
            !marker.indices.forall(i => r.payload(pos + i) == marker(i)))
            None
          else {
            var i = pos + marker.length
            while (i < r.payload.length && r.payload(i) != '\n'.toByte)
              i += 1
            if (i < r.payload.length) Some(i + 1) else None
          }
        Iterator.unfold((body, 0L)) { case (pos, idx) =>
          frameBodyStart(pos) match {
            case Some(start) if start.toLong + plane <= r.payload.length =>
              var s = 0L; var i = 0
              while (i < plane) { s += (r.payload(start + i) & 0xff); i += 1 }
              Some((VideoFrame(r.doc_id, idx, w, h, s.toDouble / plane),
                (start + plane, idx + 1)))
            case _ => None
          }
        }.toSeq
      }
    }

  /** The video pipeline: (doc_id, payload) → per-frame features. */
  def extractVideoFrames(spark: SparkSession,
      media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(decodeVideo)
  }

  val all: Seq[Q] = Seq(
    // MM1 — binary metadata extraction (payload stays columnar; only
    // byte-level metadata is computed — no decode in the oracle path)
    Q("mm1_binary_meta",
      Some("""SELECT doc_id,
             |  cast(octet_length(encode(text)) as bigint) AS n_bytes,
             |  cast(octet_length(encode(text)) % 64 + 1 as bigint) AS fake_width,
             |  cast(octet_length(encode(text)) // 64 % 64 + 1 as bigint) AS fake_height
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("n_bytes"),
          (col("n_bytes") % 64 + 1).as("fake_width"),
          (floor(col("n_bytes") / 64) % 64 + 1).as("fake_height"))
        .orderBy("doc_id")),

    // MM2 — frame sampling: fixed 256-byte frames per payload, exploded
    // to (doc, frame) grain — the video-frame fan-out shape
    Q("mm2_frame_sample",
      Some("""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |SELECT doc_id, unnest(range(0, (n + 255) // 256)) AS frame_idx,
             |       least(256, n - unnest(range(0, (n + 255) // 256)) * 256) AS frame_len
             |FROM m ORDER BY doc_id, frame_idx""".stripMargin),
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("n"))
        .select(col("doc_id"), col("n"),
          // empty payload → zero frames (sequence(0,-1) would descend)
          explode(when(col("n") > 0,
            sequence(lit(0L), (floor((col("n") + 255) / 256) - 1).cast("long")))
            .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          least(lit(256L), col("n") - col("frame_idx") * 256).as("frame_len"))
        .orderBy("doc_id", "frame_idx"))
    ,

    // MM3 — ViT patch-grid arithmetic: how many 16×16 patches (and
    // transformer tokens, +1 for CLS) each image contributes — the
    // per-row token-budget math a vision-model ingest runs BEFORE any
    // decode. Pure metadata arithmetic over the mm1 fake dims,
    // map-side only; at scale this is the column that drives sp4-style
    // shard packing for image batches.
    Q("mm3_patch_grid",
      Some("""WITH m AS (SELECT doc_id,
             |  octet_length(encode(text)) % 64 + 1 AS w,
             |  octet_length(encode(text)) // 64 % 64 + 1 AS h
             |FROM documents)
             |SELECT doc_id,
             |  cast((w + 15) // 16 AS BIGINT) AS patches_x,
             |  cast((h + 15) // 16 AS BIGINT) AS patches_y,
             |  cast(((w + 15) // 16) * ((h + 15) // 16) + 1 AS BIGINT) AS seq_len
             |FROM m ORDER BY doc_id""".stripMargin),
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("n"))
        .select(col("doc_id"),
          (col("n") % 64 + 1).as("w"),
          (floor(col("n") / 64) % 64 + 1).as("h"))
        .select(col("doc_id"),
          floor((col("w") + 15) / 16).cast("long").as("patches_x"),
          floor((col("h") + 15) / 16).cast("long").as("patches_y"))
        .withColumn("seq_len",
          (col("patches_x") * col("patches_y") + 1).cast("long"))
        .orderBy("doc_id"))
    ,

    // MM4 — REAL image decode round trip, oracle-checked: each doc_id
    // deterministically encodes a (doc_id%31+1)×(doc_id%17+1) constant-
    // gray image through a real JVM codec (png/bmp alternating), and
    // the decode lane recovers the dimensions, band count, and mean
    // sample from the BYTES. Lossless codecs make the output a pure
    // function of doc_id, so DuckDB predicts it arithmetically without
    // decoding anything — a true hash-checked oracle over a decode
    // path the oracle engine cannot run. Encode+decode stay inside one
    // partition task; no payload crosses a shuffle.
    Q("mm4_image_decode",
      Some("""SELECT doc_id,
             |  cast(doc_id % 31 + 1 AS INT) AS width,
             |  cast(doc_id % 17 + 1 AS INT) AS height,
             |  cast(3 AS INT) AS channels,
             |  cast(doc_id % 256 AS DOUBLE) AS mean_byte
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        val media = T.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaRow(id, syntheticImage(id,
            (id % 31 + 1).toInt, (id % 17 + 1).toInt,
            if (id % 2 == 0) "png" else "bmp")))
        extractImageFeatures(s, media.toDF())
          .select(col("doc_id"), col("width"), col("height"),
            col("channels"), col("mean_byte"))
          .orderBy("doc_id")
      }),

    // MM5 — perceptual hash (dHash) through REAL decode, oracle-checked:
    // each doc_id encodes a 9s×8s block-pattern image (s = id%3+1,
    // png/bmp alternating) whose decoded 9×8 box-average grid is the
    // pure function ((id+1)(7X+11Y+13)) mod 256 — so the 64 gradient
    // bits are integer arithmetic DuckDB computes without any codec.
    // Emitted as two 32-bit halves (lo = bits 0..31, hi = 32..63): both
    // exact in a signed BIGINT, which one 2^63 term would not be.
    Q("mm5_image_dhash",
      Some("""WITH b AS (
             |  SELECT doc_id, x, y,
             |    CASE WHEN ((doc_id+1)*(7*(x+1) + 11*y + 13)) % 256 >
             |              ((doc_id+1)*(7*x + 11*y + 13)) % 256
             |         THEN 1 ELSE 0 END AS bit
             |  FROM documents, range(0, 8) tx(x), range(0, 8) ty(y))
             |SELECT doc_id,
             |  cast(sum(CASE WHEN y < 4 THEN bit * (1::BIGINT << (y*8+x))
             |                ELSE 0 END) AS BIGINT) AS dhash_lo,
             |  cast(sum(CASE WHEN y >= 4 THEN bit * (1::BIGINT << ((y-4)*8+x))
             |                ELSE 0 END) AS BIGINT) AS dhash_hi
             |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        val media = T.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaRow(id, syntheticPatternImage(id,
            (id % 3 + 1).toInt, if (id % 2 == 0) "png" else "bmp")))
        imageDHashes(s, media.toDF())
          .select(col("id").as("doc_id"),
            col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"),
            shiftrightunsigned(col("dhash"), 32).as("dhash_hi"))
          .orderBy("doc_id")
      }),

    // D14 — image near-dup pairs: dHash Hamming ≤ 3 via 4-band
    // pigeonhole banding (exact recall at this distance — the banded
    // result IS the brute-force set, which is what lets DuckDB's
    // all-pairs oracle hash-match it). The scale path is the banding:
    // shuffle carries (16-bit band, id) only, hot buckets split by
    // boundedSelfPairs; the oracle's O(n²) join exists only oracle-side.
    Q("d14_image_neardup",
      Some("""WITH b AS (
             |  SELECT doc_id, x, y,
             |    CASE WHEN ((doc_id+1)*(7*(x+1) + 11*y + 13)) % 256 >
             |              ((doc_id+1)*(7*x + 11*y + 13)) % 256
             |         THEN 1 ELSE 0 END AS bit
             |  FROM documents, range(0, 8) tx(x), range(0, 8) ty(y)),
             |h AS (
             |  SELECT doc_id,
             |    cast(sum(CASE WHEN y < 4 THEN bit * (1::BIGINT << (y*8+x))
             |                  ELSE 0 END) AS BIGINT) AS lo,
             |    cast(sum(CASE WHEN y >= 4 THEN bit * (1::BIGINT << ((y-4)*8+x))
             |                  ELSE 0 END) AS BIGINT) AS hi
             |  FROM b GROUP BY doc_id)
             |SELECT a.doc_id AS d1, c.doc_id AS d2,
             |  cast(bit_count(xor(a.lo, c.lo)) +
             |       bit_count(xor(a.hi, c.hi)) AS INT) AS dist
             |FROM h a JOIN h c ON a.doc_id < c.doc_id
             |WHERE bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi)) <= 3
             |ORDER BY d1, d2""".stripMargin),
      (s, d) => {
        import s.implicits._
        val media = T.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaRow(id, syntheticPatternImage(id,
            (id % 3 + 1).toInt, if (id % 2 == 0) "png" else "bmp")))
        dHashPairs(imageDHashes(s, media.toDF()), maxDist = 3)
          .orderBy("d1", "d2")
      }),

    // D15 — image near-dup CLUSTER RESOLUTION: d8's connected
    // components over d14's pairs, so the full image-dedup composition
    // (decode → dHash → banding → components → canonical) is
    // oracle-checked end to end. DuckDB rebuilds the components with a
    // recursive CTE over the arithmetic pair set; Spark runs the
    // pointer-halving propagation over the banded pairs. Docs in no
    // pair are their own (absent) cluster — both sides emit only
    // paired docs, the d8 convention.
    Q("d15_image_components",
      Some("""WITH RECURSIVE b AS (
             |  SELECT doc_id, x, y,
             |    CASE WHEN ((doc_id+1)*(7*(x+1) + 11*y + 13)) % 256 >
             |              ((doc_id+1)*(7*x + 11*y + 13)) % 256
             |         THEN 1 ELSE 0 END AS bit
             |  FROM documents, range(0, 8) tx(x), range(0, 8) ty(y)),
             |h AS (
             |  SELECT doc_id,
             |    cast(sum(CASE WHEN y < 4 THEN bit * (1::BIGINT << (y*8+x))
             |                  ELSE 0 END) AS BIGINT) AS lo,
             |    cast(sum(CASE WHEN y >= 4 THEN bit * (1::BIGINT << ((y-4)*8+x))
             |                  ELSE 0 END) AS BIGINT) AS hi
             |  FROM b GROUP BY doc_id),
             |pairs AS (
             |  SELECT a.doc_id AS d1, c.doc_id AS d2
             |  FROM h a JOIN h c ON a.doc_id < c.doc_id
             |  WHERE bit_count(xor(a.lo, c.lo)) +
             |        bit_count(xor(a.hi, c.hi)) <= 3),
             |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
             |          UNION SELECT d2, d1 FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach(id, m) AS (
             |  SELECT id, id FROM nodes
             |  UNION
             |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.id)
             |SELECT id AS doc_id, cast(min(m) as bigint) AS canonical_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        val media = T.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaRow(id, syntheticPatternImage(id,
            (id % 3 + 1).toInt, if (id % 2 == 0) "png" else "bmp")))
        Dedup.connectedComponents(
          dHashPairs(imageDHashes(s, media.toDF()), maxDist = 3)
            .select("d1", "d2"))
          .select(col("id").as("doc_id"),
            col("comp").cast("long").as("canonical_id"))
          .orderBy("doc_id")
      }),

    // MM6 — REAL audio decode round trip, oracle-checked: each doc_id
    // synthesizes deterministic 16-bit PCM, seals it in a real WAV
    // container (JDK RIFF writer), and the decode lane re-parses the
    // container and computes per-frame zero-crossings / Σ|x| / RMS
    // from the BODY bytes. The samples are pure arithmetic of
    // (doc_id, i), so DuckDB predicts every feature without a codec —
    // mm4's trick, extended to the audio modality. zc/sum_abs are
    // exact integers; rms is one IEEE division + one IEEE sqrt.
    Q("mm6_audio_frames",
      Some(s"""WITH d AS (SELECT doc_id,
              |    512 + (doc_id % 3) * 256 + (doc_id % 5) * 16 AS ns
              |  FROM documents),
              |idx AS (SELECT doc_id, unnest(range(0, ns)) AS i FROM d),
              |s AS (SELECT doc_id, i,
              |        ((doc_id + 1) * (7 * i + 13) + i * i) % 65536
              |          - 32768 AS x,
              |        i // $AudioFrameLen AS frame_idx
              |      FROM idx),
              |p AS (SELECT *, lag(x) OVER (PARTITION BY doc_id, frame_idx
              |        ORDER BY i) AS prev FROM s)
              |SELECT doc_id, frame_idx,
              |  cast(count(*) AS BIGINT) AS n,
              |  cast(sum(CASE WHEN prev IS NOT NULL
              |                 AND ((prev < 0) != (x < 0))
              |                THEN 1 ELSE 0 END) AS BIGINT) AS zc,
              |  cast(sum(abs(x)) AS BIGINT) AS sum_abs,
              |  round(sqrt(cast(sum(x * x) AS DOUBLE) / count(*)), 6) AS rms
              |FROM p GROUP BY doc_id, frame_idx
              |ORDER BY doc_id, frame_idx""".stripMargin),
      (s, d) => {
        import s.implicits._
        val media = T.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaRow(id, syntheticWav(id)))
        extractAudioFrames(s, media.toDF())
          .toDF()
          .withColumn("rms", round(col("rms"), 6))
          .orderBy("doc_id", "frame_idx")
      }),

    // MM7 — REAL video-container parse, oracle-checked: each doc_id
    // synthesizes a Cmono YUV4MPEG2 clip (raw mezzanine frames — the
    // codec-free tier a JVM engine can own) and the decode lane
    // re-parses the container: dimensions from the header tags, frame
    // boundaries from the FRAME markers, mean luma from the plane
    // bytes. Every byte is arithmetic of (doc_id, f, y, x), so DuckDB
    // predicts all of it parser-free — mm4/mm6's trick on the third
    // modality. Completes the triple: image = real JDK codec, audio =
    // real RIFF/WAV container, video = real y4m container.
    Q("mm7_video_frames",
      Some("""WITH d AS (SELECT doc_id, 4 + (doc_id % 3) AS w,
             |    3 + (doc_id % 2) AS h, 2 + (doc_id % 3) AS nf
             |  FROM documents),
             |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM d),
             |yy AS (SELECT doc_id, w, h, fi, unnest(range(0, h)) AS y FROM f),
             |px AS (SELECT doc_id, w, h, fi, y,
             |         unnest(range(0, w)) AS x FROM yy)
             |SELECT doc_id, fi AS frame_idx,
             |  cast(w AS INT) AS width, cast(h AS INT) AS height,
             |  round(cast(sum(((doc_id + 1) * (x + 7 * y + 13 * fi) + 5)
             |      % 256) AS DOUBLE) / (w * h), 6) AS mean_luma
             |FROM px GROUP BY doc_id, fi, w, h
             |ORDER BY doc_id, frame_idx""".stripMargin),
      (s, d) => {
        import s.implicits._
        val media = T.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaRow(id, syntheticY4m(id)))
        extractVideoFrames(s, media.toDF())
          .toDF()
          .withColumn("mean_luma", round(col("mean_luma"), 6))
          .orderBy("doc_id", "frame_idx")
      })
  )
}
