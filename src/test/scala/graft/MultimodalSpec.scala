package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("binary payload pipeline: mapPartitions feature extraction preserves rows and computes real byte stats") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(spark, media)
    val docs = Tables.documents(spark, sf)
    assert(feats.count() == docs.count())
    // n_bytes matches the source text byte length (ASCII corpus)
    val joined = feats.toDF.join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("len")).count() == 0)
    // mean byte of ASCII text sits in the printable range
    val m = feats.agg(min("mean_byte"), max("mean_byte")).head
    assert(m.getDouble(0) > 32 && m.getDouble(1) < 127)
  }

  test("image decode round trip: png/bmp recover exact (w, h, 3, gray); gif recovers dims") {
    for (fmt <- Seq("png", "bmp"); (id, w, h) <- Seq((7L, 5, 9), (300L, 31, 1), (0L, 1, 1), (511L, 16, 16))) {
      val out = Multimodal.decodeImage(Iterator(
        Multimodal.MediaRow(id, Multimodal.syntheticImage(id, w, h, fmt)))).toList
      assert(out.size == 1, s"$fmt $id")
      val f = out.head
      assert(f.width == w && f.height == h, s"$fmt $id: ${f.width}x${f.height}")
      assert(f.channels == 3, s"$fmt $id: ${f.channels} bands")
      assert(f.mean_byte == (id % 256).toDouble, s"$fmt $id: mean ${f.mean_byte}")
    }
    // gif decodes palette-indexed: dimensions exact, band count 1
    val g = Multimodal.decodeImage(Iterator(
      Multimodal.MediaRow(9L, Multimodal.syntheticImage(9L, 12, 7, "gif")))).toList
    assert(g.size == 1 && g.head.width == 12 && g.head.height == 7)
    assert(g.head.channels == 1)
  }

  test("image decode: undecodable payloads are dropped, not fatal to the batch") {
    val good1 = Multimodal.MediaRow(1L, Multimodal.syntheticImage(1L, 3, 3))
    val good2 = Multimodal.MediaRow(2L, Multimodal.syntheticImage(2L, 4, 2, "bmp"))
    val junk = Multimodal.MediaRow(3L, Array.tabulate[Byte](64)(i => (i * 37).toByte))
    val truncated = Multimodal.MediaRow(4L, good1.payload.take(20)) // valid PNG magic, cut body
    val empty = Multimodal.MediaRow(5L, Array.emptyByteArray)
    val out = Multimodal.decodeImage(
      Iterator(good1, junk, good2, truncated, empty)).toList
    assert(out.map(_.doc_id) == List(1L, 2L),
      s"curation semantics: only decodable rows survive, got $out")
  }

  test("mm4 distributed lane: decode output is the encoded function of doc_id") {
    val out = SparkEntry.queries("mm4_image_decode")(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    assert(out.count() == docs) // every synthetic image decodes; none dropped
    val bad = out.filter(
      col("width") =!= (col("doc_id") % 31 + 1).cast("int") ||
      col("height") =!= (col("doc_id") % 17 + 1).cast("int") ||
      col("channels") =!= 3 ||
      col("mean_byte") =!= (col("doc_id") % 256).cast("double")).count()
    assert(bad == 0)
  }

  test("frame sampling: frame lengths reassemble to payload size") {
    val frames = SparkEntry.queries("mm2_frame_sample")(spark, sf)
    val sums = frames.groupBy("doc_id").agg(sum("frame_len").as("tot"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).cast("long").as("n"))
    assert(sums.join(docs, "doc_id").filter(col("tot") =!= col("n")).count() == 0)
  }

  /** The same gradient-bit arithmetic the mm5/d14 DuckDB oracles run. */
  private def predictedDHash(id: Long): Long = {
    def g(x: Long, y: Long): Long = ((id + 1) * (7 * x + 11 * y + 13)) % 256
    var bits = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (g(x + 1, y) > g(x, y)) bits |= 1L << (y * 8 + x)
    bits
  }

  test("dHash64: decoded pattern images hash to the arithmetic prediction at every scale") {
    for (id <- Seq(0L, 1L, 5L, 254L, 255L, 300L, 499L);
         scale <- Seq(1, 2, 3); fmt <- Seq("png", "bmp")) {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.syntheticPatternImage(id, scale, fmt)))
      assert(Multimodal.dHash64(im) == predictedDHash(id),
        s"id=$id scale=$scale fmt=$fmt")
    }
    // degenerate sizes don't crash: tiny images produce SOME stable hash
    val tiny = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    assert(Multimodal.dHash64(tiny) == Multimodal.dHash64(tiny))
  }

  test("dHashPairs: planted near-dup found with its distance, far image rejected") {
    import spark.implicits._
    val h = predictedDHash(42L)
    val near = h ^ (1L << 3) ^ (1L << 17)      // 2 bits flipped
    val far = ~h                               // 64 bits away
    val hashes = Seq((1L, h), (2L, near), (3L, far)).toDF("id", "dhash")
    val pairs = Multimodal.dHashPairs(hashes, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(pairs == Seq((1L, 2L, 2)), s"got $pairs")
  }

  test("d14 banding equals brute force: exact recall at maxDist < bands") {
    import spark.implicits._
    val media = Tables.documents(spark, sf).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRow(id, Multimodal.syntheticPatternImage(id,
        (id % 3 + 1).toInt, if (id % 2 == 0) "png" else "bmp"))).toDF()
    val hashes = Multimodal.imageDHashes(spark, media).localCheckpoint()
    val banded = Multimodal.dHashPairs(hashes, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    val a = hashes.select(col("id").as("d1"), col("dhash").as("h1"))
    val b = hashes.select(col("id").as("d2"), col("dhash").as("h2"))
    val brute = a.crossJoin(b).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("int").as("dist"))
      .filter(col("dist") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute,
      s"banding must be exact: missing ${brute -- banded}, extra ${banded -- brute}")
    assert(brute.nonEmpty, "test corpus should contain at least one near-dup pair")
  }

  test("curateImages: decode, dimension, exact-byte, and perceptual gates compose") {
    import spark.implicits._
    // ids 0 and 1 hash within Hamming 2 of each other; 5 is far from
    // both (measured in the dHash64 spec's arithmetic)
    val p5 = Multimodal.syntheticPatternImage(5L, 1)
    val media = Seq(
      (0L, Multimodal.syntheticPatternImage(0L, 1)),   // canonical of {0,1}
      (1L, Multimodal.syntheticPatternImage(1L, 2)),   // near-dup of 0
      (5L, p5),                                        // survivor
      (101L, p5),                                      // byte-copy of 5
      (300L, Array.tabulate[Byte](64)(i => (i * 37).toByte)), // junk
      (400L, Multimodal.syntheticImage(400L, 1, 1))    // 1×1 thumbnail
    ).toDF("doc_id", "payload")
    val (out, rep) = Multimodal.curateImages(media)
    assert(rep == Multimodal.ImageReport(6, 5, 4, 3, 2), rep.toString)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 5L), s"got $ids")
    // survivors carry the full payload-free profile
    assert(out.columns.toSet == Set("doc_id", "n_bytes", "width",
      "height", "channels", "mean_byte", "dhash", "payload_md5"))
  }

  test("audio: WAV round trip recovers header + exact frame features; junk and non-16-bit payloads drop; big-endian accepted") {
    import spark.implicits._
    import javax.sound.sampled._
    // header truth: the container really is 16 kHz mono 16-bit PCM LE
    val wav = Multimodal.syntheticWav(7L)
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val f = ais.getFormat
    assert(f.getSampleRate == 16000f && f.getChannels == 1 &&
      f.getSampleSizeInBits == 16 && !f.isBigEndian &&
      f.getEncoding == AudioFormat.Encoding.PCM_SIGNED)
    // decode lane vs direct per-frame reference over the raw PCM
    def ref(d: Long): Seq[(Long, Long, Long, Long, Double)] = {
      val xs = Multimodal.syntheticPcm(d).map(_.toInt)
      xs.grouped(Multimodal.AudioFrameLen).zipWithIndex.map {
        case (fr, i) =>
          val zc = fr.sliding(2).count(p =>
            p.length == 2 && ((p(0) < 0) != (p(1) < 0)))
          (i.toLong, fr.length.toLong, zc.toLong,
            fr.map(x => math.abs(x).toLong).sum,
            math.sqrt(fr.map(x => x.toLong * x).sum.toDouble / fr.length))
      }.toSeq
    }
    for (d <- Seq(0L, 1L, 4L, 7L)) { // covers tail-frame and no-tail docs
      val got = Multimodal.decodeAudio(Iterator(
        Multimodal.MediaRow(d, Multimodal.syntheticWav(d)))).toSeq
        .map(a => (a.frame_idx, a.n, a.zc, a.sum_abs, a.rms))
      assert(got == ref(d), s"doc $d")
    }
    // junk bytes and an 8-bit WAV both drop; the good row survives
    val eight = {
      val fmt8 = new AudioFormat(16000f, 8, 1, true, false)
      val body = Array.tabulate[Byte](64)(i => i.toByte)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(body), fmt8, 64L),
        AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val mixed = Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticWav(1L)),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(3L, eight))
    val surv = Multimodal.decodeAudio(mixed.iterator).map(_.doc_id).toSet
    assert(surv == Set(1L))
    // big-endian PCM containers decode to the same features
    val be = {
      val pcm = Multimodal.syntheticPcm(4L)
      val bytes = new Array[Byte](pcm.length * 2)
      pcm.indices.foreach { i =>
        bytes(2 * i) = ((pcm(i) >> 8) & 0xff).toByte
        bytes(2 * i + 1) = (pcm(i) & 0xff).toByte
      }
      val fmtBE = new AudioFormat(16000f, 16, 1, true, true)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmtBE, pcm.length.toLong),
        AudioFileFormat.Type.AIFF, baos)
      baos.toByteArray
    }
    val gotBE = Multimodal.decodeAudio(Iterator(
      Multimodal.MediaRow(4L, be))).toSeq
      .map(a => (a.frame_idx, a.n, a.zc, a.sum_abs, a.rms))
    assert(gotBE == ref(4L), "big-endian container must decode identically")
    // distributed shape: features only, payloads never in the output
    val media = Seq(1L, 2L).toDF("doc_id")
      .as[Long].map(id => Multimodal.MediaRow(id, Multimodal.syntheticWav(id)))
    val out = Multimodal.extractAudioFrames(spark, media.toDF())
    assert(out.columns.toSet ==
      Set("doc_id", "frame_idx", "n", "zc", "sum_abs", "rms"))
    // doc1: 784 samples → 4 frames; doc2: 1056 samples → 5 frames
    assert(out.count() == 9)
  }

  test("video: y4m round trip recovers header dims + exact frame lumas; truncated tail yields complete frames; junk and chroma formats drop") {
    // header truth + per-frame mean from the plane bytes
    def ref(d: Long): Seq[(Long, Int, Int, Double)] = {
      val w = (4 + d % 3).toInt; val h = (3 + d % 2).toInt
      (0 until (2 + d % 3).toInt).map { f =>
        val s = (for (y <- 0 until h; x <- 0 until w)
          yield ((d + 1) * (x + 7L * y + 13L * f) + 5) % 256).sum
        (f.toLong, w, h, s.toDouble / (w * h))
      }
    }
    for (d <- Seq(0L, 1L, 5L)) {
      val got = Multimodal.decodeVideo(Iterator(
        Multimodal.MediaRow(d, Multimodal.syntheticY4m(d)))).toSeq
        .map(v => (v.frame_idx, v.width, v.height, v.mean_luma))
      assert(got == ref(d), s"doc $d")
    }
    // truncated mid-frame: only the complete frames survive
    val full = Multimodal.syntheticY4m(2L) // 6x3 px, 4 frames
    val cut = full.take(full.length - 5)
    val gotCut = Multimodal.decodeVideo(Iterator(
      Multimodal.MediaRow(2L, cut))).toSeq
    assert(gotCut.size == ref(2L).size - 1, s"got ${gotCut.size}")
    assert(gotCut.map(v => (v.frame_idx, v.width, v.height, v.mean_luma))
      == ref(2L).dropRight(1))
    // junk and a chroma-subsampled header both drop
    val c420 = ("YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n" + "FRAME\n")
      .getBytes("US-ASCII") ++ Array.fill[Byte](24)(1)
    val mixed = Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticY4m(1L)),
      Multimodal.MediaRow(2L, Array[Byte](9, 9, 9)),
      Multimodal.MediaRow(3L, c420))
    assert(Multimodal.decodeVideo(mixed.iterator).map(_.doc_id).toSet
      == Set(1L))
    // per-frame params are legal y4m: "FRAME Ip\n" parses like "FRAME\n"
    val withParams = new String(Multimodal.syntheticY4m(1L), "ISO-8859-1")
      .replace("FRAME\n", "FRAME Ip\n").getBytes("ISO-8859-1")
    val gp = Multimodal.decodeVideo(Iterator(
      Multimodal.MediaRow(1L, withParams))).toSeq
      .map(v => (v.frame_idx, v.width, v.height, v.mean_luma))
    assert(gp == ref(1L), "frame params must not hide frames")
    // a hostile header (dims that overflow Int when multiplied) DROPS
    // instead of crashing the task
    val hostile = ("YUV4MPEG2 W50000 H50000 F25:1 Ip A1:1 Cmono\n" +
      "FRAME\n").getBytes("US-ASCII") ++ Array.fill[Byte](64)(7)
    assert(Multimodal.decodeVideo(Iterator(
      Multimodal.MediaRow(9L, hostile))).isEmpty)
  }
}
