package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The container has no codec
  * libraries, so the DECODE step is a clearly-marked deterministic stub
  * (`decodeStub`) — but everything Spark-side is real and tested: the
  * binary schema, the batched per-partition processing shape (the Scala
  * analogue of mapInPandas: one iterator in, one iterator out, no
  * per-row setup cost), partitioning, and frame-sampling arithmetic.
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

  /** STUB decode: a real implementation would call an image codec here.
    * The stub derives deterministic fake dimensions + a real byte-mean
    * so the pipeline shape (batch iterator → features) is testable. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val n = r.payload.length.toLong
      // ??? — codec goes here; fake dims derived from byte length
      val width = (n % 64 + 1).toInt
      val height = (n / 64 % 64 + 1).toInt
      var s = 0L; var i = 0
      while (i < r.payload.length) { s += (r.payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else s.toDouble / n
      MediaFeatures(r.doc_id, n, width, height, 3, mean)
    }

  /** The mapPartitions pipeline over a binary payload column. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(decodeStub)
  }

  /** documents.text rendered as a binary payload (the test surrogate for
    * an image/audio blob column). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

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
  )
}
