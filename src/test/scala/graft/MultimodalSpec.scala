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

  test("frame sampling: frame lengths reassemble to payload size") {
    val frames = SparkEntry.queries("mm2_frame_sample")(spark, sf)
    val sums = frames.groupBy("doc_id").agg(sum("frame_len").as("tot"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).cast("long").as("n"))
    assert(sums.join(docs, "doc_id").filter(col("tot") =!= col("n")).count() == 0)
  }
}
