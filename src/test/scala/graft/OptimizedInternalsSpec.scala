package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 optimization internals, pinned against the shapes they
  * replaced — each rewrite claims bit-identical results; these specs
  * hold the old and new forms side by side so a future edit cannot
  * drift one without the other (the end-to-end oracle rows would also
  * catch it, but only through the specific bench corpus).
  */
class OptimizedInternalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat the cat came back"),
      (2L, "vector stream merge vector stream merge vector"),
      (3L, "a b c d e f g h i j k l m n o p"),
      (4L, "repeat repeat repeat repeat repeat repeat repeat repeat"),
      (5L, "solo"),
      (6L, "  leading and trailing   whitespace   collapse test  "),
      (7L, "ünïcode tökens mixed WITH case And 123 456 789 0 x y")
    ).toDF("doc_id", "text")
  }

  test("SimHash32 ≡ the explode + weighted-vote aggregate it replaced") {
    // the OLD d5 pipeline, verbatim: explode occurrences, weight per
    // (doc, token), hv = first 8 md5 hex chars as long, ±w votes per
    // bit, assemble — the shape the fused native expression must
    // reproduce exactly (votes are occurrence-additive)
    val tokenHash = (tk: org.apache.spark.sql.Column) =>
      conv(substring(md5(tk), 1, 8), 16, 10).cast("long")
    val weighted = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("w"))
      .select(col("doc_id"), col("w"), tokenHash(col("tk")).as("hv"))
    val bitCols = (0 until 32).map(j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(1) === 1, col("w"))
        .otherwise(-col("w"))).as(s"b$j"))
    val assembled = (0 until 32)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val old = weighted.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"), assembled.cast("long").as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val fused = docs.select(col("doc_id"),
        graft.functions.VectorFunctions.simhash32(spark,
          split(trim(col("text")), "\\s+")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(fused == old, s"fused $fused != reference $old")
  }

  test("row-local gram dedup ≡ explode-then-distinct, per doc") {
    val n = 3 // 3-grams keep even the short docs in play
    val old = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"),
        explode(operators.Dedup.shingles(col("ts"), n)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val local = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"),
        operators.Dedup.sortedGramDigests(col("ts"), n).as("shs"))
      .select(col("doc_id"),
        explode(operators.Dedup.adjacentDistinct(col("shs"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // same SET per doc, and the local form emits each digest ONCE
    assert(local.toSet == old)
    assert(local.length == local.distinct.length,
      "adjacentDistinct left a repeated digest in one row")
  }

  test("adjacentDistinct emits sorted, exactly-once digests per row") {
    import spark.implicits._
    val row = Seq((1L, Seq("b", "a", "c", "a", "b", "a")))
      .toDF("id", "xs")
      .select(col("id"), array_sort(col("xs")).as("s"))
      .select(operators.Dedup.adjacentDistinct(col("s")).as("d"))
      .first().getSeq[String](0)
    assert(row == Seq("a", "b", "c"))
  }
}
