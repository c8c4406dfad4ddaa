package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the text-analysis family on synthetic inputs
  * (the corpus queries themselves are oracle-gated; these pin the
  * per-operator semantics on inputs the corpus may not contain).
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pii redaction replaces emails, IPv4s, and phone numbers with typed tags") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact a.user+tag@example.co.uk or admin@host.io today"),
      (2L, "server at 10.0.255.3 answered; call 415-555-2671 after"),
      (3L, "dotted phone 415.555.2671 and spaced 415 555 2671"),
      (4L, "no pii here, just 3.14 and v1.2 and year 2024")
    ).toDF("doc_id", "text")
    val red = docs.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("r")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "contact <EMAIL> or <EMAIL> today")
    assert(red(2L) == "server at <IP> answered; call <PHONE> after")
    assert(red(3L) == "dotted phone <PHONE> and spaced <PHONE>")
    assert(red(4L) == "no pii here, just 3.14 and v1.2 and year 2024")
  }

  test("repetition ratio: fully repeated text scores high, unique text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // bigrams repeat
      (2L, "one two three four five six")          // all bigrams unique
    ).toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val bgs = operators.Dedup.shingles(toks, 2)
    val got = docs.select(col("doc_id"),
      (lit(1.0) - size(array_distinct(bgs)).cast("double") / size(bgs)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > 0.5, s"repetitive doc scored ${got(1L)}")
    assert(got(2L) == 0.0)
  }
}
