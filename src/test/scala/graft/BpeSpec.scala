package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real BPE: training reproduces the hand-computable merge sequence on
  * the classic corpus, encoding is greedy-left-to-right exact, the
  * expression chain ≡ the mapPartitions production encoder, and both
  * are layout-independent.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Bpe.EndMark

  /** Sennrich's running example, frequency-weighted by repetition:
    * low×5, lower×2, newest×6, widest×3. */
  private def classic = {
    import spark.implicits._
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    docs.toDF("doc_id", "text")
  }

  test("training learns the classic corpus' merge sequence") {
    val merges = Bpe.train(classic, nMerges = 5)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8 …
    // tie-break (c DESC, a ASC, b ASC) picks (e,s); then (es,t)=9,
    // (t,</w>)… st gone (absorbed), (est,</w>)=9 after round 2.
    assert(merges.take(3) ==
      Seq(("e", "s"), ("es", "t"), ("est", EndMark)))
    // after est</w>: counts are l,o=7 / o,w=7 / n,e=6 … → (l,o) then (lo,w)
    assert(merges.slice(3, 5) == Seq(("l", "o"), ("lo", "w")))
  }

  test("training is layout-independent") {
    val a = Bpe.train(classic, nMerges = 5)
    val b = Bpe.train(classic.repartition(7), nMerges = 5)
    assert(a == b)
  }

  test("encode: greedy left-to-right, EndMark distinct from in-word chars") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaa low lowest")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("l", "o"), ("lo", "w"), ("low", EndMark))
    val r = Bpe.encode(docs, merges).collect()(0)
    // aaaa → aa aa </w>; aaa → aa a </w>; low → low</w> (word-final
    // merge fires); lowest → low e s t </w> (no low</w> — not final)
    assert(r.getAs[String]("subwords") ==
      s"aa aa $EndMark aa a $EndMark low$EndMark low e s t $EndMark")
    assert(r.getAs[Long]("n_subwords") == 12L)
  }

  test("expression encode ≡ mapPartitions production encoder") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.fixedMerges
    val a = Bpe.encode(docs, merges).orderBy("doc_id").collect()
    val b = Bpe.encodeLarge(docs, merges).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getString(2) == y.getString(2),
        s"doc ${x.getLong(0)} diverged")
      assert(x.getLong(1) == y.getLong(1))
    }
  }

  test("round trip: dropping EndMark boundaries reconstructs the text") {
    import spark.implicits._
    val docs = Seq((1L, "newest widest low lower")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 8)
    val sub = Bpe.encode(docs, merges).collect()(0).getAs[String]("subwords")
    // subwords of one word concatenate back to word+EndMark; EndMark
    // therefore splits the stream back into the original words
    val words = sub.replace(" ", "").split(java.util.regex.Pattern
      .quote(EndMark)).toSeq
    assert(words == Seq("newest", "widest", "low", "lower"))
  }

  test("train→encode composes: classic vocab tokenizes unseen words") {
    val merges = Bpe.train(classic, nMerges = 10)
    import spark.implicits._
    val unseen = Seq((1L, "lowest")).toDF("doc_id", "text")
    val sub = Bpe.encode(unseen, merges).collect()(0).getAs[String]("subwords")
    // "lowest" decomposes through learned subwords (low + est</w> after
    // enough merges) — never through whole-word memorization
    assert(sub.replace(" ", "") == s"lowest$EndMark")
    assert(sub.split(" ").length < "lowest".length + 1,
      s"expected real merges to fire, got '$sub'")
  }

  test("encode plan is one map-side projection: no shuffle, no UDF") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Bpe.encode(docs, Bpe.fixedMerges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "BPE encode must not shuffle")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("mapPartitions"))
  }
}
