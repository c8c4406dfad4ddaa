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

  test("chunking covers every token: windows overlap by W-S and the tail is never dropped") {
    import spark.implicits._
    val (w, st) = (64, 48)
    // doc lengths around the window/stride boundaries
    val docs = Seq(1, 16, 17, 63, 64, 65, 112, 113, 150, 300).map { n =>
      (n.toLong, (1 to n).map(i => s"tk$i").mkString(" "))
    }.toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val starts = sequence(lit(1), greatest(lit(1), size(toks) - (w - st)), lit(st))
    val got = docs.select(col("doc_id"), explode(starts).as("s"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getInt(1)).sorted.toSeq).toMap
    got.foreach { case (n, ss) =>
      assert(ss.head == 1, s"n=$n")
      assert(ss == ss.indices.map(1 + _ * st), s"n=$n starts=$ss not stride-spaced")
      assert(ss.last + w - 1 >= n, s"n=$n: tail tokens beyond ${ss.last + w - 1} dropped")
      // no fully-redundant final window: its start stays within the doc
      assert(ss.last <= math.max(1, n), s"n=$n")
    }
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

  test("gopher rules: each rule trips on its own violation, boundaries are exact") {
    import spark.implicits._
    val docs = Seq(
      // 1: clean 30-word doc — every rule passes
      1L -> (("the quick brown fox jumps over a lazy dog today " * 3).trim),
      // 2: 5 words — fails r_len only, everything else healthy
      2L -> "short doc with the a",
      // 3: 25 one-char-ish words — mean length below 3 fails r_wordlen
      3L -> (("a " * 24).trim + " the"),
      // 4: 5 '#' symbols against 25 words — fails r_symbol (and r_stop:
      //    no stopwords); r_alpha sits on its exact 80% boundary and passes
      4L -> (("word " * 20).trim + " # # # # #"),
      // 5: 20 numeric words — fails r_alpha and r_stop; r_len and
      //    r_wordlen both sit on exact boundaries (20 words, mean 3)
      5L -> ("123 " * 20).trim
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs).collect().map { r =>
      r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(7))
    }.toMap
    // (r_len, r_wordlen, r_alpha, r_symbol, r_stop, keep)
    assert(got(1L) == ((1, 1, 1, 1, 1, 1)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((0, 1, 1, 1, 1, 0)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((1, 0, 1, 1, 1, 0)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((1, 1, 1, 0, 0, 0)), s"doc4: ${got(4L)}")
    assert(got(5L) == ((1, 1, 0, 1, 0, 0)), s"doc5: ${got(5L)}")
  }

  test("c4 line filters: line gates edit, doc gates drop, reassembly keeps order") {
    import spark.implicits._
    val docs = Seq(
      // 1: three clean lines + one no-terminal + one short + one js →
      //    kept 3 of 6, doc survives, order preserved
      1L -> Seq(
        "The first sentence has enough words here.",
        "no terminal punctuation on this line",
        "Too short.",
        "A second good line with many words too!",
        "Uses javascript for the menu bar today.",
        "And a third fine line rounds it out?").mkString("\n"),
      // 2: only two good lines → n_kept < 3 drops the doc
      2L -> Seq(
        "A good line with plenty of words here.",
        "Another good line with plenty of words.").mkString("\n"),
      // 3: brace anywhere kills the doc even with 3 good lines
      3L -> Seq(
        "A good line with plenty of words here.",
        "Another good line with plenty of words.",
        "function() { return 1; } is fine prose?",
        "And a third fine line rounds it out.").mkString("\n"),
      // 4: boilerplate marker kills the doc
      4L -> Seq(
        "A good line with plenty of words here.",
        "Lorem Ipsum dolor sit amet consectetur adipiscing.",
        "Another good line with plenty of words.").mkString("\n")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4LineClean(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getString(5), r.getInt(6)))
    }.toMap
    val (n1, k1, b1, lo1, ct1, keep1) = got(1L)
    assert((n1, k1, b1, lo1, keep1) == ((6L, 3L, 0, 0, 1)))
    assert(ct1 == Seq(
      "The first sentence has enough words here.",
      "A second good line with many words too!",
      "And a third fine line rounds it out?").mkString("\n"))
    assert(got(2L)._2 == 2L && got(2L)._6 == 0)
    assert(got(3L)._3 == 1 && got(3L)._6 == 0)
    assert(got(4L)._4 == 1 && got(4L)._6 == 0)
  }

  test("hashed linear classifier: score is the exact sum of per-token weights and a trained-table lookup fits the same shape") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha beta gamma",
      2L -> "alpha alpha alpha alpha",
      3L -> "Alpha ALPHA alpha" // case-folded before hashing
    ).toDF("doc_id", "text")
    val weightOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      b => (b * lit(2654435761L)) % 2001 - 1000
    val got = TextAnalysis.hashedLinearScore(docs, col("text"), weightOf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // per-token weight computed independently of the array fold
    def w(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      ((java.lang.Long.parseLong(hex, 16) % 4096) * 2654435761L) % 2001 - 1000
    }
    assert(got(1L) == ((3L, w("alpha") + w("beta") + w("gamma"))))
    assert(got(2L) == ((4L, 4 * w("alpha"))))
    assert(got(3L) == ((3L, 3 * w("alpha"))))
    // a "trained" weight table broadcasts as a literal array lookup —
    // same fold, weights now data not formula
    val table = Array.tabulate(4096)(i => ((i * 31) % 7 - 3).toLong)
    val lookup: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      b => element_at(typedLit(table.toSeq), (b + 1).cast("int"))
    val got2 = TextAnalysis.hashedLinearScore(docs, col("text"), lookup)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def w2(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      table((java.lang.Long.parseLong(hex, 16) % 4096).toInt)
    }
    assert(got2(1L) == w2("alpha") + w2("beta") + w2("gamma"))
    assert(got2(2L) == 4 * w2("alpha"))
  }

  test("bm25: scores match the closed form, rank by relevance, zero-match docs score zero") {
    import spark.implicits._
    val docs = Seq(
      1L -> "cat cat cat dog",   // heavy on 'cat'
      2L -> "cat bird",          // one 'cat', short
      3L -> "dog bird fish owl", // no query terms
      4L -> "cat dog bird fish owl ray hen fox elk ant bee cow" // long, one 'cat'
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("cat"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // closed form: N=4, sum_dl=22, df=3
    val n = 4.0; val avgdl = 22.0 / 4
    def s(tf: Long, dl: Long): Double = {
      val idf = math.log((2 * n + 2) / (2 * 3 + 1))
      val raw = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // ranking: tf=3 short doc first, then tf=1 short, then tf=1 long, then 0
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L, 3L))
    assert(got(0)._3 == s(3, 4) && got(1)._3 == s(1, 2) && got(2)._3 == s(1, 12))
    assert(got(3)._3 == 0.0)
    // multi-term: terms sum; a doc matching both beats either alone
    val docs2 = Seq(1L -> "cat dog pad", 2L -> "cat pad pad", 3L -> "dog pad pad")
      .toDF("doc_id", "text")
    val top = TextAnalysis.bm25TopK(docs2, Seq("cat", "dog"), 1).collect()
    assert(top.head.getLong(0) == 1L)
  }

  test("trained classifier: recovers a planted linear concept and training is layout-independent") {
    import spark.implicits._
    // corpus where the concept (3·cnt(vector)+2·cnt(stream)−cnt(slow) > 1)
    // splits ~half/half, with filler vocabulary for hash-collision noise
    val vocab = Seq("table", "join", "scan", "row", "batch", "merge")
    val docs = (0L until 120L).map { i =>
      val filler = (0 to (i % 5).toInt).map(j => vocab(((i + j) % 6).toInt))
      val pos = i % 4 match {
        case 0 => Seq("vector")                    // 3 > 1 → true
        case 1 => Seq("stream", "slow")            // 2-1=1 → false
        case 2 => Seq("vector", "stream", "slow")  // 4 > 1 → true
        case _ => Seq("slow")                      // -1 → false
      }
      i -> (filler ++ pos).mkString(" ")
    }.toDF("doc_id", "text")
    val w = TextAnalysis.trainHashedClassifier(
      docs, TextAnalysis.plantedConcept(col("text")), iters = 30, lr = 2.0)
    val scored = TextAnalysis.scoreWithWeights(docs, col("text"), w)
    val acc = scored
      .join(docs.select(col("doc_id"),
        TextAnalysis.plantedConcept(col("text")).cast("int").as("y")), "doc_id")
      .filter(col("keep") === col("y")).count().toDouble / 120
    assert(acc >= 0.95, s"train accuracy $acc")
    // layout independence: fixed-point gradient sums make training
    // bit-identical under any partitioning
    val w2 = TextAnalysis.trainHashedClassifier(
      docs.repartition(7), TextAnalysis.plantedConcept(col("text")),
      iters = 30, lr = 2.0)
    assert(w.toSeq == w2.toSeq)
  }

  test("classifier training is sample-bounded: pinned set, no source rescans, held-out floor") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val label = TextAnalysis.plantedConcept(col("text"))
    // the pinned training set is checkpoint-backed: iterating over it
    // scans materialized blocks, never the parquet source again
    val prep = TextAnalysis.classifierTrainingSet(docs, label, sampleN = 100)
    assert(prep.count() == 100)
    val scans = prep.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      "training iterations must scan the pinned sample, not the corpus:\n" +
        prep.queryExecution.executedPlan)
    // a sampleN cap ≥ corpus leaves the weights exactly unchanged
    // (gradients are order-independent exact longs) — the t19 row's
    // stability guarantee
    val full = TextAnalysis.trainHashedClassifier(docs, label,
      iters = 10, lr = 2.0, sampleN = 0)
    val capped = TextAnalysis.trainHashedClassifier(docs, label,
      iters = 10, lr = 2.0, sampleN = 1000000)
    assert(full.toSeq == capped.toSeq)
    // sampled = full-batch over the SAME explicit sample: the cap is a
    // row bound, not a different algorithm
    val explicit = docs
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(300)
    val wS = TextAnalysis.trainHashedClassifier(docs, label,
      iters = 10, lr = 2.0, sampleN = 300)
    val wE = TextAnalysis.trainHashedClassifier(explicit, label,
      iters = 10, lr = 2.0, sampleN = 0)
    assert(wS.toSeq == wE.toSeq)
    // held-out quality: a fully-trained 300-doc sample model must
    // still recover the planted concept on the 200 docs it never saw
    val heldOut = docs.join(explicit.select("doc_id"), Seq("doc_id"),
      "left_anti")
    val n = heldOut.count()
    assert(n > 0)
    def heldOutAcc(w: Array[Double]): Double =
      TextAnalysis.scoreWithWeights(heldOut, col("text"), w)
        .join(heldOut.select(col("doc_id"), label.cast("int").as("y")),
          "doc_id")
        .filter(col("keep") === col("y")).count().toDouble / n
    val accSampled = heldOutAcc(TextAnalysis.trainHashedClassifier(
      docs, label, iters = 30, lr = 2.0, sampleN = 300))
    val accFull = heldOutAcc(TextAnalysis.trainHashedClassifier(
      docs, label, iters = 30, lr = 2.0, sampleN = 0))
    // the claim sampling must defend: a bounded sample's model stays
    // close to the full-corpus model on unseen docs and well above
    // chance. (At this corpus a 300-doc sample is only 60% of the
    // data, so SOME gap is genuine; at 100 TB the 100k default cap
    // dwarfs what GD needs, and the exact-equality assertion above
    // pins that a cap ≥ corpus changes nothing at all.)
    assert(accSampled >= accFull - 0.15 && accSampled >= 0.75,
      s"held-out: sampled=$accSampled full-batch=$accFull")
  }
}
