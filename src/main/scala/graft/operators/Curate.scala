package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the operator families
  * exist for: one call takes a raw documents table through the quality
  * gate, exact and near dedup, benchmark decontamination, and
  * split/shard assignment, each stage being an already-oracle-checked
  * operator (t2, d2, d4+d8+d9, d10, sp1+sp4).
  *
  * Scale shape, by construction of the stages it composes: the text
  * payload never enters a quadratic path (near-dup candidates are
  * discovered over (id, band-hash) pairs and verified on the candidate
  * set only), gram digests — not gram strings — cross the
  * decontamination shuffle with the benchmark side broadcast, and
  * split/shard membership is a pure function of doc id + a per-split
  * prefix sum. At 100 TB each stage's output would land in a warehouse
  * table between runs ([[graft.olist.Warehouse.save]]); the single-call
  * form here recomputes the lineage per report count, which is the
  * right trade at spec/demo scale only.
  */
object Curate {

  /** Per-stage survivor counts of one [[curate]] run. */
  final case class Report(input: Long, afterQuality: Long,
      afterExact: Long, afterNear: Long, afterDecontam: Long,
      trainDocs: Long, shards: Long)

  /** Runs the full pipeline over `docs` (needs `doc_id` long + `text`
    * string). `benchDocs` is the held-out eval suite for the
    * decontamination sweep (same shape). Returns the curated corpus —
    * original columns + `n_tokens`, `quality`, `split`, `shard` — and
    * the per-stage report. */
  def curate(docs: DataFrame, benchDocs: DataFrame,
      minQuality: Double = 0.3, k: Int = 16, bands: Int = 4,
      jaccard: Double = 0.6, tokensPerShard: Long = 4096L)
      : (DataFrame, Report) = {
    val input = docs.count()

    // 1 — quality gate: the t2 closed-form signal (length saturation ×
    // stopword density), computed in one projection over the scan
    val scored = docs
      .withColumn("n_tokens",
        size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("quality",
        least(lit(1.0), col("n_tokens") / 50.0) * 0.5 +
          least(lit(1.0), lit(5.0) *
            TextAnalysis.wordHits(col("text"), TextAnalysis.enWords) /
            col("n_tokens")) * 0.5)
    val qualified = scored.filter(col("quality") >= minQuality)
    val nQuality = qualified.count()

    // 2 — exact dedup on the d2 normalized fingerprint: smallest id
    // survives; one window over the 16-byte digest, text never shuffles
    val wFp = Window.partitionBy("fp").orderBy("doc_id")
    val exactKeep = qualified
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("rk", row_number().over(wFp))
      .filter(col("rk") === 1).drop("rk", "fp")
    val nExact = exactKeep.count()

    // 3 — near dedup: banded MinHash pairs (hot buckets bounded) →
    // connected components → canonical survivor (the component label
    // IS the minimum id, so survivors are the rows whose id equals it)
    val pairs = Dedup.minHashLshPairs(exactKeep, "doc_id", "text",
      k = k, bands = bands, threshold = jaccard)
    val comps = Dedup.connectedComponents(pairs.select("d1", "d2"))
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val nearKeep = exactKeep.join(losers, Seq("doc_id"), "left_anti")
    val nNear = nearKeep.count()

    // 4 — decontamination: drop any document sharing a word-8-gram
    // with the benchmark set (d10 shape: md5 the grams BEFORE the
    // join, broadcast the small bench side)
    def grams(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]) = df
      .select((cols :+ split(trim(col("text")), "\\s+").as("ts")): _*)
      .filter(size(col("ts")) >= 8)
      .select((cols :+ explode(Dedup.shingles(col("ts"), 8)).as("g")): _*)
      .select((cols :+ md5(col("g")).as("h")): _*)
    val benchGrams = grams(benchDocs, Nil).distinct()
    val dirty = grams(nearKeep, Seq(col("doc_id")))
      .join(broadcast(benchGrams), Seq("h"))
      .select("doc_id").distinct()
    val clean = nearKeep.join(dirty, Seq("doc_id"), "left_anti")
    val nClean = clean.count()

    // 5 — deterministic split + token-budget shard packing (sp1 + sp4):
    // membership is a pure function of id; shards cut a per-split
    // md5-ordered prefix sum at the token budget
    val wShard = Window.partitionBy("split")
      .orderBy(md5(col("doc_id").cast("string")))
    val out = clean
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .withColumn("shard",
        floor((sum("n_tokens").over(wShard) - col("n_tokens")) /
          tokensPerShard))
    val nTrain = out.filter(col("split") === "train").count()
    val nShards = out.select("split", "shard").distinct().count()

    (out, Report(input, nQuality, nExact, nNear, nClean, nTrain, nShards))
  }
}
