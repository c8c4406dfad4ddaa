package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the operator families
  * exist for: one call takes a raw documents table through the quality
  * gate, the blocklist safety gate, exact and near dedup, benchmark
  * decontamination, per-source capping, temperature rebalancing, and
  * split/shard assignment, each stage being an already-oracle-checked
  * operator (t2, t14, d2, d4+d8+d9, d10, sp9, sp7, sp1+sp4).
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

  /** Per-stage survivor counts of one [[curate]] run. Skipped stages
    * (empty blocklist / no rebalance column) report the incoming
    * count unchanged. */
  final case class Report(input: Long, afterQuality: Long,
      afterBlocklist: Long, afterExact: Long, afterNear: Long,
      afterSpanDedup: Long, afterDecontam: Long, afterSourceCap: Long,
      afterRebalance: Long, trainDocs: Long, shards: Long)

  /** Runs the full pipeline over `docs` (needs `doc_id` long + `text`
    * string). `benchDocs` is the held-out eval suite for the
    * decontamination sweep (same shape). `blocklist` terms arm the t14
    * safety gate (docs over 5% blocked tokens drop — the exact-integer
    * flag); `rebalanceBy` names a stratum column (e.g. `lang`) to arm
    * the sp7 temperature resample after cleaning. Returns the curated
    * corpus — original columns + `n_tokens`, `quality`, `split`,
    * `shard` — and the per-stage report. */
  def curate(docs: DataFrame, benchDocs: DataFrame,
      minQuality: Double = 0.3, k: Int = 16, bands: Int = 4,
      jaccard: Double = 0.6, tokensPerShard: Long = 4096L,
      blocklist: Seq[String] = Nil, rebalanceBy: Option[String] = None,
      maxDupSpanFraction: Option[Double] = None,
      maxPerSource: Option[(String, Int)] = None)
      : (DataFrame, Report) = {
    // the sweep stages: banded-pair components (canonical = component
    // min) for near-dup, a fresh gram sweep of benchDocs for
    // decontamination
    val nearLosers = (in: DataFrame) => {
      val pairs = Dedup.minHashLshPairs(in, "doc_id", "text",
        k = k, bands = bands, threshold = jaccard)
      Dedup.connectedComponents(pairs.select("d1", "d2"))
        .filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
    }
    // the gram pipeline IS ContamGate's (one shared definition, so the
    // sweep and the stored gate can never drift on tokenization —
    // curateStored's equality contract is structural, not coincidental)
    val dirtyIds = (in: DataFrame) => {
      val benchGrams = ContamGate.grams(benchDocs.select("doc_id", "text"))
        .select("h").distinct()
      ContamGate.grams(in.select("doc_id", "text"))
        .join(broadcast(benchGrams), Seq("h"))
        .select("doc_id").distinct()
    }
    pipeline(docs, nearLosers, dirtyIds, minQuality, tokensPerShard,
      blocklist, rebalanceBy, maxDupSpanFraction, maxPerSource)
  }

  /** [[curate]] with the two STORED-STATE stages routed through the
    * warehouse gates instead of from-scratch sweeps — so batch
    * curation and streaming admission ([[Ingest.ingestBatch]]) read
    * the SAME verdicts and can never drift on what "contaminated" or
    * "already seen" means:
    *
    *  - decontamination probes [[ContamGate]]'s stored digests
    *    (identical gram semantics to the sweep by construction — the
    *    gate stores exactly the sweep's md5 word-8-grams, so the
    *    dirty set is equal when the gate holds the same suites);
    *  - near-dup reads [[DedupIndex]] verdicts — the keep-first
    *    bucket-min policy (`Dedup.lshDedupAssign`), the admission
    *    gate's own rule. NOTE the POLICY difference from the sweep
    *    form: curate() resolves dup components to their canonical
    *    minimum (a doc connected only through intermediaries still
    *    drops); the gate convicts only docs sharing a bucket with a
    *    SMALLER id directly. On pairwise dup structure the two agree
    *    exactly (CurateSpec pins the agreement end-to-end); on CHAINS
    *    (a~b~c, a!~c) the gate can keep a middle doc the component
    *    rule drops — choose by policy, not by accident:
    *    `resolveComponents = true` switches the stored path to the
    *    sweep's transitive-closure rule by running connected
    *    components over the gate's full convicting edge set
    *    ([[DedupIndex.convictingPairs]] — per bucket the stored min
    *    is a star over the members, same connectivity as the clique)
    *    and dropping every non-canonical member. Note the remaining
    *    deliberate difference: the gate judges against EVERYTHING
    *    indexed, the sweep only within the curated survivors — equal
    *    when the index holds exactly the curated corpus.
    *
    * The index must hold (at least) the docs being curated — the
    * normal state when the corpus was admitted through the gate.
    * Every stateless stage is the shared [[pipeline]] body, so the
    * two forms cannot diverge anywhere else. */
  def curateStored(wh: graft.olist.Warehouse, docs: DataFrame,
      contamIdx: String, dedupIdx: String,
      minQuality: Double = 0.3, tokensPerShard: Long = 4096L,
      blocklist: Seq[String] = Nil, rebalanceBy: Option[String] = None,
      maxDupSpanFraction: Option[Double] = None,
      maxPerSource: Option[(String, Int)] = None,
      resolveComponents: Boolean = false)
      : (DataFrame, Report) = {
    val nearLosers = (in: DataFrame) =>
      if (resolveComponents)
        Dedup.connectedComponents(
          DedupIndex.convictingPairs(wh, dedupIdx, in))
          .filter(col("id") =!= col("comp"))
          .select(col("id").as("doc_id"))
      else DedupIndex.verdicts(wh, dedupIdx, in)
        .filter(col("keep") === 0).select("doc_id")
    val dirtyIds = (in: DataFrame) =>
      // materialize: the sweep is corpus-scale and the pipeline may
      // consume the verdict set more than once — the eager bounded
      // pin (one row per corpus doc) beats re-deriving corpus grams
      // per consumer, and is released when the frame drops
      ContamGate.verdicts(wh, contamIdx, in, materialize = true)
        .filter(col("keep") === 0).select("doc_id")
    pipeline(docs, nearLosers, dirtyIds, minQuality, tokensPerShard,
      blocklist, rebalanceBy, maxDupSpanFraction, maxPerSource)
  }

  /** The corpus DATA CARD from the manifest alone — the release
    * documentation numbers (docs, token sum, mean tokens, mixture
    * weight per group): one [[graft.olist.Warehouse.statsAggregateBy]]
    * call with sums + avgs, so on a clean table partitioned by
    * `groupCol` with `tokenCol` stats declared, the whole card folds
    * from per-file metadata with ZERO data files opened. Mixture
    * weight = the group's token share (exact longs into one double
    * division). None when the manifest cannot answer exactly — the
    * scan is then the honest path, not a silently-stale card. */
  def dataCard(wh: graft.olist.Warehouse, table: String,
      groupCol: String, tokenCol: String): Option[DataFrame] =
    wh.statsAggregateBy(table, Seq(groupCol), Seq(tokenCol),
      withSums = true, withAvgs = true).map { agg =>
      val slim = agg.select(col(groupCol), col("cnt").as("docs"),
        col(s"sum_$tokenCol").as("tokens"),
        col(s"avg_$tokenCol").as("mean_tokens"))
      // the card is groups-sized (a LocalRelation on the clean path) —
      // the share denominator joins back as one broadcast row
      val total = slim.agg(sum(col("tokens")).as("__total"))
      slim.crossJoin(broadcast(total))
        .select(col(groupCol), col("docs"), col("tokens"),
          col("mean_tokens"),
          // a corpus whose token sums are all zero has no defined
          // mixture — weight is explicitly null there, rather than a
          // divide-by-zero null-or-ANSI-error depending on session mode
          when(col("__total") === 0, lit(null).cast("double"))
            .otherwise(col("tokens").cast("double") / col("__total"))
            .as("weight"))
        .orderBy(groupCol)
    }

  /** The shared stage body: everything but the two pluggable
    * stored-state stages (near-dup loser set, contaminated id set) is
    * identical between [[curate]] and [[curateStored]] by
    * construction. */
  private def pipeline(docs: DataFrame,
      nearLosers: DataFrame => DataFrame,
      dirtyIds: DataFrame => DataFrame,
      minQuality: Double, tokensPerShard: Long,
      blocklist: Seq[String], rebalanceBy: Option[String],
      maxDupSpanFraction: Option[Double],
      maxPerSource: Option[(String, Int)])
      : (DataFrame, Report) = {
    val input = docs.count()

    // 1 — quality gate: the t2 closed-form signal (length saturation ×
    // stopword density), computed in one projection over the scan —
    // the SHARED expression ([[TextAnalysis.qualityExpr]]), so this
    // stage, the t2 oracle row, and the ingest gate agree by identity
    val scored = docs
      .withColumn("n_tokens",
        size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("quality", TextAnalysis.qualityExpr(col("text")))
    val qualified = scored.filter(col("quality") >= minQuality)
    val nQuality = qualified.count()

    // 1b — blocklist safety gate (t14): per-row term hits against the
    // (broadcast-literal) list, keep/drop decided by the exact integer
    // rendering of rate > 5% — no float boundary, map-side only
    val safe =
      if (blocklist.isEmpty) qualified
      else qualified
        .withColumn("__nb", size(filter(TextAnalysis.tokens(col("text")),
          t => t.isInCollection(blocklist))).cast("long"))
        .filter(!(col("__nb") * 20 > col("n_tokens"))).drop("__nb")
    val nSafe = if (blocklist.isEmpty) nQuality else safe.count()

    // 2 — exact dedup on the d2 normalized fingerprint: smallest id
    // survives; one window over the 16-byte digest, text never shuffles
    val wFp = Window.partitionBy("fp").orderBy("doc_id")
    val exactKeep = safe
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("rk", row_number().over(wFp))
      .filter(col("rk") === 1).drop("rk", "fp")
    val nExact = exactKeep.count()

    // 3 — near dedup: the pluggable loser set (sweep components or
    // stored-gate verdicts), anti-joined off the exact-dedup survivors
    val losers = nearLosers(exactKeep)
    val nearKeep = exactKeep.join(losers, Seq("doc_id"), "left_anti")
    val nNear = nearKeep.count()

    // 3b — verbatim-span gate (d13, opt-in): a document most of whose
    // 20-token windows also appear in OTHER surviving documents is
    // boilerplate near-dedup could not catch (templated pages sharing
    // long spans without being pairwise-similar overall). Docs whose
    // duplicated-window fraction exceeds the threshold drop; docs too
    // short to window (< 20 tokens) have no row in the span stats and
    // are kept — the safe direction. Runs AFTER near-dedup so a span
    // duplicated only within an already-removed dup cluster does not
    // count against its canonical survivor.
    val spanKept = maxDupSpanFraction match {
      case None => nearKeep
      case Some(maxFrac) =>
        val spanDrop = Dedup.dupSpanCounts(nearKeep, "doc_id", "text")
          .filter(col("n_dup_windows").cast("double") / col("n_windows")
            > maxFrac)
          .select("doc_id")
        nearKeep.join(spanDrop, Seq("doc_id"), "left_anti")
    }
    val nSpan = if (maxDupSpanFraction.isEmpty) nNear else spanKept.count()

    // 4 — decontamination: the pluggable dirty set (fresh gram sweep
    // or the stored ContamGate digests — identical gram semantics)
    val dirty = dirtyIds(spanKept)
    val clean = spanKept.join(dirty, Seq("doc_id"), "left_anti")
    val nClean = clean.count()

    // 4c — per-source quota cap (sp9, opt-in): at most N surviving
    // docs per source/domain — the over-represented-domain guard (C4
    // caps pages per host, RefinedWeb per registered domain). Runs
    // AFTER dedup/decontamination so the cap counts real survivors,
    // BEFORE temperature rebalance so strata counts reflect the capped
    // corpus. Keep set = the N smallest stable hash keys per source —
    // membership a pure function of (id, source, N), one shuffle on
    // the group key.
    val capped = maxPerSource match {
      case None => clean
      case Some((srcCol, cap)) =>
        val keep = Sampling.sourceCap(
          clean.select(col("doc_id"), col(srcCol).as("source")),
          col("source"), cap)
          .filter(col("kept") === 1).select("doc_id")
        clean.join(keep, Seq("doc_id"), "left_semi")
    }
    val nCapped = if (maxPerSource.isEmpty) nClean else capped.count()

    // 4b — temperature rebalance (sp7): per-stratum keep rate
    // sqrt(cnt_min/cnt) over md5 buckets — run AFTER cleaning so the
    // strata counts reflect what dedup/decontamination left; the
    // smallest stratum keeps everything by construction
    val rebalanced = rebalanceBy match {
      case None => capped
      case Some(strat) =>
        val cnts = capped.groupBy(strat).agg(count(lit(1)).as("__cnt"))
        val cmin = cnts.agg(min("__cnt").as("__cmin"))
        val rates = cnts.crossJoin(broadcast(cmin))
          .select(col(strat),
            floor(sqrt(col("__cmin").cast("double") / col("__cnt")) * 10000)
              .cast("long").as("__th"))
        capped.join(broadcast(rates), strat)
          .filter(Sampling.hashBucket(col("doc_id"), 10000) < col("__th"))
          .drop("__th")
    }
    val nRebalanced = if (rebalanceBy.isEmpty) nCapped else rebalanced.count()

    // 5 — deterministic split + token-budget shard packing (sp1 + sp4):
    // membership is a pure function of id; shards cut a per-split
    // md5-ordered prefix sum at the token budget
    val wShard = Window.partitionBy("split")
      .orderBy(md5(col("doc_id").cast("string")))
    val out = rebalanced
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .withColumn("shard",
        floor((sum("n_tokens").over(wShard) - col("n_tokens")) /
          tokensPerShard))
    val nTrain = out.filter(col("split") === "train").count()
    val nShards = out.select("split", "shard").distinct().count()

    (out, Report(input, nQuality, nSafe, nExact, nNear, nSpan, nClean,
      nCapped, nRebalanced, nTrain, nShards))
  }
}
