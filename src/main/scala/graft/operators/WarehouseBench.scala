package graft.operators

import graft.{Q, Tables => T}
import graft.Num.{dsum, sqlDsum}
import graft.olist.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-format read-path benchmark twins.
  *
  * Every other headline query scans raw parquet, so the manifest
  * layers the engine actually serves reads through — PruningFileIndex
  * file skipping, per-file stats admission, DV anti-joins, manifest
  * CatalogStatistics — were asserted correct but never TIMED round
  * over round; a pruning-layer regression would be invisible to both
  * the correctness board and the bench. These two queries are the
  * same selective probe (one-year l_shipdate window → grouped
  * aggregate) run twice: `b1_probe_raw` against the raw parquet
  * directory, `b1_probe_wh` through a [[Warehouse]] table saved
  * range-laid-out on the predicate column, so the manifest prunes
  * most files before Spark ever lists them. The wh reading must stay
  * within ~1.5× of its raw twin — pruning overhead is bounded metadata
  * work — and at 100 TB it flips to the FASTER side (it opens a
  * handful of files where raw listing scans the directory).
  *
  * Setup (one partitioned re-save of lineitem into a temp dir) is
  * memoized per (session, sf dir) and paid on the FIRST run only; the
  * bench's median-of-3 discards that run, so the recorded number is
  * the steady-state read path. Both queries share one oracle SQL —
  * the saved table holds exactly the source rows, which is itself a
  * correctness check on the manifest read path at sf0.01.
  */
object WarehouseBench {

  // keyed by (session, sf dir): a Warehouse holds its SparkSession, so
  // a dir-only key would hand a later session a Warehouse bound to an
  // earlier (possibly stopped) one. The on-disk table is rebuilt per
  // session — cheap at bench scale, and each entry's temp dir is only
  // reachable through its own session's Warehouse.
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  /** The probe's one-year window (sf-independent: the synthetic ship
    * dates span 1995–2001 at every scale factor — see TESTDATA.md). */
  private val lo = "1998-01-01 00:00:00"
  private val hi = "1998-12-31 23:59:59"

  /** b2b's query set — subsets/reorders of the standard bm25Query, so
    * every query has ≥10 positive matches at every testdata sf. */
  private val b2BatchQueries: Seq[(Long, Seq[String])] = Seq(
    (1L, TextAnalysis.bm25Query),
    (2L, Seq(TextAnalysis.bm25Query(1), TextAnalysis.bm25Query.head)),
    (3L, Seq(TextAnalysis.bm25Query.last)))

  /** b15's hybrid query set — ids must exist in `embeddings` (the
    * dense lane's query vectors) at every testdata sf. */
  private val b15BatchQueries: Seq[(Long, Seq[String])] = Seq(
    (0L, TextAnalysis.bm25Query),
    (7L, Seq(TextAnalysis.bm25Query(1), TextAnalysis.bm25Query.head)),
    (42L, Seq(TextAnalysis.bm25Query.last)))

  private def warehouse(s: SparkSession, d: String): Warehouse =
    cache.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_whbench").toString
      val w = new Warehouse(s, dir)
      // range layout on the predicate column: 8 files with disjoint
      // l_shipdate spans, so per-file min/max stats admit ~1-2 files
      // for a one-year window — the skipping the bench should observe
      w.save("lineitem_b",
        T.lineitem(s, d).repartitionByRange(8, col("l_shipdate")),
        clusterBy = Seq("l_shipdate"))
      // declared stats on the b4 aggregate columns: one re-analyze at
      // setup, then min/max/count answer from the manifest forever
      w.statsBy("lineitem_b", Seq("l_orderkey", "l_extendedprice"))
      // b7's partitioned twin: files sit in l_returnflag=… dirs, so
      // GROUPED min/max/count folds per partition from metadata
      w.save("lineitem_p", T.lineitem(s, d),
        partitionBy = Seq("l_returnflag"), clusterBy = Seq("l_orderkey"))
      // b10's token ledger: documents partitioned by source with the
      // size column declared for stats, so per-source sum/count — the
      // per-domain token-budget accounting every training-data
      // pipeline keeps — folds from the manifest's exact per-file sums
      w.save("documents_p", T.documents(s, d),
        partitionBy = Seq("source"), clusterBy = Seq("doc_id"))
      w.statsBy("documents_p", Seq("n_chars"))
      // b14's DECIMAL ledger: a fixed-point price column (the billing/
      // cost-accounting shape) whose per-file sums fold exactly like
      // the integral ones — decimal addition is order-independent
      w.save("documents_dec", T.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("cast(n_chars * 0.25 as decimal(12,2))").as("price")),
        partitionBy = Seq("source"), clusterBy = Seq("doc_id"))
      w.statsBy("documents_dec", Seq("price"))
      w
    })

  private def probe(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
        col("l_shipdate") <= lit(hi).cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")

  private val oracle =
    s"""SELECT l_returnflag,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$lo' AND l_shipdate <= TIMESTAMP '$hi'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The two appended fact rows — literals shared with [[i4Oracle]]. */
  private val i4Appends = Seq(
    (9000001L, 7L, "O", 111.11, "1998-06-01 00:00:00", "1-URGENT"),
    (9000002L, 8L, "F", 222.22, "1998-06-02 00:00:00", "2-HIGH"))

  private val i4Oracle = {
    val appends = i4Appends.map { case (ok, ck, st, tp, ts, pr) =>
      s"SELECT $ok AS o_orderkey, $ck AS o_custkey, '$st' AS o_orderstatus, " +
        s"$tp AS o_totalprice, TIMESTAMP '$ts' AS o_orderdate, " +
        s"'$pr' AS o_orderpriority"
    }.mkString(" UNION ALL ")
    s"""WITH f AS (
       |  SELECT * FROM orders WHERE o_orderkey % 97 <> 0
       |  UNION ALL $appends
       |), d AS (
       |  SELECT c_custkey AS o_custkey,
       |    CASE WHEN c_custkey = 7 THEN 'FORGOTTEN'
       |         ELSE c_mktsegment END AS c_mktsegment
       |  FROM customer)
       |SELECT c_mktsegment, count(*) AS cnt,
       |  ${sqlDsum("o_totalprice")} AS sum_price
       |FROM f JOIN d USING (o_custkey)
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  }

  private val b7Oracle =
    """SELECT l_returnflag, min(l_orderkey) AS min_ok,
      |  max(l_orderkey) AS max_ok, count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // b11: the last-100-doc batch judged against the src0 eval suite —
  // shared-gram counts exactly d10's, plus the firewall's keep flag
  private val b11Oracle =
    """WITH g AS (
      |  SELECT doc_id, source,
      |    md5(unnest(list_distinct(list_transform(range(1, len(ts) - 6),
      |                i -> array_to_string(ts[i:i+7], ' '))))) AS h
      |  FROM (SELECT doc_id, source,
      |          regexp_split_to_array(trim(text), '\s+') AS ts
      |        FROM documents) WHERE len(ts) >= 8),
      |bench AS (SELECT DISTINCT h FROM g WHERE source = 'src0'),
      |batch AS (SELECT doc_id FROM documents
      |          WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)),
      |hits AS (SELECT g.doc_id, count(*) AS shared_grams
      |         FROM g JOIN bench USING (h) JOIN batch USING (doc_id)
      |         GROUP BY g.doc_id)
      |SELECT b.doc_id,
      |  CAST(coalesce(h.shared_grams, 0) AS BIGINT) AS shared_grams,
      |  CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END AS keep
      |FROM batch b LEFT JOIN hits h USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // b14: the DECIMAL twin of b10/b12 — per-source sum and mean of a
  // fixed-point price column. Both lanes settle to DOUBLE at the very
  // end (one exact-decimal sum, one rounding cast, one division — the
  // identical arithmetic in Spark, the metadata fold, and DuckDB; the
  // sums here are ≤2^53·0.25 so even the double rendering is exact)
  private val b14Oracle =
    """SELECT source,
      |  cast(sum(cast(n_chars * 0.25 as decimal(12,2))) as double)
      |    AS sum_price,
      |  cast(sum(cast(n_chars * 0.25 as decimal(12,2))) as double)
      |    / count(n_chars) AS avg_price,
      |  count(n_chars) AS nn
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // b13: the batch's per-(doc, suite) shared-digest counts against a
  // two-suite gate — src0's and src1's grams each tagged as their own
  // suite; a doc sharing grams with both shows BOTH rows
  private val b13Oracle =
    """WITH g AS (
      |  SELECT doc_id, source,
      |    md5(unnest(list_distinct(list_transform(range(1, len(ts) - 6),
      |                i -> array_to_string(ts[i:i+7], ' '))))) AS h
      |  FROM (SELECT doc_id, source,
      |          regexp_split_to_array(trim(text), '\s+') AS ts
      |        FROM documents) WHERE len(ts) >= 8),
      |bench AS (SELECT DISTINCT source AS suite, h FROM g
      |          WHERE source IN ('src0', 'src1')),
      |batch AS (SELECT doc_id FROM documents
      |          WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents))
      |SELECT g.doc_id, bench.suite,
      |  CAST(count(DISTINCT g.h) AS BIGINT) AS shared_grams
      |FROM g JOIN bench USING (h) JOIN batch USING (doc_id)
      |GROUP BY g.doc_id, bench.suite
      |ORDER BY doc_id, suite""".stripMargin

  // b16: the per-suite DROP COUNTS the blame-enabled ingest ledger
  // records — countDistinct(doc) per convicting suite over the same
  // two-suite gate as b13 (a doubly-convicted doc counts in BOTH
  // suites; the sums may exceed the distinct-doc contam_drops)
  private val b16Oracle =
    """WITH g AS (
      |  SELECT doc_id, source,
      |    md5(unnest(list_distinct(list_transform(range(1, len(ts) - 6),
      |                i -> array_to_string(ts[i:i+7], ' '))))) AS h
      |  FROM (SELECT doc_id, source,
      |          regexp_split_to_array(trim(text), '\s+') AS ts
      |        FROM documents) WHERE len(ts) >= 8),
      |bench AS (SELECT DISTINCT source AS suite, h FROM g
      |          WHERE source IN ('src0', 'src1')),
      |batch AS (SELECT doc_id FROM documents
      |          WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents))
      |SELECT bench.suite,
      |  CAST(count(DISTINCT g.doc_id) AS BIGINT) AS drops
      |FROM g JOIN bench USING (h) JOIN batch USING (doc_id)
      |GROUP BY bench.suite ORDER BY bench.suite""".stripMargin

  // DuckDB sums BIGINT into HUGEINT — the a15/sp10 trap; Spark's
  // sum(long) is LongType, so the oracle pins BIGINT explicitly
  private val b10Oracle =
    """SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(*) AS cnt, count(n_chars) AS nn
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // b12: per-source MEAN doc size — exact at this scale on every
  // engine (integral sums ≪ 2^53, so double accumulation is exact and
  // the one final division lands on the identical double in Spark,
  // DuckDB, and the metadata fold)
  private val b12Oracle =
    """SELECT source, avg(n_chars) AS avg_chars, count(n_chars) AS nn
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  private val b4Oracle =
    """SELECT min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
      |  min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px,
      |  min(l_shipdate) AS min_sd, max(l_shipdate) AS max_sd,
      |  count(*) AS cnt
      |FROM lineitem""".stripMargin

  val all: Seq[Q] = Seq(
    Q("b1_probe_raw", Some(oracle), (s, d) => probe(T.lineitem(s, d))),
    Q("b1_probe_wh", Some(oracle),
      (s, d) => probe(warehouse(s, d).table("lineitem_b"))),

    // b2 — the RETRIEVAL serving twins: t18's scan-time BM25 (stats +
    // scoring recomputed per query) vs the SAME query served from the
    // stored TextIndex (term-pruned postings, stored df/stats).
    // TextIndexSpec proves the two produce bit-identical scores on
    // matching docs, and the synthetic corpus has hundreds of matches
    // for the fixed query — the top-10 is all-positive at every sf, so
    // BOTH twins carry t18's full DuckDB oracle (the stored index is
    // hash-checked cross-engine, not just spec-asserted). Index build
    // is memoized per (session, sf) like the b1 warehouse; the
    // median-of-3 discards the build run.
    Q("b2_bm25_raw", Some(TextAnalysis.bm25OracleSql(
        TextAnalysis.bm25Query, 10)),
      (s, d) => TextAnalysis.bm25TopK(T.documents(s, d),
        TextAnalysis.bm25Query, 10)),
    Q("b2_bm25_wh", Some(TextAnalysis.bm25OracleSql(
        TextAnalysis.bm25Query, 10)),
      (s, d) => TextIndex.query(textIndexed(s, d), "ti_b",
        TextAnalysis.bm25Query, 10)),

    // b2b — BATCHED BM25 serving, hash-checked: three queries (the
    // standard one, a reordered two-term subset, a single-term one)
    // answered by ONE term-pruned postings scan + per-query
    // term-index-ordered score folds; DuckDB replays each query's t18
    // arithmetic and the batch must match all three top-10s
    // bit-for-bit, per-query order included.
    Q("b2_bm25_batch_wh",
      Some(TextAnalysis.bm25BatchOracleSql(b2BatchQueries, 10)),
      (s, d) => TextIndex.queryBatch(textIndexed(s, d), "ti_b",
        b2BatchQueries, 10)),

    // b2t — QUERY-BY-TEXT serving, hash-checked: the same three
    // queries arrive as RAW STRINGS (the search-box shape) and
    // tokenize through the index's own analyzer over a LocalRelation
    // (no table read derives the terms — plan-asserted in
    // TextIndexSpec); scores and per-query order must still match
    // DuckDB's replay of each query's t18 arithmetic bit-for-bit.
    Q("b2_bm25_text_wh",
      Some(TextAnalysis.bm25BatchOracleSql(b2BatchQueries, 10)),
      (s, d) => TextIndex.queryTextBatch(textIndexed(s, d), "ti_b",
        b2BatchQueries.map { case (qid, ts) => (qid, ts.mkString(" ")) },
        10)),

    // b3 — the ANN serving twin: e4's native brute-force cosine vs the
    // stored IVF-PQ probe (cell-pruned codes + ADC + exact re-rank).
    // Rows-only (approximate ranking, recall floors spec-asserted in
    // AnnIndexSpec); the number tracks the SERVING path — probe +
    // partition-pruned scan + bounded re-rank — round over round.
    Q("b3_ann_wh", None, (s, d) =>
      AnnIndex.query(annIndexed(s, d), "ann_b", T.embeddings(s, d),
        queryId = 0L)),

    // b3f — the stored-ANN read path HASH-CHECKED cross-engine: under
    // a FULL probe (nProbe = every coarse cell) with overquery·topK ≥
    // corpus size, the ADC stage admits every stored code row and the
    // exact re-rank IS the brute-force top-k — independent of codebook
    // quality (AnnIndexSpec's "exact under full probe" invariant). So
    // the whole serving stack — coarse-cell ranking, `cell IN (…)`
    // partition-pruned codes scan, ADC lookup, bounded exact re-rank —
    // must reproduce DuckDB's exact-decimal cosine top-10 (e1's
    // oracle) bit-for-bit, through the STORED tables. b3_ann_wh stays
    // as the timed PROBED lane (the approximate production shape).
    // overquery 200 → 2000 admitted candidates, ≥ the embeddings table
    // at every testdata scale (500 at sf0.01, 2000 at sf0.1).
    Q("b3_ann_full_wh", Some(Similarity.exactCosineTopKSql()), (s, d) =>
      AnnIndex.query(annIndexed(s, d), "ann_b", T.embeddings(s, d),
        queryId = 0L, topK = 10, overquery = 200, nProbe = 8)),

    // b3b — BATCHED stored-ANN serving: 16 queries answered in ONE
    // distributed pass (query vectors + probe lists + ADC tables
    // broadcast, codes scanned once over the union of probed cells,
    // two-level per-query top-k). Rows-only like b3_ann_wh (probed =
    // approximate); the timed contrast is per-call driver-loop cost vs
    // one job for the whole set — the retrieval-service shape.
    Q("b3_ann_batch_wh", None, (s, d) =>
      AnnIndex.queryBatch(annIndexed(s, d), "ann_b", T.embeddings(s, d),
        queryIds = 0L until 16L)),

    // b3c — the batched path HASH-CHECKED cross-engine, b3f's logic
    // lifted to N queries: under a full probe with all-admitting
    // overquery, queryBatch must reproduce DuckDB's per-query exact
    // cosine top-10 bit-for-bit through the stored tables — per-query
    // ADC tables, the two-level (adc, vec_id) cut, the round-12
    // re-rank, and the (cosine desc, vec_id) tie-break all included.
    Q("b3_ann_batch_full_wh",
      Some(Similarity.exactCosineTopKBatchSql(Seq(0L, 1L, 2L))), (s, d) =>
      AnnIndex.queryBatch(annIndexed(s, d), "ann_b", T.embeddings(s, d),
        queryIds = Seq(0L, 1L, 2L), topK = 10, overquery = 200,
        nProbe = 8)),

    // b3v — QUERY-BY-VECTOR serving, hash-checked cross-engine: the
    // same three queries arrive as LITERAL vectors (the retrieval-
    // service shape — a live query is an unseen embedding; here the
    // literals happen to equal stored rows so DuckDB's exact per-query
    // cosine top-10 is the oracle). The query-vector derivation is a
    // LocalRelation (plan-asserted in AnnIndexSpec): no corpus scan
    // buys the query side; the full probe + all-admitting overquery
    // make the served ranking exact, so the entire literal path —
    // local normalize, driver ADC tables, pruned codes scan, two-level
    // cut, re-rank — must reproduce the oracle bit-for-bit.
    Q("b3_ann_vec_full_wh",
      Some(Similarity.exactCosineTopKBatchSql(Seq(0L, 1L, 2L))), (s, d) => {
      val raw = T.embeddings(s, d)
        .filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Double](1): Seq[Double])).toMap
      AnnIndex.queryVecBatch(annIndexed(s, d), "ann_b",
        T.embeddings(s, d), Seq(0L, 1L, 2L).map(id => id -> raw(id)),
        topK = 10, overquery = 200, nProbe = 8)
    }),

    // b15 — BATCHED HYBRID retrieval, both flavors over the SAME
    // dual-index warehouse. The probed lane is the timed serving shape
    // (3 hybrid queries: one postings scan + one codes scan + pool-
    // bounded fusions — rows-only, the dense lane is approximate). The
    // full lane is the HASH-CHECKED one: a full probe + all-admitting
    // overquery make the dense lane exact, the sparse lane is exact
    // always, so the ENTIRE stack — postings read, per-query BM25
    // folds, coarse probe, pruned codes scan, ADC, re-rank, per-query
    // RRF fusion — must reproduce DuckDB's three fused top-10s
    // bit-for-bit.
    // the single-query stored-hybrid lane: the per-call cost the batch
    // lane amortizes — read b15_hybrid_batch_wh against 3× this number
    Q("b15_hybrid_wh", None, (s, d) =>
      AnnIndex.hybridQuery(hybridIndexed(s, d), "annh_b", "tih_b",
        T.embeddings(s, d), TextAnalysis.bm25Query, queryId = 0L)),
    Q("b15_hybrid_batch_wh", None, (s, d) =>
      AnnIndex.hybridQueryBatch(hybridIndexed(s, d), "annh_b", "tih_b",
        T.embeddings(s, d), b15BatchQueries)),
    Q("b15_hybrid_batch_full_wh",
      Some(Similarity.hybridBatchOracleSql(b15BatchQueries, 10)),
      (s, d) => AnnIndex.hybridQueryBatch(hybridIndexed(s, d), "annh_b",
        "tih_b", T.embeddings(s, d), b15BatchQueries,
        topK = 10, pool = 50, overquery = 200, nProbe = 8)),

    // b15v — the FULL literal front door, hash-checked: each query
    // arrives as (id, raw TEXT, raw VECTOR) — the sparse lane
    // tokenizes through the index's analyzer, the dense lane
    // normalizes through the index's normalizer, both over
    // LocalRelations, both lanes under ONE snapshot cut — and the
    // fused per-query top-10 must reproduce DuckDB's replay of the
    // whole composition bit-for-bit (the literals equal stored rows,
    // so b15's oracle applies unchanged).
    Q("b15_hybrid_vec_full_wh",
      Some(Similarity.hybridBatchOracleSql(b15BatchQueries, 10)),
      (s, d) => {
        val raw = T.embeddings(s, d)
          .filter(col("vec_id").isin(b15BatchQueries.map(_._1): _*))
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .collect()
          .map(r => r.getLong(0) -> (r.getSeq[Double](1): Seq[Double]))
          .toMap
        AnnIndex.hybridQueryVecBatch(hybridIndexed(s, d), "annh_b",
          "tih_b", T.embeddings(s, d),
          b15BatchQueries.map { case (qid, ts) =>
            (qid, ts.mkString(" "), raw(qid)) },
          topK = 10, pool = 50, overquery = 200, nProbe = 8)
      }),

    // b4 — AGGREGATE-PUSHDOWN twins: the same min/max/count answered
    // by a full scan (raw) and from manifest metadata alone (wh —
    // statsAggregate; the plan is a LocalRelation, zero files opened,
    // spec-asserted). At 100 TB the raw side reads the table; the wh
    // side reads the manifest. Both carry the same DuckDB oracle, so
    // the metadata fold is hash-checked cross-engine — the per-file
    // stat strings must round-trip every extreme exactly (timestamps
    // included) for this row to stay green.
    Q("b4_minmax_raw", Some(b4Oracle), (s, d) =>
      T.lineitem(s, d).agg(
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"),
        min(col("l_extendedprice")).as("min_px"),
        max(col("l_extendedprice")).as("max_px"),
        min(col("l_shipdate")).as("min_sd"),
        max(col("l_shipdate")).as("max_sd"),
        count(lit(1)).as("cnt"))),
    Q("b4_minmax_wh", Some(b4Oracle), (s, d) =>
      warehouse(s, d).statsAggregate("lineitem_b",
          Seq("l_orderkey", "l_extendedprice", "l_shipdate"))
        .getOrElse(throw new IllegalStateException(
          "b4: lineitem_b stats must answer — setup declares them"))
        .select(col("min_l_orderkey").as("min_ok"),
          col("max_l_orderkey").as("max_ok"),
          col("min_l_extendedprice").as("min_px"),
          col("max_l_extendedprice").as("max_px"),
          col("min_l_shipdate").as("min_sd"),
          col("max_l_shipdate").as("max_sd"),
          col("cnt"))),

    // b8 — b4's PLAIN-SQL form: the same min/max/count written as
    // ordinary SELECT over the dw_ view and folded by the Catalyst
    // MetadataAggRewrite rule (no API call; the plan is a
    // LocalRelation, zero files opened). Re-binds the bench warehouse
    // each run — the session has ONE SQL binding slot and other lanes
    // may claim it — so the rewrite provably serves this lane; shares
    // b4's DuckDB oracle, so the rule's fold is hash-checked
    // cross-engine alongside the API path's.
    Q("b8_sql_minmax_wh", Some(b4Oracle), (s, d) => {
      warehouse(s, d).enableSql()
      s.sql("""SELECT min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
              |  min(l_extendedprice) AS min_px,
              |  max(l_extendedprice) AS max_px,
              |  min(l_shipdate) AS min_sd, max(l_shipdate) AS max_sd,
              |  count(*) AS cnt FROM dw_lineitem_b""".stripMargin)
    }),

    // b5 — PHRASE search served from the stored POSITIONAL index:
    // t22's scan recomputes token windows per query; the index answers
    // from its terms' postings alone (position-list intersection,
    // term-pruned read). Same DuckDB oracle as t22 — the stored
    // positions are hash-checked cross-engine.
    Q("b5_phrase_wh", Some(TextAnalysis.phraseOracleSql(
        TextAnalysis.phraseQueryTerms)),
      (s, d) => TextIndex.phraseQuery(textIndexed(s, d), "ti_b",
        TextAnalysis.phraseQueryTerms)),

    // b7 — PARTITION-GROUPED metadata aggregates: GROUP BY a partition
    // column answered from the manifest + the k=v path segments alone
    // (a file belongs to exactly one partition, so per-file stats fold
    // cleanly per group). The raw twin runs the real grouped scan; the
    // same DuckDB oracle hash-checks both.
    Q("b7_minmax_by_raw", Some(b7Oracle), (s, d) =>
      T.lineitem(s, d).groupBy("l_returnflag")
        .agg(min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),
    Q("b7_minmax_by_wh", Some(b7Oracle), (s, d) =>
      warehouse(s, d).statsAggregateBy("lineitem_p",
          Seq("l_returnflag"), Seq("l_orderkey"))
        .getOrElse(throw new IllegalStateException(
          "b7: lineitem_p partition stats must answer"))
        .select(col("l_returnflag"),
          col("min_l_orderkey").as("min_ok"),
          col("max_l_orderkey").as("max_ok"), col("cnt"))
        .orderBy("l_returnflag")),

    // b10 — the TOKEN-LEDGER twins: per-source size/count accounting
    // ("how many chars/docs does each domain contribute to the
    // mixture?") answered by a full grouped scan (raw) vs folded
    // entirely from the manifest's exact per-file DECIMAL(38,0) sums
    // (wh — plain SQL over the dw_ view, MetadataAggRewrite turns the
    // Aggregate into a LocalRelation; zero data files opened,
    // spec-asserted in MetadataAggRewriteSpec). At 100 TB the raw side
    // re-reads the corpus per budget question; the wh side reads the
    // manifest — and stays EXACT through appends because per-file sums
    // fold additively, unlike a cached approximate ledger. Both lanes
    // carry the same DuckDB oracle, so the sum fold is hash-checked
    // cross-engine (the HUGEINT cast included).
    Q("b10_ledger_raw", Some(b10Oracle), (s, d) =>
      T.documents(s, d).groupBy("source")
        .agg(sum(col("n_chars")).as("sum_chars"),
          count(lit(1)).as("cnt"), count(col("n_chars")).as("nn"))
        .orderBy("source")),
    Q("b10_ledger_wh", Some(b10Oracle), (s, d) => {
      warehouse(s, d).enableSql()
      s.sql("""SELECT source, sum(n_chars) AS sum_chars, count(*) AS cnt,
              |  count(n_chars) AS nn
              |FROM dw_documents_p GROUP BY source ORDER BY source""".stripMargin)
    }),

    // b12 — the MEAN-LEDGER twins: "mean doc length per source"
    // answered by a grouped scan (raw) vs avg folded from the
    // manifest's exact per-file sums and non-null counts (wh — the
    // MetadataAggRewrite avg lane; plans as a LocalRelation, zero
    // files opened, PlanQualitySpec-asserted). Both lanes carry the
    // same DuckDB oracle, so the fold is hash-checked cross-engine.
    Q("b12_avg_raw", Some(b12Oracle), (s, d) =>
      T.documents(s, d).groupBy("source")
        .agg(avg(col("n_chars")).as("avg_chars"),
          count(col("n_chars")).as("nn"))
        .orderBy("source")),
    Q("b12_avg_wh", Some(b12Oracle), (s, d) => {
      warehouse(s, d).enableSql()
      s.sql("""SELECT source, avg(n_chars) AS avg_chars, count(n_chars) AS nn
              |FROM dw_documents_p GROUP BY source ORDER BY source""".stripMargin)
    }),

    // b14 — the DECIMAL-LEDGER twins: per-source sum/mean of a
    // fixed-point price column, by grouped scan (raw) vs folded from
    // the manifest's exact per-file DECIMAL sums (wh —
    // statsAggregateBy; the fold answers in Spark's own Sum result
    // type decimal(22,2), then both lanes settle to double for the
    // cross-engine hash). The cost-accounting question ("what does
    // each source's data cost?") joins the token ledger in never
    // paying a scan.
    Q("b14_ledger_dec_raw", Some(b14Oracle), (s, d) =>
      T.documents(s, d)
        .select(col("source"),
          expr("cast(n_chars * 0.25 as decimal(12,2))").as("price"),
          col("n_chars"))
        .groupBy("source")
        .agg(sum(col("price")).cast("double").as("sum_price"),
          (sum(col("price")).cast("double") / count(col("n_chars")))
            .as("avg_price"),
          count(col("n_chars")).as("nn"))
        .orderBy("source")),
    Q("b14_ledger_dec_wh", Some(b14Oracle), (s, d) =>
      warehouse(s, d).statsAggregateBy("documents_dec", Seq("source"),
          Seq("price"), withSums = true, withAvgs = true)
        .getOrElse(throw new IllegalStateException(
          "b14: documents_dec decimal sums must answer — setup declares them"))
        .select(col("source"),
          col("sum_price").cast("double").as("sum_price"),
          col("avg_price").as("avg_price"), col("cnt").as("nn"))
        .orderBy("source")),

    // b11 — the DECONTAMINATION-FIREWALL serving twins: "is this
    // delivery batch clean of the eval suite?" answered by recomputing
    // the suite's grams per question (raw — re-shingles the src0 docs
    // every time) vs a read of the stored [[ContamGate]] digests (wh —
    // the batch's grams broadcast onto the stored 16-byte digest scan;
    // no benchmark text touched at serving, ever). Same batch shape as
    // b9 (the 100 top-id docs); both lanes carry the same DuckDB
    // oracle, so the stored digests are hash-checked cross-engine.
    Q("b11_contam_raw", Some(b11Oracle), (s, d) => {
      val docs = T.documents(s, d)
      val split = docs.agg(max("doc_id")).first().getLong(0) - 100
      // row-local gram dedup (d10's rationale — the corpus-wide
      // distinct() Exchange dedups nothing a per-row sorted pass
      // cannot; r17, guide §2.4)
      val ex = docs
        .select(col("doc_id"), col("source"),
          org.apache.spark.sql.functions.split(trim(col("text")), "\\s+")
            .as("ts"))
        .filter(size(col("ts")) >= 8)
        .select(col("doc_id"), col("source"),
          explode(graft.functions.VectorFunctions
            .gramDigests(col("ts"), 8)).as("h"))
      val bench = ex.filter(col("source") === "src0").select("h").distinct()
      val batch = docs.filter(col("doc_id") > split).select("doc_id")
      val hits = ex.join(batch, Seq("doc_id"), "left_semi")
        .join(broadcast(bench), Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
      batch.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("shared_grams"), lit(0L)).as("shared_grams"),
          when(col("shared_grams").isNull, 1).otherwise(0).as("keep"))
        .orderBy("doc_id")
    }),
    Q("b11_contam_wh", Some(b11Oracle), (s, d) => {
      val docs = T.documents(s, d)
      val split = docs.agg(max("doc_id")).first().getLong(0) - 100
      ContamGate.verdicts(contamIndexed(s, d), "cg_b",
        docs.filter(col("doc_id") > split)).orderBy("doc_id")
    }),

    // b13 — per-suite contamination BLAME, hash-checked cross-engine:
    // the same delivery batch judged against a TWO-suite gate (src0
    // and src1 ingested as separate suites), with verdictsBySuite
    // attributing each convicted doc to the suite(s) whose digests it
    // shares — the triage lens a multi-suite firewall needs ("which
    // benchmark leaked into this crawl?"). DuckDB replays the
    // per-(doc, suite) distinct-digest counts exactly.
    Q("b13_contam_suite_wh", Some(b13Oracle), (s, d) => {
      val docs = T.documents(s, d)
      val split = docs.agg(max("doc_id")).first().getLong(0) - 100
      ContamGate.verdictsBySuite(contamIndexed2(s, d), "cg_b2",
        docs.filter(col("doc_id") > split))
    }),

    // b16 — the BLAME-LEDGER aggregation, hash-checked: the exact
    // per-suite drop counts ingestBatch(blameSuites = true) records —
    // countDistinct(doc) per convicting suite off the same stored
    // two-suite gate; DuckDB replays the whole attribution.
    Q("b16_blame_agg_wh", Some(b16Oracle), (s, d) => {
      val docs = T.documents(s, d)
      val split = docs.agg(max("doc_id")).first().getLong(0) - 100
      ContamGate.verdictsBySuite(contamIndexed2(s, d), "cg_b2",
          docs.filter(col("doc_id") > split))
        .groupBy("suite")
        .agg(countDistinct(col("doc_id")).as("drops"))
        .orderBy("suite")
    }),

    // b17 — the MAINTAINED index, hash-checked end-to-end: build on a
    // quarter of the corpus, three incremental refreshes, a remove,
    // then OPTIMIZE (the df LSM major fold + postings/doclen debris
    // pack + tombstone fold against a base that still carries the
    // removed docs, so the tombstones correctly SURVIVE) — and the
    // optimized index must still reproduce DuckDB's from-scratch BM25
    // over the surviving corpus bit-for-bit. This is the lane that
    // hash-checks the whole maintenance lifecycle cross-engine: if the
    // fold ever lost a segment, double-counted a df, resurrected a
    // removed doc, or the debris pack dropped a postings row, this
    // row goes red.
    Q("b17_optimized_bm25_wh",
      Some(TextAnalysis.bm25OracleSql(TextAnalysis.bm25Query, 10,
        excludeIds = b17Removed)),
      (s, d) => TextIndex.query(optimizedIndexed(s, d), "ti_o",
        TextAnalysis.bm25Query, 10)),

    // b18 — b17's VECTOR twin: the maintained ANN index hash-checked
    // end-to-end. Build on a quarter of the corpus, three incremental
    // refreshes (each anti-join re-screening the already-encoded
    // residues), a right-to-be-forgotten remove, then OPTIMIZE (the
    // per-cell codes debris pack + the tombstone fold against a base
    // that still carries the removed vectors, so the guards correctly
    // SURVIVE) — and a FULL probe with all-admitting overquery through
    // the optimized index must still reproduce DuckDB's brute-force
    // cosine top-10 over the SURVIVING corpus bit-for-bit (the
    // full-probe trick makes the check codebook-independent, exactly
    // like b3_ann_full_wh — the quarter-trained codebooks affect
    // candidate order, never the exact re-rank's verdict). A code row
    // lost in the pack, a resurrected vector, or a cell directory
    // broken by the compaction goes red here.
    Q("b18_optimized_ann_wh",
      Some(Similarity.exactCosineTopKSql(excludeIds = b18Removed)),
      (s, d) => AnnIndex.query(optimizedAnnIndexed(s, d), "ann_o",
        T.embeddings(s, d), queryId = 0L, topK = 10, overquery = 200,
        nProbe = 8)),

    // b19 — EXACT adaptive serving, hash-checked: the cell-bound
    // terminated search (probe cells best-first by centroid-distance −
    // stored radius, stop when every unprobed cell bounds past the
    // k-th exact distance) must reproduce DuckDB's brute-force cosine
    // top-10 bit-for-bit — WITHOUT the full-probe crutch b3f leans on:
    // the adaptive stop itself is what this lane hash-checks. The
    // filtered twin restricts both engines BEFORE ranking (the
    // filtered-search semantics every probe here implements).
    Q("b19_exact_ann_wh", Some(Similarity.exactCosineTopKSql()),
      (s, d) => AnnIndex.query(annIndexed(s, d), "ann_b",
        T.embeddings(s, d), queryId = 0L, topK = 10, exact = true)),
    Q("b19_exact_filtered_wh",
      Some(Similarity.exactCosineTopKSql(
        whereSql = Some("e.vec_id % 3 = 0"))),
      (s, d) => AnnIndex.query(annIndexed(s, d), "ann_b",
        T.embeddings(s, d), queryId = 0L, topK = 10,
        filter = Some(col("vec_id") % 3 === 0), exact = true)),

    // b21 — the STORED-VECTOR exact read path, hash-checked: a
    // vector-storing index (build storeVectors + a refresh that must
    // carry the raw column) serves EXACT from the probed partitions'
    // OWN raw vectors — zero source I/O — and must still reproduce
    // DuckDB's brute-force cosine bit-for-bit. A vec column dropped
    // by refresh, a stale raw value, or a stored/source arithmetic
    // drift goes red here (b19 cannot catch those: it reads the
    // source).
    Q("b21_vec_exact_ann_wh", Some(Similarity.exactCosineTopKSql()),
      (s, d) => AnnIndex.query(vecAnnIndexed(s, d), "ann_v",
        T.embeddings(s, d), queryId = 0L, topK = 10, exact = true)),

    // b20 — GEOMETRY EVOLUTION, hash-checked end-to-end (b18's trick
    // on the re-shape lifecycle): build SMALL (4 cells on a quarter of
    // the corpus), refresh to full, remove, then retrainAs to 16 cells
    // — and a FULL probe through the RE-SHAPED index must still
    // reproduce DuckDB's brute-force cosine over the surviving corpus
    // bit-for-bit. A tombstone lost in the re-shape, a code row
    // encoded under the wrong codebook, or a torn three-table swap
    // goes red here.
    Q("b20_reshaped_ann_wh",
      Some(Similarity.exactCosineTopKSql(excludeIds = b18Removed)),
      (s, d) => AnnIndex.query(reshapedAnnIndexed(s, d), "ann_g",
        T.embeddings(s, d), queryId = 0L, topK = 10, overquery = 200,
        nProbe = 16)),

    // b6 — NEAR/proximity twin of b5 over the same stored positions
    Q("b6_near_wh", Some(TextAnalysis.nearOracleSql(
        TextAnalysis.nearQueryTerms._1, TextAnalysis.nearQueryTerms._2,
        TextAnalysis.nearQueryTerms._3)),
      (s, d) => TextIndex.nearQuery(textIndexed(s, d), "ti_b",
        TextAnalysis.nearQueryTerms._1, TextAnalysis.nearQueryTerms._2,
        TextAnalysis.nearQueryTerms._3)),

    // I4 — incrementally-maintained JOIN view, end state oracle-checked:
    // bootstrap orders⋈customer, then drive a delta batch through the
    // warehouse (predicate DELETE, dim UPDATE, fact APPEND) and refresh
    // from the row-level change feeds. The MV's aggregate must equal
    // DuckDB's from-scratch join over the same mutations — the
    // maintenance algebra (affected ids ∪ affected dim keys, file
    // surgery, exactly-once version stamps) is hash-checked
    // cross-engine, not just spec-asserted.
    Q("i4_join_mv", Some(i4Oracle), (s, d) =>
      joinMv(s, d).table("orders_mv")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")),

    // b9 — the DEDUP-GATE serving twins: "which of this batch have we
    // already got?" answered by re-running the whole LSH sweep (raw —
    // re-MinHashes every corpus document per question) vs a read of
    // the stored DedupIndex (wh — the batch's bands broadcast onto the
    // bh-pruned bucket-min segments; the corpus text is never touched
    // again). The batch is the SERVING shape — the 100 top-id docs, a
    // delivery-batch-sized probe under the bh-IN file-skip cap —
    // judged against everything; the raw lane's cost stays
    // corpus-sized however small the question is, which IS the
    // contrast the index exists for. Both lanes carry the same DuckDB
    // oracle, so the STORED bucket mins are hash-checked cross-engine.
    Q("b9_neardup_raw", Some(Dedup.lshAssignOracleSql(
        where = "a.doc_id > (SELECT max(doc_id) - 100 FROM documents)")),
      (s, d) => {
        val docs = T.documents(s, d)
        val split = docs.agg(max("doc_id")).first().getLong(0) - 100
        Dedup.lshDedupAssign(docs)
          .filter(col("doc_id") > split).orderBy("doc_id")
      }),
    Q("b9_neardup_wh", Some(Dedup.lshAssignOracleSql(
        where = "a.doc_id > (SELECT max(doc_id) - 100 FROM documents)")),
      (s, d) => {
        val docs = T.documents(s, d)
        val split = docs.agg(max("doc_id")).first().getLong(0) - 100
        DedupIndex.verdicts(dedupIndexed(s, d), "di_b",
          docs.filter(col("doc_id") > split)).orderBy("doc_id")
      })
  )

  private val diCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  private def dedupIndexed(s: SparkSession, d: String): Warehouse =
    memoized(diCache, "graft_dibench")(
      w => DedupIndex.build(w, "di_b", T.documents(s, d)))(s, d)

  private val cgCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  private def contamIndexed(s: SparkSession, d: String): Warehouse =
    memoized(cgCache, "graft_cgbench")(
      w => ContamGate.build(w, "cg_b",
        T.documents(s, d).filter(col("source") === "src0")))(s, d)

  // b13's two-suite gate: src0 and src1 each ingested under their own
  // suite tag (build + refresh — the additive multi-suite lifecycle)
  private val cg2Cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  private def contamIndexed2(s: SparkSession, d: String): Warehouse =
    memoized(cg2Cache, "graft_cg2bench") { w =>
      ContamGate.build(w, "cg_b2",
        T.documents(s, d).filter(col("source") === "src0"),
        suite = "src0")
      ContamGate.refresh(w, "cg_b2",
        T.documents(s, d).filter(col("source") === "src1"),
        suite = "src1")
      ()
    }(s, d)

  // one memoizer shape for every serving-path warehouse: keyed per
  // (session, sf dir) — see the cache comment above — with the setup
  // paid on first use only
  private def memoized(cache: scala.collection.concurrent.TrieMap[
        (SparkSession, String), Warehouse],
      prefix: String)(setup: Warehouse => Unit)(
      s: SparkSession, d: String): Warehouse =
    cache.getOrElseUpdate((s, d), {
      val w = new Warehouse(s, java.nio.file.Files
        .createTempDirectory(prefix).toString)
      setup(w)
      w
    })

  private val tiCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]
  private val annCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  private def textIndexed(s: SparkSession, d: String): Warehouse =
    memoized(tiCache, "graft_tibench")(
      w => TextIndex.build(w, "ti_b", T.documents(s, d)))(s, d)

  /** b17's removed doc ids — present at every testdata sf (they index
    * in the r=3 refresh below: 3 % 4 = 7 % 4 = 3). Shared with the
    * oracle's exclusion list. A def, not a val: the lane list above
    * references it during object init. */
  private def b17Removed = Seq(3L, 7L)

  private val optCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  /** b17's maintained index: incremental build-out (a quarter per
    * step, each refresh's anti-join re-screening the already-indexed
    * residues), a right-to-be-forgotten remove, then the full
    * OPTIMIZE. The tombstone fold runs against the FULL corpus — it
    * still carries the removed docs, so their guards are live and
    * must survive (and the lane's oracle proves they kept the docs
    * out). */
  private def optimizedIndexed(s: SparkSession, d: String): Warehouse =
    memoized(optCache, "graft_optbench") { w =>
      val docs = T.documents(s, d)
      TextIndex.build(w, "ti_o", docs.filter(col("doc_id") % 4 === 0))
      (1 to 3).foreach { r =>
        TextIndex.refresh(w, "ti_o", docs.filter(col("doc_id") % 4 <= r))
        ()
      }
      TextIndex.remove(w, "ti_o", b17Removed)
      TextIndex.optimize(w, "ti_o", source = Some(docs))
      ()
    }(s, d)

  private def annIndexed(s: SparkSession, d: String): Warehouse =
    memoized(annCache, "graft_annbench")(
      w => AnnIndex.build(w, "ann_b", T.embeddings(s, d)))(s, d)

  private val vecAnnCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  /** b21's vector-storing index: built on half the corpus, refreshed
    * to full — the refresh leg is the point (it must CARRY the raw
    * column, not just build-time writes). */
  private def vecAnnIndexed(s: SparkSession, d: String): Warehouse =
    memoized(vecAnnCache, "graft_vecannbench") { w =>
      val emb = T.embeddings(s, d)
      AnnIndex.build(w, "ann_v", emb.filter(col("vec_id") % 2 === 0),
        storeVectors = true)
      AnnIndex.refresh(w, "ann_v", emb)
      ()
    }(s, d)

  /** b18's removed vector ids — present at every testdata sf, indexed
    * in the final (r = 3) refresh like b17's docs (3 % 4 = 7 % 4 = 3);
    * shared with the oracle's exclusion list. */
  private def b18Removed = Seq(3L, 7L)

  private val optAnnCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  /** b18's maintained ANN index — [[optimizedIndexed]]'s vector twin:
    * incremental build-out (a quarter per step), a remove, then the
    * full OPTIMIZE. The tombstone fold runs against the FULL corpus —
    * it still carries the removed vectors, so their guards are live
    * and must survive (the lane's oracle proves they kept the vectors
    * out of the probe). */
  private def optimizedAnnIndexed(s: SparkSession, d: String): Warehouse =
    memoized(optAnnCache, "graft_optannbench") { w =>
      val emb = T.embeddings(s, d)
      AnnIndex.build(w, "ann_o", emb.filter(col("vec_id") % 4 === 0))
      (1 to 3).foreach { r =>
        AnnIndex.refresh(w, "ann_o", emb.filter(col("vec_id") % 4 <= r))
        ()
      }
      AnnIndex.remove(w, "ann_o", b18Removed)
      AnnIndex.optimize(w, "ann_o", source = Some(emb))
      ()
    }(s, d)

  private val reshapeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  /** b20's re-shaped ANN index — the geometry-evolution lifecycle:
    * built at 4 cells on a quarter of the corpus (the shape a small
    * early corpus deserves), grown to full via refreshes, a remove,
    * then [[AnnIndex.retrainAs]] to 16 cells — the atomic re-cell an
    * index outgrown by its corpus takes instead of drop-and-recreate.
    * The lane's full probe proves answers survived the re-shape. */
  private def reshapedAnnIndexed(s: SparkSession, d: String): Warehouse =
    memoized(reshapeCache, "graft_reshapebench") { w =>
      val emb = T.embeddings(s, d)
      AnnIndex.build(w, "ann_g", emb.filter(col("vec_id") % 4 === 0),
        nCells = 4)
      (1 to 3).foreach { r =>
        AnnIndex.refresh(w, "ann_g", emb.filter(col("vec_id") % 4 <= r))
        ()
      }
      AnnIndex.remove(w, "ann_g", b18Removed)
      AnnIndex.retrainAs(w, "ann_g", emb, nCells = 16, m = 8, k = 16)
      ()
    }(s, d)

  // b15's dual-index warehouse: the hybrid lanes need BOTH stored
  // indexes behind one warehouse
  private val hybCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  private def hybridIndexed(s: SparkSession, d: String): Warehouse =
    memoized(hybCache, "graft_hybbench") { w =>
      AnnIndex.build(w, "annh_b", T.embeddings(s, d))
      TextIndex.build(w, "tih_b", T.documents(s, d))
      ()
    }(s, d)

  // ── i4: the join-MV lifecycle (bootstrap → mutate → refresh) ──────
  private val mvCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Warehouse]

  private def joinMv(s: SparkSession, d: String): Warehouse =
    memoized(mvCache, "graft_jmvbench") { w =>
      import s.implicits._
      w.save("orders_f", T.orders(s, d)
        .repartitionByRange(4, col("o_orderkey")),
        clusterBy = Seq("o_orderkey"))
      w.save("customer_d", T.customer(s, d)
        .withColumnRenamed("c_custkey", "o_custkey").coalesce(1))
      w.refreshJoinView("orders_f", "customer_d", "orders_mv",
        Seq("o_custkey"), "o_orderkey", bootstrapFiles = 4)
      // the delta batch: predicate delete + dim update + fact append
      w.delete("orders_f", col("o_orderkey") % 97 === 0)
      w.update("customer_d", col("o_custkey") === 7L,
        Map("c_mktsegment" -> lit("FORGOTTEN")))
      w.append("orders_f", i4Appends
        .toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "ts", "o_orderpriority")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          // the source parquet is tz-free µs → Spark reads NTZ; the
          // appended literal must match that physical type
          col("ts").cast("timestamp_ntz").as("o_orderdate"),
          col("o_orderpriority")))
      w.refreshJoinView("orders_f", "customer_d", "orders_mv",
        Seq("o_custkey"), "o_orderkey")
    }(s, d)

}
