package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and dataset splitting — the
  * way a training-data pipeline carves train/val/test (or a p% sample)
  * out of a corpus so that membership is a PURE FUNCTION of the row's
  * id: reproducible across runs, engines, cluster sizes, and data
  * relocation, with no RNG state to coordinate and no shuffle — a
  * per-row codegen'd hash inside the scan stage. (Spark's `sample()` /
  * `randomSplit()` are seeded per-partition and change membership when
  * the file layout changes — unusable for stable corpus splits.)
  *
  * Bucket = first 8 hex digits of md5(id) as an integer mod `buckets`
  * — uniform, and bit-identical in every engine with an md5 function
  * (the repo-wide cross-engine hashing pattern).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** 90/5/5 train/val/test split label. */
  def splitLabel(id: Column): Column = {
    val b = hashBucket(id)
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  /** Epoch `epoch`'s deterministic permutation prefix: the first `n`
    * rows of the corpus under md5("<epoch>:<id>") order — a pure
    * function of (epoch, id), so the permutation is identical on any
    * cluster layout and after any restart, and DISTINCT epochs give
    * decorrelated orders (md5 avalanche on the seed prefix) — the
    * multi-epoch data-ordering contract a training loop needs. Plans
    * as TakeOrderedAndProject (per-partition top-n + bounded merge),
    * never a global sort. */
  def epochShuffle(df: org.apache.spark.sql.DataFrame, idCol: String,
      epoch: Int, n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
      md5(concat(lit(s"$epoch:"), col(idCol).cast("string"))).as("h"))
      .orderBy("h").limit(n)

  /** The FULL-ROW sharded form of [[epochShuffle]] — what the training
    * loop's dataloader actually consumes: every row of `df` placed in
    * epoch `epoch`'s deterministic permutation, cut into `nShards`
    * hash-RANGE shards with an explicit within-shard position. Shard
    * boundaries are contiguous ranges of the epoch hash, so
    * concatenating shards 0..n-1 (each read in `pos` order) replays
    * the EXACT global permutation — yet nothing ever globally sorts:
    * shard membership is a pure closed-form function of (epoch, id)
    * (first 8 hex of the hash scaled by nShards — NOT
    * repartitionByRange, whose sampled boundaries change with layout
    * and would un-reproduce shard membership), and `pos` is one
    * row_number window hash-partitioned by shard — one exchange on the
    * shard key, per-shard local sorts, each bounded by corpus/nShards
    * (pick nShards for the shard-file size you want; the plan is
    * asserted global-Sort-free in SamplingSpec). Composes with sp10's
    * packing downstream. Returns df.* + (h, shard, pos). */
  def epochShards(df: org.apache.spark.sql.DataFrame, idCol: String,
      epoch: Int, nShards: Int): org.apache.spark.sql.DataFrame = {
    require(nShards > 0, s"epochShards: nShards must be positive")
    // withColumn REPLACES a same-named input column silently — an input
    // already carrying one of the outputs (or the temp) would lose it
    // without error; refuse loudly (the repo-wide convention)
    val clash = df.columns.toSet
      .intersect(Set("h", "shard", "pos", "__p"))
    require(clash.isEmpty,
      s"epochShards: input already has column(s) ${clash.mkString(", ")} " +
        "— they collide with the (h, shard, pos) outputs; rename upstream")
    import org.apache.spark.sql.expressions.Window
    // first 32 hash bits scaled to [0, nShards) — exact integer
    // arithmetic (≤ 2^32·nShards ≪ 2^63), bit-identical cross-engine
    df.withColumn("h",
        md5(concat(lit(s"$epoch:"), col(idCol).cast("string"))))
      .withColumn("__p", conv(substring(col("h"), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("shard", expr(s"(__p * $nShards) div 4294967296"))
      .drop("__p")
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("h"), col(idCol))))
  }

  /** [[epochShards]] WRITTEN as shard files through the warehouse —
    * what the training loop's dataloader actually mounts: a table
    * PARTITIONED BY shard (shard k is its own directory, readable
    * independently) with exactly ONE file per shard whose row order IS
    * `pos` — so a sequential read of shard k's file streams epoch
    * `epoch`'s permutation slice with no sort at read time, and
    * concatenating shards 0..n-1 replays the exact global permutation.
    * The write needs no global sort either: [[epochShards]]'s window
    * already hash-partitions by shard (each shard lands wholly in one
    * task, rows (shard, pos)-sorted), and the save's `clusterBy(pos)`
    * is a sort WITHIN partitions — one exchange total, the shard one.
    * Per-file min/max stats on `pos` let a range read (`pos BETWEEN`)
    * skip row groups — the mid-epoch-resume read shape. Composes with
    * sp10: pack first ([[packSequences]]), then shard the packed frame
    * — the spec pins the composition. Returns rows written. */
  def writeEpochShards(wh: graft.olist.Warehouse, table: String,
      df: org.apache.spark.sql.DataFrame, idCol: String, epoch: Int,
      nShards: Int): Long = {
    val shards = epochShards(df, idCol, epoch, nShards)
    wh.save(table, shards, partitionBy = Seq("shard"),
      clusterBy = Seq("pos"))
    wh.countRows(table).getOrElse(wh.table(table).count())
  }

  /** DuckDB rendering of [[hashBucket]] (oracle side). */
  def bucketSql(idExpr: String, buckets: Int = 100): String =
    s"(('0x' || substr(md5(cast($idExpr as varchar)), 1, 8))::BIGINT % $buckets)"

  val all: Seq[Q] = Seq(
    // SP1 — deterministic 90/5/5 split: per-document label plus the
    // per-split corpus accounting a pipeline run would log.
    Q("sp1_hash_split",
      Some(s"""SELECT split, count(*) AS n_docs,
              |       cast(sum(length(text)) as bigint) AS total_chars
              |FROM (SELECT text,
              |        CASE WHEN ${bucketSql("doc_id")} < 90 THEN 'train'
              |             WHEN ${bucketSql("doc_id")} < 95 THEN 'val'
              |             ELSE 'test' END AS split
              |      FROM documents)
              |GROUP BY split ORDER BY split""".stripMargin),
      (s, d) => T.documents(s, d)
        .select(col("text"), splitLabel(col("doc_id")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("total_chars"))
        .orderBy("split")),

    // SP2 — stratified 10% sample: the same stable bucket filtered
    // per-language, so every stratum is sampled at the same rate and a
    // re-run (or a different engine) selects the SAME documents.
    Q("sp2_stratified_sample",
      Some(s"""SELECT lang, doc_id
              |FROM documents
              |WHERE ${bucketSql("doc_id")} < 10
              |ORDER BY lang, doc_id""".stripMargin),
      (s, d) => T.documents(s, d)
        .filter(hashBucket(col("doc_id")) < 10)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")),

    // SP3 — weighted dataset mixing: each stratum is kept at its own
    // target rate (the "data recipe" step of a pretraining pipeline —
    // upweight scarce languages, downsample the dominant one). Same
    // stable-bucket membership, so the recipe reproduces exactly; the
    // whole mix is one shuffle-free filter over the scan.
    Q("sp3_weighted_mix",
      Some(s"""SELECT lang, count(*) AS n_docs
              |FROM documents
              |WHERE ${bucketSql("doc_id")} <
              |  CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50
              |            WHEN 'zh' THEN 100 ELSE 25 END
              |GROUP BY lang ORDER BY lang""".stripMargin),
      (s, d) => T.documents(s, d)
        .filter(hashBucket(col("doc_id")) <
          when(col("lang") === "en", 10)
            .when(col("lang") === "de", 50)
            .when(col("lang") === "zh", 100)
            .otherwise(25))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // SP4 — token-budget shard packing: assign each document to a
    // ~10k-token training shard by running-prefix token counts over a
    // DETERMINISTIC pseudo-random order (md5 of the id — the same
    // stable-hash idea as the splits, so shard membership reproduces).
    // The window partitions by language stratum: one hash shuffle on
    // lang, per-stratum sort, no global total order anywhere — at
    // corpus scale the stratum (or (stratum, split)) key keeps every
    // partition bounded. Output is the per-shard accounting.
    Q("sp4_token_shards",
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |    cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint) AS n_tokens,
             |    md5(cast(doc_id as varchar)) AS h
             |  FROM documents),
             |packed AS (
             |  SELECT lang, n_tokens,
             |    (sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
             |                         ROWS UNBOUNDED PRECEDING) - n_tokens) // 10000 AS shard
             |  FROM toks)
             |SELECT lang, cast(shard as bigint) AS shard, count(*) AS n_docs,
             |       cast(sum(n_tokens) as bigint) AS shard_tokens
             |FROM packed GROUP BY lang, shard ORDER BY lang, shard""".stripMargin),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("h", "doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        T.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("shard", expr("(cum - n_tokens) div 10000"))
          .groupBy("lang", "shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("shard_tokens"))
          .orderBy("lang", "shard")
      }),

    // sp5 — deterministic global shuffle order: training pipelines need
    // a reproducible random permutation of the corpus (shard assembly,
    // curriculum ordering) that never depends on partition layout.
    // md5(id) is a pure function of the row → the permutation is
    // identical on any cluster size, and ORDER BY h LIMIT k is
    // TakeOrderedAndProject (per-partition top-k + merge, no global
    // sort) — the only order-by shape that survives 100 TB.
    Q("sp5_shuffle",
      Some("""SELECT o_orderkey, md5(cast(o_orderkey as varchar)) AS h
             |FROM orders ORDER BY h LIMIT 1000""".stripMargin),
      (s, d) => T.orders(s, d)
        .select(col("o_orderkey"),
          md5(col("o_orderkey").cast("string")).as("h"))
        .orderBy("h").limit(1000)),

    // SP12 — multi-EPOCH deterministic shuffle: each training epoch
    // needs its OWN reproducible permutation (reusing one order feeds
    // the model the identical batch sequence every epoch; true random
    // breaks resume/replay). Seeding sp5's hash with the epoch number
    // gives a FAMILY of layout-independent permutations — a pure
    // function of (epoch, id), so epoch N's order reproduces
    // bit-for-bit on any cluster after any restart, and distinct
    // epochs decorrelate (md5 avalanche). Same TakeOrderedAndProject
    // shape as sp5 — no global sort at any size.
    Q("sp12_epoch_shuffle",
      Some("""SELECT o_orderkey, md5('2:' || cast(o_orderkey as varchar)) AS h
             |FROM orders ORDER BY h LIMIT 1000""".stripMargin),
      (s, d) => epochShuffle(T.orders(s, d), "o_orderkey",
        epoch = 2, n = 1000)),

    // SP13 — FULL-ROW sharded epoch stream: sp12 gave the permutation
    // PREFIX; the training loop's real consumer wants every row, in
    // epoch order, cut into shard files it can read independently.
    // Shards are contiguous hash ranges (closed-form from the first
    // 32 hash bits — a pure function of (epoch, id), unlike sampled
    // range boundaries), so (shard, pos) lexicographic order IS the
    // global permutation with no global sort anywhere: one exchange
    // on the shard key, per-shard row_number. Both engines replay the
    // assignment and the within-shard order bit-for-bit.
    Q("sp13_epoch_shards",
      Some("""WITH t AS (
             |  SELECT o_orderkey, o_custkey,
             |    md5('2:' || cast(o_orderkey as varchar)) AS h
             |  FROM orders),
             |s AS (
             |  SELECT o_orderkey, o_custkey, h,
             |    cast((('0x' || substr(h, 1, 8))::BIGINT * 8) // 4294967296
             |      AS BIGINT) AS shard
             |  FROM t)
             |SELECT o_orderkey, o_custkey, h, shard,
             |  row_number() OVER (PARTITION BY shard
             |                     ORDER BY h, o_orderkey) AS pos
             |FROM s ORDER BY shard, pos""".stripMargin),
      (s, d) => epochShards(T.orders(s, d)
          .select("o_orderkey", "o_custkey"), "o_orderkey",
          epoch = 2, nShards = 8)
        .orderBy("shard", "pos")),

    // SP6 — per-user TEMPORAL holdout split: each user's last ~20% of
    // events (by event time, event_id tie-break) become holdout, the
    // rest train — the leakage-free split an evaluation pipeline needs
    // (a hash split like sp1 leaks future behavior into training).
    // Pure integer arithmetic on per-user ranks: deterministic in both
    // engines, and the window hash-partitions by user — no global
    // sort, scale-safe. Holdout events are provably AFTER that user's
    // train events by construction.
    Q("sp6_time_split",
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us
             |           FROM events),
             |r AS (SELECT user_id, us, event_id,
             |        row_number() OVER (PARTITION BY user_id
             |                           ORDER BY us, event_id) AS rn,
             |        count(*) OVER (PARTITION BY user_id) AS cnt
             |      FROM e)
             |SELECT CASE WHEN rn * 5 <= cnt * 4 THEN 'train'
             |            ELSE 'holdout' END AS split,
             |       cast(count(*) AS BIGINT) AS n,
             |       cast(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = T.events(s, d).select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        val byUser = Window.partitionBy("user_id")
        // rn*5 <= cnt*4 ⇔ rn <= 0.8·cnt, in exact integer arithmetic
        e.withColumn("rn",
            row_number().over(byUser.orderBy(col("us"), col("event_id"))))
          .withColumn("cnt", count(lit(1)).over(byUser))
          .withColumn("split", when(col("rn") * 5 <= col("cnt") * 4, "train")
            .otherwise("holdout"))
          .groupBy("split")
          .agg(count(lit(1)).as("n"),
            countDistinct("user_id").as("n_users"))
          .orderBy("split")
      }),

    // SP7 — temperature resampling: downsample dominant languages so
    // the kept distribution flattens toward counts^alpha (the
    // multilingual rebalancing of mC4/XLM-R). Keep rate per language =
    // (cnt_min/cnt)^(1-alpha); alpha = 0.5 makes that a single sqrt —
    // IEEE-correctly-rounded in BOTH engines, so the integer threshold
    // floor(rate·10000) is bit-reproducible where a pow(x, 0.7) could
    // straddle a last-ulp boundary. Membership is the same md5 bucket
    // function as sp1-sp3: a pure function of doc_id, independent of
    // partitioning. The smallest language keeps everything by
    // construction. Counts frame is |langs| rows — broadcast; the
    // corpus is filtered map-side.
    Q("sp7_temperature_mix",
      Some(s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
              |m AS (SELECT min(cnt) AS cmin FROM c),
              |r AS (SELECT lang, cnt,
              |        cast(floor(sqrt(cast(cmin AS DOUBLE) / cnt) * 10000) AS BIGINT)
              |          AS thresh
              |      FROM c, m)
              |SELECT d.lang,
              |  cast(max(r.cnt) AS BIGINT) AS n_total,
              |  cast(count(*) AS BIGINT) AS n_kept
              |FROM documents d JOIN r ON d.lang = r.lang
              |WHERE ${bucketSql("d.doc_id", 10000)} < r.thresh
              |GROUP BY d.lang ORDER BY d.lang""".stripMargin),
      (s, d) => {
        val docs = T.documents(s, d)
        val c = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
        val cmin = c.agg(min("cnt").as("cmin"))
        val r = c.crossJoin(broadcast(cmin))
          .select(col("lang"), col("cnt"),
            floor(sqrt(col("cmin").cast("double") / col("cnt")) * 10000)
              .cast("long").as("thresh"))
        docs.join(broadcast(r), "lang")
          .filter(hashBucket(col("doc_id"), 10000) < col("thresh"))
          .groupBy("lang")
          .agg(max(col("cnt")).cast("long").as("n_total"),
            count(lit(1)).as("n_kept"))
          .orderBy("lang")
      }),

    // SP8 — DSIR: Data Selection with Importance Resampling (Xie et
    // al. 2023, arXiv:2302.03169) — the model-free way to tilt a raw
    // corpus toward a target domain. Features are hashed word unigrams
    // (1024 md5 buckets — the paper's hashed n-grams); the target
    // distribution here is the corpus's own lang='en' slice standing in
    // for the target domain. Per doc the log importance weight is
    //   λ(d) = Σ_tokens ln p̂_target[b] − ln p̂_raw[b]
    // with +1 Laplace smoothing, and selection is the paper's Gumbel
    // top-k: key = λ + Gumbel noise derived DETERMINISTICALLY from
    // md5(doc_id) (u = (h+0.5)/2^32, g = −ln(−ln u)), take the k =
    // ⌈10%·N⌉ largest keys. Every per-token ln argument is a ratio of
    // EXACT bigint products (< 2^53, so the double division is
    // correctly rounded identically in both engines); the per-doc sum
    // and the final key round(6) to absorb summation-order ulp — the
    // t13 contract. Scale shape: both count tables broadcast (≤1024
    // rows), the corpus is scanned twice (count, score) with one
    // groupBy(doc_id) shuffle, and selection avoids any global window:
    // the k-th (key, −id) boundary comes from a distributed
    // TakeOrderedAndProject and broadcasts back as one row.
    Q("sp8_dsir_select",
      Some("""WITH tok AS (SELECT doc_id, lang,
              |        unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
              |      FROM documents),
              |tb AS (SELECT doc_id, lang,
              |        ('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS b FROM tok),
              |r AS (SELECT b, count(*) AS c_r FROM tb GROUP BY b),
              |g AS (SELECT b, count(*) AS c_t FROM tb WHERE lang = 'en' GROUP BY b),
              |tr AS (SELECT sum(c_r) AS t_r FROM r),
              |tg AS (SELECT sum(c_t) AS t_t FROM g),
              |terms AS (SELECT tb.doc_id,
              |        ln(cast((coalesce(g.c_t, 0) + 1) * (tr.t_r + 1024) AS DOUBLE)
              |           / ((r.c_r + 1) * (tg.t_t + 1024))) AS term
              |      FROM tb JOIN r USING (b) LEFT JOIN g USING (b), tr, tg),
              |d AS (SELECT doc_id, count(*) AS n_tokens, sum(term) AS lw
              |      FROM terms GROUP BY doc_id),
              |keyed AS (SELECT doc_id, n_tokens, round(lw, 6) AS logw,
              |        round(lw - ln(-ln(
              |          (('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::BIGINT
              |            + 0.5) / 4294967296)), 6) AS gkey
              |      FROM d),
              |rk AS (SELECT *, rank() OVER (ORDER BY gkey DESC, doc_id) AS rnk,
              |        count(*) OVER () AS n FROM keyed)
              |SELECT doc_id, n_tokens, logw, gkey,
              |  CASE WHEN rnk <= cast(ceil(0.1 * n) AS BIGINT) THEN 1 ELSE 0 END
              |    AS selected
              |FROM rk ORDER BY doc_id""".stripMargin),
      (s, d) => dsirSelect(T.documents(s, d), col("lang") === "en", 0.1)
        .orderBy("doc_id"))
  ,

    // SP9 — per-source quota cap: "at most N documents per domain",
    // the over-represented-domain guard every web-scale recipe applies
    // (C4 caps pages per host; RefinedWeb caps per registered domain).
    // Within each source the keep set is the N docs with the SMALLEST
    // stable hash key — membership is a pure function of (doc_id,
    // source, N): reproducible across runs, layouts, and engines, and
    // adding documents to a source never evicts more than the overflow.
    // Rank = row_number over (hash key, doc_id) partitioned by source —
    // ONE shuffle on the group key; each group sorts independently
    // (the w3 per-group-top-k shape). A pathologically hot domain sorts
    // in one task — the mitigation at 100 TB is the same two-level
    // trick sp3 uses: pre-filter with an approximate hash-rate gate
    // (cap/count) before the exact rank, which this composes with.
    Q("sp9_source_cap",
      Some(s"""SELECT doc_id, source, rk,
              |  CASE WHEN rk <= 15 THEN 1 ELSE 0 END AS kept
              |FROM (SELECT doc_id, source,
              |        row_number() OVER (PARTITION BY source
              |          ORDER BY ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::BIGINT,
              |            doc_id) AS rk
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin),
      (s, d) => sourceCap(T.documents(s, d), col("source"), 15)
        .orderBy("doc_id"))
  ,

    // SP10 — sequence packing: map each document onto the fixed-length
    // context windows (ctx = 2048 tokens) a pretraining dataloader
    // cuts from the concatenated token stream — GPT-style packing,
    // where documents CROSS window boundaries rather than pad (sp4 is
    // the shard ACCOUNTING; this is the doc → (sequence, offset)
    // map the loader actually indexes by). Stream order is the same
    // stable (md5, id) permutation as sp4/sp5, and the stream is
    // per-LANGUAGE (window partitioned by lang): one hash shuffle on
    // the stratum key, per-stratum running sums, no global total
    // order — the same property that makes sp4 scale. Every output
    // column is exact integer arithmetic: start_tok = prefix sum −
    // own tokens, first/last window by integer division, n_seqs the
    // difference — no float anywhere.
    Q("sp10_pack",
      // DuckDB's windowed sum(BIGINT) yields HUGEINT, which pandas
      // renders as float and breaks the driver's value hash (the a15
      // trap) — every derived column is CAST back to BIGINT.
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |    cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint) AS n_tokens,
             |    md5(cast(doc_id as varchar)) AS h
             |  FROM documents),
             |packed AS (
             |  SELECT doc_id, lang, n_tokens,
             |    cast(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
             |                        ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
             |  FROM toks)
             |SELECT doc_id, lang, n_tokens, start_tok,
             |  cast(start_tok // 2048 AS BIGINT) AS first_seq,
             |  cast((start_tok + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
             |  cast((start_tok + n_tokens - 1) // 2048 - start_tok // 2048 + 1 AS BIGINT) AS n_seqs
             |FROM packed ORDER BY doc_id""".stripMargin),
      (s, d) => packSequences(T.documents(s, d), col("lang"), 2048)
        .orderBy("doc_id"))
  )

  /** SP10's library form: doc → context-window placement within each
    * group's deterministic (md5, id) token stream. Returns (doc_id,
    * lang, n_tokens, start_tok, first_seq, last_seq, n_seqs). Assumes
    * every doc has ≥1 token (the tokenizer never emits 0 for nonempty
    * text; empty docs should be filtered upstream). */
  def packSequences(docs: org.apache.spark.sql.DataFrame, by: Column,
      ctx: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(by)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), by.as("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("first_seq", expr(s"start_tok div $ctx"))
      .withColumn("last_seq",
        expr(s"(start_tok + n_tokens - 1) div $ctx"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** SP9's library form: deterministic at-most-`cap` rows per group.
    * Returns (doc_id, source, rk, kept); filter `kept = 1` to apply. */
  def sourceCap(docs: org.apache.spark.sql.DataFrame, by: Column,
      cap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val rk = row_number()
      .over(Window.partitionBy(by).orderBy(key.asc, col("doc_id").asc))
    docs.select(col("doc_id"), by.as("source"))
      .withColumn("rk", rk)
      .withColumn("kept", when(col("rk") <= cap, 1).otherwise(0))
  }

  /** SP8's library form: score every doc's log importance weight
    * toward the `target` slice and Gumbel-top-k select `frac` of the
    * corpus. See the Q entry's comment for the exact arithmetic
    * contract. `docs` needs (doc_id, text) plus whatever `target`
    * reads. */
  def dsirSelect(docs: org.apache.spark.sql.DataFrame, target: Column,
      frac: Double): org.apache.spark.sql.DataFrame = {
    val B = 1024
    val tb = docs.select(col("doc_id"), target.as("is_t"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .select(col("doc_id"), col("is_t"),
        (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long") % B).as("b"))
    val r = tb.groupBy("b").agg(count(lit(1)).as("c_r"))
    val g = tb.filter(col("is_t")).groupBy("b").agg(count(lit(1)).as("c_t"))
    val tr = r.agg(sum("c_r").as("t_r"))
    val tg = g.agg(sum("c_t").as("t_t"))
    val terms = tb.join(broadcast(r), "b")
      .join(broadcast(g), Seq("b"), "left")
      .crossJoin(broadcast(tr)).crossJoin(broadcast(tg))
      .select(col("doc_id"),
        log(((coalesce(col("c_t"), lit(0L)) + 1) * (col("t_r") + B))
          .cast("double") / ((col("c_r") + 1) * (col("t_t") + B))).as("term"))
    val perDoc = terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("term").as("lw"))
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val keyed = perDoc.select(col("doc_id"), col("n_tokens"),
      round(col("lw"), 6).as("logw"),
      round(col("lw") - log(-log(u)), 6).as("gkey"))
    // k-th boundary under (gkey desc, doc_id asc) — a distributed
    // top-k heap, not a single-partition window
    val k = math.max(1, math.ceil(frac * docs.count()).toInt)
    val ord = struct(col("gkey").as("g"), (-col("doc_id")).as("nid"))
    val boundary = keyed.orderBy(col("gkey").desc, col("doc_id")).limit(k)
      .agg(min(ord).as("bnd"))
    keyed.crossJoin(broadcast(boundary))
      .select(col("doc_id"), col("n_tokens"), col("logw"), col("gkey"),
        when(ord >= col("bnd"), 1).otherwise(0).as("selected"))
  }
}
