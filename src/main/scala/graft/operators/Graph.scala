package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation — the domain-quality prior
  * large web-corpus pipelines rank by (Common Crawl derivatives score
  * hosts by harmonic/PageRank centrality and keep/weight documents by
  * their domain's score; the reference warehouse has no graph surface,
  * so this family is graded as a training-data extension).
  *
  * The centerpiece is PageRank in EXACT FIXED-POINT arithmetic:
  * floating-point PageRank sums in-neighbor contributions in partition
  * order, so no two engines (or two runs) agree bit-for-bit. Here rank
  * is a BIGINT in units of 1e-9: each edge contributes
  * `(rank * w) DIV wout` (one exact integer multiply + one truncating
  * division — order-independent under summation), and the damping step
  * is `base + (85 * Σ) DIV 100`. The result is deterministic under ANY
  * partitioning and reproducible in DuckDB's `//` arithmetic — the
  * oracle replays the same iterations unrolled. Truncation loses at
  * most 1e-9 of mass per edge per step: numerically irrelevant,
  * semantically priceless (the ranking is hash-checkable).
  *
  * Scale shape, per iteration: ONE shuffle of the node-sized rank
  * table to the edge partitioning (the edge table itself is scanned
  * map-side; AQE broadcasts the rank side outright when nodes fit) and
  * ONE node-keyed aggregation with map-side partial sums. Nothing
  * corpus-sized is ever collected; iterations compose linearly. For
  * deep iteration counts callers should `localCheckpoint` every few
  * rounds to cap lineage — the bundled lanes run shallow (3).
  */
object Graph {

  /** Unnormalized weighted PageRank (the Pregel convention: ranks
    * start at `scale` ≡ 1.0 and sum to ~N·scale), damping 0.85, in
    * exact fixed-point integer arithmetic. `edges` must carry
    * (src, dst, w) with positive integer weights; node keys may be any
    * equatable type (numeric ids, domain strings). Parallel edges are
    * legal (their weights add through `wout` and the per-edge
    * contribution). Dangling nodes (no out-edges) keep receiving but
    * leak their own mass — the standard simplified variant; the
    * ranking among connected nodes is unaffected at curation depth. */
  /** The pinned working set every PageRank lane iterates on:
    * (edges ⋈ out-weight) — materialized ONCE (the GraphX/Pregel
    * convention: an iterative algorithm pins its edges, then loops) —
    * plus the node set and the damping floor. */
  private final case class PrCtx(ew: DataFrame, nodes: DataFrame,
      base: Long)

  private def prSetup(edges: DataFrame, scale: Long,
      pin: Boolean): PrCtx = {
    val e0 = edges.select(col("src"), col("dst"),
      col("w").cast("long").as("w"))
    val wout = e0.groupBy("src").agg(sum(col("w")).as("wout"))
    val j = e0.join(wout, "src")
    val ew = if (pin) j.localCheckpoint() else j
    val nodes = ew.select(col("src").as("node"))
      .unionByName(ew.select(col("dst").as("node"))).distinct()
    PrCtx(ew, nodes, scale * 15L / 100L)
  }

  /** One exact fixed-point iteration: one shuffle of the node-sized
    * rank table to the edge key, one node-keyed aggregation. */
  private def prStep(ctx: PrCtx, rank: DataFrame): DataFrame = {
    val contrib = ctx.ew
      .join(rank.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"),
        expr("(pr * w) DIV wout").as("c"))
    val s = contrib.groupBy("node").agg(sum(col("c")).as("s"))
    ctx.nodes.join(s, Seq("node"), "left")
      .select(col("node"),
        (lit(ctx.base) + expr("(85 * coalesce(s, 0)) DIV 100")).as("pr"))
  }

  def pageRankFixed(edges: DataFrame, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, s"pageRankFixed: negative iterations $iters")
    val ctx = prSetup(edges, scale, pin = iters > 1)
    var rank = ctx.nodes.select(col("node"), lit(scale).as("pr"))
    for (i <- 1 to iters) {
      rank = prStep(ctx, rank)
      // node-sized lineage cap for deep iteration counts
      if (i % 3 == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank
  }

  /** CONVERGENCE mode: iterate [[pageRankFixed]]'s exact step until no
    * node's rank moves more than `tolUnits` (1e-9 rank units) in a
    * round, or `maxIters` is hit. Because ranks are exact integers the
    * test is exact too — `tolUnits = 0` is a true fixed point, not a
    * float-epsilon approximation, and the returned frame is
    * bit-identical to `pageRankFixed(edges, itersRun)` (GraphSpec
    * asserts it). Per round: the step's shuffle + aggregation, ONE
    * 1-row max-delta collect, and a node-sized localCheckpoint (the
    * rank frame is referenced twice — delta and next step — and
    * lineage must stay capped at arbitrary depth). Returns
    * (ranks, itersRun). */
  def pageRankConverged(edges: DataFrame, tolUnits: Long = 1000L,
      maxIters: Int = 50,
      scale: Long = 1000000000L): (DataFrame, Int) = {
    require(tolUnits >= 0 && maxIters >= 1,
      s"pageRankConverged: tolUnits=$tolUnits maxIters=$maxIters")
    val ctx = prSetup(edges, scale, pin = true)
    var rank = ctx.nodes.select(col("node"), lit(scale).as("pr"))
      .localCheckpoint()
    var i = 0
    var delta = Long.MaxValue
    while (i < maxIters && delta > tolUnits) {
      val next = prStep(ctx, rank).localCheckpoint()
      val d = rank.withColumnRenamed("pr", "prev")
        .join(next, "node")
        .agg(max(abs(col("pr") - col("prev")))).first()
      delta = if (d.isNullAt(0)) 0L else d.getLong(0) // empty graph
      rank = next
      i += 1
    }
    (rank, i)
  }

  /** The bundled lane's graph: nation-level trade edges derived from
    * the fact chain — supplier's nation → customer's nation, weighted
    * by line-item count. The DERIVATION is the distributed work (the
    * two largest tables join and aggregate down to a nation² quotient
    * graph); the iteration then runs on the quotient. */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    T.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(T.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(T.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  private val iters = 3
  /** g3's depth: past every lineage-cap boundary (caps land at 3, 6,
    * 9) — the proof the loop composes beyond toy unrolls. */
  private val deepIters = 10

  /** The unrolled fixed-point iterations, shared by every lane's
    * oracle — the SQL twin of [[pageRankFixed]]'s loop over whatever
    * `edges` CTE precedes it. */
  private def prSql(edgesCte: String, n: Int = iters): String = {
    def step(i: Int): String =
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST(150000000 + (85 * COALESCE(SUM((r.pr * e.w) // w2.wout), 0)) // 100
         |      AS BIGINT) AS pr
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN wout w2 ON w2.src = e.src
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    s"""WITH $edgesCte,
       |wout AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
       |${(1 to n).map(step).mkString(",\n")}
       |SELECT node, pr FROM r$n ORDER BY node""".stripMargin
  }

  private val g1EdgesCte =
    """edges AS (
      |  SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  private def g1Oracle: String = prSql(g1EdgesCte)

  /** Grams a source-overlap edge may ride on appear in at most this
    * many sources: ubiquitous shingles (boilerplate every domain
    * carries) pair every source with every other — quadratic edge
    * volume with zero signal. Dropping them is the standard stop-gram
    * move and what bounds the self-join fan-out at web scale. */
  private val maxGramSources = 8

  /** The corpus-native graph: sources (domains) linked by how many
    * distinct word-8-grams their documents share — the d10 digest
    * machinery pointed at domain similarity. Only 16-byte digests
    * shuffle; the per-gram fan-out is bounded by [[maxGramSources]]. */
  private def sourceEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val ex = T.documents(s, d)
      .select(col("source"), split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 8)
      .select(col("source"), explode(Dedup.shingles(col("ts"), 8)).as("g"))
      .select(col("source"), md5(col("g")).as("h"))
      .distinct()
    val rare = ex.groupBy("h")
      .agg(count(lit(1)).as("ns")) // ex is (source, h)-distinct
      .filter(col("ns") <= maxGramSources).select("h")
    val exb = ex.join(rare, Seq("h"))
    exb.as("a").join(exb.as("b"), "h")
      .filter(col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src"), col("b.source").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  private def g2Oracle: String = prSql(
    s"""g AS (
       |  SELECT source,
       |    list_distinct(list_transform(range(1, len(ts) - 6),
       |                  i -> array_to_string(ts[i:i+7], ' '))) AS gs
       |  FROM (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ts
       |        FROM documents) WHERE len(ts) >= 8),
       |ex AS (SELECT DISTINCT source, md5(unnest(gs)) AS h FROM g),
       |rare AS (SELECT h FROM ex GROUP BY h HAVING count(*) <= $maxGramSources),
       |exb AS (SELECT ex.source, ex.h FROM ex JOIN rare USING (h)),
       |edges AS (
       |  SELECT a.source AS src, b.source AS dst, count(*) AS w
       |  FROM exb a JOIN exb b ON a.h = b.h AND a.source <> b.source
       |  GROUP BY 1, 2)""".stripMargin)

  /** The domain-prior gate a curation pipeline composes with
    * [[sourceEdges]]+[[pageRankFixed]] (or any (node, pr) frame):
    * keep documents whose source's rank clears `minPr`; sources
    * ABSENT from the rank frame are neutral — kept — because absence
    * means "shared no rare gram with anyone", which is evidence of
    * independence, not of low quality. The rank frame is node-sized
    * (one row per domain) and broadcasts; the decision is an exact
    * integer comparison, no float boundary. */
  def sourceRankGate(docs: DataFrame, ranks: DataFrame,
      minPr: Long): DataFrame =
    docs.join(
      broadcast(ranks.select(col("node").as("source"), col("pr"))),
      Seq("source"), "left")
      .filter(col("pr").isNull || col("pr") >= minPr)
      .drop("pr")

  val all: Seq[Q] = Seq(
    Q("g1_nation_pagerank", Some(g1Oracle), (s, d) =>
      pageRankFixed(tradeEdges(s, d), iters).orderBy("node")),
    // g2 — the domain-quality prior on the corpus itself: PageRank
    // over the source-overlap graph. Sources sharing no (rare) gram
    // with anyone have no row — a curation stage treats absence as
    // neutral, not as zero.
    Q("g2_source_pagerank", Some(g2Oracle), (s, d) =>
      pageRankFixed(sourceEdges(s, d), iters).orderBy("node")),
    // g3 — g1's graph at DEEP unroll (10 rounds): the iteration
    // crosses every lineage-cap checkpoint boundary and the oracle
    // replays all 10 rounds in exact `//` arithmetic, so the
    // hash-check proves the capped loop COMPOSES — truncation,
    // damping, and checkpoint placement drift nowhere past toy depth.
    Q("g3_nation_pagerank_deep", Some(prSql(g1EdgesCte, deepIters)),
      (s, d) => pageRankFixed(tradeEdges(s, d), deepIters)
        .orderBy("node")))
}
