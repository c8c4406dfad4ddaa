package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank: hand-computed iterations on a star graph,
  * bit-reproducibility under re-partitioning, parallel-edge weight
  * accumulation, and dangling-receiver behavior. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int,
      parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankFixed(
      edges.toDF("src", "dst", "w").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // leaves 1..4 → center 0, center → leaf 1
  private val star = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L),
    (4L, 0L, 1L), (0L, 1L, 1L))

  test("star graph matches the hand-computed fixed-point iterations") {
    // iter 1: center absorbs 4×1e9 → 0.15e9 + 0.85·4e9 = 3.55e9;
    // leaf 1 gets the center's 1e9 → exactly 1e9; leaves 2-4 get base
    assert(ranks(star, 1) == Map(0L -> 3550000000L, 1L -> 1000000000L,
      2L -> 150000000L, 3L -> 150000000L, 4L -> 150000000L))
    // iter 2, every step exact integer arithmetic:
    //   center: s = 1e9 + 3·150e6 = 1.45e9 → 150e6 + (85·1.45e9)//100
    //   leaf 1: s = 3.55e9          → 150e6 + (85·3.55e9)//100
    assert(ranks(star, 2) == Map(0L -> 1382500000L, 1L -> 3167500000L,
      2L -> 150000000L, 3L -> 150000000L, 4L -> 150000000L))
  }

  test("bit-identical under any partitioning; zero iterations = uniform") {
    assert(ranks(star, 3, parts = 1) == ranks(star, 3, parts = 7))
    assert(ranks(star, 0).values.toSet == Set(1000000000L))
  }

  test("sourceRankGate: below drops, at-or-above keeps, absent is neutral") {
    import spark.implicits._
    val docs = Seq((1L, "sA"), (2L, "sA"), (3L, "sB"), (4L, "sC"))
      .toDF("doc_id", "source")
    // sC has no rank row — it shared no rare gram with anyone
    val ranks = Seq(("sA", 900000000L), ("sB", 100000000L))
      .toDF("node", "pr")
    val kept = graft.operators.Graph
      .sourceRankGate(docs, ranks, minPr = 500000000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"got $kept")
  }

  test("g2 composition: corpus ranks gate documents deterministically") {
    import graft.operators.Graph
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val edges = {
      // the g2 derivation through the public lane entry
      val q = graft.SparkEntry.queries("g2_source_pagerank")
      q(spark, sf)
    }
    val ranks = edges.collect()
    assert(ranks.nonEmpty, "the synthetic corpus must link some sources")
    // determinism under re-run (fresh plan, same integers)
    val again = graft.SparkEntry.queries("g2_source_pagerank")(spark, sf)
      .collect()
    assert(ranks.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // gating at the median rank keeps every doc of clearing sources
    // plus every doc of absent sources — exact set accounting
    val sorted = ranks.map(_.getLong(1)).sorted
    val minPr = sorted(sorted.length / 2)
    val clears = ranks.filter(_.getLong(1) >= minPr).map(_.getString(0)).toSet
    val ranked = ranks.map(_.getString(0)).toSet
    val kept = Graph.sourceRankGate(docs,
      graft.SparkEntry.queries("g2_source_pagerank")(spark, sf)
        .withColumnRenamed("node", "node"), minPr)
    val expected = docs.collect().count(r =>
      !ranked.contains(r.getAs[String]("source")) ||
        clears.contains(r.getAs[String]("source")))
    assert(kept.count() == expected)
  }

  test("convergence mode: exact fixed point, ≡ the unrolled loop at its own depth") {
    import spark.implicits._
    val edges = star.toDF("src", "dst", "w")
    // damping 0.85 contracts ~15% per round, so this tolerance takes
    // the loop well past every lineage-cap boundary (≈18 rounds)
    // without the spec paying for a 1e-9-tight fixed point
    val tol = 200000000L
    val (conv, n) = Graph.pageRankConverged(edges, tolUnits = tol,
      maxIters = 60)
    assert(n >= 10 && n < 60, s"expected genuine deep iteration, ran $n")
    val got = conv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bit-identical to the plain unroll at the depth convergence chose
    assert(got == ranks(star, n), s"converged ≠ unrolled at depth $n")
    // converged means converged: one more exact step moves no node by
    // more than the tolerance
    val step = ranks(star, n + 1)
    assert(got.forall { case (k, v) => math.abs(step(k) - v) <= tol },
      s"fixed point not reached: $got vs $step")
    // deep unrolls stay exact across lineage-cap boundaries: depth 10
    // equals depth 9 advanced one step (associativity of the loop),
    // computed through different checkpoint placements
    val r9 = ranks(star, 9); val r10 = ranks(star, 10)
    val manual = {
      // one exact step from r9, computed in driver arithmetic
      val wout = star.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val sums = star.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        r9(s) * w / wout(s) }.sum).toMap
      r9.keys.map(k => k ->
        (150000000L + 85L * sums.getOrElse(k, 0L) / 100L)).toMap
    }
    assert(r10 == manual)
  }

  test("parallel edges add weight; a dangling receiver still accumulates") {
    // 1 → 2 twice (w 1 and 2) and 1 → 3 (w 1): wout = 4, so node 2
    // draws 3/4 of node 1's rank, node 3 draws 1/4; both are dangling
    // (no out-edges) and simply absorb
    val g = Seq((1L, 2L, 1L), (1L, 2L, 2L), (1L, 3L, 1L))
    val r = ranks(g, 1)
    assert(r(2L) == 150000000L + 85L * (750000000L) / 100L)
    assert(r(3L) == 150000000L + 85L * (250000000L) / 100L)
    assert(r(1L) == 150000000L)
  }
}
