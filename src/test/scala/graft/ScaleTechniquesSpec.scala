package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques: salting equivalence and bucketed co-located joins. */
class ScaleTechniquesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf)
    val sup = Tables.supplier(spark, sf)
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey"))
      .agg(count(lit(1)), sum("l_quantity"), sum("s_acctbal")).head
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", 8)
      .agg(count(lit(1)), sum("l_quantity"), sum("s_acctbal")).head
    assert(plain == salted)
  }

  test("salt spreads byte-identical duplicate rows of a hot key") {
    // the degenerate corpus salting exists for: one hot key, every row
    // byte-identical. A content-hash salt maps them ALL to one salt
    // (one task); the row-counter salt must spread them.
    val salts = 8
    val hot = spark.range(1000)
      .select(lit(42L).as("suppkey"), lit("same-bytes").as("payload"))
    val used = hot.withColumn("_salt", Skew.saltExpr(salts))
      .select("_salt").distinct().count()
    assert(used >= salts / 2,
      s"constant-row probe used only $used of $salts salts — hot key still pins one task")
    // and the join result is still salt-invariant on this worst case
    import spark.implicits._
    val dim = Seq((42L, "supplier-42")).toDF("suppkey", "s_name")
    val joined = Skew.saltedJoin(hot, dim, "suppkey", salts)
    assert(joined.count() == 1000)
    assert(joined.select("s_name").distinct().as[String].collect().toSeq == Seq("supplier-42"))
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_suppkey")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"))
      .orderBy("l_suppkey").collect().toSeq
    val salted = Skew.saltedSum(li, "l_suppkey", "l_quantity", 8)
      .select(col("l_suppkey"), col("sum_l_quantity").as("sq"), col("n_rows").as("n"))
      .orderBy("l_suppkey").collect().toSeq
    assert(direct == salted)
  }

  test("boundedSelfPairs equals the naive all-pairs self-join on a hot bucket") {
    import spark.implicits._
    // one degenerate 100-id bucket (forces chunk-splitting at cap 10)
    // plus a small bucket that stays single-chunk
    val items = ((1 to 100).map(i => ("hot", i.toLong)) ++
      (1 to 7).map(i => ("cold", 1000L + i))).toDF("bk", "id")
    val got = Skew.boundedSelfPairs(items, "bk", "id", maxBucket = 10)
      .select("bk", "d1", "d2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val naive = items.select(col("bk"), col("id").as("d1"))
      .join(items.select(col("bk"), col("id").as("d2")), Seq("bk"))
      .filter(col("d1") < col("d2")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.size == 100 * 99 / 2 + 7 * 6 / 2)
    assert(got == naive)
  }

  test("boundedSelfPairs bounds per-task pair fan-out by maxBucket²") {
    import spark.implicits._
    val cap = 10
    val n = 100
    val items = (1 to n).map(i => ("hot", i.toLong)).toDF("bk", "id")
    // recompute the helper's chunk assignment and group pairs by their
    // (chunk_lo, chunk_hi) task: no task may hold more than cap² pairs
    val m = math.ceil(n.toDouble / cap).toLong
    val chunks = items.select(col("id"),
      pmod(xxhash64(col("id")), lit(m)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perTask = Skew.boundedSelfPairs(items, "bk", "id", cap).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .groupBy { case (a, b) =>
        val (ca, cb) = (chunks(a), chunks(b))
        (math.min(ca, cb), math.max(ca, cb))
      }.map(_._2.length)
    // chunk sizes are hash-balanced (binomial around n/m), so the exact
    // per-task bound is max_chunk² = O(maxBucket²); 4× covers the
    // balance slack at this small n and shrinks as n grows — the point
    // is the task is NOT the whole bucket's n²/2
    assert(perTask.max <= 4 * cap * cap,
      s"a chunk-pair task holds ${perTask.max} pairs (> ${4 * cap * cap})")
    assert(perTask.max < n * (n - 1) / 8,
      "hot-bucket work not spread: one task still holds a quadratic share")
    assert(perTask.size > 1, "hot bucket was not split across tasks")
  }

  test("surrogate-key guard: a fact-sized input is rejected before the window runs") {
    val big = spark.range(graft.olist.Dimensions.MAX_DIM_ROWS + 1)
      .select(col("id").cast("string").as("nat"))
    val err = intercept[IllegalArgumentException] {
      graft.olist.Dimensions.withKey(big, "k", "nat")
    }
    assert(err.getMessage.contains("dims-only"))
    // and a dim-sized input still passes
    val small = spark.range(50).select(col("id").cast("string").as("nat"))
    assert(graft.olist.Dimensions.withKey(small, "k", "nat").count() == 50)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wdir = "/tmp/graft-test-warehouse"
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wdir/b_orders").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity")).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wdir/b_lineitem").saveAsTable("b_lineitem")
    val j = spark.table("b_lineitem").join(spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(j.count() == Tables.lineitem(spark, sf).count())
  }

  test("count-min sketch: memory-bounded token counts never undercount, bounded overcount") {
    // the approximation tier behind t10_heavy_hitters: at 100 TB the
    // exact groupBy's key space (every distinct token) can itself be
    // huge; a count-min sketch caps memory at width×depth counters with
    // one-sided error ≤ eps·N
    val toks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val sketch = toks.stat.countMinSketch("token",
      eps = 0.001, confidence = 0.99, seed = 42)
    val slack = math.ceil(0.001 * total).toLong
    exact.foreach { case (t, n) =>
      val est = sketch.estimateCount(t)
      assert(est >= n, s"count-min undercounted '$t': $est < $n")
      assert(est <= n + slack, s"count-min overcounted '$t' beyond eps·N: $est > $n + $slack")
    }
  }
}
