package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("as-of join picks the latest right row at-or-before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l1"), // before any right row → null payload
      (1L, 200L, "l2"), // exactly at r@200 → inclusive match
      (1L, 350L, "l3"), // between r@200 and r@400 → r@200
      (1L, 400L, "l4"), // at r@400
      (2L, 500L, "l5")  // key with no right rows at all
    ).toDF("k", "t", "lv")
    val right = Seq((1L, 200L, "r200"), (1L, 400L, "r400"))
      .toDF("k", "t", "rv")
    val got = Temporal.asofJoin(left, right, "k", "t")
      .orderBy("k", "t").collect()
      .map(r => (r.getString(2), Option(r.getString(3)).getOrElse("-"))).toSeq
    assert(got == Seq("l1" -> "-", "l2" -> "r200", "l3" -> "r200",
      "l4" -> "r400", "l5" -> "-"))
  }

  test("as-of join plan: one hash exchange on the key, no nested-loop or cartesian join") {
    val df = SparkEntry.queries("j14_asof_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"range explosion in plan:\n$plan")
    // the as-of core is a window over ONE hashpartitioning exchange on
    // user_id (further exchanges belong to the final global orderBy)
    assert(plan.contains("hashpartitioning(user_id"), s"no key partition:\n$plan")
    assert(df.count() > 0)
  }

  test("bounded range join counts exactly the rows in (t, t+W], bin edges included") {
    import spark.implicits._
    val W = 100L
    val left = Seq((1L, 10L, 250L), (1L, 11L, 300L), (2L, 12L, 500L))
      .toDF("k", "event_id", "t")
    // matches for event 10 (t=250): 251..350 → {300, 350}; 250 excluded
    // (exclusive lower), 351 excluded; event 11 (t=300): {350, 400};
    // key 2 has nothing
    val right = Seq((1L, 250L), (1L, 300L), (1L, 350L), (1L, 400L), (1L, 451L))
      .toDF("k", "t")
    val pairs = graft.operators.Temporal
      .boundedRangeJoin(left, right, "k", "t", "t", W)
      .select("event_id", "r_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // inner pairs: exactly the in-range matches, nothing for event 12
    assert(pairs == Set((10L, 300L), (10L, 350L), (11L, 350L), (11L, 400L)))
    // left semantics live in the query: zero-match clicks kept as 0
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("j15_range_join")(spark, sf)
    val nClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(out.count() == nClicks, "left cardinality must be preserved")
  }

  test("range join plans as a hash equi-join on (key, bin), never nested-loop") {
    val df = SparkEntry.queries("j15_range_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"range explosion:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(df.count() > 0)
  }

  test("temporal ops handle empty sides: asof yields all-null payloads, range join yields no pairs, components yield no rows") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1")).toDF("k", "t", "lv")
    val emptyRight = Seq.empty[(Long, Long, String)].toDF("k", "t", "rv")
    val asof = graft.operators.Temporal.asofJoin(left, emptyRight, "k", "t")
    assert(asof.count() == 1 && asof.filter(col("rv").isNull).count() == 1)
    val range = graft.operators.Temporal
      .boundedRangeJoin(left, emptyRight.drop("rv"), "k", "t", "t", 10L)
    assert(range.count() == 0)
    val comps = graft.operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("d1", "d2"))
    assert(comps.count() == 0)
  }

  test("interval overlap join equals the naive quadratic over random intervals, no dup pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // intervals up to 3 bins long: exercises multi-bin replication and
    // the first-shared-bin dedup
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"$tag$i", rnd.nextInt(4).toLong, s, s + rnd.nextInt(300).toLong)
    }
    val l = mk(120, "L").toDF("lid", "k", "ls", "le")
    val r = mk(120, "R").toDF("rid", "k", "rs", "re")
    val got = Temporal.intervalOverlapJoin(l, r, "k",
      "ls", "le", "rs", "re", binUs = 100L)
      .select("lid", "rid").as[(String, String)].collect().toSeq
    // exactly-once: no pair may be emitted twice despite shared bins
    assert(got.size == got.distinct.size, "duplicate pairs emitted")
    val naive = l.as[(String, Long, Long, Long)].collect().flatMap {
      case (lid, lk, ls, le) =>
        r.as[(String, Long, Long, Long)].collect().collect {
          case (rid, rk, rs, re) if lk == rk && ls <= re && rs <= le =>
            (lid, rid)
        }
    }.toSet
    assert(got.toSet == naive, s"pair set drifted: " +
      s"missing=${(naive -- got.toSet).take(5)} extra=${(got.toSet -- naive).take(5)}")
    // and the plan is a hash equi-join on (key, bin), never nested-loop
    val plan = Temporal.intervalOverlapJoin(l, r, "k",
      "ls", "le", "rs", "re", binUs = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("every click either matches a purchase at-or-before it or is marked unmatched") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("j14_asof_join")(spark, sf)
    val ev = Tables.events(spark, sf)
    val nClicks = ev.filter(col("event_type") === "click").count()
    assert(out.count() == nClicks, "as-of must preserve left cardinality")
    // matched payload ts can never be after the click (join contract):
    // re-derive by joining back to the purchase event ids
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), unix_micros(col("ts")).as("p_us"))
    val bad = out.filter(col("p_event_id") =!= -1L)
      .join(purch, Seq("p_event_id"))
      .filter(col("p_us") > col("us"))
    assert(bad.count() == 0, "matched a purchase AFTER the click")
  }
}
