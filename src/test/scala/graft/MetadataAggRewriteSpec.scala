package graft

import graft.olist.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The metadata-aggregate Catalyst rule: plain SQL min/max/count over
  * a `dw_` view plans as a LocalRelation (zero file reads) when
  * provably exact, and STAYS a scan in every disqualifying case —
  * with the answer identical either way.
  */
class MetadataAggRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fileScans(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.size

  test("SELECT min/max/count FROM dw_t plans as LocalRelation, answer exact") {
    val wh = new Warehouse(spark, tmp("wh_mdagg")).enableSql()
    val df = spark.range(5000)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val q = spark.sql(
      "SELECT min(k) AS a, max(k) AS b, count(*) AS c, max(v) AS d FROM dw_t")
    assert(fileScans(q) == 0, "metadata aggregate must not scan:\n" +
      q.queryExecution.sparkPlan)
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 4999L &&
      r.getLong(2) == 5000L && r.getLong(3) == 6L)
  }

  test("GROUP BY a partition column also rewrites; values match the scan") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_p")).enableSql()
    val df = spark.range(6000)
      .select((col("id") % 3).cast("string").as("p"), col("id").as("k"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    val q = spark.sql(
      "SELECT p, min(k) AS lo, max(k) AS hi, count(*) AS n " +
        "FROM dw_t GROUP BY p")
    assert(fileScans(q) == 0, "grouped metadata aggregate must not scan")
    val got = q.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = df.groupBy("p")
      .agg(min("k"), max("k"), count(lit(1))).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("disqualifiers keep the scan — and the scan stays correct") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_no")).enableSql()
    val df = spark.range(1000)
      .select(col("id").as("k"), (col("id") % 5).as("v"),
        when(col("id") % 2 === 0, col("id")).as("nv"))
      .repartitionByRange(3, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    // avg over a column with no declared sum/nn stats → scan
    val q1 = spark.sql("SELECT min(k) AS a, avg(nv) AS m FROM dw_t")
    assert(fileScans(q1) > 0)
    assert(q1.collect()(0).getLong(0) == 0L)
    // count(col) over a column with NO declared stats (nv carries no
    // "__nn_" entry) → scan, right answer; the positive fold case
    // lives in the count(col) test below
    val q2 = spark.sql("SELECT count(nv) AS c FROM dw_t")
    assert(fileScans(q2) > 0)
    assert(q2.collect()(0).getLong(0) == 500L)
    // a WHERE clause interposes a Filter → scan
    val q3 = spark.sql("SELECT min(k) AS a FROM dw_t WHERE k > 10")
    assert(fileScans(q3) > 0)
    assert(q3.collect()(0).getLong(0) == 11L)
    // column without declared stats → scan (v has none here)
    val q4 = spark.sql("SELECT min(v) AS a FROM dw_t")
    assert(fileScans(q4) > 0)
    assert(q4.collect()(0).getLong(0) == 0L)
    // conf off → scan even when derivable
    spark.conf.set("graft.metadataAgg.enabled", "false")
    try {
      val q5 = spark.sql("SELECT min(k) AS a FROM dw_t")
      assert(fileScans(q5) > 0)
      assert(q5.collect()(0).getLong(0) == 0L)
    } finally spark.conf.set("graft.metadataAgg.enabled", "true")
  }

  test("WHERE on partition columns folds driver-side; mixed predicates stay scans") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_w")).enableSql()
    val df = spark.range(9000)
      .select((col("id") % 3).cast("string").as("p"), col("id").as("k"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    // equality predicate — the bread-and-butter partition probe
    val q1 = spark.sql(
      "SELECT min(k) AS lo, max(k) AS hi, count(*) AS n FROM dw_t WHERE p = '1'")
    assert(fileScans(q1) == 0, "partition-equality WHERE must fold:\n" +
      q1.queryExecution.sparkPlan)
    val want1 = df.filter(col("p") === "1")
      .agg(min("k"), max("k"), count(lit(1))).collect()(0)
    val r1 = q1.collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ==
      ((want1.getLong(0), want1.getLong(1), want1.getLong(2))))
    // IN-list + GROUP BY compose; Catalyst eval decides membership
    val q2 = spark.sql(
      "SELECT p, count(*) AS n FROM dw_t WHERE p IN ('0', '2') GROUP BY p")
    assert(fileScans(q2) == 0)
    assert(q2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("0" -> 3000L, "2" -> 3000L))
    // a predicate selecting NOTHING yields SQL's empty-input shape:
    // one all-null/zero row ungrouped, zero rows grouped
    val q3 = spark.sql(
      "SELECT min(k) AS lo, count(*) AS n FROM dw_t WHERE p = 'zz'")
    assert(fileScans(q3) == 0)
    val r3 = q3.collect()(0)
    assert(r3.isNullAt(0) && r3.getLong(1) == 0L)
    assert(spark.sql(
      "SELECT p, count(*) AS n FROM dw_t WHERE p = 'zz' GROUP BY p")
      .collect().isEmpty)
    // a predicate touching a DATA column cannot fold — scan, exact
    val q4 = spark.sql(
      "SELECT count(*) AS n FROM dw_t WHERE p = '1' AND k > 100")
    assert(fileScans(q4) > 0)
    assert(q4.collect()(0).getLong(0) ==
      df.filter(col("p") === "1" && col("k") > 100).count())
  }

  test("count(col) folds from non-null counts; all-null partitions don't poison min/max") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_nn")).enableSql()
    val df = spark.range(4000).select(
      (col("id") % 4).cast("string").as("p"), col("id").as("k"),
      when(col("id") % 4 =!= 0, col("id") * 2).as("v"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val q = spark.sql(
      "SELECT count(v) AS cv, count(*) AS n, min(v) AS lo, max(v) AS hi FROM dw_t")
    assert(fileScans(q) == 0, "count(col) over stats columns must fold:\n" +
      q.queryExecution.sparkPlan)
    val want = df.agg(count(col("v")), count(lit(1)), min("v"), max("v"))
      .collect()(0)
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((want.getLong(0), want.getLong(1), want.getLong(2), want.getLong(3))))
    // grouped: the all-null partition reports 0, not a poisoned plan
    val q2 = spark.sql("SELECT p, count(v) AS cv FROM dw_t GROUP BY p")
    assert(fileScans(q2) == 0)
    assert(q2.collect().map(r2 => r2.getString(0) -> r2.getLong(1)).toMap ==
      Map("0" -> 0L, "1" -> 1000L, "2" -> 1000L, "3" -> 1000L))
    // a column with NO nn stats (never declared) keeps the scan
    val q3 = spark.sql("SELECT count(k) AS ck FROM dw_t")
    // k IS a cluster column, so it carries nn stats — use a synthetic
    // un-stat'd table for the negative instead
    assert(q3.collect()(0).getLong(0) == 4000L)
    val wh2 = new Warehouse(spark, tmp("wh_mdagg_nn2")).enableSql()
    wh2.save("u", spark.range(100).select(col("id").as("a"),
      col("id").as("b")), clusterBy = Seq("a"))
    val q4 = spark.sql("SELECT count(b) AS cb FROM dw_u")
    assert(fileScans(q4) > 0, "un-stat'd column must stay a scan")
    assert(q4.collect()(0).getLong(0) == 100L)
  }

  test("sum(col) folds from per-file exact sums — the token-ledger lane") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_sum")).enableSql()
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("p"), col("id").as("k"),
      when(col("id") % 7 =!= 0, col("id") * 11).as("v"),
      (col("id") % 100).cast("double").as("d"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    // ungrouped: sum over a nullable stats column, alongside the other
    // foldable aggregates — nulls never contribute, exactly the scan
    val q = spark.sql(
      "SELECT sum(v) AS sv, sum(k) AS sk, count(v) AS cv, count(*) AS n FROM dw_t")
    assert(fileScans(q) == 0, "sum over stats columns must fold:\n" +
      q.queryExecution.sparkPlan)
    val want = df.agg(sum("v"), sum("k"), count(col("v")), count(lit(1)))
      .collect()(0)
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((want.getLong(0), want.getLong(1), want.getLong(2), want.getLong(3))))
    // grouped by the partition column — the per-source token budget
    val q2 = spark.sql("SELECT p, sum(v) AS sv, count(*) AS n " +
      "FROM dw_t GROUP BY p")
    assert(fileScans(q2) == 0, "grouped sum must fold")
    val got2 = q2.collect().map(r2 =>
      r2.getString(0) -> ((r2.getLong(1), r2.getLong(2)))).toMap
    val want2 = df.groupBy("p").agg(sum("v"), count(lit(1))).collect()
      .map(r2 => r2.getString(0) -> ((r2.getLong(1), r2.getLong(2)))).toMap
    assert(got2 == want2)
    // a DOUBLE column never folds (order-dependent addition) — scan
    val q3 = spark.sql("SELECT sum(d) AS sd FROM dw_t")
    assert(fileScans(q3) > 0, "sum(double) must stay a scan")
    // un-stat'd column → scan, right answer
    val wh2 = new Warehouse(spark, tmp("wh_mdagg_sum2")).enableSql()
    wh2.save("u", spark.range(100).select(col("id").as("a"),
      col("id").as("b")), clusterBy = Seq("a"))
    val q4 = spark.sql("SELECT sum(b) AS sb FROM dw_u")
    assert(fileScans(q4) > 0, "un-stat'd column must stay a scan")
    assert(q4.collect()(0).getLong(0) == 4950L)
    // sum DISTINCT is a different aggregate — never rewritten
    val q5 = spark.sql("SELECT sum(DISTINCT a) AS s FROM dw_u")
    assert(fileScans(q5) > 0)
    assert(q5.collect()(0).getLong(0) == 4950L)
  }

  test("avg(col) folds as exact-sum / non-null-count — the mean-ledger lane") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_avg")).enableSql()
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("p"), col("id").as("k"),
      when(col("id") % 7 =!= 0, col("id") * 11).as("v"),
      (col("id") % 100).cast("double").as("d"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    // ungrouped: avg over a nullable stats column alongside its
    // ingredients — the division denominator is the NON-NULL count
    val q = spark.sql(
      "SELECT avg(v) AS av, avg(k) AS ak, sum(v) AS sv, count(*) AS n FROM dw_t")
    assert(fileScans(q) == 0, "avg over stats columns must fold:\n" +
      q.queryExecution.sparkPlan)
    val want = df.agg(avg("v"), avg("k"), sum("v"), count(lit(1)))
      .collect()(0)
    val r = q.collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)) ==
      ((want.getDouble(0), want.getDouble(1), want.getLong(2),
        want.getLong(3))))
    // grouped by the partition column — mean doc length per source
    val q2 = spark.sql("SELECT p, avg(v) AS av FROM dw_t GROUP BY p")
    assert(fileScans(q2) == 0, "grouped avg must fold")
    val got2 = q2.collect().map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
    val want2 = df.groupBy("p").agg(avg("v")).collect()
      .map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
    assert(got2 == want2)
    // a DOUBLE column never folds (the sum lane's disqualifier) — scan
    val q3 = spark.sql("SELECT avg(d) AS ad FROM dw_t")
    assert(fileScans(q3) > 0, "avg(double) must stay a scan")
    // an all-null column answers SQL NULL from metadata
    val wh2 = new Warehouse(spark, tmp("wh_mdagg_avgnull")).enableSql()
    wh2.save("z", spark.range(50).select(col("id").as("k"),
      lit(null).cast("long").as("v")), clusterBy = Seq("k"))
    wh2.statsBy("z", Seq("v"))
    val qz = spark.sql("SELECT avg(v) AS av FROM dw_z")
    assert(fileScans(qz) == 0)
    assert(qz.collect()(0).isNullAt(0), "avg over zero non-null rows is NULL")
    // DVs disqualify avg like sum (the stored ingredients include the
    // deleted rows) — scan, right answer
    val wh3 = new Warehouse(spark, tmp("wh_mdagg_avgdv")).enableSql()
    wh3.save("t", spark.range(1000).select(col("id").as("k"))
      .repartitionByRange(3, col("k")), clusterBy = Seq("k"))
    assert(wh3.delete("t", col("k") === 999L).filesDv >= 1)
    val qd = spark.sql("SELECT avg(k) AS ak FROM dw_t")
    assert(fileScans(qd) > 0, "DV'd table must stay a scan for avg")
    assert(qd.collect()(0).getDouble(0) == (499500.0 - 999.0) / 999.0)
    // values whose PARTIAL sums exceed 2^53 disqualify even though the
    // TOTAL is tiny (1): the scan's double accumulator already rounded
    // 2^53+1 away, so a fold from the exact sum would CHANGE the
    // answer — the bound is n·max|value|, not |total|
    import spark.implicits._
    val wh4 = new Warehouse(spark, tmp("wh_mdagg_avghuge")).enableSql()
    wh4.save("h", Seq((1L << 53) + 1L, -(1L << 53)).toDF("v")
      .withColumn("k", lit(1L)).coalesce(1), clusterBy = Seq("k"))
    wh4.statsBy("h", Seq("v"))
    val qh = spark.sql("SELECT avg(v) AS av FROM dw_h")
    assert(fileScans(qh) > 0,
      "beyond-2^53 values must keep the scan for avg:\n" +
        qh.queryExecution.sparkPlan)
    // …while sum(v) still folds (the exact total fits Long — the sum
    // lane's own contract, where the scan is exact-Long too)
    val qs = spark.sql("SELECT sum(v) AS sv FROM dw_h")
    assert(fileScans(qs) == 0)
    assert(qs.collect()(0).getLong(0) == 1L)
  }

  test("sum: all-null columns yield SQL NULL; overflow keeps the scan") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_sumnull")).enableSql()
    import spark.implicits._
    // partition '0' is ALL null in v — its files carry no __sum_ entry
    // and must contribute the additive identity, not poison the fold
    val df = spark.range(900).select(
      (col("id") % 3).cast("string").as("p"), col("id").as("k"),
      when(col("p") =!= "0", col("id")).as("v"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val q = spark.sql("SELECT p, sum(v) AS sv FROM dw_t GROUP BY p")
    assert(fileScans(q) == 0, "all-null groups must not poison the fold")
    val got = q.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))).toMap
    val want = df.groupBy("p").agg(sum("v")).collect().map(r =>
      r.getString(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(got == want)
    assert(got("0") == null, "an all-null group sums to SQL NULL")
    // a ZERO-non-null table overall also answers NULL from metadata
    val wh2 = new Warehouse(spark, tmp("wh_mdagg_sumnull2")).enableSql()
    wh2.save("z", spark.range(50).select(col("id").as("k"),
      lit(null).cast("long").as("v")), clusterBy = Seq("k"))
    wh2.statsBy("z", Seq("v"))
    val qz = spark.sql("SELECT sum(v) AS sv, count(*) AS n FROM dw_z")
    assert(fileScans(qz) == 0)
    val rz = qz.collect()(0)
    assert(rz.isNullAt(0) && rz.getLong(1) == 50L)
    // a total beyond LongType disqualifies — the overflow must surface
    // through the real scan's ANSI semantics, never a wrapped fold
    val wh3 = new Warehouse(spark, tmp("wh_mdagg_sumovf")).enableSql()
    wh3.save("o", Seq(Long.MaxValue, Long.MaxValue).toDF("v")
      .withColumn("k", lit(1L)).repartition(2), clusterBy = Seq("k"))
    wh3.statsBy("o", Seq("v"))
    val qo = spark.sql("SELECT sum(v) AS sv FROM dw_o")
    assert(fileScans(qo) > 0, "overflowing total must keep the scan:\n" +
      qo.queryExecution.sparkPlan)
    // …while a same-table max still folds (the stats themselves are fine)
    val qm = spark.sql("SELECT max(v) AS mv FROM dw_o")
    assert(fileScans(qm) == 0)
    assert(qm.collect()(0).getLong(0) == Long.MaxValue)
  }

  test("sum: deletion vectors disqualify; appends stay additive") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_sumdv")).enableSql()
    val df = spark.range(1000).select(col("id").as("k"))
      .repartitionByRange(3, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    // appends fold additively — the ledger stays exact through growth
    import spark.implicits._
    wh.append("t", Seq(100000L, 200000L).toDF("k"))
    val q = spark.sql("SELECT sum(k) AS s, count(*) AS n FROM dw_t")
    assert(fileScans(q) == 0, "append must keep the sum foldable")
    val r = q.collect()(0)
    assert(r.getLong(0) == 499500L + 300000L && r.getLong(1) == 1002L)
    // a DV'd file's stored sum includes the deleted row — scan
    assert(wh.delete("t", col("k") === 500L).filesDv >= 1)
    val q2 = spark.sql("SELECT sum(k) AS s FROM dw_t")
    assert(fileScans(q2) > 0, "DV'd table must stay a scan for sum")
    assert(q2.collect()(0).getLong(0) == 499500L + 300000L - 500L)
    // compaction folds the DV away → the ledger answers again
    wh.compact("t")
    val q3 = spark.sql("SELECT sum(k) AS s FROM dw_t")
    assert(fileScans(q3) == 0, "post-compaction the sum folds again")
    assert(q3.collect()(0).getLong(0) == 499500L + 300000L - 500L)
  }

  test("count(*) alone stays metadata-exact through deletion vectors") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_dvc")).enableSql()
    val df = spark.range(3000).select(col("id").as("k"))
      .repartitionByRange(4, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    val del = wh.delete("t", col("k") >= 2995L)
    assert(del.filesDv >= 1)
    // the manifest knows each sidecar's cardinality: Σrows − Σdv
    val q = spark.sql("SELECT count(*) AS c FROM dw_t")
    assert(fileScans(q) == 0, "count-only must fold through DVs:\n" +
      q.queryExecution.sparkPlan)
    assert(q.collect()(0).getLong(0) == 2995L)
    // …but a min/max alongside cannot (the deleted row may be the
    // extreme) — the mixed query stays a scan and stays right
    val q2 = spark.sql("SELECT max(k) AS a, count(*) AS c FROM dw_t")
    assert(fileScans(q2) > 0)
    val r2 = q2.collect()(0)
    assert(r2.getLong(0) == 2994L && r2.getLong(1) == 2995L)
  }

  test("deletion vectors disqualify; rewrite returns after compaction") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_dv")).enableSql()
    val df = spark.range(2000).select(col("id").as("k"))
      .repartitionByRange(4, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    val del = wh.delete("t", col("k") === 1999L)
    assert(del.filesDv >= 1)
    val q = spark.sql("SELECT max(k) AS a, count(*) AS c FROM dw_t")
    assert(fileScans(q) > 0, "DV'd table must stay a scan")
    val r = q.collect()(0)
    assert(r.getLong(0) == 1998L && r.getLong(1) == 1999L)
    // compaction folds the DV away → the rewrite fires again
    wh.compact("t")
    val q2 = spark.sql("SELECT max(k) AS a, count(*) AS c FROM dw_t")
    assert(fileScans(q2) == 0, "post-compaction the metadata answers")
    val r2 = q2.collect()(0)
    assert(r2.getLong(0) == 1998L && r2.getLong(1) == 1999L)
  }

  test("HAVING and ORDER BY compose above the folded aggregate") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_having")).enableSql()
    val df = spark.range(6000)
      .select((col("id") % 3).cast("string").as("p"), col("id").as("k"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    // the rewrite replaces only the Aggregate; the parent Filter
    // (HAVING) and Sort run over the LocalRelation
    val q = spark.sql(
      "SELECT p, max(k) AS hi, count(*) AS n FROM dw_t " +
        "GROUP BY p HAVING count(*) > 0 ORDER BY p DESC")
    assert(fileScans(q) == 0, "HAVING must not defeat the fold:\n" +
      q.queryExecution.sparkPlan)
    val got = q.collect()
    assert(got.map(_.getString(0)).toSeq == Seq("2", "1", "0"))
    assert(got.map(_.getLong(2)).forall(_ == 2000L))
    // ORDER BY an aggregate resolves through the same
    // push-into-Aggregate mechanism — must also fold, one pass later
    val q2 = spark.sql(
      "SELECT p, min(k) AS lo FROM dw_t GROUP BY p ORDER BY count(*), p")
    assert(fileScans(q2) == 0, "ORDER BY count(*) must not defeat the fold")
    assert(q2.collect().length == 3)
  }

  test("the DataFrame API over spark.table(dw_t) folds like the SQL form") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_api")).enableSql()
    val df = spark.range(3000).select(col("id").as("k"))
      .repartitionByRange(3, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    val q = spark.table("dw_t")
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
    assert(fileScans(q) == 0, "the API path resolves through the same " +
      "view alias — it must fold:\n" + q.queryExecution.sparkPlan)
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 2999L &&
      r.getLong(2) == 3000L)
  }

  test("a foreign malformed %-segment partition dir degrades, never fails") {
    val root = tmp("wh_mdagg_foreign")
    val wh = new Warehouse(spark, root).enableSql()
    val df = spark.range(600).select(
      when(col("id") % 2 === 0, "a").otherwise("b").as("p"),
      col("id").as("k"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    // forge the FOREIGN layout this engine never writes: a partition
    // value escaped as `%` + non-hex. Physically rename p=a → p=a%zq
    // and rewrite the committed records to match — exactly what an
    // external writer with different escaping rules leaves behind.
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root)
    val all = java.nio.file.Files.walk(base).iterator().asScala.toList
    all.foreach { f =>
      if (java.nio.file.Files.isRegularFile(f) &&
          (f.toString.endsWith(".manifest") || f.toString.endsWith(".delta"))) {
        val txt = java.nio.file.Files.readString(f)
        if (txt.contains("p=a/")) {
          java.nio.file.Files.writeString(f, txt.replace("p=a/", "p=a%zq/"))
          // drop the Hadoop checksum sidecar the edit invalidated
          val crc = f.resolveSibling("." + f.getFileName + ".crc")
          java.nio.file.Files.deleteIfExists(crc)
        }
      }
    }
    val dirs = all.filter(d => java.nio.file.Files.isDirectory(d) &&
      d.getFileName.toString == "p=a")
    assert(dirs.nonEmpty, "test setup: expected a p=a partition directory")
    dirs.foreach(d =>
      java.nio.file.Files.move(d, d.resolveSibling("p=a%zq")))
    // the writing instance caches its parsed manifest and its dw_ view
    // lists pre-forgery paths — read the foreign layout the way a real
    // reader would: a fresh instance over the directory, view refreshed
    val rdr = new Warehouse(spark, root).enableSql()
    rdr.refreshTable("t")
    // the old parser threw NumberFormatException HERE, at analysis —
    // the contract is "disqualify or parse verbatim, never fail", and
    // either way the answer must equal the real scan's
    val sql = "SELECT p, min(k) AS lo, count(*) AS n FROM dw_t GROUP BY p"
    val got = spark.sql(sql).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    spark.conf.set("graft.metadataAgg.enabled", "false")
    val want =
      try spark.sql(sql).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      finally spark.conf.set("graft.metadataAgg.enabled", "true")
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._3).sum == 600L)
  }

  test("property: random layouts × aggregates — rewrite ≡ scan, fires iff eligible") {
    val rnd = new scala.util.Random(20260814L)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .sorted.toSeq
    for (trial <- 0 until 8) {
      val wh = new Warehouse(spark, tmp(s"wh_mdagg_fz$trial")).enableSql()
      val t = s"fz$trial"
      val nRows = 500 + rnd.nextInt(2500)
      val nPart = 1 + rnd.nextInt(4)
      val nullMod = 2 + rnd.nextInt(5)
      val partitioned = rnd.nextBoolean()
      val df = spark.range(nRows).select(
        (col("id") % nPart).cast("string").as("p"),
        col("id").as("k"),
        when(col("id") % nullMod =!= 0, col("id") * 3).as("v"),
        // the round-14 decimal lane rides the same pool: a fixed-point
        // column with its own null pattern
        when(col("id") % (nullMod + 1) =!= 0,
          org.apache.spark.sql.functions.expr(
            "cast(id * 0.25 as decimal(12,2))")).as("d"))
      if (partitioned)
        wh.save(t, df.repartition(1 + rnd.nextInt(4)),
          partitionBy = Seq("p"), clusterBy = Seq("k"))
      else
        wh.save(t, df.repartitionByRange(1 + rnd.nextInt(4), col("k")),
          clusterBy = Seq("k"))
      val vStats = rnd.nextBoolean()
      if (vStats) wh.statsBy(t, Seq("v"))
      val dStats = rnd.nextBoolean()
      if (dStats) wh.statsBy(t, Seq("d"))
      if (rnd.nextBoolean()) {
        import spark.implicits._
        wh.append(t, Seq(("0", nRows.toLong + 1L, null.asInstanceOf[java.lang.Long]))
          .toDF("p", "k", "v").select(col("p"), col("k"),
            col("v").cast("long"),
            lit(null).cast("decimal(12,2)").as("d")))
      }
      var hasDv = false
      if (rnd.nextBoolean()) {
        hasDv = wh.delete(t, col("k") === (nRows / 2).toLong).filesDv >= 1
        if (hasDv && rnd.nextBoolean()) { wh.compact(t); hasDv = false }
      }
      // (query, eligible: Some(expected-to-fold) | None(don't assert))
      val pool: Seq[(String, Option[Boolean])] = Seq(
        (s"SELECT min(k) AS a, max(k) AS b, count(*) AS c FROM dw_$t",
          Some(!hasDv)),
        (s"SELECT count(*) AS c FROM dw_$t", Some(true)),
        (s"SELECT avg(k) AS m FROM dw_$t", Some(!hasDv)),
        (s"SELECT avg(v) AS m, avg(k) AS mk FROM dw_$t",
          Some(vStats && !hasDv)),
        (s"SELECT min(v) AS a, max(v) AS b FROM dw_$t",
          Some(vStats && !hasDv)),
        (s"SELECT count(v) AS c FROM dw_$t", Some(vStats && !hasDv)),
        (s"SELECT sum(v) AS s, count(v) AS c FROM dw_$t",
          Some(vStats && !hasDv)),
        (s"SELECT sum(k) AS s FROM dw_$t", Some(!hasDv)),
        // decimal sums fold (exact fixed-scale addition); decimal AVG
        // never folds — its plan type divides in decimal
        (s"SELECT sum(d) AS sd FROM dw_$t", Some(dStats && !hasDv)),
        (s"SELECT min(d) AS a, max(d) AS b FROM dw_$t",
          Some(dStats && !hasDv)),
        (s"SELECT avg(d) AS ad FROM dw_$t", Some(false)),
        (s"SELECT min(k) AS a FROM dw_$t WHERE k > 100", Some(false))) ++
        (if (partitioned) Seq(
          (s"SELECT p, min(k) AS lo, max(k) AS hi, count(*) AS n " +
            s"FROM dw_$t GROUP BY p", Some(!hasDv)),
          (s"SELECT p, sum(v) AS sv, sum(k) AS sk FROM dw_$t GROUP BY p",
            Some(vStats && !hasDv)),
          (s"SELECT p, sum(d) AS sd FROM dw_$t GROUP BY p",
            Some(dStats && !hasDv)),
          (s"SELECT p, avg(v) AS av FROM dw_$t GROUP BY p",
            Some(vStats && !hasDv)),
          (s"SELECT min(k) AS lo, count(*) AS n FROM dw_$t WHERE p = '0'",
            Some(!hasDv)),
          (s"SELECT p, count(*) AS n FROM dw_$t " +
            s"WHERE p IN ('0','2') GROUP BY p", Some(true)))
         else Nil)
      for ((sql, eligible) <- pool) {
        val q = spark.sql(sql)
        val fired = fileScans(q) == 0
        eligible.foreach(e => assert(fired == e,
          s"trial $trial (partitioned=$partitioned vStats=$vStats " +
            s"dStats=$dStats " +
            s"hasDv=$hasDv): expected fold=$e got fold=$fired for: $sql\n" +
            q.queryExecution.sparkPlan))
        val got = rows(q)
        spark.conf.set("graft.metadataAgg.enabled", "false")
        val want =
          try rows(spark.sql(sql))
          finally spark.conf.set("graft.metadataAgg.enabled", "true")
        assert(got == want,
          s"trial $trial: rewrite ≠ scan for: $sql\ngot  $got\nwant $want")
      }
    }
  }

  test("commits keep the rewrite current (view re-points per commit)") {
    val wh = new Warehouse(spark, tmp("wh_mdagg_fresh")).enableSql()
    import spark.implicits._
    wh.save("t", Seq(1L, 2L, 3L).toDF("k").coalesce(1), clusterBy = Seq("k"))
    assert(spark.sql("SELECT max(k) AS a FROM dw_t")
      .collect()(0).getLong(0) == 3L)
    wh.append("t", Seq(99L).toDF("k"))
    val q = spark.sql("SELECT max(k) AS a, count(*) AS c FROM dw_t")
    assert(fileScans(q) == 0)
    val r = q.collect()(0)
    assert(r.getLong(0) == 99L && r.getLong(1) == 4L)
  }
}
