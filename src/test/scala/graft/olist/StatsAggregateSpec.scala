package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only aggregates ([[Warehouse.statsAggregate]]): MIN/MAX +
  * COUNT(*) folded from the manifest's per-file stats — zero data
  * files opened on a clean table, DV'd files (and only those)
  * rescanned, honest None when any file lacks a requested stat.
  */
class StatsAggregateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("clean table: exact min/max/count with NO file scan in the plan") {
    val dir = tmp("wh_sagg")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(10000)
      .select(col("id").as("k"), (col("id") * 7 % 997).as("v"),
        concat(lit("s"), lpad(col("id").cast("string"), 5, "0")).as("s"))
      .repartitionByRange(6, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v", "s"))
    val got = wh.statsAggregate("t", Seq("k", "v", "s")).get
    // the whole answer folds driver-side: LocalRelation, no FileScan
    assert(!got.queryExecution.executedPlan.toString.contains("Scan "),
      "clean-table statsAggregate must not plan a file scan")
    val r = got.collect()(0)
    assert(r.getAs[Long]("min_k") == 0L && r.getAs[Long]("max_k") == 9999L)
    assert(r.getAs[Long]("min_v") == 0L)
    assert(r.getAs[Long]("max_v") ==
      (0L until 10000L).map(_ * 7 % 997).max)
    assert(r.getAs[String]("min_s") == "s00000")
    assert(r.getAs[String]("max_s") == "s09999")
    assert(r.getAs[Long]("cnt") == 10000L)
  }

  test("timestamp stats round-trip exactly (fractional seconds included)") {
    val dir = tmp("wh_sagg_ts")
    val wh = new Warehouse(spark, dir)
    import spark.implicits._
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("1998-03-05 04:05:06.123456")),
      (2L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00.5")),
      (3L, java.sql.Timestamp.valueOf("2001-12-31 23:59:59")),
      (4L, java.sql.Timestamp.valueOf("1999-06-15 12:00:00.000001")))
    wh.save("t", rows.toDF("k", "ts").repartition(2, col("k")),
      clusterBy = Seq("ts"))
    val r = wh.statsAggregate("t", Seq("ts")).get.collect()(0)
    assert(r.getAs[java.sql.Timestamp]("min_ts") ==
      java.sql.Timestamp.valueOf("1995-01-01 00:00:00.5"))
    assert(r.getAs[java.sql.Timestamp]("max_ts") ==
      java.sql.Timestamp.valueOf("2001-12-31 23:59:59"))
    assert(r.getAs[Long]("cnt") == 4L)
  }

  test("TIMESTAMP_NTZ stats answer too (the pyarrow-parquet lane)") {
    // the driver's testdata carries timestamp[us] without tz →
    // Spark 4 reads TIMESTAMP_NTZ and stats render LocalDateTime ISO
    val dir = tmp("wh_sagg_ntz")
    val wh = new Warehouse(spark, dir)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    wh.save("t", li.repartitionByRange(4, col("l_shipdate")),
      clusterBy = Seq("l_shipdate"))
    val r = wh.statsAggregate("t", Seq("l_shipdate")).get.collect()(0)
    val want = li.agg(min("l_shipdate"), max("l_shipdate"),
      count(lit(1))).collect()(0)
    assert(r.getAs[Any]("min_l_shipdate") == want.getAs[Any](0))
    assert(r.getAs[Any]("max_l_shipdate") == want.getAs[Any](1))
    assert(r.getAs[Long]("cnt") == want.getAs[Long](2))
  }

  test("DV'd files rescan — and ONLY they do; extremes follow live rows") {
    val dir = tmp("wh_sagg_dv")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(5, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    // point-delete the global max row (k=999) — takes the DV path, so
    // its file's manifest stats now overstate the max
    val del = wh.delete("t", col("k") === 999L)
    assert(del.filesDv == 1, s"expected a DV point delete, got $del")
    val agg = wh.statsAggregate("t", Seq("k", "v")).get
    // exactly one DATA file (the DV'd one) is rescanned, the other four
    // fold from metadata — pre-adaptive sparkPlan shows the scans (the
    // executed plan hides them inside AQE), and the DV sidecar's own
    // tiny read (_dv/…) is not a data-file rescan
    val scans = agg.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.filterNot(_.contains("_dv/"))
    }.flatten
    assert(scans.length == 1, s"expected 1 rescanned file, planned $scans")
    val r = agg.collect()(0)
    assert(r.getAs[Long]("min_k") == 0L && r.getAs[Long]("max_k") == 998L)
    assert(r.getAs[Long]("max_v") == 1996L)
    assert(r.getAs[Long]("cnt") == 999L)
  }

  test("honest None when a file lacks stats for a requested column") {
    val dir = tmp("wh_sagg_none")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(100).select(col("id").as("k"), col("id").as("v"))
    wh.save("t", df.coalesce(1)) // no clusterBy/statsBy: no col stats
    assert(wh.statsAggregate("t", Seq("v")).isEmpty)
    // declaring stats afterward re-analyzes and the answer appears
    wh.statsBy("t", Seq("v"))
    val r = wh.statsAggregate("t", Seq("v")).get.collect()(0)
    assert(r.getAs[Long]("min_v") == 0L && r.getAs[Long]("max_v") == 99L)
  }

  test("withSums: exact metadata sums, DV rescan merges, non-integral refuses") {
    val dir = tmp("wh_sagg_sum")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(1000).select(col("id").as("k"),
      when(col("id") % 5 =!= 0, col("id") * 3).as("v"),
      col("id").cast("string").as("s"))
      .repartitionByRange(4, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v", "s"))
    val r = wh.statsAggregate("t", Seq("k", "v"), withSums = true).get
    // clean table: still a pure LocalRelation plan
    assert(!r.queryExecution.executedPlan.toString.contains("Scan "),
      "clean-table sums must not plan a file scan")
    val want = df.agg(sum("k"), sum("v")).collect()(0)
    val row = r.collect()(0)
    assert(row.getAs[Long]("sum_k") == want.getLong(0))
    assert(row.getAs[Long]("sum_v") == want.getLong(1))
    assert(row.getAs[Long]("cnt") == 1000L)
    // a string column cannot sum — the whole request refuses (None)
    assert(wh.statsAggregate("t", Seq("s"), withSums = true).isEmpty)
    // …while the min/max-only form still answers for it
    assert(wh.statsAggregate("t", Seq("s")).isDefined)
    // DV'd files rescan; live-row sums merge exactly
    wh.delete("t", col("k") === 10L)
    val r2 = wh.statsAggregate("t", Seq("k"), withSums = true).get.collect()(0)
    assert(r2.getAs[Long]("sum_k") == (0L until 1000L).sum - 10L)
    assert(r2.getAs[Long]("cnt") == 999L)
  }

  test("withAvgs: exact-sum/non-null-count means, NULL over all-null, DV rescan merges") {
    val dir = tmp("wh_sagg_avg")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(1000).select(col("id").as("k"),
      when(col("id") % 5 =!= 0, col("id") * 3).as("v"),
      col("id").cast("string").as("s"))
      .repartitionByRange(4, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v", "s"))
    val r = wh.statsAggregate("t", Seq("k", "v"), withAvgs = true).get
    assert(!r.queryExecution.executedPlan.toString.contains("Scan "),
      "clean-table avgs must not plan a file scan")
    val want = df.agg(avg("k"), avg("v")).collect()(0)
    val row = r.collect()(0)
    // denominators differ: avg_k over all rows, avg_v over non-nulls
    assert(row.getAs[Double]("avg_k") == want.getDouble(0))
    assert(row.getAs[Double]("avg_v") == want.getDouble(1))
    // a string column cannot average — the whole request refuses
    assert(wh.statsAggregate("t", Seq("s"), withAvgs = true).isEmpty)
    // an all-null column answers SQL NULL, not a poisoned request
    val wh2 = new Warehouse(spark, tmp("wh_sagg_avgnull"))
    wh2.save("z", spark.range(40).select(col("id").as("k"),
      lit(null).cast("long").as("v")).coalesce(1), clusterBy = Seq("k"))
    wh2.statsBy("z", Seq("v"))
    val rz = wh2.statsAggregate("z", Seq("v"), withAvgs = true).get
      .collect()(0)
    assert(rz.isNullAt(rz.fieldIndex("avg_v")))
    // DV'd files rescan; the mean re-derives from merged exact
    // ingredients (sum and non-null count), one final division
    wh.delete("t", col("k") === 10L)
    val r2 = wh.statsAggregate("t", Seq("k"), withSums = true,
      withAvgs = true).get.collect()(0)
    val liveSum = (0L until 1000L).sum - 10L
    assert(r2.getAs[Long]("sum_k") == liveSum)
    assert(r2.getAs[Double]("avg_k") == liveSum.toDouble / 999L)
    assert(r2.getAs[Long]("cnt") == 999L)
  }

  test("statsAggregateBy withAvgs: the per-group mean ledger, exact through DV merges") {
    val dir = tmp("wh_saggby_avg")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(2000)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("k"),
        when(col("id") % 3 =!= 0, col("id") * 7).as("v"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val clean = wh.statsAggregateBy("t", Seq("p"), Seq("k", "v"),
      withAvgs = true).get
    assert(clean.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.isEmpty, "clean grouped avgs must not plan a file scan")
    def wantMap() = df.groupBy("p").agg(avg("k"), avg("v")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(clean.collect().map(r => r.getAs[String]("p") ->
      ((r.getAs[Double]("avg_k"), r.getAs[Double]("avg_v")))).toMap
      == wantMap())
    // DV one partition's row; its group merges scan + metadata
    // ingredients and divides once — exactly the live mean
    assert(wh.delete("t", col("k") === 1998L).filesDv >= 1)
    val live = df.filter(col("k") =!= 1998L)
    val want2 = live.groupBy("p").agg(avg("k"), avg("v")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val res = wh.statsAggregateBy("t", Seq("p"), Seq("k", "v"),
      withAvgs = true).get.collect().map(r => r.getAs[String]("p") ->
        ((r.getAs[Double]("avg_k"), r.getAs[Double]("avg_v")))).toMap
    assert(res == want2)
  }

  test("DECIMAL columns: exact metadata sums in the scan's own type; doubles disqualify to the scan") {
    val dir = tmp("wh_sagg_dec")
    val wh = new Warehouse(spark, dir).enableSql()
    val df = spark.range(1000).select(col("id").as("k"),
      when(col("id") % 5 =!= 0,
        expr("cast(id * 0.25 as decimal(12,2))")).as("p"),
      (col("id").cast("double") / 8).as("dbl"))
      .repartitionByRange(4, col("k"))
    wh.save("t", df, clusterBy = Seq("k"))
    wh.statsBy("t", Seq("p", "dbl"))
    // clean table: the decimal sum folds with zero file scans, in
    // Spark's own Sum result type decimal(12+10, 2), bit-equal to the
    // scan's exact decimal sum; the mean = double(exact sum)/nn
    val r = wh.statsAggregate("t", Seq("p"), withSums = true,
      withAvgs = true).get
    assert(!r.queryExecution.executedPlan.toString.contains("Scan "),
      "clean-table decimal sums must not plan a file scan")
    val want = df.agg(sum("p"), count(col("p"))).collect()(0)
    val row = r.collect()(0)
    assert(row.schema("sum_p").dataType ==
      org.apache.spark.sql.types.DecimalType(22, 2))
    assert(row.getDecimal(row.fieldIndex("sum_p")) == want.getDecimal(0))
    assert(row.getAs[Double]("avg_p") ==
      want.getDecimal(0).doubleValue() / want.getLong(1))
    // the directed disqualification: a DOUBLE column's sum/avg keeps
    // the scan — float addition is order-dependent, no metadata fold
    // can promise the scan's bits
    assert(wh.statsAggregate("t", Seq("dbl"), withSums = true).isEmpty)
    assert(wh.statsAggregate("t", Seq("dbl"), withAvgs = true).isEmpty)
    // …and through the SQL rewrite: sum(decimal) folds to a
    // LocalRelation, sum(double) keeps its FileScan.
    // sparkPlan, not executedPlan: AQE wraps the latter and hides the
    // scans until execution (the MetadataAggRewriteSpec helper's shape)
    def scans(q: String): Int =
      spark.sql(q).queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.size
    assert(scans("SELECT sum(p) AS s FROM dw_t") == 0,
      "SQL sum(decimal) must fold from the manifest")
    assert(spark.sql("SELECT sum(p) AS s FROM dw_t").collect()(0)
      .getDecimal(0) == want.getDecimal(0))
    assert(scans("SELECT sum(dbl) AS s FROM dw_t") > 0,
      "SQL sum(double) must disqualify to the scan")
    assert(scans("SELECT avg(p) AS a FROM dw_t") > 0,
      "SQL avg(decimal) keeps the scan — its plan type divides in decimal")
    // DV'd files rescan; the decimal merge stays exact (and the SQL
    // fold now honestly keeps the scan — DVs bake deleted rows into
    // the stored sums)
    wh.delete("t", col("k") === 11L) // a non-null p row drops
    val r2 = wh.statsAggregate("t", Seq("p"), withSums = true,
      withAvgs = true).get.collect()(0)
    val want2 = wh.table("t").agg(sum("p"), count(col("p"))).collect()(0)
    assert(r2.getDecimal(r2.fieldIndex("sum_p")) == want2.getDecimal(0))
    assert(r2.getAs[Double]("avg_p") ==
      want2.getDecimal(0).doubleValue() / want2.getLong(1))
    assert(scans("SELECT sum(p) AS s FROM dw_t") > 0,
      "a DV'd snapshot's SQL sum must keep the scan")
  }

  test("SQL surface: DESCRIBE STATS includes __sum_ rows when the manifest can answer them") {
    val dir = tmp("wh_sagg_sql_sum")
    val wh = new Warehouse(spark, dir).enableSql()
    wh.save("t", spark.range(300)
      .select(col("id").as("k"), (col("id") % 9).as("v"))
      .repartitionByRange(3, col("k")), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val rows = spark.sql("DESCRIBE STATS t (k, v)").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows("k") == (("0", "299")))
    assert(rows("__sum_k") == (((0L until 300L).sum.toString,
      (0L until 300L).sum.toString)))
    assert(rows("__sum_v")._1 ==
      (0L until 300L).map(_ % 9).sum.toString)
    // the avg lane rides the same stats: __avg_ rows appear alongside
    assert(rows("__avg_k")._1 ==
      ((0L until 300L).sum.toDouble / 300).toString)
    assert(rows("__avg_v")._1 ==
      ((0L until 300L).map(_ % 9).sum.toDouble / 300).toString)
    assert(rows("__rows") == (("300", "300")))
  }

  test("unknown column refuses; empty column list refuses") {
    val dir = tmp("wh_sagg_req")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(10).select(col("id").as("k")).coalesce(1),
      clusterBy = Seq("k"))
    intercept[IllegalArgumentException] {
      wh.statsAggregate("t", Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      wh.statsAggregate("t", Nil)
    }
  }

  test("SQL surface: DESCRIBE STATS t (cols)") {
    val dir = tmp("wh_sagg_sql")
    val s2 = spark
    val wh = new Warehouse(s2, dir).enableSql()
    wh.save("t", s2.range(500)
      .select(col("id").as("k"), (col("id") % 9).as("v"))
      .repartitionByRange(3, col("k")), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val rows = s2.sql("DESCRIBE STATS t (k, v)").collect()
    val byCol = rows.map(r => r.getString(0) ->
      (r.getString(1), r.getString(2))).toMap
    assert(byCol("k") == (("0", "499")))
    assert(byCol("v") == (("0", "8")))
    assert(byCol("__rows") == (("500", "500")))
    // un-analyzed column → loud refusal, not a silent wrong answer
    val ex = intercept[Exception] {
      s2.sql("DESCRIBE STATS t (nope)").collect()
    }
    assert(ex.getMessage.contains("nope") ||
      ex.getCause != null && ex.getCause.getMessage.contains("nope"))
  }

  test("statsAggregateBy: exact per-partition min/max/count, zero file scans") {
    val dir = tmp("wh_saggby")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(9000)
      .select((col("id") % 3).cast("string").as("p"), col("id").as("k"),
        (col("id") * 3 % 101).as("v"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    wh.statsBy("t", Seq("v"))
    val got = wh.statsAggregateBy("t", Seq("p"), Seq("k", "v")).get
    // the answer is a LocalTableScan (driver rows) — no FileSourceScan
    assert(got.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.isEmpty, "clean grouped statsAggregateBy must not plan a file scan")
    val want = df.groupBy("p").agg(min("k"), max("k"), min("v"),
      max("v"), count(lit(1))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val res = got.collect().map(r => r.getAs[String]("p") ->
      ((r.getAs[Long]("min_k"), r.getAs[Long]("max_k"),
        r.getAs[Long]("min_v"), r.getAs[Long]("max_v"),
        r.getAs[Long]("cnt")))).toMap
    assert(res == want)
  }

  test("statsAggregateBy: DV'd files merge per group; non-partition group refuses") {
    val dir = tmp("wh_saggby_dv")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(3000)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("k"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    // point-delete the max of partition "1" (id 2999) via the DV path
    val del = wh.delete("t", col("k") === 2999L)
    assert(del.filesDv >= 1, s"expected a DV delete, got $del")
    val res = wh.statsAggregateBy("t", Seq("p"), Seq("k")).get
      .collect().map(r => r.getAs[String]("p") ->
        ((r.getAs[Long]("min_k"), r.getAs[Long]("max_k"),
          r.getAs[Long]("cnt")))).toMap
    assert(res("1") == ((1L, 2997L, 1499L)))
    assert(res("0") == ((0L, 2998L, 1500L)))
    intercept[IllegalArgumentException] {
      wh.statsAggregateBy("t", Seq("k"), Seq("k"))
    }
  }

  test("statsAggregateBy withSums: the per-group token ledger, exact through DV merges") {
    val dir = tmp("wh_saggby_sum")
    val wh = new Warehouse(spark, dir)
    val df = spark.range(2000)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("k"))
    wh.save("t", df, partitionBy = Seq("p"), clusterBy = Seq("k"))
    val clean = wh.statsAggregateBy("t", Seq("p"), Seq("k"),
      withSums = true).get
    assert(clean.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.isEmpty, "clean grouped sums must not plan a file scan")
    val want = df.groupBy("p").agg(sum("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.collect().map(r =>
      r.getAs[String]("p") -> r.getAs[Long]("sum_k")).toMap == want)
    // DV the even partition's max; its group re-sums live rows exactly
    assert(wh.delete("t", col("k") === 1998L).filesDv >= 1)
    val res = wh.statsAggregateBy("t", Seq("p"), Seq("k"),
      withSums = true).get.collect().map(r =>
        r.getAs[String]("p") -> ((r.getAs[Long]("sum_k"),
          r.getAs[Long]("cnt")))).toMap
    assert(res("0") == ((want("0") - 1998L, 999L)))
    assert(res("1") == ((want("1"), 1000L)))
  }

  test("statsAggregateBy: mixed pre-evolution layout answers None") {
    val dir = tmp("wh_saggby_mixed")
    val wh = new Warehouse(spark, dir)
    import spark.implicits._
    wh.save("t", Seq((1L, "a"), (2L, "b")).toDF("k", "p").coalesce(1),
      clusterBy = Seq("k"))
    wh.repartitionTable("t", Seq("p"))
    wh.append("t", Seq((3L, "a")).toDF("k", "p"))
    // the pre-evolution file has no p=… segment: not derivable
    assert(wh.statsAggregateBy("t", Seq("p"), Seq("k")).isEmpty)
  }
}
