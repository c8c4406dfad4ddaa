package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent-catalog warehouse mode (reference: the real `Olist_DW`
  * database, `Olist DW.sql:39-51`): the build lands as managed catalog
  * tables via saveAsTable, every write is followed by `ANALYZE TABLE`
  * so the cost-based optimizer has row counts (and per-column NDV on
  * the dims), and reports run against `olist_dw.<table>` names.
  */
class CatalogWarehouseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val src = OlistFixtures.sources(spark)
  private val DB = "olist_dw"

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("olist_cat").toString
    val w = new Warehouse(spark, dir, "parquet", database = Some(DB))
    w.build(src)
    w
  }

  test("build lands managed tables in the catalog database") {
    wh // force the build
    assert(spark.catalog.databaseExists(DB))
    Seq("time_period", "product", "location", "origin", "lead_type",
      "business_type", "orders_fact", "conversions_fact").foreach { t =>
      assert(spark.catalog.tableExists(DB, t), s"missing $DB.$t")
    }
  }

  test("ANALYZE statistics visible in DESCRIBE EXTENDED and in plan stats") {
    wh
    val desc = spark.sql(s"DESCRIBE EXTENDED $DB.orders_fact").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.contains("Statistics"), s"no Statistics row in:\n$desc")
    assert(desc("Statistics").contains("rows"), s"no row count: ${desc("Statistics")}")
    // and the optimizer actually sees it (CBO reads catalog row counts)
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(s"$DB.orders_fact").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.nonEmpty, "row count not propagated into plan stats")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("dimension column stats (NDV) recorded for CBO") {
    wh
    val d = spark.sql(s"DESCRIBE EXTENDED $DB.product product_key").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d.get("distinct_count").exists(v => v != null && v != "NULL"),
      s"no NDV for product_key:\n$d")
  }

  test("reports run against catalog-qualified tables") {
    wh
    val dw = Reports.topSellersByUnitsDw(spark.table(s"$DB.orders_fact"),
      spark.table(s"$DB.time_period"), src("sellers"), 2018).collect()
    assert(dw.nonEmpty)
  }

  test("filtered time dim dynamically prunes the year-partitioned fact scan") {
    wh
    // the mechanism that lets the star probe scan 1/Nth of a 100 TB
    // fact: the partition column rides the join, so Catalyst plants a
    // dynamicpruning subquery on the fact scan fed by the filtered
    // (broadcast) dim — only matching year= directories are read.
    // The dim filter is on `date`, NOT on year: a literal year filter
    // would propagate to the fact statically through the join
    // constraint (also good — but then there's nothing left for DPP
    // to do); a date-range filter implies the year only at runtime.
    val t = spark.table(s"$DB.time_period").alias("t")
      .filter(col("date").between("2018-06-01", "2018-06-30"))
    val f = spark.table(s"$DB.orders_fact").alias("f")
    val q = f.join(broadcast(t), col("f.date_key") === col("t.date_key") &&
        col("f.year") === col("t.year"))
      .groupBy(col("t.month")).agg(sum("units_sold").as("units"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), s"no dynamic partition pruning:\n$p")
    assert(q.collect().nonEmpty)
  }

  test("incremental append + partition-scoped upsert work on catalog tables") {
    wh
    val before = spark.table(s"$DB.orders_fact").count()
    val appended = IncrementalLoad.run(wh, src, "2019-01-01", "2019-02-01")
    assert(spark.table(s"$DB.orders_fact").count() == before + appended.count())
    // upsert replaces the loaded dates in place (no duplicates)
    IncrementalLoad.runUpsert(wh, src, "2019-01-01", "2019-02-01")
    val f = spark.table(s"$DB.orders_fact")
    assert(f.filter(col("date_key") >= 20190101).count() == appended.count())
    assert(f.count() == before + appended.count())
  }

  test("catalog clustering: recorded as a table property and re-applied by compact") {
    wh
    import spark.implicits._
    val whc = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("olist_cat_clus").toString,
      "parquet", database = Some(DB))
    whc.save("clus_cat", spark.range(50000).select(
      (col("id") * 7919 % 50000).as("k"), col("id").as("v")),
      clusterBy = Seq("k"))
    // compaction through a FRESH instance must recover the cluster spec
    // from the table property and keep files internally sorted
    val whc2 = new Warehouse(spark, java.nio.file.Files
      .createTempDirectory("olist_cat_clus2").toString, "parquet", database = Some(DB))
    whc2.append("clus_cat", spark.range(1000).select(
      (col("id") * 31 % 1000 + 100000).as("k"), col("id").as("v")))
    whc2.compact("clus_cat")
    val loc = spark.sql(s"DESCRIBE EXTENDED $DB.clus_cat").collect()
      .find(_.getString(0) == "Location").map(_.getString(1)).get
      .stripPrefix("file:")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(loc))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k")
        .collect().map(_.getLong(0)).toSeq
      assert(ks == ks.sorted, s"catalog compact lost clustering in $f")
    }
    assert(spark.table(s"$DB.clus_cat").count() == 51000)
  }

  test("bucketed tables co-locate: fact-fact join has zero exchanges") {
    wh // ensure the db exists
    val big1 = spark.range(50000).toDF("id")
      .select(col("id").as("k"), (col("id") % 97).as("a"))
    val big2 = spark.range(50000).toDF("id")
      .select(col("id").as("k"), (col("id") % 31).as("b"))
    wh.saveBucketed("bk1", big1, 8, Seq("k"), sortCols = Seq("k"))
    wh.saveBucketed("bk2", big2, 8, Seq("k"), sortCols = Seq("k"))
    // one file per bucket: the repartition-before-bucketBy shape (not
    // buckets × tasks files)
    val loc = spark.sql(s"DESCRIBE EXTENDED $DB.bk1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap.apply("Location")
    val dataFiles = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(
        new java.net.URI(loc))).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    }
    assert(dataFiles.size == 8, s"expected 8 bucket files, got ${dataFiles.size}")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table(s"$DB.bk1").join(spark.table(s"$DB.bk2"), "k")
        .groupBy("a").agg(count(lit(1)).as("n"), sum("b").as("sb"))
      val joinSide = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
        .split("HashAggregate").last // below the agg: the join itself
      assert(joinSide.contains("SortMergeJoin"), joinSide)
      assert(!joinSide.contains("Exchange"),
        s"bucketed join still shuffles:\n$joinSide")
      // and the co-located plan returns exactly the plain-join result
      val got = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = big1.join(big2, "k").groupBy("a")
        .agg(count(lit(1)).as("n"), sum("b").as("sb")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // runs LAST: mutates the shared table through a fresh instance
  test("a NEW Warehouse instance over the existing catalog db recovers partitioning from the catalog") {
    wh // ensure built
    val wh2 = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("olist_cat2").toString,
      "parquet", database = Some(DB))
    val before = spark.table(s"$DB.orders_fact").count()
    // upsert through the fresh instance: partition columns must come
    // from the catalog (no _graft_meta exists in database mode)
    IncrementalLoad.runUpsert(wh2, src, "2019-01-01", "2019-02-01")
    val f = spark.table(s"$DB.orders_fact")
    assert(f.filter(col("date_key") >= 20190101).count() == 5)
    assert(f.count() == before) // replaced in place, nothing duplicated
  }
}
