package graft.olist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Olist star-schema warehouse on Spark — the engine with the same
  * capability surface as the reference's `Olist DW.sql` + SSIS package,
  * re-expressed Spark-first.
  *
  * Source tables arrive as a Map of DataFrames (from CSV with declared
  * schemas, Parquet, or test fixtures); warehouse tables are written as
  * Parquet under `basePath` and registered as temp views `dw_<name>`.
  * At cluster scale `basePath` is a distributed store and the fact
  * tables are written partitioned by year (SURVEY §4: partition pruning
  * on the date axis; dims stay broadcast-sized and unpartitioned).
  *
  * With `database = Some("olist_dw")` the build lands in the session
  * catalog instead (the moral equivalent of the reference's persistent
  * `Olist_DW` database, `Olist DW.sql:39-51`): `CREATE DATABASE IF NOT
  * EXISTS` (S9), managed `saveAsTable` per table, and `ANALYZE TABLE …
  * COMPUTE STATISTICS` after every build step so the cost-based
  * optimizer sees row counts / sizes (SURVEY §4 CBO row); dimension
  * tables additionally get per-column NDV stats (the join-reorder and
  * broadcast-threshold inputs).
  */
class Warehouse(spark: SparkSession, basePath: String,
    format: String = "parquet", database: Option[String] = None) {
  import Normalize.norm

  require(Seq("parquet", "orc", "json", "csv").contains(format),
    s"unsupported warehouse format: $format")

  database.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db"))

  /** Partition spec recorded at save time so appends lay files out
    * identically (a flat append into a partitioned directory corrupts
    * partition discovery). */
  private val partitioning = scala.collection.mutable.Map.empty[String, Seq[String]]

  /** S4 CTAS-style sink + catalog registration (reference:
    * SELECT..INTO, Olist DW.sql:64-67 etc.). */
  def save(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): DataFrame = {
    partitioning(name) = partitionBy
    schemas(name) = df.schema
    val w = df.write.mode("overwrite").format(format)
      .option("header", "true") // no-op outside csv
    val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    database match {
      case Some(db) =>
        pw.saveAsTable(s"$db.$name")
        analyze(db, name, columnStats = partitionBy.isEmpty)
      case None =>
        pw.save(s"$basePath/$name")
        // meta only AFTER the data write succeeds — a failed write must
        // not leave metadata describing data that never landed
        writeMeta(name, partitionBy, df.schema)
    }
    val back = read(name)
    back.createOrReplaceTempView(s"dw_$name")
    back
  }

  /** S5/S7 append sink (reference: SSIS fast-load `Package.dtsx:281-445`;
    * INSERT..SELECT `Olist DW.sql:71-75`). Parquet append is bulk and
    * atomic per task — the moral equivalent of TABLOCK fast load. */
  def append(name: String, df: DataFrame): Unit = database match {
    case Some(db) =>
      // insertInto appends through the table definition (partition
      // layout included) — positional, so align to the table's order
      val target = spark.table(s"$db.$name")
      df.select(target.columns.map(col): _*)
        .write.mode("append").insertInto(s"$db.$name")
      // keep CBO inputs fresh; dims (unpartitioned) refresh NDV too
      analyze(db, name, columnStats = partitionColsOf(name).isEmpty)
    case None =>
      val parts = partitionColsOf(name)
      val w = df.write.mode("append").format(format)
        .option("header", "true")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
        .save(s"$basePath/$name")
  }

  /** The table's partition columns as a NEW Warehouse instance over an
    * existing store must see them: from the session catalog in database
    * mode (the catalog IS the metadata there — `_graft_meta` is never
    * written), from the persisted meta files otherwise. */
  private def partitionColsOf(name: String): Seq[String] =
    partitioning.getOrElseUpdate(name, database match {
      case Some(db) =>
        spark.catalog.listColumns(s"$db.$name").collect()
          .filter(_.isPartition).map(_.name).toSeq
      case None => loadMeta(name)._1
    })

  /** Partition-scoped overwrite: replace ONLY the partitions present in
    * `df`, leaving every other partition's files physically untouched
    * (`partitionOverwriteMode=dynamic`). This is what makes the
    * date-grain upsert a bounded rewrite instead of a full-table one —
    * at 100 TB a daily delta touches one `year=` directory, not the
    * table. */
  def overwritePartitions(name: String, df: DataFrame): Unit = {
    val parts = partitionColsOf(name)
    require(parts.nonEmpty, s"overwritePartitions: $name is not partitioned")
    withDynamicOverwrite {
      database match {
        case Some(db) =>
          // insertInto is positional — align to the table's column order
          val target = spark.table(s"$db.$name")
          df.select(target.columns.map(col): _*)
            .write.mode("overwrite").format(format).insertInto(s"$db.$name")
          analyze(db, name, columnStats = false)
        case None =>
          df.write.mode("overwrite").format(format).option("header", "true")
            .partitionBy(parts: _*).save(s"$basePath/$name")
      }
    }
  }

  private def withDynamicOverwrite[T](f: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Small-files compaction (the OPTIMIZE of a plain-Parquet warehouse):
    * incremental appends accumulate one file per task per run, and at
    * cluster scale the file-listing + task-scheduling overhead of ten
    * thousand tiny files dominates scans. Rewrites each partition of a
    * partitioned table into ≤ `filesPerPartition` files, or an
    * unpartitioned table into that many files total.
    *
    * Caller contract: EXCLUSIVE access for the duration — plain Parquet
    * has no transaction log, so rows appended between the snapshot and
    * the commit would be lost (a table-format sink — Delta/Iceberg —
    * is what makes OPTIMIZE safe under concurrent ingestion).
    * Durability: the partitioned rewrite goes through dynamic-overwrite
    * staging (old files survive until job commit); the unpartitioned
    * path-mode rewrite writes to a sibling temp directory and swaps by
    * rename, so a mid-write failure leaves the original intact. */
  def compact(name: String, filesPerPartition: Int = 1): Unit = {
    val parts = partitionColsOf(name)
    val n = math.max(filesPerPartition, 1)
    val snapshot = read(name).localCheckpoint()
    if (parts.nonEmpty) {
      // the dynamic-partition writer emits one file per (task,
      // partition value): repartitioning by the partition columns alone
      // → 1 file per partition; add a row-hash splitter only when more
      // are wanted
      val byPart =
        if (n == 1) snapshot.repartition(parts.map(col): _*)
        else snapshot.repartition((parts.map(col) :+
          pmod(hash(snapshot.columns.map(col): _*), lit(n))): _*)
      overwritePartitions(name, byPart)
    } else {
      val coalesced = snapshot.coalesce(n)
      database match {
        case Some(db) =>
          val target = spark.table(s"$db.$name")
          coalesced.select(target.columns.map(col): _*)
            .write.mode("overwrite").insertInto(s"$db.$name")
          analyze(db, name, columnStats = true)
        case None =>
          // write-then-swap: never delete the only copy before the
          // replacement is fully on disk
          val fs = metaFs
          val dst = new org.apache.hadoop.fs.Path(s"$basePath/$name")
          val tmp = new org.apache.hadoop.fs.Path(s"$basePath/.${name}__compacting")
          val old = new org.apache.hadoop.fs.Path(s"$basePath/.${name}__precompact")
          fs.delete(tmp, true)
          coalesced.write.mode("overwrite").format(format)
            .option("header", "true").save(tmp.toString)
          fs.delete(old, true)
          require(fs.rename(dst, old), s"compact: could not stage $dst aside")
          require(fs.rename(tmp, dst), s"compact: could not move $tmp into place")
          fs.delete(old, true)
      }
    }
  }

  /** Table-level stats (rowCount + sizeInBytes) after every write;
    * per-column NDV/min/max on the broadcast-sized dims — the inputs
    * the cost-based optimizer uses for join reordering and broadcast
    * decisions. Facts skip column stats (a full-column scan per build
    * would dominate at 100 TB; the table-level row count is what AQE
    * and the broadcast threshold need). */
  private def analyze(db: String, name: String, columnStats: Boolean): Unit = {
    spark.sql(s"ANALYZE TABLE $db.$name COMPUTE STATISTICS")
    if (columnStats)
      spark.sql(s"ANALYZE TABLE $db.$name COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  /** Schema recorded at save time — json/csv don't self-describe. */
  private val schemas = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]

  private def read(name: String): DataFrame = database match {
    case Some(db) => spark.table(s"$db.$name")
    case None =>
      val sc = schemas.getOrElseUpdate(name,
        loadMeta(name)._2.getOrElse(org.apache.spark.sql.types.StructType(Nil)))
      val r = spark.read.format(format).option("header", "true")
      (if (sc.isEmpty) r else r.schema(sc)).load(s"$basePath/$name")
  }

  /** Table metadata persisted beside the data so a NEW Warehouse
    * instance over an existing basePath (the cross-job incremental
    * scenario) appends with the original partition layout and reads
    * csv/json with the declared schema. Two plain files per table —
    * no hand-rolled JSON parsing. Goes through the Hadoop FileSystem
    * resolved from the basePath URI (NOT java.nio) so the meta lands
    * beside the data on whatever store basePath names — HDFS, S3A, or
    * local file:// — exactly like the data writes do. */
  private def metaDir = new org.apache.hadoop.fs.Path(s"$basePath/_graft_meta")

  private def metaFs: org.apache.hadoop.fs.FileSystem =
    metaDir.getFileSystem(spark.sessionState.newHadoopConf())

  private def writeMeta(name: String,
      parts: Seq[String], schema: org.apache.spark.sql.types.StructType): Unit = {
    val fs = metaFs
    fs.mkdirs(metaDir)
    def put(file: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(metaDir, file), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    put(s"$name.partitions", parts.mkString("\n"))
    put(s"$name.schema.json", schema.json)
  }

  private def loadMeta(name: String)
      : (Seq[String], Option[org.apache.spark.sql.types.StructType]) = {
    val fs = metaFs
    def get(file: String): Option[String] = {
      val p = new org.apache.hadoop.fs.Path(metaDir, file)
      if (fs.exists(p)) {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      } else None
    }
    val parts = get(s"$name.partitions")
      .map(_.split("\n").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val schema = get(s"$name.schema.json").flatMap(j =>
      scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
    (parts, schema)
  }

  def table(name: String): DataFrame = read(name)

  /** Build every dim + both facts from the given source tables.
    * Statement order mirrors the reference build (Olist DW.sql:39-184). */
  def build(src: Map[String, DataFrame]): Unit = {
    val time = TimeDim.generate(spark, "2016-09-01", "2019-12-31")
    save("time_period", time)
    save("product", Dimensions.product(src("category")))
    save("location", Dimensions.location(src("geolocation")))
    save("origin", Dimensions.origin(src("leads")))
    save("lead_type", Dimensions.leadType(src("closed_deals")))
    save("business_type", Dimensions.businessType(src("closed_deals")))
    // dim append: new business segments not already in product dim
    // (Olist DW.sql:71-75 — NOT IN + INSERT..SELECT as anti-join+append)
    append("product",
      Dimensions.newSegments(src("closed_deals"), table("product")))
    save("orders_fact",
      Facts.ordersFact(src("orders"), src("order_items"), src("products"),
        src("category"), src("sellers"), table("product"), table("location"),
        table("time_period"), cutoff = "2019-01-01"),
      partitionBy = Seq("year"))
    val conv = Facts.conversionsFact(src("leads"), src("closed_deals"),
      src("sellers"), src("order_items"), table("origin"),
      table("lead_type"), table("business_type"), table("product"),
      table("time_period"))
    // S8: DELETE WHERE avg_hrs_convert < 1 (Olist DW.sql:183-184) as
    // anti-filter rewrite
    save("conversions_fact", conv.filter(col("avg_hrs_convert") >= 1))
  }
}

/** F6 — SQL Server's default collation is case-insensitive; Spark is
  * case-sensitive. All join/filter boundaries on human-entered strings
  * normalize through here (SURVEY §7.4 trap #1). */
object Normalize {
  def norm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(trim(c))
}
