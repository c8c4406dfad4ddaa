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
  * Path-mode tables commit through a version manifest (the minimal
  * transactional core of a table format): every write publishes a new
  * immutable file-list version, reads resolve one version per
  * DataFrame, and superseded files survive until [[vacuum]] — so
  * compaction and partition upserts are snapshot-consistent for
  * concurrent readers instead of exposing partial directory listings.
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
  private val partitioning = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  /** Serializes read-modify-write manifest commits per table within
    * this JVM, so concurrent writers in one application (e.g. two
    * streams into the same table) cannot erase each other's commit
    * between a manifest read and the version swap. CROSS-process
    * writers remain single-writer-per-table by contract: the
    * rename-no-overwrite commit detects same-version races on stores
    * with atomic-exclusive rename (HDFS), it does not resolve them. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withCommitLock[T](name: String)(f: => T): T =
    commitLocks.computeIfAbsent(name, _ => new Object).synchronized(f)

  /** Cluster spec recorded at save time — clustering is TABLE layout,
    * not a per-write option: append/compact/merge must re-apply the
    * sort or they silently destroy the row-group-skipping property. */
  private val clustering = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  private def clusterColsOf(name: String): Seq[String] =
    clustering.getOrElseUpdate(name, database match {
      case Some(db) =>
        // recorded as a table property so a NEW instance over the
        // catalog recovers it like it recovers partition columns
        scala.util.Try(
          spark.sql(s"SHOW TBLPROPERTIES $db.$name('$ClusterProp')")
            .collect().headOption.map(_.getString(1))
            .filterNot(_.contains("does not have property"))).toOption.flatten
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
      case None =>
        currentManifestFull(name).flatMap(_._3.get(ClusterMeta))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(loadMeta(name)._3)
    })

  /** Re-applies the table's recorded clustering to rows about to be
    * written (partition columns prefix the sort so the partitioned
    * writer's required ordering is satisfied without a re-sort). */
  private def clustered(name: String, df: DataFrame, parts: Seq[String]): DataFrame = {
    val cluster = clusterColsOf(name)
    if (cluster.isEmpty) df
    else df.sortWithinPartitions((parts ++ cluster).map(col): _*)
  }

  /** S4 CTAS-style sink + catalog registration (reference:
    * SELECT..INTO, Olist DW.sql:64-67 etc.). Path mode commits through
    * the version manifest (see [[commitManifest]]): data files land
    * first, the manifest swap is the atomic commit point, and readers
    * pinned to the previous version keep a complete snapshot.
    *
    * `clusterBy` sorts rows by the given columns WITHIN each output
    * file (no extra shuffle): parquet/orc then record tight per-row-
    * group min/max stats on those columns, so point/range filters skip
    * whole row groups at scan time — the poor man's Z-ORDER, and the
    * second lever (after partition pruning) that decides how little of
    * 100 TB a selective query reads. The partition columns prefix the
    * sort so the partitioned writer's own required ordering is already
    * satisfied and doesn't re-sort away the clustering. */
  def save(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil): DataFrame = {
    partitioning(name) = partitionBy
    schemas(name) = df.schema
    clustering(name) = clusterBy
    val shaped = clustered(name, df, partitionBy)
    database match {
      case Some(db) =>
        val w = shaped.write.mode("overwrite").format(format)
          .option("header", "true") // no-op outside csv
        val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
        pw.saveAsTable(s"$db.$name")
        if (clusterBy.nonEmpty)
          spark.sql(s"ALTER TABLE $db.$name SET TBLPROPERTIES" +
            s"('$ClusterProp'='${clusterBy.mkString(",")}')")
        analyze(db, name, columnStats = partitionBy.isEmpty)
      case None =>
        val files = stageWrite(name, shaped, partitionBy)
        // overwrite: new snapshot is the new files; the schema rides the
        // SAME atomic commit so no crash window can separate data from
        // its definition, and tableAt reads each version with the
        // schema it was committed under
        withCommitLock(name) {
          commitManifest(name, files, Map(SchemaMeta -> df.schema.json,
            PartsMeta -> partitionBy.mkString(","),
            ClusterMeta -> clusterBy.mkString(",")))
        }
        // side meta is bootstrap redundancy for pre-manifest readers
        writeMeta(name, partitionBy, df.schema, clusterBy)
    }
    val back = read(name)
    back.createOrReplaceTempView(s"dw_$name")
    back
  }

  /** S5/S7 append sink (reference: SSIS fast-load `Package.dtsx:281-445`;
    * INSERT..SELECT `Olist DW.sql:71-75`). Parquet append is bulk and
    * atomic per task — the moral equivalent of TABLOCK fast load.
    *
    * Path-mode schema evolution (add-column): a delta carrying NEW
    * columns widens the table schema in the same commit — existing
    * files simply lack the column and read as NULL (the columnar
    * add-column semantics of production table formats, no rewrite of
    * old data). Dropping or retyping columns is rejected loudly. */
  def append(name: String, df: DataFrame): Unit = database match {
    case Some(db) =>
      // insertInto appends through the table definition (partition
      // layout included) — positional, so align to the table's order
      val target = spark.table(s"$db.$name")
      clustered(name, df, partitionColsOf(name))
        .select(target.columns.map(col): _*)
        .write.mode("append").insertInto(s"$db.$name")
      // keep CBO inputs fresh; dims (unpartitioned) refresh NDV too
      analyze(db, name, columnStats = partitionColsOf(name).isEmpty)
    case None =>
      val parts = partitionColsOf(name)
      val (aligned, widened) = alignDelta(name, df, allowWiden = true)
      val files = stageWrite(name, clustered(name, aligned, parts), parts)
      withCommitLock(name) {
        val old = currentManifest(name).map(_._2).getOrElse(Nil)
        commitManifest(name, old ++ files,
          widened.map(m => Map(SchemaMeta -> m.json)).getOrElse(Map.empty))
      }
      widened.foreach { merged =>
        schemas(name) = merged
        writeMeta(name, parts, merged, clusterColsOf(name))
      }
  }

  /** Validates a path-mode delta against the table's recorded schema
    * and returns it column-aligned to the recorded order (csv maps
    * columns positionally on read; json/orc get one canonical layout).
    * With `allowWiden`, NEW columns extend the schema at the end
    * (add-column evolution) and the widened schema is returned;
    * otherwise the delta must carry exactly the current columns.
    * Retypes and drops are always rejected. */
  private def alignDelta(name: String, df: DataFrame, allowWiden: Boolean)
      : (DataFrame, Option[org.apache.spark.sql.types.StructType]) = {
    val current = tableSchema(name)
    if (current.isEmpty || current == df.schema) (df, None)
    else {
      val curByName = current.map(f => f.name -> f).toMap
      df.schema.foreach { f =>
        curByName.get(f.name).foreach { cf =>
          require(cf.dataType == f.dataType,
            s"delta for $name cannot retype column ${f.name}: " +
              s"${cf.dataType} -> ${f.dataType}")
        }
      }
      val missing = current.filterNot(f => df.schema.fieldNames.contains(f.name))
      require(missing.isEmpty,
        s"delta for $name drops columns ${missing.map(_.name).mkString(", ")}; " +
          "deltas must carry the full current schema")
      val added = df.schema.filterNot(f => curByName.contains(f.name))
      require(allowWiden || added.isEmpty,
        s"delta for $name adds columns ${added.map(_.name).mkString(", ")}; " +
          "only append() widens the schema")
      val widened =
        if (added.isEmpty) None
        else Some(org.apache.spark.sql.types.StructType(current ++ added))
      (df.select(widened.getOrElse(current).map(f => col(f.name)): _*), widened)
    }
  }

  /** The table's current schema: the manifest's committed copy wins
    * (versioned atomically with the data), then the in-memory cache,
    * then side meta. */
  private def tableSchema(name: String): org.apache.spark.sql.types.StructType =
    currentManifestFull(name).flatMap(m => metaSchema(m._3)).getOrElse(
      schemas.getOrElseUpdate(name,
        loadMeta(name)._2.getOrElse(org.apache.spark.sql.types.StructType(Nil))))

  private def metaSchema(meta: Map[String, String])
      : Option[org.apache.spark.sql.types.StructType] =
    meta.get(SchemaMeta).flatMap(j =>
      scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)

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
    database match {
      case Some(db) => withDynamicOverwrite {
        // insertInto is positional — align to the table's column order
        val target = spark.table(s"$db.$name")
        df.select(target.columns.map(col): _*)
          .write.mode("overwrite").format(format).insertInto(s"$db.$name")
        analyze(db, name, columnStats = false)
      }
      case None =>
        // manifest-level dynamic overwrite: the new snapshot keeps every
        // file OUTSIDE the partitions present in the delta and swaps in
        // the delta's files — untouched partitions' files are not even
        // listed, let alone rewritten, and the swap is atomic
        val (aligned, _) = alignDelta(name, df, allowWiden = false)
        val files = stageWrite(name, clustered(name, aligned, parts), parts)
        val touched = files.map(partitionPrefix).toSet
        withCommitLock(name) {
          val kept = currentManifest(name).map(_._2).getOrElse(Nil)
            .filterNot(f => touched.contains(partitionPrefix(f)))
          commitManifest(name, kept ++ files)
        }
    }
  }

  /** The partition-directory part of a manifest-relative file path
    * ("year=2018/f.parquet" → "year=2018/"; unpartitioned → ""). */
  private def partitionPrefix(rel: String): String =
    rel.substring(0, rel.lastIndexOf('/') + 1)

  /** Row-level MERGE (the Delta-style upsert) for path-mode partitioned
    * tables: delta rows REPLACE target rows carrying the same key —
    * wherever they live — and new keys are inserted. Only partitions
    * that hold delta rows or matched keys are rewritten; everything
    * else is untouched files in the new manifest.
    *
    * Handles the key-moves-partition case `overwritePartitions` cannot:
    * when a delta row lands a key in a NEW partition, the key's old
    * partition is also rewritten without it (even if that empties the
    * partition entirely), so no stale duplicate survives. The affected
    * partition list is collected to the driver — it is bounded by the
    * partitions a delta touches (days/years), never by table size. */
  def merge(name: String, delta: DataFrame, keys: Seq[String]): Unit = {
    require(database.isEmpty, "merge applies to path-mode tables only")
    val parts = partitionColsOf(name)
    require(parts.nonEmpty, s"merge: $name is not partitioned")
    require(keys.nonEmpty, "merge needs at least one key column")
    require(keys.forall(!parts.contains(_)),
      "merge keys must be non-partition columns (a partition value IS part of the key path)")
    // directory-name reconstruction below covers int/long/string/date
    // values (and null/empty via the hive default-partition name);
    // timestamp renders differently on the path than String.valueOf
    require(!tableSchema(name).exists(f => parts.contains(f.name) &&
      (f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.TimestampNTZType)),
      s"merge: timestamp partition columns are not supported on $name")
    // pin the delta once: its lineage would otherwise re-execute in the
    // guard, the partition probe, and the rewrite — and a
    // non-deterministic delta could make the dropped-prefix set
    // disagree with the rows actually written (runUpsert pins for the
    // same reason)
    val (aligned0, _) = alignDelta(name, delta, allowWiden = false)
    // the partitioned writer stores an EMPTY string partition value in
    // the hive default partition, where it reads back as null —
    // normalize the delta up front so the path prefixes, the null-safe
    // partition probe, and the rows actually written all agree
    val partTypes = tableSchema(name).map(f => f.name -> f.dataType).toMap
    val emptyNormalized = parts.foldLeft(aligned0) { (d, pc) =>
      if (partTypes.get(pc).contains(org.apache.spark.sql.types.StringType))
        d.withColumn(pc, when(col(pc) === "", lit(null)).otherwise(col(pc)))
      else d
    }
    val aligned = emptyNormalized.localCheckpoint()
    // Delta-MERGE contract: at most one source row per key, keys non-null
    val badKeys = aligned
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1 || keys.map(k => col(k).isNull).reduce(_ || _))
      .limit(1).collect()
    require(badKeys.isEmpty,
      s"merge delta for $name has duplicate or null key rows " +
        s"(e.g. ${badKeys.headOption.getOrElse("")}); one source row per key required")
    // in-JVM writers serialize around the whole read-rewrite-commit:
    // the kept rows are derived from the same snapshot the kept-file
    // list is filtered from, so a concurrent append cannot land rows
    // into an affected partition between the two and be erased
    withCommitLock(name) {
      val target = read(name)
      val deltaKeys = aligned.select(keys.map(col): _*).distinct()
      val affectedParts = aligned.select(parts.map(col): _*)
        .unionByName(target.join(broadcast(deltaKeys), keys, "left_semi")
          .select(parts.map(col): _*))
        .distinct().collect()
      if (affectedParts.nonEmpty) {
        // hive-style partition dir prefixes of every affected partition —
        // including ones the rewrite may leave EMPTY (key moved away).
        // getPartitionPathString handles null/empty values the way the
        // writer's path rendering does (__HIVE_DEFAULT_PARTITION__).
        val prefixSet = affectedParts.map { row =>
          parts.indices.map { i =>
            val raw = row.get(i)
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .getPartitionPathString(parts(i),
                if (raw == null) null else String.valueOf(raw))
          }.mkString("", "/", "/")
        }.toSet
        // static frame from the already-collected rows (no lazy
        // re-derivation), joined null-safely so null partition values
        // select their partition too
        val fieldByName = tableSchema(name).map(f => f.name -> f).toMap
        val partsSchema = org.apache.spark.sql.types.StructType(
          parts.map(fieldByName)) // in parts order, matching the projection
        val affectedDf = spark.createDataFrame(
          java.util.Arrays.asList(affectedParts: _*), partsSchema)
        val keptRows = target
          .join(broadcast(affectedDf),
            parts.map(c => target(c) <=> affectedDf(c)).reduce(_ && _),
            "left_semi")                                // affected partitions only
          .join(broadcast(deltaKeys), keys, "left_anti") // minus matched keys
          .select(target.columns.map(col): _*)
        val merged = keptRows.unionByName(aligned.select(target.columns.map(col): _*))
        val files = stageWrite(name, clustered(name, merged, parts), parts)
        val keptFiles = currentManifest(name).map(_._2).getOrElse(Nil)
          .filterNot(f => prefixSet.contains(partitionPrefix(f)))
        commitManifest(name, keptFiles ++ files)
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
    * Path mode is snapshot-consistent: the rewrite lands as new data
    * files and one atomic manifest swap, so a concurrent reader sees
    * the pre-compaction snapshot or the post-compaction one, never a
    * partial listing (and readers pinned to the old manifest keep
    * working — superseded files survive until [[vacuum]]). Exclusive
    * WRITER access is still the contract: rows appended between the
    * snapshot read and the commit would be dropped by the replace.
    * Catalog mode rewrites through insertInto (the session catalog owns
    * that layout); it keeps the weaker exclusive-access contract. */
  def compact(name: String, filesPerPartition: Int = 1): Unit = {
    val parts = partitionColsOf(name)
    val n = math.max(filesPerPartition, 1)
    database match {
      case Some(db) =>
        val snapshot = read(name).localCheckpoint()
        val target = spark.table(s"$db.$name")
        val shaped =
          if (parts.nonEmpty) {
            // the dynamic-partition writer emits one file per (task,
            // partition value): repartitioning by the partition columns
            // alone → 1 file per partition; a row-hash splitter only
            // when more are wanted
            val byPart =
              if (n == 1) snapshot.repartition(parts.map(col): _*)
              else snapshot.repartition((parts.map(col) :+
                pmod(hash(snapshot.columns.map(col): _*), lit(n))): _*)
            byPart
          } else snapshot.coalesce(n)
        withDynamicOverwrite {
          clustered(name, shaped, parts).select(target.columns.map(col): _*)
            .write.mode("overwrite").format(format).insertInto(s"$db.$name")
        }
        analyze(db, name, columnStats = parts.isEmpty)
      case None => withCommitLock(name) {
        // the whole snapshot-rewrite-commit holds the table's commit
        // lock: the kept rows derive from the same manifest the replace
        // supersedes, so an in-JVM concurrent append can't land between
        // the snapshot read and the commit and be erased. The manifest
        // pins the snapshot's exact file list and nothing below deletes
        // data files — the lazy read is safe to rewrite from.
        val snapshot = read(name)
        val shaped =
          if (parts.nonEmpty) {
            if (n == 1) snapshot.repartition(parts.map(col): _*)
            else snapshot.repartition((parts.map(col) :+
              pmod(hash(snapshot.columns.map(col): _*), lit(n))): _*)
          } else snapshot.coalesce(n)
        // clustering is table layout: compaction must re-establish it
        val files = stageWrite(name, clustered(name, shaped, parts), parts)
        // full replace: the snapshot covers the table
        commitManifest(name, files)
      }
    }
  }

  /** Reclaims data files no longer referenced by the CURRENT manifest
    * (superseded by save/overwritePartitions/compact) plus superseded
    * manifest versions. Caller contract: run only after in-flight
    * readers of older snapshots have drained — the retention window is
    * the caller's policy, exactly as in production table formats. */
  def vacuum(name: String): Unit = {
    require(database.isEmpty, "vacuum applies to path-mode tables only")
    val fs = metaFs
    currentManifest(name).foreach { case (v, files) =>
      val keep = files.toSet
      val root = qualifiedPath(s"$basePath/$name")
      // a zero-file snapshot never created the data dir: nothing to scan
      if (fs.exists(root)) {
        val doomed = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val f = it.next().getPath
          val rel = relativeTo(root, f)
          if (!keep.contains(rel) && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")) doomed += f
        }
        doomed.foreach(fs.delete(_, false))
        // empty partition directories left behind by the deletes
        fs.listStatus(root).filter(_.isDirectory).foreach { d =>
          if (!fs.listFiles(d.getPath, true).hasNext) fs.delete(d.getPath, true)
        }
      }
      fs.listStatus(txnDir(name)).foreach { st =>
        st.getPath.getName match {
          case ManifestName(ver) if ver.toLong < v => fs.delete(st.getPath, false)
          case _ => ()
        }
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
  private val schemas = scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  private def read(name: String): DataFrame = database match {
    case Some(db) => spark.table(s"$db.$name")
    case None =>
      currentManifestFull(name) match {
        case Some((_, files, meta)) =>
          // the committed schema wins — it versioned atomically with
          // the data (cache/side meta are bootstrap fallbacks)
          val sc = metaSchema(meta).getOrElse(schemas.getOrElseUpdate(name,
            loadMeta(name)._2.getOrElse(org.apache.spark.sql.types.StructType(Nil))))
          fromFiles(name, files, sc)
        case None => // pre-manifest store layout (or foreign directory)
          val sc = schemas.getOrElseUpdate(name,
            loadMeta(name)._2.getOrElse(org.apache.spark.sql.types.StructType(Nil)))
          val r = spark.read.format(format).option("header", "true")
          (if (sc.isEmpty) r else r.schema(sc)).load(s"$basePath/$name")
      }
  }

  /** Snapshot reader over an explicit committed file list, resolved at
    * DataFrame creation — concurrent commits can't change or truncate
    * what this reader sees. basePath keeps partition columns parsed
    * from the k=v directory segments. */
  private def fromFiles(name: String, files: Seq[String],
      sc: org.apache.spark.sql.types.StructType): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sc)
    else {
      val r = spark.read.format(format).option("header", "true")
      (if (sc.isEmpty) r else r.schema(sc))
        .option("basePath", s"$basePath/$name")
        .load(files.map(f => s"$basePath/$name/$f"): _*)
    }

  /** Committed versions of a path-mode table, ascending. */
  def tableVersions(name: String): Seq[Long] = {
    require(database.isEmpty, "tableVersions applies to path-mode tables only")
    val fs = metaFs
    val dir = txnDir(name)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(v) => Some(v.toLong)
      case _ => None
    }).sorted
  }

  /** Time travel: the table AS OF a committed version. Every commit is
    * an immutable file list, so any un-vacuumed version stays readable
    * — the audit/debug/reproducibility read a training-data pipeline
    * needs ("which snapshot did run X train on?"). */
  def tableAt(name: String, version: Long): DataFrame = {
    require(database.isEmpty, "tableAt applies to path-mode tables only")
    val fs = metaFs
    val p = new org.apache.hadoop.fs.Path(txnDir(name), s"v$version.manifest")
    require(fs.exists(p),
      s"$name has no committed version $version (vacuumed, or never existed); " +
        s"available: ${tableVersions(name).mkString(", ")}")
    val (files, vMeta) = readManifestFile(p)
    // read the OLD version with the schema it was committed under — a
    // later save() may have redefined column order or types
    fromFiles(name, files, metaSchema(vMeta).getOrElse(
      schemas.getOrElseUpdate(name,
        loadMeta(name)._2.getOrElse(org.apache.spark.sql.types.StructType(Nil)))))
  }

  /** Rolls a table back to an earlier committed version by publishing
    * that version's file list (and the schema it was committed under)
    * as a NEW version — history stays linear and append-only, later
    * un-vacuumed snapshots remain readable, and operational metadata
    * (streaming high-water marks) carries forward rather than being
    * resurrected from the past. The undo button the time-travel read
    * implies. */
  def restore(name: String, version: Long): Unit = {
    require(database.isEmpty, "restore applies to path-mode tables only")
    val fs = metaFs
    val p = new org.apache.hadoop.fs.Path(txnDir(name), s"v$version.manifest")
    require(fs.exists(p),
      s"$name has no committed version $version to restore; " +
        s"available: ${tableVersions(name).mkString(", ")}")
    val (files, vMeta) = readManifestFile(p)
    require(vMeta.contains(SchemaMeta) && vMeta.contains(PartsMeta),
      s"restore: version $version of $name predates table-definition " +
        "metadata in the manifest — its layout cannot be rolled back safely")
    withCommitLock(name) {
      commitManifest(name, files, Seq(SchemaMeta, PartsMeta, ClusterMeta)
        .flatMap(k => vMeta.get(k).map(k -> _)).toMap)
    }
    // roll the in-memory + side-meta table DEFINITION back with the
    // data: a later append must lay files out the way this version did,
    // not the way the rolled-over head did
    val restoredSchema = metaSchema(vMeta)
    restoredSchema.foreach(schemas(name) = _)
    val restoredParts = vMeta.get(PartsMeta)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    restoredParts.foreach(partitioning(name) = _)
    val restoredCluster = vMeta.get(ClusterMeta)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    restoredCluster.foreach(clustering(name) = _)
    if (restoredSchema.isDefined && restoredParts.isDefined)
      writeMeta(name, restoredParts.get, restoredSchema.get,
        restoredCluster.getOrElse(Nil))
  }

  /** Exactly-once streaming micro-batch append (path mode). Structured
    * Streaming's foreachBatch is at-least-once: after a failure between
    * the sink write and the checkpoint advance, the same batchId is
    * REPLAYED. Committing the batch and its id in one atomic manifest
    * swap makes the replay detectable — batchIds are monotonically
    * increasing per query, so a single high-water mark per streamId in
    * the manifest metadata suffices, and because metadata rides every
    * subsequent commit, the guarantee survives compaction and upserts.
    * Only an exact replay of the LAST committed batch is skipped; a
    * batchId BELOW the mark means the stream checkpoint was reset or
    * two queries share a streamId — that is an error, not a silent
    * skip (silence there would discard all data forever). Returns true
    * iff the batch landed (false = duplicate replay). */
  def appendStreamBatch(name: String, df: DataFrame, batchId: Long,
      streamId: String = "stream"): Boolean = {
    require(database.isEmpty, "appendStreamBatch applies to path-mode tables only")
    val markKey = s"watermark.$streamId"
    val check = currentManifestFull(name).flatMap(_._3.get(markKey)).map(_.toLong)
    if (check.contains(batchId)) false // replay of the last committed batch
    else if (check.exists(batchId < _))
      throw new IllegalStateException(
        s"appendStreamBatch($name, streamId=$streamId): batchId $batchId is " +
          s"below the committed mark ${check.get} — stream checkpoint was " +
          "reset or two queries share this streamId; use a fresh streamId")
    else {
      val parts = partitionColsOf(name)
      val (aligned, _) = alignDelta(name, df, allowWiden = false)
      val files = stageWrite(name, clustered(name, aligned, parts), parts)
      withCommitLock(name) {
        // re-read under the lock: a concurrent writer may have committed
        val prev = currentManifestFull(name)
        val mark = prev.flatMap(_._3.get(markKey)).map(_.toLong)
        if (mark.exists(_ >= batchId)) false
        else {
          commitManifest(name, prev.map(_._2).getOrElse(Nil) ++ files,
            Map(markKey -> batchId.toString))
          true
        }
      }
    }
  }

  /** Drive a streaming DataFrame into a path-mode table with
    * exactly-once rows via [[appendStreamBatch]]. */
  def streamInto(name: String, stream: DataFrame, checkpoint: String,
      streamId: String = "stream"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        appendStreamBatch(name, batch, id, streamId); ()
      }
      .start()

  // ----- version-manifest commit log (path mode) --------------------
  //
  // The minimal transactional core of a table format: a table's current
  // snapshot is an immutable LIST OF FILES named by a manifest; writers
  // stage data files first (invisible — readers only see listed files),
  // then publish a new manifest version; the highest version wins.
  // Readers resolve the manifest once per DataFrame, so every query runs
  // against one consistent snapshot even while writers land new
  // versions, and compaction/upsert never present a partial directory.
  // Manifests live under _graft_meta (not the table dir) so the data
  // directories hold data only. Single-writer-per-table remains the
  // contract (the create-exclusive commit detects races rather than
  // resolving them — production formats add a log store/lock service).

  private val ManifestName = "v(\\d+)\\.manifest".r
  /** Manifest metadata keys: the committed schema (compact single-line
    * JSON — safe in the `#key:value` line format), the partition spec,
    * and the cluster spec — all versioned atomically with the data so
    * restore can roll the full table definition back. */
  private val SchemaMeta = "schema"
  private val PartsMeta = "parts"
  private val ClusterMeta = "cluster"
  /** Catalog-mode home of the cluster spec (table property). */
  private val ClusterProp = "graft.clusterBy"

  private def txnDir(name: String) =
    new org.apache.hadoop.fs.Path(s"$basePath/_graft_meta/txn/$name")

  private def qualifiedPath(p: String): org.apache.hadoop.fs.Path =
    metaFs.makeQualified(new org.apache.hadoop.fs.Path(p))

  /** Path of `f` relative to directory `root` (same FileSystem). */
  private def relativeTo(root: org.apache.hadoop.fs.Path,
      f: org.apache.hadoop.fs.Path): String = {
    val rootPath = root.toUri.getPath.stripSuffix("/") + "/"
    val fp = f.toUri.getPath
    require(fp.startsWith(rootPath), s"$f is not under $root")
    fp.substring(rootPath.length)
  }

  /** Manifest format: optional leading `#key:value` metadata lines
    * (carried forward commit-to-commit; e.g. streaming high-water
    * marks), then one data-file path per line. */
  private def parseManifest(content: String): (Seq[String], Map[String, String]) = {
    val lines = content.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    val (meta, files) = lines.partition(_.startsWith("#"))
    (files, meta.map { m =>
      val kv = m.drop(1).split(":", 2)
      kv(0) -> (if (kv.length > 1) kv(1) else "")
    }.toMap)
  }

  private def readManifestFile(p: org.apache.hadoop.fs.Path): (Seq[String], Map[String, String]) = {
    val in = metaFs.open(p)
    val content =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    parseManifest(content)
  }

  /** Latest committed (version, file list, metadata), if any. */
  private def currentManifestFull(name: String)
      : Option[(Long, Seq[String], Map[String, String])] = {
    val fs = metaFs
    val dir = txnDir(name)
    if (!fs.exists(dir)) None
    else {
      val versions = fs.listStatus(dir).toSeq.flatMap { st =>
        st.getPath.getName match {
          case ManifestName(v) => Some(v.toLong -> st.getPath)
          case _ => None
        }
      }
      if (versions.isEmpty) None
      else {
        val (v, p) = versions.maxBy(_._1)
        val (files, meta) = readManifestFile(p)
        Some((v, files, meta))
      }
    }
  }

  private def currentManifest(name: String): Option[(Long, Seq[String])] =
    currentManifestFull(name).map { case (v, files, _) => (v, files) }

  /** Atomic commit: write the full file list to a hidden temp file,
    * fsync/close, then rename to `v<N+1>.manifest`. Rename-no-overwrite
    * is the commit point — it either publishes the complete manifest or
    * fails (a concurrent committer of the same version loses the race
    * loudly instead of corrupting the log). */
  private def commitManifest(name: String, files: Seq[String],
      extraMeta: Map[String, String] = Map.empty): Unit = {
    val fs = metaFs
    val dir = txnDir(name)
    fs.mkdirs(dir)
    val prev = currentManifestFull(name)
    val version = prev.map(_._1).getOrElse(0L) + 1
    // metadata (streaming marks etc.) survives every commit — a
    // compaction must not forget which batches already landed
    val meta = prev.map(_._3).getOrElse(Map.empty) ++ extraMeta
    val body = (meta.toSeq.sorted.map { case (k, v) => s"#$k:$v" } ++ files)
      .mkString("\n")
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".v$version.manifest.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try {
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // durability before visibility; local checksum streams lack hsync
      try out.hsync()
      catch { case _: UnsupportedOperationException => out.flush() }
    } finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dir, s"v$version.manifest")
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit conflict on $name v$version: concurrent writer detected")
    }
  }

  /** Writes `df` to a staging directory, then moves the data files into
    * the table directory under transaction-unique names (a pure
    * same-filesystem rename per file). Staged/moved files are invisible
    * to readers until the manifest naming them is committed. Returns
    * the moved files' paths relative to the table dir (partition
    * directories included). */
  private def stageWrite(name: String, df: DataFrame,
      parts: Seq[String]): Seq[String] = {
    val fs = metaFs
    val txnId = java.util.UUID.randomUUID.toString.take(8)
    val stage = qualifiedPath(s"$basePath/_graft_stage/$name-$txnId")
    val w = df.write.mode("overwrite").format(format).option("header", "true")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).save(stage.toString)
    val tableRoot = qualifiedPath(s"$basePath/$name")
    val moved = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(stage, true)
    while (it.hasNext) {
      val f = it.next().getPath
      val base = f.getName
      if (!base.startsWith("_") && !base.startsWith(".")) {
        val rel = relativeTo(stage, f)
        val relDir = rel.stripSuffix(base).stripSuffix("/")
        val destRel = (if (relDir.isEmpty) "" else s"$relDir/") + s"$txnId-$base"
        val dest = new org.apache.hadoop.fs.Path(tableRoot, destRel)
        fs.mkdirs(dest.getParent)
        require(fs.rename(f, dest), s"stage move failed: $f -> $dest")
        moved += destRel
      }
    }
    fs.delete(stage, true)
    // drop the shared staging parent when this was its last transaction
    val stageParent = stage.getParent
    if (fs.exists(stageParent) && fs.listStatus(stageParent).isEmpty)
      fs.delete(stageParent, false)
    moved.toSeq
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

  private def writeMeta(name: String, parts: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      cluster: Seq[String] = Nil): Unit = {
    val fs = metaFs
    fs.mkdirs(metaDir)
    def put(file: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(metaDir, file), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    put(s"$name.partitions", parts.mkString("\n"))
    put(s"$name.schema.json", schema.json)
    put(s"$name.cluster", cluster.mkString("\n"))
  }

  private def loadMeta(name: String)
      : (Seq[String], Option[org.apache.spark.sql.types.StructType], Seq[String]) = {
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
    val cluster = get(s"$name.cluster")
      .map(_.split("\n").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    (parts, schema, cluster)
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
