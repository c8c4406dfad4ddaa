package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-driven file skipping on the AUTOMATIC read path — the
  * mechanism production table formats use (a custom [[FileIndex]]
  * whose `listFiles` consults table-format metadata): Spark's
  * FileSourceStrategy hands every scan's pushed-down data filters to
  * the index BEFORE any file is opened, so a `WHERE k = 42` over a
  * clustered/bloom-indexed table reads only the files whose committed
  * stats admit 42 — no explicit `scan()` call, no hint. The reference
  * analogue is its covering indexes (`Olist DW.sql:190-207`): a
  * predicate lane that avoids touching most of the table.
  *
  * Soundness is inherited, not re-proven per query: the admission
  * callback only ever DROPS files that provably contain no matching
  * rows (stats straddle / bloom miss), and Spark re-applies the full
  * residual predicate to every row scanned, so an over-admitted file
  * costs I/O, never correctness. At 100 TB this is the difference
  * between touching 1/Nth of the footers and all of them.
  *
  * Extends [[InMemoryFileIndex]] (listing, partition inference, and
  * size bookkeeping unchanged — partition-directory pruning still
  * happens in `super.listFiles`) and filters the surviving leaves
  * through the warehouse's per-file stats.
  */
class PruningFileIndex(
    session: SparkSession,
    leafPaths: Seq[Path],
    options: Map[String, String],
    fullSchema: StructType,
    prune: (Seq[(String, Option[Any], Option[Any])], Seq[(String, Seq[Any])],
        Seq[(String, Boolean)])
      => (String => Boolean))
  extends InMemoryFileIndex(
    PruningFileIndex.classic(session), leafPaths, options, Some(fullSchema)) {

  /** (files kept, files total) of the most recent listing — the
    * observability hook the auto-skipping specs assert on. */
  @volatile var lastListing: Option[(Int, Int)] = None

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val total = base.iterator.map(_.files.size).sum
    val ranges = PruningFileIndex.impliedRanges(dataFilters)
    val inSets = PruningFileIndex.impliedInSets(dataFilters)
    val nulls = PruningFileIndex.impliedNullness(dataFilters)
    if (ranges.isEmpty && inSets.isEmpty && nulls.isEmpty) {
      lastListing = Some((total, total)); base
    } else {
      val admit = prune(ranges, inSets, nulls)
      val pruned = base.map { pd =>
        PartitionDirectory(pd.values,
          pd.files.filter(f => admit(f.getPath.toUri.getPath)))
      }.filter(_.files.nonEmpty)
      lastListing = Some((pruned.iterator.map(_.files.size).sum, total))
      pruned
    }
  }
}

object PruningFileIndex {

  private[graft] def classic(s: SparkSession) =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Range constraints provably implied by ANALYZED filter
    * expressions, as (column, lower, upper) with EXTERNAL Scala values
    * (what the warehouse's stat comparator consumes). Unlike the
    * unresolved-Column walker (`GraftColumnShim.impliedRanges`), type
    * exactness is structural here: after analysis Spark has already
    * placed any coercion cast, so a bound is emitted only when the
    * comparison is literally `attribute <op> literal` of the SAME type
    * — a cast wrapped around the column (`CAST(k AS STRING) = '42'`)
    * matches nothing and the file list stays complete, the safe
    * direction. A cast around the LITERAL has been constant-folded
    * into a typed literal by optimization time, making its bound
    * sound by construction. */
  def impliedRanges(filters: Seq[Expression])
      : Seq[(String, Option[Any], Option[Any])] = {
    def ext(l: Literal): Option[Any] =
      Option(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    def same(a: Attribute, l: Literal): Boolean = l.dataType.sameType(a.dataType)
    def rng(a: Attribute, l: Literal, lo: Boolean, hi: Boolean) =
      if (!same(a, l)) Nil
      else ext(l).map(v =>
        (a.name, if (lo) Some(v) else None, if (hi) Some(v) else None)).toSeq
    def walk(e: Expression): Seq[(String, Option[Any], Option[Any])] = e match {
      case And(x, y) => walk(x) ++ walk(y)
      case EqualTo(a: Attribute, l: Literal) => rng(a, l, lo = true, hi = true)
      case EqualTo(l: Literal, a: Attribute) => rng(a, l, lo = true, hi = true)
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null =>
        rng(a, l, lo = true, hi = true)
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null =>
        rng(a, l, lo = true, hi = true)
      case GreaterThan(a: Attribute, l: Literal) => rng(a, l, lo = true, hi = false)
      case GreaterThanOrEqual(a: Attribute, l: Literal) => rng(a, l, lo = true, hi = false)
      case LessThan(a: Attribute, l: Literal) => rng(a, l, lo = false, hi = true)
      case LessThanOrEqual(a: Attribute, l: Literal) => rng(a, l, lo = false, hi = true)
      // flipped operand order mirrors the comparison
      case GreaterThan(l: Literal, a: Attribute) => rng(a, l, lo = false, hi = true)
      case GreaterThanOrEqual(l: Literal, a: Attribute) => rng(a, l, lo = false, hi = true)
      case LessThan(l: Literal, a: Attribute) => rng(a, l, lo = true, hi = false)
      case LessThanOrEqual(l: Literal, a: Attribute) => rng(a, l, lo = true, hi = false)
      // LIKE 'p%' (the optimizer rewrites it to StartsWith): every
      // match lies in [p, p.init ++ (last+1)) — the prefix-successor
      // range Delta/Iceberg prune on. The successor bound is emitted
      // only when the last char is a plain BMP character below the
      // surrogate block: there +1 is monotone in UTF-16, UTF-8 byte,
      // AND code-point order alike, so the bound holds under whichever
      // order produced the stats. Inclusive upper is looser than the
      // true strict bound — sound. An empty prefix matches everything
      // (no range); an un-incrementable last char keeps only the
      // lower bound.
      case StartsWith(a: Attribute, l: Literal)
          if a.dataType == org.apache.spark.sql.types.StringType &&
            l.value != null =>
        val p = l.value.toString
        if (p.isEmpty) Nil
        else {
          val last = p.charAt(p.length - 1)
          val hi = if (last >= 0xD7FF.toChar) None
            else Some(p.substring(0, p.length - 1) + (last + 1).toChar)
          Seq((a.name, Some(p), hi))
        }
      case _ => Nil
    }
    filters.flatMap(walk)
  }

  /** Point-value SET constraints implied by analyzed filters — the
    * second-most-common point-predicate shape after equality:
    * `k IN (3, 7)`, its optimized `InSet` form (Spark converts IN to
    * InSet above `spark.sql.optimizer.inSetConversionThreshold`), and
    * an OR-of-equalities over ONE attribute. Semantics differ from
    * [[impliedRanges]]: a file is admitted when ANY value's
    * stats/bloom test admits it (union per value), and each returned
    * (column, values) pair is one conjunct of the overall filter.
    * Type exactness is structural, as for ranges: every element must
    * be a literal of the attribute's own type, or the conjunct emits
    * nothing (the safe, read-everything direction). NULL elements are
    * dropped — `k IN (3, NULL)` is only ever TRUE via 3. Sets larger
    * than `maxValues` emit nothing (bounds the per-file admission
    * work; a 10k-element IN should scan, not run 10k bloom probes per
    * file). */
  def impliedInSets(filters: Seq[Expression],
      maxValues: Int = 64): Seq[(String, Seq[Any])] = {
    def ext(v: Any, a: Attribute): Option[Any] =
      Option(CatalystTypeConverters.convertToScala(v, a.dataType))
    // OR tree → (single attribute, values); None when any branch is
    // not an equality on that same attribute
    def eqValues(e: Expression): Option[(Attribute, Seq[Any])] = e match {
      case Or(x, y) =>
        for {
          (ax, vx) <- eqValues(x)
          (ay, vy) <- eqValues(y)
          if ax.semanticEquals(ay)
        } yield (ax, vx ++ vy)
      case EqualTo(a: Attribute, l: Literal)
        if l.dataType.sameType(a.dataType) => Some((a, Seq(l.value)))
      case EqualTo(l: Literal, a: Attribute)
        if l.dataType.sameType(a.dataType) => Some((a, Seq(l.value)))
      case EqualNullSafe(a: Attribute, l: Literal)
        if l.value != null && l.dataType.sameType(a.dataType) =>
        Some((a, Seq(l.value)))
      case EqualNullSafe(l: Literal, a: Attribute)
        if l.value != null && l.dataType.sameType(a.dataType) =>
        Some((a, Seq(l.value)))
      case _ => None
    }
    def walk(e: Expression): Seq[(String, Seq[Any])] = e match {
      case And(x, y) => walk(x) ++ walk(y)
      case In(a: Attribute, list)
        if list.nonEmpty && list.forall {
          case l: Literal => l.dataType.sameType(a.dataType)
          case _ => false
        } =>
        val vs = list.collect { case l: Literal if l.value != null =>
          ext(l.value, a) }.flatten
        if (vs.isEmpty || vs.size > maxValues) Nil else Seq((a.name, vs))
      case InSet(a: Attribute, hset) =>
        val vs = hset.iterator.filter(_ != null).flatMap(ext(_, a)).toSeq
        if (vs.isEmpty || vs.size > maxValues) Nil else Seq((a.name, vs))
      case o: Or =>
        eqValues(o).toSeq.flatMap { case (a, raw) =>
          val vs = raw.filter(_ != null).flatMap(ext(_, a))
          if (vs.isEmpty || vs.size > maxValues) Nil else Seq((a.name, vs))
        }
      case _ => Nil
    }
    filters.flatMap(walk)
  }

  /** Nullness constraints implied by analyzed filters — (column,
    * wantNull) top-level conjuncts: `c IS NULL` admits only files with
    * at least one null in c, `c IS NOT NULL` only files with at least
    * one non-null. The latter fires far beyond explicit user SQL: the
    * analyzer adds `isnotnull(c)` under every null-intolerant
    * predicate on c, so any comparison filter auto-skips files that
    * are ALL null in that column (sparse/late-added columns). The
    * per-file test consumes the manifest's "__nn_" non-null counts;
    * files without them are always admitted. */
  def impliedNullness(filters: Seq[Expression]): Seq[(String, Boolean)] = {
    def walk(e: Expression): Seq[(String, Boolean)] = e match {
      case And(x, y) => walk(x) ++ walk(y)
      case IsNull(a: Attribute) => Seq((a.name, true))
      case IsNotNull(a: Attribute) => Seq((a.name, false))
      case EqualNullSafe(a: Attribute, l: Literal) if l.value == null =>
        Seq((a.name, true))
      case EqualNullSafe(l: Literal, a: Attribute) if l.value == null =>
        Seq((a.name, true))
      case _ => Nil
    }
    filters.flatMap(walk)
  }

  /** A DataFrame over `index` — the relation Spark's own file sources
    * produce, just with the pruning index in the FileIndex slot. Keeps
    * parquet predicate pushdown, column pruning, partition pruning,
    * and whole-stage codegen on the standard FileSourceScanExec path.
    * `catalogStats` (sizeInBytes, rowCount), when present, surfaces
    * manifest-derived statistics to the cost-based optimizer;
    * `colNdv` adds per-column distinct counts (manifest HLL unions) —
    * the input join reordering and join-cardinality estimation need. */
  def relation(session: SparkSession, index: PruningFileIndex,
      fullSchema: StructType, format: String, options: Map[String, String],
      tableName: String,
      catalogStats: Option[(BigInt, Option[BigInt])] = None,
      colNdv: Map[String, BigInt] = Map.empty): DataFrame = {
    val cs = classic(session)
    // files may legitimately lack declared columns (schema widening:
    // old files read NULL) — DataSource.resolveRelation reads under
    // schema.asNullable for exactly this reason; a non-nullable field
    // here would let the optimizer fold `col IS NULL` to false
    val pSchema = index.partitionSchema.asNullable
    val dSchema = StructType(
      fullSchema.filterNot(f => pSchema.fieldNames.contains(f.name))).asNullable
    val fmt: FileFormat = format match {
      case "parquet" => new parquet.ParquetFileFormat
      case "orc" => new orc.OrcFileFormat
      case "json" =>
        org.apache.spark.sql.execution.datasources.json.JsonFileFormat()
      case "csv" =>
        org.apache.spark.sql.execution.datasources.csv.CSVFileFormat()
      case other => throw new IllegalArgumentException(
        s"unsupported pruning-read format: $other")
    }
    val rel = HadoopFsRelation(index, pSchema, dSchema, None, fmt, options)(cs)
    val lr = catalogStats match {
      case Some((bytes, rows)) =>
        import org.apache.spark.sql.catalyst.TableIdentifier
        import org.apache.spark.sql.catalyst.catalog._
        val cstats = colNdv.collect {
          case (c, ndv) if fullSchema.fieldNames.contains(c) =>
            c -> CatalogColumnStat(distinctCount = Some(ndv))
        }
        val ct = CatalogTable(
          identifier = TableIdentifier(tableName),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = fullSchema,
          provider = Some(format),
          stats = Some(CatalogStatistics(bytes, rows, cstats)))
        LogicalRelation(rel, ct)
      case None => LogicalRelation(rel, isStreaming = false)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(cs, lr)
  }
}
