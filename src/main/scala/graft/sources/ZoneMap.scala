package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** FILE-level zone maps (data skipping) over a parquet directory —
  * the Delta/Iceberg "stats in the table log" idea as a sidecar next
  * to plain parquet (beyond-reference; the reference re-reads whole
  * TSV dumps per Makefile stage).
  *
  * Spark's parquet reader already skips ROW GROUPS via pushed
  * filters, but it must still LIST and OPEN every file to do so —
  * at 100 TB the file-open round trips dominate a selective scan.
  * [[harvest]] reads each file's FOOTER ONLY (no data pages) into a
  * one-row-per-file min/max sidecar, distributed over the executors;
  * [[scanRange]] then selects surviving file PATHS at planning time,
  * so pruned files are never opened — and the surviving files still
  * get Spark's row-group skipping on top, because the exact filter
  * is re-applied. Pair with [[Tabular.writeClusteredParquet]]: the
  * z-order layout is what makes per-file ranges disjoint and the
  * zone map selective on every clustered dimension at once.
  *
  * v1 scope: INT32/INT64 physical columns (ids, counts, scaled
  * numerics, epoch times — cast at write time like the z-key does).
  * A column with unusable stats in ANY row group marks the file
  * un-prunable for that column (kept conservatively); all-null
  * blocks are safe to skip because a range predicate excludes NULL.
  */
object ZoneMap {

  private def sidecar(path: String) = s"$path/_zonemap"

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(spark: SparkSession, path: String): Seq[String] =
    fs(spark, path).listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(p => p.getName.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted

  /** Per-file (ok, min, max) for one column, merged across row
    * groups from the footer. ok=false → stats unusable, never prune.
    * ok=true with null min/max → every value is NULL → a range
    * predicate may prune the file. */
  private def colStats(
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
      c: String): (Boolean, Option[Long], Option[Long]) = {
    def asLong(v: Any): Option[Long] = v match {
      case n: java.lang.Integer => Some(n.longValue)
      case n: java.lang.Long    => Some(n.longValue)
      case _                    => None
    }
    var ok = true
    var mn: Option[Long] = None
    var mx: Option[Long] = None
    blocks.foreach { b =>
      b.getColumns.asScala.find(_.getPath.toDotString == c) match {
        case None => ok = false // column absent from this file
        case Some(cc) =>
          val s = cc.getStatistics
          if (s == null || s.isEmpty) ok = false
          else if (s.hasNonNullValue) {
            (asLong(s.genericGetMin), asLong(s.genericGetMax)) match {
              case (Some(lo), Some(hi)) =>
                mn = Some(mn.fold(lo)(math.min(_, lo)))
                mx = Some(mx.fold(hi)(math.max(_, hi)))
              case _ => ok = false // non-integral physical type
            }
          } else if (s.getNumNulls != b.getRowCount) ok = false
        // else: an all-null block contributes nothing and is safe
      }
    }
    if (ok) (true, mn, mx) else (false, None, None)
  }

  /** Harvest per-file zone maps for `cols` from parquet FOOTERS only
    * — one footer read per file, parallelized over the executors
    * (each task reconstructs the filesystem from the executor's own
    * Hadoop configuration; no data pages are touched). Returns one
    * row per file: `file, n_rows, <c>_ok, <c>_min, <c>_max, …`. */
  def harvest(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val files = dataFiles(spark, path)
    require(files.nonEmpty, s"no parquet files under $path")
    val schema = StructType(
      StructField("file", StringType, nullable = false) ::
        StructField("n_rows", LongType, nullable = false) ::
        cols.toList.flatMap(c => Seq(
          StructField(s"${c}_ok", BooleanType, nullable = false),
          StructField(s"${c}_min", LongType, nullable = true),
          StructField(s"${c}_max", LongType, nullable = true))))
    val colsB = cols.toIndexedSeq
    val n = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(files, n).map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val conf = new org.apache.hadoop.conf.Configuration()
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val per = colsB.flatMap { c =>
          val (ok, mn, mx) = colStats(blocks, c)
          Seq[Any](ok, mn.map(Long.box).orNull, mx.map(Long.box).orNull)
        }
        Row.fromSeq(hp.getName +: blocks.map(_.getRowCount).sum +: per)
      } finally r.close()
    }
    spark.createDataFrame(rows, schema)
  }

  /** Harvest and persist the sidecar at `path/_zonemap` (the `_`
    * prefix hides it from every scan of `path`). Call once after the
    * layout write; re-call after rewriting files. */
  def write(spark: SparkSession, path: String, cols: Seq[String]): Unit =
    harvest(spark, path, cols).coalesce(1)
      .write.mode("overwrite").parquet(sidecar(path))

  /** The file paths a `lo <= c <= hi` scan must open: files whose
    * zone proves emptiness are dropped; files with unusable stats
    * are kept conservatively. Bounded by the file count (the same
    * driver-side listing any parquet scan performs). */
  private[graft] def keptFiles(spark: SparkSession, path: String,
      c: String, lo: Long, hi: Long): (Seq[String], Int) = {
    val zm = spark.read.parquet(sidecar(path))
    require(zm.columns.contains(s"${c}_ok"),
      s"no zone map for column $c under ${sidecar(path)} — " +
        s"harvested: ${zm.columns.filter(_.endsWith("_ok")).map(_.dropRight(3)).mkString(", ")}")
    val kept = zm.where(!col(s"${c}_ok") ||
        (col(s"${c}_min").isNotNull &&
          col(s"${c}_min") <= hi && col(s"${c}_max") >= lo))
      .select("file").collect().map(r => s"$path/${r.getString(0)}").toSeq
    (kept.sorted, zm.count().toInt)
  }

  /** Range scan through the zone map: open ONLY files whose zone
    * intersects `[lo, hi]`, then re-apply the exact predicate (zone
    * maps prove absence, never presence — survivors still filter,
    * and parquet row-group skipping applies within them). */
  def scanRange(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long): DataFrame = {
    val (kept, _) = keptFiles(spark, path, c, lo, hi)
    if (kept.isEmpty) spark.read.parquet(path).where(lit(false))
    else spark.read.parquet(kept: _*).where(col(c).between(lo, hi))
  }

  /** Full-scan reference form — law twin (ZoneMapSpec). */
  private[graft] def scanRangeBrute(spark: SparkSession, path: String,
      c: String, lo: Long, hi: Long): DataFrame =
    spark.read.parquet(path).where(col(c).between(lo, hi))

  /** DECLARATIVE zone-map table: a DataFrame whose scan consults the
    * sidecar for EVERY predicate Catalyst pushes down — `table(...)
    * .where(...)` prunes files at planning time with no special API,
    * SQL views included. This is the extension point file-skipping
    * table formats use: a custom [[org.apache.spark.sql.execution
    * .datasources.FileIndex]] receives the pushed data filters in
    * `listFiles` and returns only surviving files; the normal parquet
    * scan (row-group skipping, column pruning, whole-stage codegen)
    * runs unchanged on top. Pruning is sound by construction — the
    * scan re-applies the exact filters, so dropping a file only ever
    * removes rows the predicate provably excludes. */
  def table(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val idx = new ZoneMapFileIndex(spark, path)
    val dataSchema = spark.read.parquet(path).schema
    val rel = HadoopFsRelation(idx, new StructType(), dataSchema, None,
      new ParquetFileFormat, Map("path" -> path))(spark)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(
      spark, LogicalRelation(rel, isStreaming = false))
  }
}

/** [[graft.sources.ZoneMap.table]]'s scan-time pruner: one zone row
  * per file, checked against the data filters Spark's planner hands
  * to `listFiles`. Only provably-sound prunings fire — conjuncts it
  * can't interpret are ignored and the file kept. Supported shapes
  * per stats column (bare attribute vs int/long literal, both
  * orientations): `=  <  <=  >  >=  BETWEEN  IS NOT NULL` — the
  * not-null case prunes all-null files, and the planner plants
  * `IsNotNull` beside every comparison, so it fires on every
  * filtered scan. */
class ZoneMapFileIndex(spark: SparkSession, path: String)
    extends org.apache.spark.sql.execution.datasources.FileIndex {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.execution.datasources.PartitionDirectory

  /** (ok, min, max) per harvested column, per file name. */
  private val zones: Map[String, Map[String, (Boolean, Option[Long], Option[Long])]] = {
    val zm = spark.read.parquet(s"$path/_zonemap")
    val cols = zm.columns.filter(_.endsWith("_ok")).map(_.dropRight(3)).toSeq
    zm.collect().map { r =>
      r.getString(r.fieldIndex("file")) -> cols.map { c =>
        def optLong(f: String): Option[Long] = {
          val i = r.fieldIndex(f)
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        }
        c -> ((r.getBoolean(r.fieldIndex(s"${c}_ok")),
          optLong(s"${c}_min"), optLong(s"${c}_max")))
      }.toMap
    }.toMap
  }

  private val statuses: Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).toSeq
      .sortBy(_.getPath.getName)
  }

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
    Seq(new org.apache.hadoop.fs.Path(path))
  override def partitionSchema: StructType = new StructType()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def inputFiles: Array[String] =
    statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = () // layout immutable once harvested

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // per-column conjunctive interval + not-null demand from the
    // pushed filters; unrecognized conjuncts are simply not used
    var lo = Map.empty[String, Long]
    var hi = Map.empty[String, Long]
    var notNull = Set.empty[String]
    def tightenLo(c: String, v: Long): Unit =
      lo += c -> math.max(v, lo.getOrElse(c, Long.MinValue))
    def tightenHi(c: String, v: Long): Unit =
      hi += c -> math.min(v, hi.getOrElse(c, Long.MaxValue))
    object Lit {
      def unapply(e: Expression): Option[Long] = e match {
        case Literal(v: Int, _)  => Some(v.toLong)
        case Literal(v: Long, _) => Some(v)
        case _ => None
      }
    }
    dataFilters.foreach {
      case EqualTo(a: AttributeReference, Lit(v)) =>
        tightenLo(a.name, v); tightenHi(a.name, v)
      case EqualTo(Lit(v), a: AttributeReference) =>
        tightenLo(a.name, v); tightenHi(a.name, v)
      case GreaterThanOrEqual(a: AttributeReference, Lit(v)) => tightenLo(a.name, v)
      case GreaterThan(a: AttributeReference, Lit(v))        => tightenLo(a.name, v + 1)
      case LessThanOrEqual(a: AttributeReference, Lit(v))    => tightenHi(a.name, v)
      case LessThan(a: AttributeReference, Lit(v))           => tightenHi(a.name, v - 1)
      case GreaterThanOrEqual(Lit(v), a: AttributeReference) => tightenHi(a.name, v)
      case GreaterThan(Lit(v), a: AttributeReference)        => tightenHi(a.name, v - 1)
      case LessThanOrEqual(Lit(v), a: AttributeReference)    => tightenLo(a.name, v)
      case LessThan(Lit(v), a: AttributeReference)           => tightenLo(a.name, v + 1)
      case IsNotNull(a: AttributeReference) => notNull += a.name
      case _ => ()
    }
    val kept = statuses.filter { st =>
      zones.get(st.getPath.getName).forall { z =>
        z.forall { case (c, (ok, mn, mx)) =>
          if (!ok) true // unusable stats: keep conservatively
          else {
            val nullOk = !notNull.contains(c) || mn.nonEmpty
            val rangeDemanded = lo.contains(c) || hi.contains(c)
            val rangeOk = !rangeDemanded || (mn.nonEmpty &&
              mn.get <= hi.getOrElse(c, Long.MaxValue) &&
              mx.get >= lo.getOrElse(c, Long.MinValue))
            nullOk && rangeOk
          }
        }
      }
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}
