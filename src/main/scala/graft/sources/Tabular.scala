package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Tabular sources/sinks (SURVEY §2.1 S1/S2/S11/S12) with declared
  * schemas — schema-on-read TSV/CSV like the reference's read.delim,
  * but the schema travels with the reader call instead of being
  * inferred per file (inference is a full extra pass at 100 TB).
  */
object Tabular {

  /** S1 — TSV scan with declared schema (header optional). */
  def tsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read.option("sep", "\t").option("header", header.toString)
      .schema(schema).csv(path)

  /** S2 — CSV scan with declared schema. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read.option("sep", ",").option("header", header.toString)
      .schema(schema).csv(path)

  /** S11 — TSV sink (reference write.table(quote=F, sep="\t")). */
  def writeTsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("sep", "\t")
      .option("header", header.toString).csv(path)

  /** S12 — parquet checkpoint sink/source (replaces .Rdata blobs). */
  def checkpoint(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Z-order-clustered parquet sink (beyond-reference, the write-side
    * layout op behind q139's key): range-partition on the Morton key
    * so each output task owns a contiguous z-range, sort within, and
    * cap file size. Result: every FILE covers a disjoint key range on
    * every clustered dimension at once, so parquet min-max stats turn
    * point/range predicates on ANY dim into file/row-group skips —
    * the read-amplification lever for a 100 TB corpus (the writer
    * pays one range exchange + local sort; reads prune forever).
    * The z-key is a sort expression only — the written schema is
    * unchanged. */
  def writeClusteredParquet(df: DataFrame, path: String, zDims: Seq[String],
      bits: Int = 21, nFiles: Int = 0, maxRecordsPerFile: Long = 0L): Unit = {
    import org.apache.spark.sql.functions.col
    val zkey = graft.functions.ZOrderKey(bits, zDims.map(c => col(c).cast("long")): _*)
    val parts = if (nFiles > 0) nFiles
      else df.sparkSession.sparkContext.defaultParallelism
    val w = df.repartitionByRange(parts, zkey).sortWithinPartitions(zkey)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w).parquet(path)
  }

  /** JSONL scan with declared schema (beyond-reference: the de-facto
    * training-data interchange format). Schema declared, not
    * inferred — inference is a full extra pass at corpus scale. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL sink — one JSON object per line, splittable downstream. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC checkpoint sink/source (beyond-reference: the second
    * columnar interchange format a lakehouse ingests; same
    * predicate-pushdown + column-pruning contract as parquet via the
    * vectorized ORC reader). */
  def checkpointOrc(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.orc(path)
  }

  /** Hive-style partitioned parquet sink: one directory per partition
    * value, so a filter on the partition column prunes whole
    * directories at PLANNING time (PartitionFilters in the scan —
    * cheaper than any row-group statistic). THE layout primitive for
    * a date/source-partitioned 100 TB corpus; pair with
    * [[writeClusteredParquet]]'s z-order INSIDE partitions for
    * two-level skipping. */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
}
