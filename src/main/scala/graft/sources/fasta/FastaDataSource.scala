package graft.sources.fasta

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 FASTA provider — the engine-native form of the S3
  * scan (`spark.read.format("graft-fasta").load(path)`), replacing
  * the RDD reader for the scale path:
  *
  *  - **Byte-range splittable**: every file is planned as
  *    `splitBytes`-sized input partitions; a reader whose range
  *    starts mid-record aligns forward to the next `\n>` boundary
  *    (the LineRecordReader convention: a split owns the records that
  *    START inside it, split 0 also owns the first record). A 100 GB
  *    FASTA file therefore parallelizes across the cluster instead of
  *    pinning one task — the property the RDD `delimited` reader
  *    (one partition per textFile split of the *concatenated* record
  *    stream) cannot give for block records spanning split edges.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): a query
  *    touching only `id`/`length` never materializes the sequence
  *    string — record bytes are still scanned (lengths need them)
  *    but per-row allocation drops to the projected columns, and the
  *    plan's BatchScan advertises the pruned schema (plan-audited).
  *
  * Options: `path` (file, directory or glob), `splitBytes` (default
  * 128 MiB). Value-identical to [[graft.sources.BioSources.fasta]]
  * (FastaSourceSpec proves equality across adversarial split sizes).
  * Reference analog: bin/remove_block_fasta_format.pl (SURVEY S3).
  */
class FastaDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fasta"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FastaDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrives as a plain (case-sensitive) map here — wrap it
    // so .option("splitBytes", …) and .option("splitbytes", …) both land
    val opts = new CaseInsensitiveStringMap(properties)
    new FastaTable(opts.get("path"),
      Option(opts.get("splitbytes")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024))
  }
}

object FastaDataSource {
  val Schema: StructType = new StructType()
    .add("id", StringType).add("desc", StringType)
    .add("seq", StringType).add("length", LongType)
}

final class FastaTable(path: String, splitBytes: Long)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-fasta requires a path")
  override def name(): String = s"graft-fasta:$path"
  override def schema(): StructType = FastaDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FastaScanBuilder(path, splitBytes)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new FastaWriteBuilder(path, info.schema())
}

final class FastaScanBuilder(path: String, splitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FastaDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FastaScan(path, required, splitBytes)
}

final class FastaScan(path: String, required: StructType, splitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty).flatMap {
      st => if (st.isDirectory) fs.listStatus(st.getPath) else Array(st)
    }.filter(st => st.isFile && st.getLen > 0 &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    statuses.flatMap { st =>
      val len = st.getLen
      (0L until len by splitBytes).map { start =>
        FastaInputPartition(st.getPath.toString, start,
          math.min(splitBytes, len - start), len)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FastaReaderFactory(required.fieldNames)
}

final case class FastaInputPartition(file: String, start: Long, length: Long,
  fileLength: Long) extends InputPartition

final class FastaReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FastaPartitionReader(partition.asInstanceOf[FastaInputPartition], fields)
}

/** Streams one byte range of one FASTA file. Ownership rule: this
  * split emits every record whose '>' lies in [start, end). A
  * non-first split seeks to `start - 1` (NOT `start`) before scanning
  * for the "\n>" boundary — a record whose '>' falls exactly at
  * `start` is preceded by a '\n' at `start - 1`, which belongs to the
  * previous split's byte range; starting the scan one byte early is
  * the only way this split can see that newline and claim the record.
  * (The previous split stops at records with '>' < its end == start,
  * so without the back-off such a record is emitted by NO split.)
  * Records are accumulated as raw bytes and decoded once as UTF-8, so
  * multi-byte headers match BioSources.fasta's text reader exactly.
  * The reader buffers only ONE record — memory is O(longest record),
  * never O(split). */
final class FastaPartitionReader(part: FastaInputPartition,
    fields: Array[String]) extends PartitionReader[InternalRow] {

  private val conf = new Configuration() // local/default-FS contract; a
  // cluster deployment threads its serialized Hadoop conf here instead
  /** non-first splits back off one byte to catch a boundary-exact record */
  private val scanFrom = math.max(0L, part.start - 1)
  private val in = {
    val p = new Path(part.file)
    val stream = p.getFileSystem(conf).open(p)
    stream.seek(scanFrom)
    new java.io.BufferedInputStream(stream, 1 << 16)
  }
  private val end = part.start + part.length
  /** absolute offset of the NEXT byte `in` will deliver */
  private var pos = scanFrom
  private var eof = false
  private var row: InternalRow = _
  /** lookahead holding the '>' byte of the next record (consumed from
    * the stream but not yet part of a record) */
  private var pendingRecordStart = -1L

  // align: split 0 starts at the file head (must be '>'); later splits
  // scan to the first record boundary at or after start
  if (part.start == 0L) {
    val b = read()
    if (b == '>') pendingRecordStart = 0L
    else if (b >= 0) skipToNextBoundary() // junk prefix: tolerate
  } else skipToNextBoundary()

  private def read(): Int = {
    val b = in.read()
    if (b < 0) eof = true else pos += 1
    b
  }

  /** Scan forward for "\n>"; leaves pendingRecordStart at the '>' if
    * its offset is < end, else marks the split exhausted. */
  private def skipToNextBoundary(): Unit = {
    var prev = -1
    var b = read()
    while (b >= 0 && !(prev == '\n' && b == '>')) { prev = b; b = read() }
    if (b == '>' && pos - 1 < end) pendingRecordStart = pos - 1
    else eof = true
  }

  @annotation.tailrec
  override def next(): Boolean = {
    if (eof || pendingRecordStart < 0) return false
    // read one record: from the pending '>' to the next "\n>" or EOF —
    // raw bytes, decoded once as UTF-8 (per-byte toChar would be Latin-1
    // and mangle multi-byte headers)
    val buf = new java.io.ByteArrayOutputStream(256)
    var prev = -1
    var b = read()
    var nextStart = -1L
    while (b >= 0 && !(prev == '\n' && b == '>')) {
      buf.write(b); prev = b; b = read()
    }
    if (b == '>') nextStart = pos - 1
    val rec = new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    pendingRecordStart = if (nextStart >= 0 && nextStart < end) nextStart else -1L
    if (pendingRecordStart < 0) eof = true
    if (rec.trim.isEmpty) next() // degenerate empty record: skip
    else {
      val lines = rec.split("\n", -1)
      val header = lines.head.trim
      val id = header.takeWhile(!_.isWhitespace)
      // per-line trim then join — byte-equal to BioSources.fasta
      val seq = lines.tail.map(_.trim).mkString("")
      val vals = fields.map {
        case "id"     => UTF8String.fromString(id)
        case "desc"   => UTF8String.fromString(header)
        case "seq"    => UTF8String.fromString(seq)
        case "length" => java.lang.Long.valueOf(seq.length.toLong)
      }
      row = InternalRow.fromSeq(vals.toIndexedSeq)
      true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
