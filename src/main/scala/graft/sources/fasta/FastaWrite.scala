package graft.sources.fasta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** The write half of the DSv2 FASTA provider —
  * `df.write.format("graft-fasta").mode(...).save(path)`.
  *
  * Protocol: each task streams its partition into a hidden
  * `.inprogress` file and RENAMES it to its final part name on task
  * commit (atomic on HDFS/local — a failed/zombie task never leaves a
  * visible partial file); job commit is a no-op, job abort deletes
  * the committed parts it knows about. `mode("overwrite")` arrives as
  * WriteBuilder.truncate(), which clears the directory up front.
  *
  * Record form: `>{desc}\n{seq wrapped at 60 cols}` — the exact shape
  * the read path consumes, so read(write(df)) round-trips
  * bit-for-bit (FastaSourceSpec). Input columns by name: `desc`
  * (header; falls back to `id`) and `seq`. */
final class FastaWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      if (doTruncate) {
        val p = new Path(path)
        val fs = p.getFileSystem(new Configuration())
        if (fs.exists(p)) fs.delete(p, true)
      }
      new FastaBatchWrite(path, schema)
    }
  }
}

final case class FastaCommit(file: String) extends WriterCommitMessage

final class FastaBatchWrite(path: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FastaWriterFactory(path, schema.fieldNames)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.collect { case FastaCommit(f) => fs.delete(new Path(f), false) }
  }
}

final class FastaWriterFactory(path: String, fields: Array[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FastaWriter(path, fields, partitionId, taskId)
}

final class FastaWriter(dir: String, fields: Array[String], partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val conf = new Configuration()
  private val fs = new Path(dir).getFileSystem(conf)
  private val tmp = new Path(dir, s".part-$partitionId-$taskId.fasta.inprogress")
  private val fin = new Path(dir, f"part-$partitionId%05d.fasta")
  private val out = {
    fs.mkdirs(new Path(dir))
    new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
  }
  private val iDesc = fields.indexOf("desc")
  private val iId = fields.indexOf("id")
  private val iSeq = fields.indexOf("seq")
  require(iSeq >= 0 && (iDesc >= 0 || iId >= 0),
    s"graft-fasta write needs `seq` and `desc` (or `id`) columns, got ${fields.mkString(",")}")

  override def write(row: InternalRow): Unit = {
    val header =
      if (iDesc >= 0 && !row.isNullAt(iDesc)) row.getUTF8String(iDesc).toString
      else if (iId >= 0 && !row.isNullAt(iId)) row.getUTF8String(iId).toString
      else ""
    val seq = if (row.isNullAt(iSeq)) "" else row.getUTF8String(iSeq).toString
    val sb = new java.lang.StringBuilder(header.length + seq.length + seq.length / 60 + 4)
    sb.append('>').append(header)
    var i = 0
    while (i < seq.length) {
      sb.append('\n').append(seq, i, math.min(i + 60, seq.length))
      i += 60
    }
    sb.append('\n')
    out.write(sb.toString.getBytes("UTF-8"))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"rename $tmp -> $fin failed")
    FastaCommit(fin.toString)
  }

  override def abort(): Unit = {
    try out.close() finally fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}
