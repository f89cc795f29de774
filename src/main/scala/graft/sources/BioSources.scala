package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-format sources (SURVEY §2.1 S3-S8), distributed-safe.
  *
  * FASTA/GenBank/EMBL use a custom Hadoop record delimiter so records
  * never straddle partition boundaries — each input split yields whole
  * records, scaling to arbitrarily many/large files with no shuffle.
  * FASTQ's 4-line records have no safe delimiter (quality lines may
  * start with '@'), so it pays one zipWithIndex pass — documented
  * tradeoff, matching the format's inherent unsplittability.
  *
  * Parsers mirror the reference's Perl/awk/python readers (cited per
  * method) but emit typed columns instead of re-serialized text.
  */
object BioSources {

  /** RDD of records split on a custom delimiter (splittable scan). */
  private def delimited(spark: SparkSession, path: String, delim: String) = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", delim)
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
  }

  /** S3 — FASTA → (id, desc, seq, length). Handles block (wrapped)
    * format, i.e. also replaces the reference's block normalizer
    * (reference bin/remove_block_fasta_format.pl,
    * bin/ContigLengthTable.pl:43-56). */
  def fasta(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    delimited(spark, path, "\n>")
      .map(r => if (r.startsWith(">")) r.drop(1) else r)
      .filter(_.trim.nonEmpty)
      .map { rec =>
        val lines = rec.split("\n")
        val header = lines.head.trim
        val id = header.takeWhile(!_.isWhitespace)
        val seq = lines.tail.map(_.trim).mkString("")
        (id, header, seq, seq.length.toLong)
      }.toDF("id", "desc", "seq", "length")
  }

  /** S4 — FASTQ → (id, seq, qual). 4-line records via index grouping
    * (reference bin/get_trimmed_pairs.py:7-35). */
  def fastq(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (line, i) => (i / 4, (i % 4, line)) }
      .groupByKey()
      .map { case (_, parts) =>
        val m = parts.toMap
        val id = m(0L).drop(1).takeWhile(!_.isWhitespace)
        (id, m(1L), m(3L))
      }.toDF("id", "seq", "qual")
  }

  /** S4 — paired-read intersection: keep ids present in both files
    * (reference bin/get_trimmed_pairs.py semantics = inner join). */
  def pairedReads(spark: SparkSession, r1Path: String, r2Path: String): DataFrame = {
    def base = regexp_replace(col("id"), "/[12]$", "").as("id")
    val r1 = fastq(spark, r1Path).select(base,
      col("seq").as("seq_1"), col("qual").as("qual_1"))
    val r2 = fastq(spark, r2Path).select(base,
      col("seq").as("seq_2"), col("qual").as("qual_2"))
    r1.join(r2, "id")
  }

  /** S5 — SAM → typed alignment columns (header lines dropped). */
  def sam(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .filter(l => l.nonEmpty && !l.startsWith("@"))
      .map { l =>
        val f = l.split("\t")
        (f(0), f(1).toInt, f(2), f(3).toLong, f(4).toInt,
          if (f.length > 9) f(9) else "")
      }.toDF("qname", "flag", "rname", "pos", "mapq", "seq")
  }

  /** S5 — per-contig abundance from SAM: stream, count column 3, drop
    * unmapped '*' (reference bin/calculate_abundance_from_sam.pl:24-38
    * + the grep -v '*' step). Pure hash aggregate. */
  def samAbundance(spark: SparkSession, path: String): DataFrame =
    sam(spark, path).filter(col("rname") =!= "*")
      .groupBy(col("rname").as("contig")).agg(count(lit(1)).as("count"))

  /** S6 — GenBank flatfile → (accession, organism, host) for phage
    * records (reference bin/Genbank2phagehost.py:24-36). */
  def genbankPhageHosts(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val AccRe = """(?s)LOCUS\s+(\S+)""".r
    val OrgRe = """(?s)ORGANISM\s+([^\n]+)""".r
    val HostRe = """(?s)/host="([^"]+)"""".r
    delimited(spark, path, "\n//\n")
      .filter(_.contains("LOCUS"))
      .flatMap { rec =>
        val acc = AccRe.findFirstMatchIn(rec).map(_.group(1))
        val org = OrgRe.findFirstMatchIn(rec).map(_.group(1).trim)
        val host = HostRe.findFirstMatchIn(rec).map(_.group(1))
        for (a <- acc; o <- org if o.matches(".*[Pp]hage.*"); h <- host)
          yield (a, o, h)
      }.toDF("accession", "organism", "host")
  }

  /** S7 — EMBL-ish .dat records: ID / OS / host qualifier →
    * phage-host pairs (reference bin/LiteratureAssociationsNeo4j.pl:86-126). */
  def emblPhageHosts(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val IdRe = """(?m)^ID\s+(\S+?);""".r
    val OsRe = """(?m)^OS\s+(.+)$""".r
    val HostRe = """/host="([^"]+)"""".r
    delimited(spark, path, "\n//\n")
      .filter(_.contains("ID"))
      .flatMap { rec =>
        val id = IdRe.findFirstMatchIn(rec).map(_.group(1))
        val os = OsRe.findFirstMatchIn(rec).map(_.group(1).trim)
        val host = HostRe.findFirstMatchIn(rec).map(_.group(1))
        for (i <- id; o <- os if o.matches(".*[Pp]hage.*"); h <- host)
          yield (i, o, h)
      }.toDF("id", "organism", "host")
  }

  /** S8 — piler-cr report → CRISPR spacer sequences (reference
    * bin/ExtractSpacers.pl:43-77): per-array tables whose rows carry
    * the spacer string in the last column; array id from the
    * preceding "Array N" heading. One file = one record (reports are
    * small); parallelism across files. */
  def pilerCrSpacers(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (file, content) =>
        var arrayId = ""
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, String)]
        var inTable = false
        content.split("\n").foreach { line =>
          val t = line.trim
          if (t.startsWith("Array ")) { arrayId = t.stripPrefix("Array ").trim; inTable = false }
          else if (t.startsWith("=====")) inTable = !inTable
          else if (inTable && t.nonEmpty) {
            val cols = t.split("\\s+")
            // spacer column is the trailing ACGT-only token (if any)
            cols.lastOption.filter(c => c.nonEmpty && c.forall("ACGTN".contains(_))) match {
              case Some(spacer) =>
                out += ((file, arrayId, out.count(_._2 == arrayId) + 1, spacer))
              case None => ()
            }
          }
        }
        out
      }.toDF("file", "array", "ordinal", "spacer")
  }

  /** P8 — CRISPR spacer length filter 20..65 (reference
    * bin/LengthFilterSeqs.pl:44-58). */
  def lengthFilter(df: DataFrame, seqCol: String, lo: Int, hi: Int): DataFrame =
    df.filter(length(col(seqCol)).between(lo, hi))
}
