package graft.queries

import graft.{QuerySpec, Tables}
import graft.sources.BioSources
import org.apache.spark.sql.functions._

/** Driver-gate coverage for the sequence-format sources (SURVEY §2.1
  * S3-S8). The driver's data dir holds only parquet, so each query
  * here writes a small deterministic fixture file (temp dir, driver
  * side) at run time, round-trips it through the REAL distributed
  * reader, and emits typed rows that a DuckDB `VALUES` oracle pins
  * exactly — rows, schema, and hash. The fixtures are format samples
  * (reference formats: bin/ContigLengthTable.pl FASTA,
  * bin/calculate_abundance_from_sam.pl SAM, bin/get_trimmed_pairs.py
  * FASTQ, bin/Genbank2phagehost.py GenBank,
  * bin/LiteratureAssociationsNeo4j.pl EMBL, bin/ExtractSpacers.pl
  * piler-cr), not data — the point is that the scan/parse path the
  * cluster would run at scale is the path being verified.
  */
object SourceQueries {

  /** Write (overwrite) a fixture under java.io.tmpdir; returns path.
    * local[*] executors share the filesystem with the driver — on a
    * real cluster fixtures would live on the shared FS instead. */
  private def fixture(name: String, content: String): String = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_fixtures")
    dir.mkdirs()
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.write(content) finally w.close()
    f.getAbsolutePath
  }

  /** S3 — block-FASTA round-trip: wrapped sequence lines are joined,
    * id/length/GC computed by the engine. */
  val q44 = QuerySpec.sql(
    "q44_fasta_roundtrip",
    """SELECT * FROM (VALUES
      |  ('contig_1', CAST(16 AS BIGINT), CAST(8 AS BIGINT)),
      |  ('contig_2', CAST(11 AS BIGINT), CAST(3 AS BIGINT)),
      |  ('contig_3', CAST(4 AS BIGINT), CAST(2 AS BIGINT))
      |) AS t(id, len, n_gc)""",
    "FASTA scan round-trip incl. block format (SURVEY S3)") { (s, _) =>
    val p = fixture("roundtrip.fasta",
      """>contig_1 sample=A
        |ACGTACGTAC
        |GTACGT
        |>contig_2 sample=B
        |TTTTAAAACC
        |C
        |>contig_3
        |ACGT
        |""".stripMargin)
    BioSources.fasta(s, p).select(
      col("id"),
      col("length").as("len"),
      (length(col("seq")) - length(translate(col("seq"), "GC", "")))
        .cast("long").as("n_gc"))
  }

  /** S5 — SAM → per-contig abundance (unmapped '*' dropped). */
  val q45 = QuerySpec.sql(
    "q45_sam_abundance",
    """SELECT * FROM (VALUES
      |  ('contig_1', CAST(2 AS BIGINT)),
      |  ('contig_2', CAST(1 AS BIGINT))
      |) AS t(contig, count)""",
    "SAM scan → per-contig counts (SURVEY S5)") { (s, _) =>
    val p = fixture("roundtrip.sam",
      """@HD	VN:1.6
        |@SQ	SN:contig_1	LN:1000
        |r1	0	contig_1	100	60	*	*	0	0	ACGT	IIII
        |r2	16	contig_1	150	60	*	*	0	0	GGGG	IIII
        |r3	4	*	0	0	*	*	0	0	TTTT	IIII
        |r4	0	contig_2	5	30	*	*	0	0	ACGTA	IIIII
        |""".stripMargin)
    BioSources.samAbundance(s, p)
  }

  /** S4 — FASTQ pair intersection: ids present in both mate files. */
  val q46 = QuerySpec.sql(
    "q46_fastq_pairs",
    """SELECT * FROM (VALUES
      |  ('read1', 'ACGT', 'TTAA'),
      |  ('read3', 'TTTT', 'CCGG')
      |) AS t(id, seq_1, seq_2)""",
    "FASTQ scan + paired-read intersection (SURVEY S4)") { (s, _) =>
    val r1 = fixture("roundtrip_r1.fastq",
      """@read1/1
        |ACGT
        |+
        |IIII
        |@read2/1
        |GGCC
        |+
        |IIII
        |@read3/1
        |TTTT
        |+
        |IIII
        |""".stripMargin)
    val r2 = fixture("roundtrip_r2.fastq",
      """@read1/2
        |TTAA
        |+
        |IIII
        |@read3/2
        |CCGG
        |+
        |IIII
        |""".stripMargin)
    BioSources.pairedReads(s, r1, r2).select("id", "seq_1", "seq_2")
  }

  /** S6 — GenBank scan: phage records with a /host qualifier. */
  val q47 = QuerySpec.sql(
    "q47_genbank_hosts",
    """SELECT * FROM (VALUES
      |  ('NC_001416', 'Enterobacteria phage lambda', 'Escherichia coli')
      |) AS t(accession, organism, host)""",
    "GenBank flatfile scan → phage-host pairs (SURVEY S6)") { (s, _) =>
    val p = fixture("roundtrip.gbk",
      """LOCUS       NC_001416              48502 bp    DNA     linear   PHG
        |DEFINITION  Enterobacteria phage lambda, complete genome.
        |SOURCE      Enterobacteria phage lambda
        |  ORGANISM  Enterobacteria phage lambda
        |FEATURES             Location/Qualifiers
        |     source          1..48502
        |                     /host="Escherichia coli"
        |//
        |LOCUS       NC_000913            4641652 bp    DNA     circular BCT
        |  ORGANISM  Escherichia coli
        |//
        |""".stripMargin)
    BioSources.genbankPhageHosts(s, p)
  }

  /** S7 — EMBL-ish .dat scan: phage records with a /host qualifier. */
  val q48 = QuerySpec.sql(
    "q48_embl_hosts",
    """SELECT * FROM (VALUES
      |  ('PH123', 'Pseudomonas phage phi6', 'Pseudomonas syringae')
      |) AS t(id, organism, host)""",
    "EMBL .dat scan → phage-host pairs (SURVEY S7)") { (s, _) =>
    val p = fixture("roundtrip.dat",
      """ID   PH123; SV 1; linear; DNA; STD; PHG; 13385 BP.
        |OS   Pseudomonas phage phi6
        |FT   source          1..13385
        |FT                   /host="Pseudomonas syringae"
        |//
        |ID   BA001; SV 1; linear; DNA; STD; PRO; 4215606 BP.
        |OS   Bacillus subtilis
        |//
        |""".stripMargin)
    BioSources.emblPhageHosts(s, p)
  }

  /** S8 — piler-cr report scan: spacers with array id and ordinal. */
  val q49 = QuerySpec.sql(
    "q49_pilercr_spacers",
    """SELECT * FROM (VALUES
      |  ('1', 1, 'ACGTACGTACGTACGTACGTACGTACGTACGT'),
      |  ('1', 2, 'TTTTCCCCGGGGAAAATTTTCCCCGGGGAAAAT'),
      |  ('2', 1, 'GGGGTTTTAAAACCCCGGGGTTTTAAAACCCC')
      |) AS t(array_id, ordinal, spacer)""",
    "piler-cr report scan → CRISPR spacers (SURVEY S8)") { (s, _) =>
    val p = fixture("roundtrip.pilercr",
      """piler-cr v1.06
        |
        |Array 1
        |>contig_1
        |
        |       Pos  Repeat     %id  Spacer  Left flank    Repeat                Spacer
        |==========  ======  ======  ======  ==========    ===============       ======
        |       462      37   100.0      32  CCTAAGAGA     GTTCACTGCCGTATAGG     ACGTACGTACGTACGTACGTACGTACGTACGT
        |       531      37    97.3      33  GTCAAGAGA     GTTCACTGCCGTATAGG     TTTTCCCCGGGGAAAATTTTCCCCGGGGAAAAT
        |==========  ======  ======  ======  ==========    ===============
        |
        |Array 2
        |>contig_2
        |
        |       Pos  Repeat     %id  Spacer  Left flank    Repeat                Spacer
        |==========  ======  ======  ======  ==========    ===============       ======
        |       101      30   100.0      32  AAAATTTTC     GTTCACTGCCGTATAGG     GGGGTTTTAAAACCCCGGGGTTTTAAAACCCC
        |==========  ======  ======  ======  ==========    ===============
        |""".stripMargin)
    BioSources.pilerCrSpacers(s, p)
      .select(col("array").as("array_id"), col("ordinal"), col("spacer"))
  }

  /** S1 + S11 — TSV scan → TSV sink → re-scan round-trip with a
    * declared schema (the reference's read.delim / write.table pair,
    * bin/ContigLengthTable.pl:43-56 output shape). The sink writes
    * through the REAL distributed writer (a directory of part files),
    * and the re-scan proves schema-on-read fidelity for every base
    * type the reference's TSVs carry (string/int/double/bool). */
  val q79 = QuerySpec.sql(
    "q79_tsv_roundtrip",
    """SELECT * FROM (VALUES
      |  ('contig_1', 1001, CAST(17.25 AS DOUBLE), TRUE),
      |  ('contig_2', -7, CAST(0.5 AS DOUBLE), FALSE),
      |  ('with space', 0, CAST(-3.125 AS DOUBLE), TRUE)
      |) AS t(id, n, score, keep)""",
    "TSV scan → sink → re-scan round-trip (SURVEY S1,S11)") { (s, _) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("n", IntegerType), StructField("score", DoubleType),
      StructField("keep", BooleanType)))
    val p = fixture("roundtrip.tsv",
      "id\tn\tscore\tkeep\n" +
        "contig_1\t1001\t17.25\ttrue\n" +
        "contig_2\t-7\t0.5\tfalse\n" +
        "with space\t0\t-3.125\ttrue\n")
    val once = graft.sources.Tabular.tsv(s, p, schema, header = true)
    val sinkDir = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_fixtures"),
      "tsv_sink").getAbsolutePath
    graft.sources.Tabular.writeTsv(once, sinkDir)
    graft.sources.Tabular.tsv(s, sinkDir, schema, header = true)
  }

  /** S2 + S12 — CSV scan → parquet checkpoint → read-back: the
    * checkpointed plan must carry identical values and types (the
    * reference's .Rdata save/load analog). */
  val q80 = QuerySpec.sql(
    "q80_csv_checkpoint",
    """SELECT * FROM (VALUES
      |  ('s1', 10, CAST(2.5 AS DOUBLE)),
      |  ('s2', 20, CAST(-1.75 AS DOUBLE))
      |) AS t(sample, reads, ratio)""",
    "CSV scan → parquet checkpoint round-trip (SURVEY S2,S12)") { (s, _) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("sample", StringType),
      StructField("reads", IntegerType), StructField("ratio", DoubleType)))
    val p = fixture("roundtrip.csv", "s1,10,2.5\ns2,20,-1.75\n")
    val ckDir = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_fixtures"),
      "csv_ck").getAbsolutePath
    graft.sources.Tabular.checkpoint(
      graft.sources.Tabular.csv(s, p, schema), ckDir)
  }

  /** Beyond-reference — JSONL scan → sink → re-scan round-trip: the
    * de-facto training-data interchange format, written through the
    * real distributed writer and re-read with a declared schema
    * (nulls, unicode, and embedded quotes survive the trip). */
  val q121 = QuerySpec.sql(
    "q121_jsonl_roundtrip",
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), 'plain text', CAST(0.5 AS DOUBLE)),
      |  (CAST(2 AS BIGINT), 'quote " and tab	here', CAST(-2.25 AS DOUBLE)),
      |  (CAST(3 AS BIGINT), NULL, CAST(0.0 AS DOUBLE))
      |) AS t(doc_id, text, score)""",
    "JSONL scan → sink → re-scan round-trip (beyond-reference)") { (s, _) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("score", DoubleType)))
    val p = fixture("roundtrip.jsonl",
      """{"doc_id": 1, "text": "plain text", "score": 0.5}
        |{"doc_id": 2, "text": "quote \" and tab\there", "score": -2.25}
        |{"doc_id": 3, "text": null, "score": 0.0}
        |""".stripMargin)
    val once = graft.sources.Tabular.jsonl(s, p, schema)
    val sinkDir = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_fixtures"),
      "jsonl_sink").getAbsolutePath
    graft.sources.Tabular.writeJsonl(once, sinkDir)
    graft.sources.Tabular.jsonl(s, sinkDir, schema)
  }

  /** P8 — CRISPR-spacer length-range filter (reference
    * bin/LengthFilterSeqs.pl:44-58): sequences kept iff length in
    * [20, 65], both bounds inclusive — pinned by fixture lengths
    * 10/20/40/65/70 where only the middle three survive (40 wrapped
    * over two lines to exercise the block join under the filter). */
  val q131 = QuerySpec.sql(
    "q131_length_filter",
    """SELECT * FROM (VALUES
      |  ('s2', CAST(20 AS BIGINT)),
      |  ('s3', CAST(40 AS BIGINT)),
      |  ('s4', CAST(65 AS BIGINT))
      |) AS t(id, len)""",
    "length-range sequence filter over FASTA (SURVEY P8)") { (s, _) =>
    val p = fixture("lenfilter.fasta",
      ">s1\n" + "A" * 10 + "\n" +
        ">s2\n" + "AC" * 10 + "\n" +
        ">s3\n" + "ACGT" * 5 + "\n" + "TGCA" * 5 + "\n" +
        ">s4\n" + "G" * 65 + "\n" +
        ">s5\n" + "T" * 70 + "\n")
    BioSources.lengthFilter(BioSources.fasta(s, p), "seq", 20, 65)
      .select(col("id"), col("length").as("len"))
  }

  /** Z-order-clustered parquet sink round-trip: the layout writer
    * ([[graft.sources.Tabular.writeClusteredParquet]]) must be a pure
    * permutation — every value survives the range exchange + local
    * sort + file split byte-for-byte. The per-file z-range
    * disjointness (what the layout BUYS) is pinned in LayoutSpec;
    * this gate pins fidelity against the original table's oracle. */
  val q146 = QuerySpec.sql(
    "q146_clustered_roundtrip",
    """SELECT l_returnflag,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_partkey AS BIGINT) * 7 + l_suppkey) AS BIGINT) AS keysum,
      |       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM lineitem GROUP BY 1""",
    "clustered layout write → re-scan fidelity (beyond-reference)") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val out = java.nio.file.Files.createTempDirectory("graft-q146").toString + "/li"
    graft.sources.Tabular.writeClusteredParquet(li, out,
      Seq("l_partkey", "l_suppkey"), nFiles = 8)
    s.read.parquet(out).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_partkey").cast("long") * 7 + col("l_suppkey")).as("keysum"),
        sum(graft.functions.ExactNum.scaled(col("l_extendedprice"), 100)).as("price_cents"))
  }

  /** ORC sink → source roundtrip: land the events table as ORC, read
    * it back through the vectorized ORC reader, and aggregate — the
    * oracle runs the same aggregate on the ORIGINAL parquet, so the
    * gate proves the ORC path carries exactly the input rows
    * (timestamps included — the cross-format fidelity trap). */
  val q195 = QuerySpec.sql(
    "q195_orc_roundtrip",
    """SELECT event_type, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents,
      |       min(ts) AS first_ts, max(ts) AS last_ts
      |FROM events GROUP BY 1""",
    "ORC write -> vectorized re-read fidelity (S12 extension)") { (s, d) =>
    val out = java.nio.file.Files.createTempDirectory("graft-q195").toString + "/ev"
    graft.sources.Tabular.checkpointOrc(Tables.events(s, d), out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
  }

  /** Hive-style partitioned sink → pruned re-read: land lineitem
    * partitioned by l_returnflag, then aggregate ONE partition — the
    * scan must carry a PartitionFilters entry (directory-level
    * pruning, asserted in PlanAuditSpec), and the oracle replays the
    * filtered aggregate on the original table. */
  val q196 = QuerySpec.sql(
    "q196_partitioned_sink",
    """SELECT l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem WHERE l_returnflag = 'R'
      |GROUP BY 1""",
    "partitioned parquet sink -> partition-pruned re-read (S12 extension)") { (s, d) =>
    val out = java.nio.file.Files.createTempDirectory("graft-q196").toString + "/li"
    graft.sources.Tabular.writePartitioned(
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag",
        "l_linestatus"),
      out, Seq("l_returnflag"))
    s.read.parquet(out)
      .where(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"))
  }

  /** Schema evolution across parquet batches: an early batch lands
    * WITHOUT the later `n_chars` column, a later batch WITH it — the
    * lakehouse reality of a corpus ingested over months. The
    * `mergeSchema` re-read unions the schemas (missing column reads
    * as NULL, no rewrite of old files), and the aggregate proves the
    * null-fill semantics exactly against the original table. Scale
    * note: schema merge is a footer-only planning cost; the data
    * files are untouched. */
  val q202 = QuerySpec.sql(
    "q202_schema_evolution",
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_known,
      |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_chars
      |FROM documents GROUP BY 1""",
    "mergeSchema read across evolving parquet batches (S12 extension)") { (s, d) =>
    val docs = Tables.documents(s, d)
    val out = java.nio.file.Files.createTempDirectory("graft-q202").toString
    docs.where(col("doc_id") % 2 === 0).select("doc_id", "source")
      .write.mode("overwrite").parquet(out + "/batch0")
    docs.where(col("doc_id") % 2 === 1).select("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(out + "/batch1")
    s.read.option("mergeSchema", "true")
      .parquet(out + "/batch0", out + "/batch1")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).cast("long").as("chars_known"),
        count(col("n_chars")).as("n_with_chars"))
  }

  /** Federated multi-format union: one logical table living in THREE
    * physical formats at once — a TSV shard, a JSONL shard, a parquet
    * shard (the ingest reality of a corpus assembled from many
    * producers) — unioned by NAME and aggregated. The oracle replays
    * the aggregate on the original table, so the gate proves all
    * three readers and the name-based union carry identical rows.
    * Text stays out of the TSV shard (delimiter safety — the
    * documented TSV contract); each shard carries the same declared
    * schema, no inference pass anywhere. */
  val q210 = QuerySpec.sql(
    "q210_federated_union",
    """SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       CAST(min(doc_id) AS BIGINT) AS min_id,
      |       CAST(max(doc_id) AS BIGINT) AS max_id
      |FROM documents GROUP BY 1""",
    "one logical table across TSV+JSONL+parquet shards, unioned by name (federation)") { (s, d) =>
    import org.apache.spark.sql.types._
    val narrow = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
    val out = java.nio.file.Files.createTempDirectory("graft-q210").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    graft.sources.Tabular.writeTsv(narrow.where(col("doc_id") % 3 === 0), out + "/tsv")
    graft.sources.Tabular.writeJsonl(narrow.where(col("doc_id") % 3 === 1), out + "/jsonl")
    narrow.where(col("doc_id") % 3 === 2).write.mode("overwrite").parquet(out + "/pq")
    val tsv = graft.sources.Tabular.tsv(s, out + "/tsv", schema, header = true)
    val jsonl = graft.sources.Tabular.jsonl(s, out + "/jsonl", schema)
    val pq = s.read.parquet(out + "/pq")
    tsv.unionByName(jsonl).unionByName(pq)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  /** DataSource V2 FASTA provider end-to-end on REAL data volume:
    * the documents table becomes a block-wrapped FASTA corpus (60-col
    * lines), re-read through `format("graft-fasta")` with splitBytes
    * forced far below file size — so the gate exercises the byte-
    * range planner and the mid-record boundary alignment, not just
    * the parser. The oracle recomputes every record length from the
    * ORIGINAL table, closing the loop without the oracle ever seeing
    * FASTA. (q44 keeps the tiny pinned fixture; this is the scale
    * form.) */
  val q216 = QuerySpec.sql(
    "q216_fasta_dsv2",
    """SELECT 'd' || CAST(doc_id AS VARCHAR) AS id,
      |       CAST(length(upper(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS BIGINT) AS len
      |FROM documents""",
    "DSv2 FASTA scan with forced byte-range splits == original table (S3 scale form)") { (s, d) =>
    val out = java.nio.file.Files.createTempDirectory("graft-q216").toString + "/fa"
    Tables.documents(s, d)
      .select(concat(lit(">d"), col("doc_id").cast("string"), lit("\n"),
        regexp_replace(
          upper(regexp_replace(col("text"), "[^A-Za-z]", "")),
          "(.{60})", "$1\n")).as("value"))
      .write.mode("overwrite").text(out)
    s.read.format("graft-fasta").option("splitBytes", "4096").load(out)
      .select(col("id"), col("length").as("len"))
  }

  /** Malformed-row quarantine — the ingest-resilience contract: a
    * TSV feed where some rows are torn (wrong arity / junk) must
    * load WITHOUT failing the job, routing bad rows to a corrupt-
    * record column for a quarantine count while good rows parse
    * normally (PERMISSIVE mode + columnNameOfCorruptRecord). The
    * torn rows are derived deterministically (o_orderkey ≡ 0 mod 13
    * gets its line replaced by junk), so the oracle recomputes both
    * populations from the original table. */
  val q220 = QuerySpec.sql(
    "q220_corrupt_quarantine",
    """SELECT CASE WHEN o_orderkey % 13 = 0 THEN 'quarantined' ELSE 'parsed' END AS status,
      |       count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 13 <> 0
      |                     THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |                     ELSE 0 END) AS BIGINT) AS good_cents,
      |       CAST(max(CASE WHEN o_orderkey % 13 <> 0 THEN o_orderkey
      |                     ELSE -1 END) AS BIGINT) AS max_key
      |FROM orders GROUP BY 1""",
    "PERMISSIVE parse with corrupt-record quarantine (ingest resilience)") { (s, d) =>
    import org.apache.spark.sql.types._
    val out = java.nio.file.Files.createTempDirectory("graft-q220").toString + "/t"
    Tables.orders(s, d)
      .select(when(col("o_orderkey") % 13 === 0,
          lit("###TORN-RECORD###"))
        .otherwise(concat_ws("\t", col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long"))).as("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("cents", LongType),
      StructField("_bad", StringType)))
    // the classifier references o_orderkey as well as _bad: CSV
    // corruption is detected per REFERENCED column (pruned parsing),
    // so a plan pruned to the corrupt column alone would both miss
    // the torn rows AND trip QUERY_ONLY_CORRUPT_RECORD_COLUMN
    s.read.option("sep", "\t").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema(schema).csv(out)
      .select(when(col("_bad").isNotNull || col("o_orderkey").isNull, "quarantined")
        .otherwise("parsed").as("status"), col("cents"), col("o_orderkey"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("cents"), lit(0L))).cast("long").as("good_cents"),
        max(coalesce(col("o_orderkey"), lit(-1L))).as("max_key"))
  }

  /** Declarative data-quality report — five constraint families
    * (completeness, uniqueness, bounds, format, referential
    * containment) compiled into ONE aggregate scan + one anti-join
    * (operators.Quality). Metrics are exact integer num/den pairs,
    * so the oracle recomputes the identical report row by row. */
  val q230 = QuerySpec.sql(
    "q230_quality_report",
    """SELECT 'complete(o_custkey)' AS constraint,
      |       CAST(count(o_custkey) AS BIGINT) AS metric_num,
      |       CAST(count(*) AS BIGINT) AS metric_den,
      |       count(o_custkey) = count(*) AS passed
      |FROM orders
      |UNION ALL
      |SELECT 'unique(o_orderkey)', CAST(count(DISTINCT o_orderkey) AS BIGINT),
      |       CAST(count(*) AS BIGINT), count(DISTINCT o_orderkey) = count(*)
      |FROM orders
      |UNION ALL
      |SELECT 'bounds(o_totalprice,0,10000000)',
      |       CAST(sum(CASE WHEN o_totalprice BETWEEN 0 AND 10000000 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN o_totalprice BETWEEN 0 AND 10000000 THEN 1 ELSE 0 END) = count(*)
      |FROM orders
      |UNION ALL
      |SELECT 'matches(o_orderpriority)',
      |       CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) = count(*)
      |FROM orders
      |UNION ALL
      |SELECT 'contained(o_custkey)',
      |       CAST((SELECT count(DISTINCT o_custkey) FROM orders
      |             WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS BIGINT),
      |       CAST(count(DISTINCT o_custkey) AS BIGINT),
      |       (SELECT count(DISTINCT o_custkey) FROM orders
      |        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
      |FROM orders""",
    "declarative constraint report in one scan (data-quality tier)") { (s, d) =>
    import graft.operators.Quality._
    check(Tables.orders(s, d), Seq(
      Complete("o_custkey"),
      Unique(Seq("o_orderkey")),
      Bounds("o_totalprice", 0, 10000000),
      Matches("o_orderpriority", "^[1-5]-"),
      ContainedIn("o_custkey", Tables.customer(s, d), "c_custkey")))
  }

  /** DSv2 FASTA WRITE → READ end-to-end on real data volume: the
    * documents table lands through the connector's two-phase task
    * commit (`.write.format("graft-fasta")`), re-reads through the
    * splittable scan, and the per-source aggregate must equal the
    * original table — closing the loop on BOTH halves of the
    * provider (q216 gates the read half alone). The source rides in
    * the header (`dNNN src=SOURCE`), exercising the desc column. */
  val q231 = QuerySpec.sql(
    "q231_fasta_dsv2_write",
    """SELECT source, count(*) AS n_records,
      |       CAST(sum(length(upper(regexp_replace(text, '[^A-Za-z]', '', 'g')))) AS BIGINT) AS total_len
      |FROM documents GROUP BY 1""",
    "DSv2 FASTA writer two-phase commit -> splittable re-read == original (S3/S11 scale form)") { (s, d) =>
    val out = java.nio.file.Files.createTempDirectory("graft-q231").toString + "/fa"
    Tables.documents(s, d)
      .select(concat(lit("d"), col("doc_id").cast("string"), lit(" src="),
          col("source")).as("desc"),
        upper(regexp_replace(col("text"), "[^A-Za-z]", "")).as("seq"))
      .write.format("graft-fasta").mode("overwrite").save(out)
    s.read.format("graft-fasta").option("splitBytes", "8192").load(out)
      .select(regexp_extract(col("desc"), "src=(\\S+)", 1).as("source"),
        col("length"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_records"), sum(col("length")).as("total_len"))
  }

  /** Keyed copy-on-write MERGE — the CDC/upsert primitive over a
    * bucket-clustered parquet table ([[graft.operators.MergeTable]]:
    * generation dirs + an atomically-committed versioned manifest, so
    * merges only ever ADD files and a crash needs no recovery). One
    * batch carries replacements (keys % 97), inserts (shifted
    * keys % 103) and deletes (keys % 101, minus the upsert overlap);
    * the gate reads the merged table back in full and the oracle
    * recomputes the identical final state relationally (anti-join +
    * union). Only buckets containing touched keys are read or
    * written — untouched-bucket generation carry-over, orphan
    * invisibility and vacuum are pinned in MergeTableSpec; this gate
    * pins the END STATE exactly. */
  val q280 = QuerySpec.sql(
    "q280_merge_table",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |ups AS (
      |  SELECT k, ck, cents + 1000000 AS cents FROM base WHERE k % 97 = 0
      |  UNION ALL
      |  SELECT k + 10000000000 AS k, ck, cents FROM base WHERE k % 103 = 0),
      |del AS (SELECT k FROM base WHERE k % 101 = 0 AND k % 97 <> 0)
      |SELECT k, ck, cents FROM base
      |WHERE k NOT IN (SELECT k FROM ups) AND k NOT IN (SELECT k FROM del)
      |UNION ALL
      |SELECT k, ck, cents FROM ups""",
    "keyed copy-on-write MERGE: upsert+insert+delete, bucket-pruned rewrite (CDC primitive)") { (s, d) =>
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q280").toString + "/t"
    graft.operators.MergeTable.create(base, dir, "k", nBuckets = 16)
    val ups = base.where(col("k") % 97 === 0)
      .withColumn("cents", col("cents") + 1000000L)
      .unionByName(base.where(col("k") % 103 === 0)
        .withColumn("k", col("k") + 10000000000L))
    val del = base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0).select("k")
    graft.operators.MergeTable.merge(s, dir, ups, del)
    graft.operators.MergeTable.read(s, dir)
  }

  /** Streaming CDC apply onto the merge table ([[graft.streaming
    * .StreamOps.runMergeStream]]): two change batches — batch 1
    * updates + deletes, batch 2 RE-updates the same keys and inserts
    * new ones — arrive through the real streaming engine and fold
    * into [[graft.operators.MergeTable]] one merge per micro-batch.
    * Exactly-once content needs no marker or undo log: a crashed
    * generation is invisible until its manifest commits, and replay
    * is content-idempotent (MergeTableSpec). The oracle derives the
    * FOLDED end state relationally — batch 2's updates supersede
    * batch 1's, so the composition collapses to one expression. */
  val q282 = QuerySpec.sql(
    "q282_merge_stream",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT k, ck, cents FROM base WHERE k % 97 <> 0 AND k % 101 <> 0
      |UNION ALL
      |SELECT k, ck, cents + 2000000 AS cents FROM base WHERE k % 97 = 0
      |UNION ALL
      |SELECT k + 10000000000 AS k, ck, cents FROM base WHERE k % 103 = 0""",
    "streaming CDC apply onto the merge table: two folded change batches (lakehouse)") { (s, d) =>
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val root = java.nio.file.Files.createTempDirectory("graft-q282").toString
    val dir = s"$root/t"
    graft.operators.MergeTable.create(base, dir, "k", nBuckets = 16)
    val src = new java.io.File(root, "src"); src.mkdirs()
    val b0 = base.where(col("k") % 97 === 0)
      .withColumn("cents", col("cents") + 1000000L).withColumn("op", lit("u"))
      .unionByName(base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0)
        .withColumn("op", lit("d")))
    val b1 = base.where(col("k") % 97 === 0)
      .withColumn("cents", col("cents") + 2000000L).withColumn("op", lit("u"))
      .unionByName(base.where(col("k") % 103 === 0)
        .withColumn("k", col("k") + 10000000000L).withColumn("op", lit("u")))
    Seq(b0, b1).zipWithIndex.foreach { case (df, b) =>
      val tmp = s"$root/tmp$b"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, f"b$b%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + b * 60000L)
    }
    graft.streaming.StreamOps.runMergeStream(s, src.toString, dir,
      s"$root/ckpt", "k")
  }

  /** TIME TRAVEL on the merge table ([[graft.operators.MergeTable
    * .readAt]]): create (v1) → merge updates+deletes (v2) → merge
    * inserts (v3), then read ALL THREE versions back tagged. Works by
    * construction of the generation+manifest layout — old manifests
    * keep naming on-disk generations because merges only ever add
    * files (vacuum is the one deleter, pinned in MergeTableSpec).
    * The oracle derives each version's state relationally. */
  val q283 = QuerySpec.sql(
    "q283_merge_time_travel",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |v2 AS (
      |  SELECT k, ck, CASE WHEN k % 97 = 0 THEN cents + 1000000 ELSE cents END AS cents
      |  FROM base WHERE NOT (k % 101 = 0 AND k % 97 <> 0))
      |SELECT 1 AS v, k, ck, cents FROM base
      |UNION ALL
      |SELECT 2 AS v, k, ck, cents FROM v2
      |UNION ALL
      |SELECT 3 AS v, k, ck, cents FROM v2
      |UNION ALL
      |SELECT 3 AS v, k + 10000000000 AS k, ck, cents FROM base WHERE k % 103 = 0""",
    "merge-table time travel: three manifest versions read back tagged (lakehouse)") { (s, d) =>
    import graft.operators.MergeTable
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q283").toString + "/t"
    MergeTable.create(base, dir, "k", nBuckets = 16)
    MergeTable.merge(s, dir,
      base.where(col("k") % 97 === 0).withColumn("cents", col("cents") + 1000000L),
      base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0).select("k"))
    MergeTable.merge(s, dir,
      base.where(col("k") % 103 === 0).withColumn("k", col("k") + 10000000000L),
      base.limit(0).select("k"))
    MergeTable.versions(s, dir).map(v =>
        MergeTable.readAt(s, dir, v).withColumn("v", lit(v)))
      .reduce(_ unionByName _).select("v", "k", "ck", "cents")
  }

  /** Keyed POINT READ on the merge table ([[graft.operators
    * .MergeTable.lookup]]): probe keys hash to their buckets and only
    * those buckets' live files are opened — the serving-path read
    * whose cost is ∝ probed data, never table size (path-pruning law
    * in MergeTableSpec). Probes a mix of surviving, updated, deleted
    * (absent) and never-present keys against the post-merge state;
    * the oracle folds the merge and semi-joins the key set. */
  val q284 = QuerySpec.sql(
    "q284_merge_lookup",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |state AS (
      |  SELECT k, ck, CASE WHEN k % 97 = 0 THEN cents + 1000000 ELSE cents END AS cents
      |  FROM base WHERE NOT (k % 101 = 0 AND k % 97 <> 0)),
      |probe AS (
      |  SELECT k FROM base WHERE k % 53 = 0
      |  UNION ALL SELECT k + 77777 FROM base WHERE k % 997 = 0)
      |SELECT s.k, s.ck, s.cents FROM state s
      |WHERE s.k IN (SELECT k FROM probe)""",
    "merge-table keyed point read: bucket-pruned lookup over the live manifest") { (s, d) =>
    import graft.operators.MergeTable
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q284").toString + "/t"
    MergeTable.create(base, dir, "k", nBuckets = 16)
    MergeTable.merge(s, dir,
      base.where(col("k") % 97 === 0).withColumn("cents", col("cents") + 1000000L),
      base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0).select("k"))
    val probe = base.where(col("k") % 53 === 0).select("k")
      .unionByName(base.where(col("k") % 997 === 0)
        .select((col("k") + 77777L).as("k")))
    MergeTable.lookup(s, dir, probe)
  }

  /** File-level ZONE-MAP data skipping ([[graft.sources.ZoneMap]]):
    * land lineitem z-clustered, harvest per-file min/max from parquet
    * FOOTERS ONLY into a `_zonemap` sidecar, then answer a range
    * predicate by opening only files whose zone intersects it —
    * planning-time path pruning on top of (not instead of) parquet's
    * row-group skipping. Pruning itself is law-pinned in ZoneMapSpec;
    * this gate pins that the skipping scan returns EXACTLY the
    * full-scan answer (zone maps prove absence, never presence). */
  val q285 = QuerySpec.sql(
    "q285_zonemap_scan",
    """SELECT l_returnflag, count(*) AS n,
      |       CAST(sum(CAST(l_partkey AS BIGINT)) AS BIGINT) AS pksum,
      |       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM lineitem
      |WHERE l_partkey BETWEEN 100 AND 150
      |GROUP BY 1""",
    "zone-map data skipping: footer-harvested sidecar -> path-pruned range scan") { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey", "l_returnflag", "l_extendedprice")
    val out = java.nio.file.Files.createTempDirectory("graft-q285").toString + "/li"
    graft.sources.Tabular.writeClusteredParquet(li, out,
      Seq("l_partkey", "l_suppkey"), nFiles = 8)
    graft.sources.ZoneMap.write(s, out, Seq("l_partkey", "l_suppkey"))
    graft.sources.ZoneMap.scanRange(s, out, "l_partkey", 100L, 150L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_partkey").cast("long")).as("pksum"),
        sum(graft.functions.ExactNum.scaled(col("l_extendedprice"), 100)).as("price_cents"))
  }

  /** The DECLARATIVE zone-map table ([[graft.sources.ZoneMap.table]]):
    * a custom FileIndex hands the sidecar zones every predicate
    * Catalyst pushes down, so a plain SQL WHERE over the registered
    * view prunes files at planning time — no scanRange call, the
    * idiom Delta-style formats use. The gate queries BOTH clustered
    * dims through pure SQL (equality on one, range on the other, plus
    * an IS NOT NULL the planner plants itself); ZoneMapSpec pins the
    * numFiles pruning laws, this gate pins answer fidelity. */
  val q287 = QuerySpec.sql(
    "q287_zonemap_table_sql",
    """SELECT l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS oksum,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem
      |WHERE l_suppkey = 7 AND l_partkey >= 50 AND l_partkey < 150
      |  AND l_returnflag >= 'N'
      |GROUP BY 1""",
    "declarative zone-map table: SQL WHERE -> planning-time file pruning") { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_returnflag", "l_linestatus")
    val out = java.nio.file.Files.createTempDirectory("graft-q287").toString + "/li"
    graft.sources.Tabular.writeClusteredParquet(li, out,
      Seq("l_partkey", "l_suppkey"), nFiles = 8)
    graft.sources.ZoneMap.write(s, out,
      Seq("l_partkey", "l_suppkey", "l_returnflag"))
    graft.sources.ZoneMap.table(s, out).createOrReplaceTempView("zm_lineitem_q287")
    s.sql("""SELECT l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS oksum,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM zm_lineitem_q287
      |WHERE l_suppkey = 7 AND l_partkey >= 50 AND l_partkey < 150
      |  AND l_returnflag >= 'N'
      |GROUP BY 1""".stripMargin)
  }

  /** CLUSTERED merge table ([[graft.operators.MergeTable]] with
    * `clusterBy`/`statsCols`): every generation is locally sorted by
    * event time inside each bucket and carries a footer-harvested
    * `_zonemap` sidecar — so [[graft.operators.MergeTable.readRange]]
    * answers a time-window query by opening only files whose zone
    * intersects, composed with the manifest's bucket-path selection.
    * The add-only layout makes sidecars maintenance-free (files are
    * never rewritten; carried generations keep serving their zones —
    * pruning laws in MergeTableSpec). The CDC-table-with-time-windows
    * shape IS the 100 TB case: upsert stream + "last week" scans.
    * Oracle folds the merge and replays the window in micros. */
  val q288 = QuerySpec.sql(
    "q288_merge_clustered_range",
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS k, epoch_us(ts) AS ts_us,
      |         CAST(user_id AS BIGINT) AS uid,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents
      |  FROM events),
      |state AS (
      |  SELECT k, ts_us, uid,
      |         CASE WHEN k % 89 = 0 THEN value_cents + 5000 ELSE value_cents END AS value_cents
      |  FROM base WHERE NOT (k % 83 = 0 AND k % 89 <> 0)
      |  UNION ALL
      |  SELECT k + 10000000000 AS k, ts_us, uid, value_cents
      |  FROM base WHERE k % 97 = 0),
      |b AS (SELECT min(ts_us) AS lo0, max(ts_us) AS hi0 FROM base)
      |SELECT s.k, s.ts_us, s.uid, s.value_cents
      |FROM state s, b
      |WHERE s.ts_us BETWEEN b.lo0 + (b.hi0 - b.lo0) // 4
      |                  AND b.lo0 + 3 * ((b.hi0 - b.lo0) // 4)""",
    "clustered merge table: CDC upserts + zone-pruned time-window read (lakehouse)") { (s, d) =>
    import graft.operators.MergeTable
    val ev = Tables.events(s, d).select(
      col("event_id").cast("long").as("k"),
      unix_micros(col("ts")).as("ts_us"),
      col("user_id").cast("long").as("uid"),
      graft.functions.ExactNum.scaled(col("value"), 100).as("value_cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q288").toString + "/t"
    MergeTable.create(ev, dir, "k", nBuckets = 16,
      clusterBy = Some("ts_us"), statsCols = Seq("ts_us"),
      maxRecordsPerFile = 2000L)
    MergeTable.merge(s, dir,
      ev.where(col("k") % 89 === 0)
        .withColumn("value_cents", col("value_cents") + 5000L)
        .unionByName(ev.where(col("k") % 97 === 0)
          .withColumn("k", col("k") + 10000000000L)),
      ev.where(col("k") % 83 === 0 && col("k") % 89 =!= 0).select("k"))
    val r = ev.agg(min("ts_us"), max("ts_us")).head()
    val (lo0, hi0) = (r.getLong(0), r.getLong(1))
    val d4 = (hi0 - lo0) / 4
    MergeTable.readRange(s, dir, "ts_us", lo0 + d4, lo0 + 3 * d4)
  }

  /** The DECLARATIVE merge table ([[graft.operators.MergeTable
    * .table]]): one registered view, plain SQL, two pruning modes in
    * one statement — `k IN (…)` hashes the probe keys driver-side
    * with the layout's own `pmod(xxhash64(k), n)` and opens ONLY
    * those buckets, while the time-window branch file-prunes through
    * the per-generation zones. Bucket/zone/snapshot laws live in
    * MergeTableSpec; this gate pins SQL-surface fidelity against the
    * folded CDC state. */
  val q289 = QuerySpec.sql(
    "q289_merge_table_sql",
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS k, epoch_us(ts) AS ts_us,
      |         CAST(user_id AS BIGINT) AS uid,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents
      |  FROM events),
      |state AS (
      |  SELECT k, ts_us, uid,
      |         CASE WHEN k % 89 = 0 THEN value_cents + 5000 ELSE value_cents END AS value_cents
      |  FROM base WHERE NOT (k % 83 = 0 AND k % 89 <> 0)
      |  UNION ALL
      |  SELECT k + 10000000000 AS k, ts_us, uid, value_cents
      |  FROM base WHERE k % 97 = 0),
      |b AS (SELECT min(ts_us) AS lo0, max(ts_us) AS hi0 FROM base)
      |SELECT 'pt' AS mode, k, ts_us, value_cents FROM state
      |WHERE k IN (SELECT k FROM base WHERE k % 9973 = 0)
      |UNION ALL
      |SELECT 'w' AS mode, k, ts_us, value_cents FROM state, b
      |WHERE ts_us >= b.lo0 + 3 * ((b.hi0 - b.lo0) // 8)
      |  AND ts_us <  b.lo0 + 5 * ((b.hi0 - b.lo0) // 8)""",
    "declarative merge table from SQL: bucket-pruned key IN + zone-pruned window") { (s, d) =>
    import graft.operators.MergeTable
    val ev = Tables.events(s, d).select(
      col("event_id").cast("long").as("k"),
      unix_micros(col("ts")).as("ts_us"),
      col("user_id").cast("long").as("uid"),
      graft.functions.ExactNum.scaled(col("value"), 100).as("value_cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q289").toString + "/t"
    MergeTable.create(ev, dir, "k", nBuckets = 16,
      clusterBy = Some("ts_us"), statsCols = Seq("ts_us"),
      maxRecordsPerFile = 2000L)
    MergeTable.merge(s, dir,
      ev.where(col("k") % 89 === 0)
        .withColumn("value_cents", col("value_cents") + 5000L)
        .unionByName(ev.where(col("k") % 97 === 0)
          .withColumn("k", col("k") + 10000000000L)),
      ev.where(col("k") % 83 === 0 && col("k") % 89 =!= 0).select("k"))
    val probe = ev.where(col("k") % 9973 === 0).select("k")
      .collect().map(_.getLong(0)).sorted
    val r = ev.agg(min("ts_us"), max("ts_us")).head()
    val (lo0, hi0) = (r.getLong(0), r.getLong(1))
    val d8 = (hi0 - lo0) / 8
    // through the graft_merge_table TABLE FUNCTION — pure SQL, no
    // registration; bucket/zone pruning identical to MergeTable.table
    s.sql(s"""SELECT 'pt' AS mode, k, ts_us, value_cents
      |FROM graft_merge_table('$dir')
      |WHERE k IN (${probe.mkString(", ")})
      |UNION ALL
      |SELECT 'w' AS mode, k, ts_us, value_cents
      |FROM graft_merge_table('$dir')
      |WHERE ts_us >= ${lo0 + 3 * d8} AND ts_us < ${lo0 + 5 * d8}""".stripMargin)
  }

  /** CHANGE DATA FEED on the merge table ([[graft.operators
    * .MergeTable.changes]]): the row-level content delta between two
    * committed versions — `'u'` new images for inserted-or-updated
    * keys, `'d'` old images for deleted keys — reading ONLY buckets
    * whose generation moved (generation equality IS content equality
    * on the add-only layout). The incremental-consumer primitive:
    * downstream jobs replay the feed instead of re-scanning the
    * table. Oracle derives the batch's exact content effects;
    * replay-composition and identical-row-upsert-is-no-change laws
    * live in MergeTableSpec. */
  val q290 = QuerySpec.sql(
    "q290_merge_changes",
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS k, epoch_us(ts) AS ts_us,
      |         CAST(user_id AS BIGINT) AS uid,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents
      |  FROM events)
      |SELECT 'update_postimage' AS change, k, ts_us, uid,
      |       value_cents + 5000 AS value_cents
      |FROM base WHERE k % 89 = 0
      |UNION ALL
      |SELECT 'update_preimage' AS change, k, ts_us, uid, value_cents
      |FROM base WHERE k % 89 = 0
      |UNION ALL
      |SELECT 'insert' AS change, k + 10000000000 AS k, ts_us, uid, value_cents
      |FROM base WHERE k % 97 = 0
      |UNION ALL
      |SELECT 'delete' AS change, k, ts_us, uid, value_cents
      |FROM base WHERE k % 83 = 0 AND k % 89 <> 0""",
    "merge-table change data feed: content delta between versions (lakehouse)") { (s, d) =>
    import graft.operators.MergeTable
    val ev = Tables.events(s, d).select(
      col("event_id").cast("long").as("k"),
      unix_micros(col("ts")).as("ts_us"),
      col("user_id").cast("long").as("uid"),
      graft.functions.ExactNum.scaled(col("value"), 100).as("value_cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q290").toString + "/t"
    MergeTable.create(ev, dir, "k", nBuckets = 16)
    MergeTable.merge(s, dir,
      ev.where(col("k") % 89 === 0)
        .withColumn("value_cents", col("value_cents") + 5000L)
        .unionByName(ev.where(col("k") % 97 === 0)
          .withColumn("k", col("k") + 10000000000L)),
      ev.where(col("k") % 83 === 0 && col("k") % 89 =!= 0).select("k"))
    MergeTable.changes(s, dir, 1, 2)
      .select("change", "k", "ts_us", "uid", "value_cents")
  }

  /** MATERIALIZED-VIEW MAINTENANCE over CDC — the full composition:
    * merge a change batch into the table ([[graft.operators
    * .MergeTable.merge]]), pull the four-mode change feed
    * ([[graft.operators.MergeTable.changes]]), fold it into signed
    * partial aggregates (+post −pre +insert −delete), and apply them
    * to the pre-merge view with [[graft.operators.MaterializedAgg
    * .applyDelta]]. The maintained view must equal a full recompute
    * over the post-merge state — the oracle does exactly that
    * recompute. Cost of the maintenance path ∝ |view| + |changed
    * data|, never table history; each piece is individually gated
    * (q280/q290/q252), this gate pins the composition. */
  val q291 = QuerySpec.sql(
    "q291_merge_view_maintenance",
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS k, CAST(user_id AS BIGINT) AS uid,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents
      |  FROM events),
      |state AS (
      |  SELECT k, uid,
      |         CASE WHEN k % 89 = 0 THEN value_cents + 5000 ELSE value_cents END AS value_cents
      |  FROM base WHERE NOT (k % 83 = 0 AND k % 89 <> 0)
      |  UNION ALL
      |  SELECT k + 10000000000 AS k, uid, value_cents FROM base WHERE k % 97 = 0)
      |SELECT uid, CAST(sum(value_cents) AS BIGINT) AS cents,
      |       count(*) AS n
      |FROM state GROUP BY 1""",
    "materialized-view maintenance: CDC merge -> change feed -> applyDelta == recompute") { (s, d) =>
    import graft.operators.{MaterializedAgg, MergeTable}
    val ev = Tables.events(s, d).select(
      col("event_id").cast("long").as("k"),
      col("user_id").cast("long").as("uid"),
      graft.functions.ExactNum.scaled(col("value"), 100).as("value_cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q291").toString + "/t"
    MergeTable.create(ev, dir, "k", nBuckets = 16)
    val view1 = ev.groupBy("uid")
      .agg(sum("value_cents").as("cents"), count(lit(1)).as("n"))
    MergeTable.merge(s, dir,
      ev.where(col("k") % 89 === 0)
        .withColumn("value_cents", col("value_cents") + 5000L)
        .unionByName(ev.where(col("k") % 97 === 0)
          .withColumn("k", col("k") + 10000000000L)),
      ev.where(col("k") % 83 === 0 && col("k") % 89 =!= 0).select("k"))
    val sgn = when(col("change").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = MergeTable.changes(s, dir, 1, 2)
      .groupBy("uid")
      .agg(sum(col("value_cents") * sgn).as("cents"), sum(sgn).as("n"))
    MaterializedAgg.applyDelta(view1, delta, Seq("uid"), Seq("cents", "n"))
      .where(col("n") =!= 0L)
  }

  /** SCHEMA EVOLUTION on the merge table: a CDC batch ADDS a column
    * (`evolveSchema = true` on [[graft.operators.MergeTable.merge]]).
    * The widened schema commits atomically with its manifest version
    * (a sentinel row carries the schema JSON), pre-evolution files
    * read the new column as NULL under the declared schema — no
    * mergeSchema footer sweep — and time travel still reads v1 under
    * its own narrower schema (laws in MergeTableSpec). The gate reads
    * the evolved end state; the oracle derives it with typed NULLs. */
  val q292 = QuerySpec.sql(
    "q292_merge_schema_evolution",
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS k, CAST(user_id AS BIGINT) AS uid,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents
      |  FROM events)
      |SELECT k, uid, value_cents, CAST(NULL AS VARCHAR) AS tag
      |FROM base WHERE NOT (k % 83 = 0 AND k % 89 <> 0) AND k % 89 <> 0
      |UNION ALL
      |SELECT k, uid, value_cents + 5000 AS value_cents, 'patched' AS tag
      |FROM base WHERE k % 89 = 0
      |UNION ALL
      |SELECT k + 10000000000 AS k, uid, value_cents, 'new' AS tag
      |FROM base WHERE k % 97 = 0""",
    "merge-table schema evolution: widened batch, NULL-filled history (lakehouse)") { (s, d) =>
    import graft.operators.MergeTable
    val ev = Tables.events(s, d).select(
      col("event_id").cast("long").as("k"),
      col("user_id").cast("long").as("uid"),
      graft.functions.ExactNum.scaled(col("value"), 100).as("value_cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q292").toString + "/t"
    MergeTable.create(ev, dir, "k", nBuckets = 16)
    MergeTable.merge(s, dir,
      ev.where(col("k") % 89 === 0)
        .withColumn("value_cents", col("value_cents") + 5000L)
        .withColumn("tag", lit("patched"))
        .unionByName(ev.where(col("k") % 97 === 0)
          .withColumn("k", col("k") + 10000000000L)
          .withColumn("tag", lit("new"))),
      ev.where(col("k") % 83 === 0 && col("k") % 89 =!= 0).select("k"),
      evolveSchema = true)
    MergeTable.read(s, dir)
  }

  /** MERGE-ON-READ + COMPACTION ([[graft.operators.MergeTable
    * .mergeOnRead]]): two CDC batches land as per-bucket DELTA files
    * (deletes as key-only tombstones) with write cost ∝ THE BATCH —
    * the trickle-upsert path where copy-on-write would rewrite whole
    * buckets (the O(delta)-not-O(bucket) byte law is pinned in
    * MergeTableSpec). Reads fold base + chain per key (latest
    * generation wins); [[graft.operators.MergeTable.compact]] then
    * folds the chains back into a fresh base generation. The gate
    * reads the SAME folded state twice — through the fold ('m') and
    * after compaction ('c') — so fold and compact must agree exactly;
    * the oracle derives that state relationally (batch 2's updates
    * supersede batch 1's). */
  val q293 = QuerySpec.sql(
    "q293_merge_mor_compact",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |state AS (
      |  SELECT k, ck, cents FROM base WHERE k % 97 <> 0 AND k % 101 <> 0
      |  UNION ALL
      |  SELECT k, ck, cents + 2000000 AS cents FROM base WHERE k % 97 = 0
      |  UNION ALL
      |  SELECT k + 10000000000 AS k, ck, cents FROM base WHERE k % 103 = 0)
      |SELECT 'm' AS tag, k, ck, cents FROM state
      |UNION ALL
      |SELECT 'c' AS tag, k, ck, cents FROM state""",
    "merge-on-read CDC deltas: O(batch) writes, folded reads, compaction (lakehouse)") { (s, d) =>
    import graft.operators.MergeTable
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q293").toString + "/t"
    MergeTable.create(base, dir, "k", nBuckets = 16)
    MergeTable.mergeOnRead(s, dir,
      base.where(col("k") % 97 === 0).withColumn("cents", col("cents") + 1000000L),
      base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0).select("k"))
    MergeTable.mergeOnRead(s, dir,
      base.where(col("k") % 97 === 0).withColumn("cents", col("cents") + 2000000L)
        .unionByName(base.where(col("k") % 103 === 0)
          .withColumn("k", col("k") + 10000000000L)),
      base.limit(0).select("k"))
    val folded = MergeTable.read(s, dir).withColumn("tag", lit("m"))
    MergeTable.compact(s, dir)
    folded.unionByName(MergeTable.read(s, dir).withColumn("tag", lit("c")))
      .select("tag", "k", "ck", "cents")
  }

  /** OPTIMISTIC MULTI-WRITER COMMIT: two merges PLAN from the same
    * manifest snapshot; the first commits normally, the second loses
    * the manifest rename-CAS and re-arbitrates — re-pointing at the
    * new head when its buckets are disjoint (the merges commute) or
    * re-planning against it when they overlap (sequential
    * semantics; the commute/serialize/orphan laws live in
    * MergeTableSpec). Here the batches overlap on keys divisible by
    * both moduli, so the loser's values win exactly where the oracle
    * says they must. The reference serializes every stage through
    * its Makefile (bin/BenchmarkDatabaseCreation.pl runs alone);
    * the engine lets concurrent writers land and arbitrates. */
  val q294 = QuerySpec.sql(
    "q294_merge_multiwriter",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT k, ck,
      |       CASE WHEN k % 89 = 0 THEN cents + 777
      |            WHEN k % 97 = 0 THEN cents + 1000000
      |            ELSE cents END AS cents
      |FROM base""",
    "optimistic multi-writer merge: stale-planned loser re-arbitrates via the manifest CAS") { (s, d) =>
    import graft.operators.MergeTable
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q294").toString + "/t"
    MergeTable.create(base, dir, "k", nBuckets = 16)
    val noDel = base.limit(0).select("k")
    // writer A commits first; writer B planned against the SAME v1
    // snapshot and must win arbitration (apply after A)
    MergeTable.mergeFrom(s, dir,
      base.where(col("k") % 97 === 0).withColumn("cents", col("cents") + 1000000L),
      noDel, evolveSchema = false, baseV = 1, mor = false)
    MergeTable.mergeFrom(s, dir,
      base.where(col("k") % 89 === 0).withColumn("cents", col("cents") + 777L),
      noDel, evolveSchema = false, baseV = 1, mor = false)
    MergeTable.read(s, dir)
  }

  /** VACUUM RETENTION HORIZON ([[graft.operators.MergeTable.vacuum]]
    * with `retainLast`): after three commits, retain the last two —
    * both stay fully readable (time travel and the change feed keep
    * their contract inside the horizon) while v1's files and
    * manifest are reclaimed; reads past the horizon fail loudly
    * (foreclosure laws in MergeTableSpec). The gate reads both
    * retained versions back tagged; the oracle derives each state. */
  val q295 = QuerySpec.sql(
    "q295_merge_vacuum_retention",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |s1 AS (
      |  SELECT k, ck, CASE WHEN k % 97 = 0 THEN cents + 1000000 ELSE cents END AS cents
      |  FROM base WHERE NOT (k % 101 = 0 AND k % 97 <> 0))
      |SELECT 2 AS v, k, ck, cents FROM s1
      |UNION ALL
      |SELECT 3 AS v, k, ck, cents FROM s1
      |UNION ALL
      |SELECT 3 AS v, k + 10000000000 AS k, ck, cents FROM base WHERE k % 103 = 0""",
    "vacuum retention horizon: last-n versions stay readable, older reclaimed (lakehouse)") { (s, d) =>
    import graft.operators.MergeTable
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q295").toString + "/t"
    MergeTable.create(base, dir, "k", nBuckets = 16)
    MergeTable.merge(s, dir,
      base.where(col("k") % 97 === 0).withColumn("cents", col("cents") + 1000000L),
      base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0).select("k"))
    MergeTable.merge(s, dir,
      base.where(col("k") % 103 === 0).withColumn("k", col("k") + 10000000000L),
      base.limit(0).select("k"))
    MergeTable.vacuum(s, dir, retainLast = 2)
    MergeTable.versions(s, dir).map(v =>
        MergeTable.readAt(s, dir, v).withColumn("v", lit(v)))
      .reduce(_ unionByName _).select("v", "k", "ck", "cents")
  }

  /** Streaming CDC apply through MERGE-ON-READ — q282's workload on
    * the delta path ([[graft.streaming.StreamOps.runMergeStream]]
    * with `mergeOnRead = true`): each micro-batch lands as per-bucket
    * delta files (write cost ∝ the batch — the fit for trickle CDC,
    * where a copy-on-write apply would rewrite touched buckets whole
    * per micro-batch), and the read folds base + chains. Exactly-once
    * content by the same replay argument (a replayed delta appends
    * identical content; latest-wins folds it away). The oracle is
    * q282's folded end state verbatim — the two apply modes must be
    * content-indistinguishable. */
  val q297 = QuerySpec.sql(
    "q297_merge_stream_mor",
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS ck,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT k, ck, cents FROM base WHERE k % 97 <> 0 AND k % 101 <> 0
      |UNION ALL
      |SELECT k, ck, cents + 2000000 AS cents FROM base WHERE k % 97 = 0
      |UNION ALL
      |SELECT k + 10000000000 AS k, ck, cents FROM base WHERE k % 103 = 0""",
    "streaming CDC apply via merge-on-read deltas: O(batch) micro-batch writes (lakehouse)") { (s, d) =>
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("ck"),
      graft.functions.ExactNum.scaled(col("o_totalprice"), 100).as("cents"))
    val root = java.nio.file.Files.createTempDirectory("graft-q297").toString
    val dir = s"$root/t"
    graft.operators.MergeTable.create(base, dir, "k", nBuckets = 16)
    val src = new java.io.File(root, "src"); src.mkdirs()
    val b0 = base.where(col("k") % 97 === 0)
      .withColumn("cents", col("cents") + 1000000L).withColumn("op", lit("u"))
      .unionByName(base.where(col("k") % 101 === 0 && col("k") % 97 =!= 0)
        .withColumn("op", lit("d")))
    val b1 = base.where(col("k") % 97 === 0)
      .withColumn("cents", col("cents") + 2000000L).withColumn("op", lit("u"))
      .unionByName(base.where(col("k") % 103 === 0)
        .withColumn("k", col("k") + 10000000000L).withColumn("op", lit("u")))
    Seq(b0, b1).zipWithIndex.foreach { case (df, b) =>
      val tmp = s"$root/tmp$b"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, f"b$b%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + b * 60000L)
    }
    graft.streaming.StreamOps.runMergeStream(s, src.toString, dir,
      s"$root/ckpt", "k", mergeOnRead = true)
  }

  /** The lakehouse family: merge-table lifecycle + zone-map gates.
    * Declared apart so [[graft.SparkEntry.benchSpecs]] can run them
    * at the battery TAIL — each builds real tables/sidecars and
    * streams micro-batches (heavy I/O + temp churn), and when they
    * ran mid-battery their heat inflated the iterative families
    * downstream by 10-30% with untouched code (round-11 closing
    * batteries; same mechanism as the corpus family move in r9). */
  val lakehouse: Seq[QuerySpec] =
    Seq(q280, q282, q283, q284, q285, q287, q288, q289, q290, q291, q292,
      q293, q294, q295, q297)

  val all: Seq[QuerySpec] =
    Seq(q44, q45, q46, q47, q48, q49, q79, q80, q121, q131, q146, q195, q196,
      q202, q210, q216, q220, q230, q231) ++ lakehouse
}
