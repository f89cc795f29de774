package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative graph construction — the one-job replacement for the
  * reference's row-at-a-time REST upsert pipeline (SURVEY §3.1;
  * reference bin/BenchmarkDatabaseCreation.pl:103-175 does per-row
  * node lookups and a linear scan of the phage's out-edges per
  * insert). Here the whole build is: sanitize → per-evidence collapse
  * → n-way full-outer join on (phage,bacteria) → id assignment. The
  * "merge property onto existing edge" upsert IS the full-outer join.
  *
  * Scale: each evidence table aggregates partially before its shuffle;
  * the n-way join shuffles on the same (phage,bacteria) key so AQE
  * coalesces to one exchange per side; node-id assignment is a
  * hash-dedup, not a sequence (no driver bottleneck, no barrier).
  */
object GraphBuild {

  /** F1 — the canonical name sanitizer applied before EVERY graph
    * write in the reference (bin/BenchmarkDatabaseCreation.pl:99-101:
    * `s/[^A-Z^a-z^0-9^\t]+/_/g`). */
  def sanitizeName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "[^A-Za-z0-9\t]+", "_")

  /** Stable 64-bit node id from the sanitized name — deterministic
    * across partitionings and runs (no monotonically_increasing_id,
    * which bakes partition layout into the ids). */
  def nodeId(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(name)

  /** Build the infection-evidence graph.
    *
    * Evidence inputs all have shape (bacteria, phage, score) except
    * `interactions` which is (phage, bacteria, flag) — the reference's
    * flipped validation-set order (FIXTURES.md §1). Collapse rules
    * follow the reference: min bit score for prophage/blast
    * (bin/iteratePredictedRelationships.R:30-34), mean for gene-level
    * blastx/pfam (bin/CollapseGeneScores.R:38), max %id for CRISPR.
    *
    * @return PropertyGraph with nodes(id,name,kind) and
    *         edges(src,dst,relType,interaction,crispr,blast,blastx,pfam)
    */
  def fromEvidence(
      crispr: DataFrame, prophage: DataFrame, blastx: DataFrame,
      pfam: DataFrame, interactions: DataFrame): PropertyGraph = {

    def norm(df: DataFrame, flip: Boolean, tag: String): DataFrame = {
      val Seq(c0, c1, c2) = df.columns.toSeq.take(3).map(col)
      val (phage, bact) = if (flip) (c0, c1) else (c1, c0)
      df.select(sanitizeName(phage).as("phage"), sanitizeName(bact).as("bacteria"),
        c2.cast("double").as("score"), lit(tag).as("ev"))
    }
    // The conceptual op is a 5-way full-outer join on (phage, bacteria)
    // (the reference's property-merge upsert); the physical strategy is
    // a tagged union + ONE conditional aggregation — same result, one
    // shuffle instead of five shuffles + four join exchanges.
    def evOnly(tag: String) = when(col("ev") === tag, col("score"))
    val tagged = Seq(
      norm(crispr, flip = false, "crispr"),
      norm(prophage, flip = false, "blast"),
      norm(blastx, flip = false, "blastx"),
      norm(pfam, flip = false, "pfam"),
      norm(interactions, flip = true, "interaction"))
      .reduce(_ unionByName _)
    val merged = tagged.groupBy("phage", "bacteria").agg(
        max(evOnly("crispr")).as("crispr"),
        min(evOnly("blast")).as("blast"),
        avg(evOnly("blastx")).as("blastx"),
        avg(evOnly("pfam")).as("pfam"),
        (max(evOnly("interaction")) > 0).as("interaction"))
      .na.fill(0.0, Seq("crispr", "blast", "blastx", "pfam"))

    val phages = merged.select(col("phage").as("name")).distinct()
      .withColumn("kind", lit("Phage"))
    val bacteria = merged.select(col("bacteria").as("name")).distinct()
      .withColumn("kind", lit("Bacterial_Host"))
    val nodes = phages.unionByName(bacteria)
      .select(nodeId(col("name")).as("id"), col("name"), col("kind"))

    val edges = merged.select(
      nodeId(col("phage")).as("src"), nodeId(col("bacteria")).as("dst"),
      lit("Infects").as("relType"),
      coalesce(col("interaction"), lit(false)).as("interaction"),
      col("crispr"), col("blast"), col("blastx"), col("pfam"))

    PropertyGraph(nodes, edges)
  }

  /** §1.3 metadata star: the reference exploded one wide metadata row
    * into 5 node kinds + 5 edge types purely because Neo4j wanted it
    * (bin/Metadata2graph.pl:95-208); in Spark the sample dimensions
    * stay one table and the abundance relation is the only edge set.
    *
    * @param abundance (contig, count, sampleId) long-format table
    *                  (reference bin/calculate_abundance_from_sam.pl)
    * @param metadata  wide sample table (FIXTURES.md §3)
    */
  def sampleGraph(abundance: DataFrame, metadata: DataFrame): (DataFrame, DataFrame) = {
    val samples = metadata // dimension table as-is, typed columns
    val sampled = abundance.select(
      sanitizeName(col(abundance.columns(2))).as("sampleId"),
      nodeId(sanitizeName(col(abundance.columns(0)))).as("nodeId"),
      col(abundance.columns(1)).cast("long").as("abundance"))
      .groupBy("sampleId", "nodeId").agg(sum("abundance").as("abundance"))
    (sampled, samples)
  }

  /** Adapter: a property graph over the driver test tables, used by
    * the motif queries in the correctness gate. Kinds: Customer,
    * Supplier, Part; rels: ordered (customer→part via orders+lineitem,
    * weight = total quantity) and supplies (supplier→part).
    *
    * Five gate queries (q50/q51/q52/q57/q58) share this derived graph;
    * round-1 profiling showed each rebuilding the lineitem⋈orders +
    * groupBy aggregates from parquet (q52 spent 9 s on a degree
    * count). One build + persist per (session, dir) — via [[graft.Memo]],
    * keyed on sessionUUID and evicted at application end — amortizes
    * that to a single pair of shuffles. */
  def tpchGraph(spark: SparkSession, dir: String): PropertyGraph = {
    lazy val built = buildTpchGraph(spark, dir)
    PropertyGraph(
      graft.Memo.df(spark, "tpchGraph.nodes", dir)(built.nodes),
      graft.Memo.df(spark, "tpchGraph.edges", dir)(built.edges))
  }

  private def buildTpchGraph(spark: SparkSession, dir: String): PropertyGraph = {
    import graft.Tables
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)

    def idOf(kind: String, naturalKey: org.apache.spark.sql.Column) =
      xxhash64(lit(kind), naturalKey)

    val customers = Tables.customer(spark, dir).select(
      idOf("C", col("c_custkey")).as("id"), col("c_name").as("name"),
      lit("Customer").as("kind"), col("c_custkey").cast("long").as("key"))
    val suppliers = Tables.supplier(spark, dir).select(
      idOf("S", col("s_suppkey")).as("id"), col("s_name").as("name"),
      lit("Supplier").as("kind"), col("s_suppkey").cast("long").as("key"))
    val parts = Tables.part(spark, dir).select(
      idOf("P", col("p_partkey")).as("id"), col("p_name").as("name"),
      lit("Part").as("kind"), col("p_partkey").cast("long").as("key"))
    val nodes = customers.unionByName(suppliers).unionByName(parts)

    val ordered = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("weight"))
      .select(idOf("C", col("o_custkey")).as("src"), idOf("P", col("l_partkey")).as("dst"),
        lit("ordered").as("relType"), col("weight"))
    val supplies = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("weight"))
      .select(idOf("S", col("l_suppkey")).as("src"), idOf("P", col("l_partkey")).as("dst"),
        lit("supplies").as("relType"), col("weight"))

    PropertyGraph(nodes, ordered.unionByName(supplies))
  }
}
