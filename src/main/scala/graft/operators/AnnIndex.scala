package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{PqModel, asDouble, codebookDf, explodeSubs, intL2,
  ivfTrain, nearestCentroid}

/** Persisted IVF-PQ approximate-nearest-neighbor index — the
  * production shape of embedding search at corpus scale, composing
  * the [[DedupIndex]] idea (materialize the corpus-side work once,
  * probe and append without rebuilding) with the [[Similarity]] PQ
  * tier:
  *
  *  - **coarse quantizer**: [[Similarity.ivfTrain]]'s deterministic
  *    centroids route every vector to an inverted list;
  *  - **codes**: [[Similarity.pqEncode]]'s integer code table —
  *    m small ints per vector instead of dim floats — written as
  *    parquet PARTITIONED BY the coarse bucket, so a probe's
  *    `cid IN (...)` filter is partition pruning: only the probed
  *    lists' files are ever opened (plan-audited in AnnIndexSpec);
  *  - **probe**: asymmetric-distance top-k over the pruned code
  *    scan — the per-query lookup table is built in-plan from the
  *    persisted codebook ([[Similarity.pqAdcTopK]]'s shape), raw
  *    corpus vectors are never read;
  *  - **append**: a new batch reads ONLY the tiny model tables
  *    (centroids + codebook), encodes itself, and appends its codes —
  *    earlier batches are untouched, the model stays frozen (the
  *    same frozen-generation contract as [[DedupIndex.append]]).
  *
  * Probing all buckets (`nProbe = nCentroids`) is bit-identical to
  * the in-memory [[Similarity.pqAdcTopK]] over the same model — the
  * exactness law AnnIndexSpec pins. Everything driver-side is
  * model-sized (nCentroids·dim + k·dim doubles); the corpus never
  * leaves the plan.
  */
object AnnIndex {

  private def centroidsPath(dir: String) = s"$dir/centroids"
  private def codebookPath(dir: String) = s"$dir/codebook"
  private def codesPath(dir: String) = s"$dir/codes"

  /** Nearest-centroid assignment by exact scaled L2 — the metric the
    * ADC stage ranks with (ties → smaller cid). */
  private def nearestByL2(v: org.apache.spark.sql.Column,
      cents: Array[(Int, Array[Double])]): org.apache.spark.sql.Column =
    array_min(transform(Similarity.centroidsLit(cents),
      c => struct(intL2(v, c.getField("vec")).as("d"),
        c.getField("cid").as("cid")))).getField("cid")

  /** Train coarse centroids + PQ codebooks on `corpus`, encode it,
    * and persist the index at `dir`: `centroids` (cid, vec),
    * `codebook` (m, code, cvec), `codes` (vid, codes) partitioned by
    * cid. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nCentroids: Int, m: Int, k: Int, refineIters: Int = 1): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val cents = ivfTrain(c, nCentroids, refineIters)
    val model = Similarity.pqTrain(corpus, idCol, vecCol, m, k, refineIters)
    cents.toSeq.map { case (cid, vec) => (cid, vec.toSeq) }
      .toDF("cid", "vec")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(dir))
    codebookDf(spark, model).withColumn("dim", lit(model.dim))
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(dir))
    writeCodes(corpus, idCol, vecCol, dir, cents, model, overwrite = true)
  }

  /** Encode a new batch under the index's FROZEN model and append its
    * codes — no earlier batch is read or rewritten. Batch vids must
    * be unique against everything already indexed. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val (cents, model) = readModel(batch.sparkSession, dir)
    writeCodes(batch, idCol, vecCol, dir, cents, model, overwrite = false)
  }

  private def writeCodes(batch: DataFrame, idCol: String, vecCol: String,
      dir: String, cents: Array[(Int, Array[Double])], model: PqModel,
      overwrite: Boolean): Unit = {
    val codes = Similarity.pqEncode(batch, idCol, vecCol, model)
    val cids = batch.select(col(idCol).as("vid"),
      nearestByL2(asDouble(col(vecCol)), cents).as("cid"))
    codes.join(cids, "vid")
      .write.partitionBy("cid")
      .mode(if (overwrite) "overwrite" else "append")
      .parquet(codesPath(dir))
  }

  /** The model tables — tiny by construction (centroids + codebook),
    * the ONLY thing probe/append read besides the probed code lists. */
  private[graft] def readModel(spark: SparkSession,
      dir: String): (Array[(Int, Array[Double])], PqModel) = {
    val cents = spark.read.parquet(centroidsPath(dir))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cbRows = spark.read.parquet(codebookPath(dir)).collect()
    val dim = cbRows.head.getInt(3)
    val m = cbRows.map(_.getInt(0)).max + 1
    val k = cbRows.map(_.getInt(1)).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach { r =>
      codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    (cents, PqModel(m, k, dim, codebooks))
  }

  /** ADC top-k against the persisted index: each query probes its
    * `nProbe` nearest inverted lists; the codes scan carries a
    * partition filter on exactly those cids, so unprobed lists'
    * files are never opened. Output: (query_id, rank, neighbor_id,
    * adc_dist) — [[Similarity.pqAdcTopK]]'s schema. */
  def probe(queries: DataFrame, idCol: String, vecCol: String,
      dir: String, nProbe: Int, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val (cents, model) = readModel(spark, dir)
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    // per-query probed lists (queries are small by contract; the
    // collected cid set sizes the partition filter, not the data)
    val probes = broadcast(q.select(col("query_id"),
      explode(slice(array_sort(transform(Similarity.centroidsLit(cents),
        c => struct(intL2(col("qv"), c.getField("vec")).as("d"),
          c.getField("cid").as("cid")))), 1, nProbe).getField("cid"))
        .as("cid")))
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getInt(0)).sorted
    val codes = spark.read.parquet(codesPath(dir))
      .where(col("cid").isin(probedCids.map(Integer.valueOf): _*))
    val cb = broadcast(codebookDf(spark, model))
    val lut = broadcast(q
      .select(col("query_id"), explodeSubs(col("qv"), model.m, model.sub))
      .join(cb, Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        intL2(col("sv"), col("cvec")).as("d")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    codes.join(probes, Seq("cid"))
      .where(col("query_id") =!= col("vid"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(lut, Seq("query_id", "m", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("d")).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adc_dist"))
  }
}
