package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M13 — genome binning: cluster sequences on k-mer frequency
  * composition (the CONCOCT slice — reference Makefile:328-353 caps at
  * 500 clusters over 4-mer + coabundance features). Feature build is
  * pure Column algebra (no UDF): one codegen'd `regexp_count` per
  * k-mer for small k.
  */
object KmerBinning {

  private val Bases = Seq("A", "C", "G", "T")

  def kmers(k: Int): Seq[String] =
    (1 until k).foldLeft(Bases)((acc, _) => acc.flatMap(p => Bases.map(p + _)))

  /** Per-sequence k-mer frequency columns, length-normalized.
    * Overlapping occurrences counted via lookahead. */
  def kmerFeatures(seqs: DataFrame, seqCol: String, k: Int = 2): DataFrame = {
    val len = greatest(length(col(seqCol)) - (k - 1), lit(1)).cast("double")
    kmers(k).foldLeft(seqs) { (df, km) =>
      df.withColumn(s"kmer_$km",
        regexp_count(col(seqCol), lit(s"(?=$km)")).cast("double") / len)
    }
  }

  /** Cluster into at most `maxClusters` bins (seeded). Returns the
    * input plus a `bin` column. */
  def bin(seqs: DataFrame, seqCol: String, k: Int = 2, maxClusters: Int = 8,
      seed: Long = 42L): DataFrame = {
    val feats = kmerFeatures(seqs, seqCol, k)
    val cols = kmers(k).map(km => s"kmer_$km")
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features")
      .transform(feats)
    val model = new KMeans().setK(maxClusters).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("bin")
      .fit(assembled)
    model.transform(assembled).drop("features")
  }
}
