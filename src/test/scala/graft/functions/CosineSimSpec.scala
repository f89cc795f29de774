package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  test("native expression matches the composed zip_with/aggregate formula bit-for-bit") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .where(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(
        CosineSim(col("a.v"), col("b.v")).as("native"),
        Similarity.cosineComposed(col("a.v"), col("b.v")).as("composed"))
    assert(pairs.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("codegen path: runs inside WholeStageCodegen and handles edge cases") {
    // exchange-free plan so AQE doesn't wrap it pre-execution; the
    // `*(n)` prefix marks WholeStageCodegen participation
    val plan = vecs.select(CosineSim(col("v"), col("v")).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan.take(500))
    import spark.implicits._
    val edge = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),    // zero vector → 0.0, not NaN
      (Array(1.0, 2.0), Array(1.0, 2.0, 9.9)) // length mismatch → min-length prefix
    ).toDF("a", "b").select(CosineSim(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(edge(0) == 0.0)
    assert(math.abs(edge(1) - 1.0) > 0.0 || edge(1) <= 1.0) // finite, defined
  }

  test("cosine_sim callable from SQL once registered") {
    // what GraftExtensions.injectFunction installs at session build
    // time, applied to the live session's registry for the test
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1)), "built-in")
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("minhash_sig callable from SQL once registered") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(children(0),
          children(1).eval().asInstanceOf[Number].intValue()), "built-in")
    val r = spark.sql(
      "SELECT minhash_sig(array('a', 'b'), 4) AS s").head.getSeq[Long](0)
    assert(r.length == 4)
    // equals the builtin xxhash64 fold min over the two tokens
    val expect = spark.sql(
      """SELECT array(least(xxhash64(0, 'a'), xxhash64(0, 'b')),
        |             least(xxhash64(1, 'a'), xxhash64(1, 'b')),
        |             least(xxhash64(2, 'a'), xxhash64(2, 'b')),
        |             least(xxhash64(3, 'a'), xxhash64(3, 'b'))) AS s""".stripMargin)
      .head.getSeq[Long](0)
    assert(r == expect)
  }

  test("l2_normalize_exact and zorder_key resolve from SQL via GraftExtensions, == the Column API (round-11)") {
    // SparkSpec's session carries GraftExtensions, so these resolve
    // with no manual registry poke — exactly what a SQL-only user gets
    val viaSql = Tables.embeddings(spark, sf).limit(50)
      .createOrReplaceTempView("emb_ext_spec")
    val sqlRows = spark.sql(
      """SELECT vec_id,
        |       l2_normalize_exact(transform(embedding, x -> CAST(x AS DOUBLE))) AS n,
        |       zorder_key(vec_id, CAST(label AS BIGINT), 12) AS z
        |FROM emb_ext_spec""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toList, r.getLong(2))).toMap
    val colRows = spark.table("emb_ext_spec")
      .select(col("vec_id"),
        Similarity.l2NormalizeExact(
          transform(col("embedding"), _.cast("double"))).as("n"),
        ZOrderKey(12, col("vec_id"), col("label").cast("long")).as("z"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toList, r.getLong(2))).toMap
    assert(sqlRows == colRows && sqlRows.nonEmpty,
      "SQL-registered kernels diverged from the Column API")
  }

  test("type check rejects non-array inputs") {
    import spark.implicits._
    val bad = Seq((1, 2)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(CosineSim(col("a"), col("b"))).collect()
    }
  }
}
