package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Stochastic operators in the gate. Three evidence tiers: xxhash64-
  * keyed forms are deterministic but Spark-private, so rows-only
  * (q63-q65) or output-pinned (q85/q86); the md5-portable forms
  * (q101/q102/q107/q109) let the DuckDB oracle RECOMPUTE every
  * sampling decision per row.
  */
object SamplingQueries {

  /** R1 — rarefaction to equal depth per group, output-pinned (the
    * q85/q130 idiom): [[Sampling.rarefy]] is deterministic under any
    * partitioning (per-group RNG seeded by (seed, group), items
    * sorted before the sequential hypergeometric draws), so the gate
    * emits a per-group DIGEST of the full rarefied table — item
    * count, drawn depth, and an order-independent xxhash64 content
    * checksum over every (item, count) row — and the oracle pins the
    * sf0.01 values. The md5-portable twin q111 stays the derived
    * (recomputable) oracle for the rarefaction arithmetic itself. */
  val q63 = QuerySpec.sql(
    "q63_rarefaction",
    PinnedOracles.q63,
    "seeded multivariate-hypergeometric rarefaction, digest-pinned (SURVEY R1)") { (s, d) =>
    val ab = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("group"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("long")).as("count"))
    Sampling.rarefy(ab, depth = 1000, seed = 42)
      .groupBy("group")
      .agg(count(lit(1)).as("n_items"), sum("count").as("depth_drawn"),
        bit_xor(xxhash64(col("item"), col("count"))).as("content_hash"))
  }

  /** R2/R5 — hash-deterministic stratified sampling, output-pinned:
    * xxhash64 keep-decisions are partition-independent constants of
    * the data, so the 3-row per-flag census pins directly (q85
    * idiom); q101 is the md5-portable derived-oracle twin. */
  val q64 = QuerySpec.sql(
    "q64_stratified_sample",
    PinnedOracles.q64,
    "deterministic stratified fraction sample, output-pinned (SURVEY R2,R5)") { (s, d) =>
    Sampling.stratifiedSample(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"), fraction = 0.1, seed = 42)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_sampled"))
  }

  /** R6 — seeded random fragments, output-pinned via a one-row digest
    * (doc count, total fragment length, order-independent xxhash64
    * content checksum over every (doc_id, fragment) pair — any
    * changed byte in any fragment moves it); q102 is the md5-portable
    * twin whose oracle RECOMPUTES each substring. */
  val q65 = QuerySpec.sql(
    "q65_random_fragment",
    PinnedOracles.q65,
    "seeded random substring fragments, digest-pinned (SURVEY R6)") { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
        Sampling.randomFragment(col("text"), col("doc_id"), 0.5, 42).as("fragment"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("fragment")).cast("long")).as("total_len"),
        bit_xor(xxhash64(col("doc_id"), col("fragment"))).as("content_hash"))
  }

  /** R4 — seeded permutation, hash-oracled: the permuted order of the
    * fixed 25-row nation table under seed 11 is a constant (xxhash64
    * is partition-independent), so a VALUES literal pins the exact
    * shuffle order the way igraph's set.seed pins the reference's.
    * DuckDB cannot recompute xxhash64, but it doesn't need to — the
    * oracle asserts the OUTPUT, which is what determinism promises. */
  val q85 = QuerySpec.sql(
    "q85_permutation",
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT),'NATION_17'),(CAST(2 AS BIGINT),'NATION_12'),
      |  (CAST(3 AS BIGINT),'NATION_16'),(CAST(4 AS BIGINT),'NATION_6'),
      |  (CAST(5 AS BIGINT),'NATION_22'),(CAST(6 AS BIGINT),'NATION_18'),
      |  (CAST(7 AS BIGINT),'NATION_9'),(CAST(8 AS BIGINT),'NATION_19'),
      |  (CAST(9 AS BIGINT),'NATION_10'),(CAST(10 AS BIGINT),'NATION_5'),
      |  (CAST(11 AS BIGINT),'NATION_2'),(CAST(12 AS BIGINT),'NATION_3'),
      |  (CAST(13 AS BIGINT),'NATION_21'),(CAST(14 AS BIGINT),'NATION_1'),
      |  (CAST(15 AS BIGINT),'NATION_11'),(CAST(16 AS BIGINT),'NATION_14'),
      |  (CAST(17 AS BIGINT),'NATION_0'),(CAST(18 AS BIGINT),'NATION_15'),
      |  (CAST(19 AS BIGINT),'NATION_7'),(CAST(20 AS BIGINT),'NATION_20'),
      |  (CAST(21 AS BIGINT),'NATION_24'),(CAST(22 AS BIGINT),'NATION_23'),
      |  (CAST(23 AS BIGINT),'NATION_13'),(CAST(24 AS BIGINT),'NATION_4'),
      |  (CAST(25 AS BIGINT),'NATION_8')
      |) AS t(position, n_name)""",
    "seeded permutation pinned by output (SURVEY R4)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Sampling.permuted(Tables.nation(s, d).select("n_name"), Seq("n_name"), seed = 11L)
      .withColumn("position", row_number().over(
        Window.orderBy(xxhash64(lit(11L), col("n_name")))).cast("long"))
      .select(col("position"), col("n_name"))
  }

  /** R3 — seeded column subsample, hash-oracled the same way: the
    * chosen half of lineitem's 16 columns under seed 11 is a
    * constant; the gate emits the choice as rows. */
  val q86 = QuerySpec.sql(
    "q86_column_subsample",
    """SELECT * FROM (VALUES
      |  ('l_discount'),('l_extendedprice'),('l_orderkey'),
      |  ('l_shipdate'),('l_suppkey'),('l_tax')
      |) AS t(column_name)""",
    "seeded column subsample pinned by output (SURVEY R3)") { (s, d) =>
    val spark = s
    import spark.implicits._
    Sampling.sampleColumns(Tables.lineitem(s, d).columns.toSeq, 0.5, 11L)
      .toDF("column_name")
  }

  /** R2/R5, hash-oracled: the portable stratified sampler's keep
    * decision derives from md5 (identical hex in every engine), so the
    * DuckDB oracle RECOMPUTES the per-row decision rather than
    * pinning outputs — a strictly stronger gate than q85/q86's VALUES
    * pinning, and it scales with SF instead of fixing one table.
    * fraction 0.1 ⇒ keep iff first-8-hex-of-md5 < ⌊0.1·2³²⌋. */
  val q101 = QuerySpec.sql(
    "q101_stratified_portable",
    """SELECT l_returnflag, count(*) AS n_sampled
      |FROM lineitem
      |WHERE ('0x' || substr(md5('42|' || CAST(l_orderkey AS VARCHAR) || '|' ||
      |                           CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
      |      < 429496729
      |GROUP BY l_returnflag""",
    "portable stratified sample, oracle recomputes decision (SURVEY R2,R5)") { (s, d) =>
    Sampling.stratifiedSamplePortable(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"), fraction = 0.1, seed = 42)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_sampled"))
  }

  /** R6, hash-oracled: fragment offsets replay from md5 via exact
    * integer mod, so DuckDB recomputes every substring. */
  val q102 = QuerySpec.sql(
    "q102_fragment_portable",
    """SELECT doc_id,
      |  substring(text,
      |    CAST(('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |         % greatest(length(text)
      |                    - greatest(CAST(floor(length(text) * CAST(0.5 AS DOUBLE)) AS INT), 1)
      |                    + 1, 1) + 1 AS INT),
      |    greatest(CAST(floor(length(text) * CAST(0.5 AS DOUBLE)) AS INT), 1)) AS fragment
      |FROM documents""",
    "portable random fragment, oracle recomputes offsets (SURVEY R6)") { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      Sampling.randomFragmentPortable(col("text"), col("doc_id"), 0.5, 42)
        .as("fragment"))
  }

  /** Beyond-reference — pretraining mixture weighting: per-source keep
    * rates (the "web 0.25×, books 1×" rebalance), md5-portable so the
    * oracle recomputes each decision. Emits per-source survivor
    * counts; sources outside the rate map use the default rate. */
  val q107 = QuerySpec.sql(
    "q107_mixture_sample",
    """SELECT source, count(*) AS n_sampled
      |FROM documents
      |WHERE ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      < CASE source WHEN 'src0' THEN 1073741824
      |                    WHEN 'src1' THEN 4294967296
      |                    WHEN 'src2' THEN 0
      |                    ELSE 2147483648 END
      |GROUP BY source""",
    "per-source mixture sampling, oracle recomputes decisions (beyond-reference)") { (s, d) =>
    Sampling.mixtureSamplePortable(Tables.documents(s, d), "source",
        Seq("doc_id"),
        rates = Map("src0" -> 0.25, "src1" -> 1.0, "src2" -> 0.0),
        default = 0.5, seed = 42)
      .groupBy("source").agg(count(lit(1)).as("n_sampled"))
  }

  /** Beyond-reference — fixed-size per-stratum sampling: exactly k
    * docs per source (eval-set carving, where fraction samplers can't
    * bound the size), ranked by the portable md5 uniform so the
    * oracle replays the selection. */
  val q109 = QuerySpec.sql(
    "q109_fixed_size_sample",
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
      |                    doc_id) AS rk
      |  FROM documents)
      |SELECT source, doc_id FROM ranked WHERE rk <= 5""",
    "exactly-k-per-source portable sample (beyond-reference)") { (s, d) =>
    Sampling.fixedSizeSamplePortable(Tables.documents(s, d), "source",
        Seq("doc_id"), k = 5, seed = 42)
      .select("source", "doc_id")
  }

  /** R1, hash-oracled twin: proportional (largest-remainder)
    * rarefaction — the deterministic expected-value form of q63's
    * hypergeometric draw, pure integer arithmetic so DuckDB replays
    * every apportionment decision. Same abundance input as q63. */
  val q111 = QuerySpec.sql(
    "q111_rarefy_proportional",
    """WITH ab AS (
      |  SELECT CAST(l_returnflag AS VARCHAR) AS grp,
      |         CAST(l_partkey AS VARCHAR) AS item,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT grp, item, cnt,
      |         sum(cnt) OVER (PARTITION BY grp) AS total
      |  FROM ab),
      |f AS (
      |  SELECT grp, item, cnt, total,
      |         (1000 * cnt) // total AS base,
      |         1000 * cnt - ((1000 * cnt) // total) * total AS rem
      |  FROM t WHERE total >= 1000),
      |r AS (
      |  SELECT grp, item, base, rem,
      |         1000 - sum(base) OVER (PARTITION BY grp) AS leftover,
      |         row_number() OVER (PARTITION BY grp ORDER BY rem DESC, item) AS rk
      |  FROM f)
      |SELECT grp AS "group", item,
      |       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS count
      |FROM r
      |WHERE base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END > 0""",
    "largest-remainder proportional rarefaction, oracle replays apportionment (SURVEY R1)") { (s, d) =>
    val ab = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("group"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("long")).as("count"))
    Sampling.rarefyProportional(ab, depth = 1000)
  }

  /** M12 output-pinned (q85 idiom): the rarefaction curve's richness
    * values are seeded, sort-canonicalized, partition-independent
    * INTEGERS (one multivariate-hypergeometric draw per group×depth),
    * so the sf0.01 curve pins as a VALUES oracle — regression evidence
    * for the whole curve path, complementing q111's expected-value
    * twin. Reference bin/OpfRarefaction.R:12-16. */
  val q137 = QuerySpec.sql(
    "q137_rarefaction_curve",
    """SELECT * FROM (VALUES
      |  ('N', CAST(772 AS BIGINT), CAST(1000 AS BIGINT)),
      |  ('R', CAST(758 AS BIGINT), CAST(1000 AS BIGINT)),
      |  ('A', CAST(787 AS BIGINT), CAST(1000 AS BIGINT)),
      |  ('N', CAST(1770 AS BIGINT), CAST(5000 AS BIGINT)),
      |  ('R', CAST(1757 AS BIGINT), CAST(5000 AS BIGINT)),
      |  ('A', CAST(1756 AS BIGINT), CAST(5000 AS BIGINT)),
      |  ('N', CAST(1995 AS BIGINT), CAST(20000 AS BIGINT)),
      |  ('R', CAST(1991 AS BIGINT), CAST(20000 AS BIGINT)),
      |  ('A', CAST(1988 AS BIGINT), CAST(20000 AS BIGINT))
      |) AS t("group", richness, depth)""",
    "output-pinned seeded rarefaction curve (SURVEY M12)") { (s, d) =>
    val ab = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("group"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("long")).as("count"))
    Sampling.rarefactionCurve(ab, depths = Seq(1000L, 5000L, 20000L), seed = 42)
  }

  /** Portable stratified k-fold assignment (SURVEY M2's fold
    * structure), hash-oracled: rows rank within their stratum by the
    * md5-portable uniform and fold = (rank−1) mod k — per-stratum fold
    * sizes differ by ≤ 1 (the guarantee hash-mod-k sampling lacks),
    * and DuckDB replays every assignment. The gate emits the
    * (stratum, fold) census; the balance property is visible in the
    * hashed output itself. */
  val q172 = QuerySpec.sql(
    "q172_kfold_portable",
    """WITH f AS (
      |  SELECT c_mktsegment,
      |         (row_number() OVER (
      |            PARTITION BY c_mktsegment
      |            ORDER BY ('0x' || substr(md5('13|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT,
      |                     c_custkey) - 1) % 5 AS fold
      |  FROM customer)
      |SELECT c_mktsegment, CAST(fold AS INT) AS fold, count(*) AS n
      |FROM f GROUP BY 1, 2""",
    "portable stratified k-fold split, oracle replays every assignment (SURVEY M2/R5)") { (s, d) =>
    Sampling.kfoldPortable(Tables.customer(s, d), "c_mktsegment",
        Seq("c_custkey"), k = 5, seed = 13)
      .groupBy(col("c_mktsegment"), col("fold"))
      .agg(count(lit(1)).as("n"))
  }

  /** Bootstrap confidence interval for the per-source mean doc length —
    * the uncertainty quantification a corpus-curation dashboard puts
    * next to every point estimate. Fully md5-portable: resample b's
    * slot i draws the doc at rank (md5(seed|source|b|i) mod n)+1, so
    * the oracle replays every draw; resample means are ONE IEEE
    * division of an exact BIGINT sum, and the CI bounds are
    * rank-SELECTED resample means (2.5%/97.5%), never float-summed.
    * Scale: the resample table is |rows|×B keyed by (source, rank) —
    * a co-partitioned equi-join against the ranked docs, then two
    * tiny windows over |sources|×B means. */
  val q179 = QuerySpec.sql(
    "q179_bootstrap_ci",
    """WITH docs AS (
      |  SELECT source, CAST(n_chars AS BIGINT) AS score,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
      |         count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |slots AS (
      |  SELECT d.source, d.n, tb.b, d.rn AS i,
      |         ('0x' || substr(md5('7|' || d.source || '|' || CAST(tb.b AS VARCHAR)
      |                         || '|' || CAST(d.rn AS VARCHAR)), 1, 8))::BIGINT % d.n + 1 AS idx
      |  FROM docs d, unnest(generate_series(1, 64)) AS tb(b)),
      |means AS (
      |  SELECT s.source, s.b,
      |         CAST(sum(d.score) AS DOUBLE) / any_value(s.n) AS m
      |  FROM slots s JOIN docs d ON d.source = s.source AND d.rn = s.idx
      |  GROUP BY s.source, s.b),
      |rk AS (
      |  SELECT source, m,
      |         row_number() OVER (PARTITION BY source ORDER BY m, b) AS r
      |  FROM means),
      |obs AS (
      |  SELECT source, CAST(sum(score) AS DOUBLE) / count(*) AS mean_obs,
      |         count(*) AS n_docs
      |  FROM docs GROUP BY source)
      |SELECT obs.source, n_docs, mean_obs,
      |       max(CASE WHEN r = 2 THEN m END) AS ci_lo,
      |       max(CASE WHEN r = 63 THEN m END) AS ci_hi
      |FROM rk JOIN obs USING (source)
      |GROUP BY obs.source, n_docs, mean_obs""",
    "md5-portable bootstrap CI for per-source mean doc length (statistics tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy("source")
    val docs = Tables.documents(s, d)
      .select(col("source"), col("n_chars").cast("long").as("score"), col("doc_id"))
      .withColumn("rn", row_number().over(bySrc.orderBy(col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bySrc))
    val slots = docs
      .select(col("source"), col("n"), col("rn").as("i"),
        explode(sequence(lit(1), lit(64))).as("b"))
      .withColumn("idx",
        pmod(Sampling.md5Bits32(7, col("source"), col("b"), col("i")), col("n")) + 1)
    val means = slots
      .join(docs.select(col("source"), col("rn").as("idx"), col("score")),
        Seq("source", "idx"))
      .groupBy("source", "b")
      .agg((sum(col("score")).cast("double") / first(col("n"))).as("m"))
    val rk = means.withColumn("r",
      row_number().over(bySrc.orderBy(col("m"), col("b"))))
    val obs = docs.groupBy("source")
      .agg((sum(col("score")).cast("double") / count(lit(1))).as("mean_obs"),
        count(lit(1)).as("n_docs"))
    rk.join(obs, "source")
      .groupBy(col("source"), col("n_docs"), col("mean_obs"))
      .agg(max(when(col("r") === 2, col("m"))).as("ci_lo"),
        max(when(col("r") === 63, col("m"))).as("ci_hi"))
  }

  /** Weighted priority sampling — the balance-biased eval-set carve
    * (sample big accounts more often) with every draw replayable:
    * priority = md5-uniform / max(weight, 1), k smallest per stratum
    * ([[Sampling.weightedSamplePortable]]). */
  val q182 = QuerySpec.sql(
    "q182_weighted_sample",
    """WITH p AS (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |         CAST(('0x' || substr(md5('21|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
      |         / greatest(CAST(c_acctbal AS DOUBLE), 1.0) AS priority
      |  FROM customer),
      |rk AS (
      |  SELECT c_mktsegment, c_custkey, c_acctbal, priority,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY priority, c_custkey) AS r
      |  FROM p)
      |SELECT c_mktsegment, c_custkey, c_acctbal, priority
      |FROM rk WHERE r <= 10""",
    "md5-portable weighted priority sample per segment (sampling tier)") { (s, d) =>
    Sampling.weightedSamplePortable(
      Tables.customer(s, d).select("c_mktsegment", "c_custkey", "c_acctbal"),
      "c_mktsegment", Seq("c_custkey"), "c_acctbal", k = 10, seed = 21)
  }

  /** Temporal train/eval split — the leakage-safe cutoff for models
    * over event data: everything at-or-before the global 80th-
    * percentile instant trains, everything after evaluates. The
    * cutoff is rank-SELECTED under the total order (ts, event_id) —
    * exact and engine-replayable, via the range-partitioned
    * [[graft.operators.GlobalRank]] (a parallel sort + offset sum,
    * never one task). An even cheaper 100 TB path derives the cutoff
    * from a sampled/sketched quantile instead (q192's note) — the
    * split semantics downstream are unchanged. Output counts per
    * (split, event_type) plus the user overlap that leakage analyses
    * start from. */
  val q206 = QuerySpec.sql(
    "q206_temporal_split",
    """WITH rk AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         row_number() OVER (ORDER BY ts, event_id) AS r,
      |         count(*) OVER () AS n
      |  FROM events),
      |cut AS (SELECT ts AS cts, event_id AS cid FROM rk
      |        WHERE r = (4 * n + 4) // 5),
      |lab AS (
      |  SELECT user_id, event_type,
      |         CASE WHEN ts < cts OR (ts = cts AND event_id <= cid)
      |              THEN 'train' ELSE 'eval' END AS split
      |  FROM rk, cut)
      |SELECT split, event_type, count(*) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM lab GROUP BY 1, 2""",
    "temporal 80/20 train-eval split at a rank-selected cutoff (ML data tier)") { (s, d) =>
    import graft.operators.GlobalRank
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    // the 80th-percentile cutoff row is rank-SELECTED via the range-
    // partitioned global rank (no whole-fact-table single-task
    // window); labeling then needs only the broadcast 1-row cutoff —
    // the fact table itself is never ranked twice
    val ranked = GlobalRank.withRank(base.select(col("ts"), col("event_id")),
      Seq(col("ts"), col("event_id")), "__rk", "__n")
    val cut = ranked.where(col("__rk") === expr("(4 * __n + 4) DIV 5"))
      .select(col("ts").as("cts"), col("event_id").as("cid"))
    base.crossJoin(broadcast(cut))
      .select(col("user_id"), col("event_type"),
        when(col("ts") < col("cts") ||
          (col("ts") === col("cts") && col("event_id") <= col("cid")), "train")
          .otherwise("eval").as("split"))
      .groupBy("split", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
  }

  /** Deterministic negative sampling — the contrastive-pair generator
    * for link prediction / recommendation training: 4 pseudo-random
    * candidate suppliers per customer from the md5 idiom (every draw
    * replayable in SQL), minus the true interactions (anti-join on
    * the observed customer→supplier pairs). Scale shape: candidates
    * are |customers|×k rows generated scan-side (no cross join
    * anywhere); the anti-join shuffles (custkey, suppkey) ids only.
    * Contiguous TPC-H suppkeys [1..S] make the index→key map free;
    * for non-contiguous keys the documented path is a zipWithIndex
    * dimension table joined the same way. */
  val q207 = QuerySpec.sql(
    "q207_negative_sampling",
    """WITH ns AS (SELECT count(*) AS n FROM supplier),
      |cand AS (
      |  SELECT c_custkey, slot,
      |         1 + (('0x' || substr(md5('neg|' || CAST(c_custkey AS VARCHAR) || '|' || CAST(slot AS VARCHAR)), 1, 8))::BIGINT
      |              % (SELECT n FROM ns)) AS s_suppkey
      |  FROM customer, unnest(generate_series(0, 3)) AS u(slot))
      |SELECT c.c_custkey, CAST(c.slot AS BIGINT) AS slot,
      |       CAST(c.s_suppkey AS BIGINT) AS s_suppkey
      |FROM cand c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_custkey = c.c_custkey AND l.l_suppkey = c.s_suppkey)""",
    "md5-replayable negative pairs minus observed interactions (contrastive tier)") { (s, d) =>
    val nSupp = Tables.supplier(s, d).count()
    val cand = Tables.customer(s, d)
      .select(col("c_custkey"), explode(array((0 until 4).map(lit(_)): _*)).as("slot"))
      .select(col("c_custkey"), col("slot").cast("long").as("slot"),
        (graft.functions.HexSlice32(
          md5(concat(lit("neg|"), col("c_custkey").cast("string"),
            lit("|"), col("slot").cast("string"))), lit(0)) % nSupp + 1)
          .as("s_suppkey"))
    val pos = Tables.orders(s, d).join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c_custkey"), col("l_suppkey").as("s_suppkey"))
      .distinct()
    cand.join(pos, Seq("c_custkey", "s_suppkey"), "left_anti")
      .select(col("c_custkey"), col("slot"), col("s_suppkey"))
  }

  val all: Seq[QuerySpec] =
    Seq(q63, q64, q65, q85, q86, q101, q102, q107, q109, q111, q137, q172,
      q179, q182, q206, q207)
}
