package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Sketches
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Event-stream processing in the gate: windowed aggregation with a
  * relational oracle, batch sessionization with a window-function
  * oracle, and the streaming engine itself driven to completion over
  * the same bounded input (parity with q60's oracle).
  */
object EventQueries {

  val q60 = QuerySpec.sql(
    "q60_windowed_agg",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n_events,
      |       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
      |FROM events GROUP BY 1, 2""",
    "tumbling-window event aggregation, batch plan") { (s, d) =>
    StreamOps.windowedCounts(Tables.events(s, d), "1 hour")
  }

  val q61 = QuerySpec.sql(
    "q61_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events,
      |       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
      |FROM sessions GROUP BY user_id, session_seq""",
    "gap-based sessionization, batch window plan") { (s, d) =>
    StreamOps.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
  }

  /** Runs the real Structured Streaming engine (memory sink) over the
    * bounded events table; oracle = the same SQL as q60, proving
    * batch/stream parity. */
  val q62 = QuerySpec.sql(
    "q62_stream_parity",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n_events,
      |       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
      |FROM events GROUP BY 1, 2""",
    "Structured Streaming windowed agg == batch oracle") { (s, d) =>
    StreamOps.runWindowedStream(s, d, "1 hour")
  }

  /** Runs a REAL stream-stream interval join (two watermarked
    * unbounded sources, equi-key + event-time range) to completion;
    * oracle = the equivalent relational interval join, proving the
    * streaming plan computes the batch answer. */
  val q88 = QuerySpec.sql(
    "q88_stream_stream_join",
    """SELECT c.event_id AS from_id, c.user_id, c.ts AS from_ts,
      |       p.event_id AS to_id, p.ts AS to_ts
      |FROM events c JOIN events p
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""",
    "stream-stream watermarked interval join == batch oracle") { (s, d) =>
    StreamOps.attributionJoinStream(s, d, "click", "purchase", horizonMinutes = 30)
  }

  /** Runs the REAL streaming dedup operator
    * (dropDuplicatesWithinWatermark) to completion over the bounded
    * events table; with the horizon past the table's time range the
    * emitted key set is exactly DISTINCT, so the relational oracle
    * hash-gates the streaming state machinery. */
  val q105 = QuerySpec.sql(
    "q105_stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    "streaming watermarked dedup == batch DISTINCT oracle") { (s, d) =>
    StreamOps.runDedupStream(s, d, Seq("user_id", "event_type"))
  }

  /** As-of join (point-in-time correctness): each click is attributed
    * the LATEST purchase at-or-before its timestamp per user — the
    * union+window form (one shuffle, |left| output rows), not a range
    * join. The ANSI window oracle replays the identical total order
    * (ts, side, event_id), hash-gating the operator end-to-end. */
  val q106 = QuerySpec.sql(
    "q106_asof_join",
    """WITH u AS (
      |  SELECT user_id, ts, event_id, 1 AS is_l, CAST(NULL AS BIGINT) AS p
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, 0 AS is_l, event_id AS p
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT user_id, ts, event_id, is_l,
      |         last_value(p IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY ts, is_l, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_purchase_id
      |  FROM u)
      |SELECT event_id, user_id, ts, prior_purchase_id FROM w WHERE is_l = 1""",
    "as-of join: latest purchase at-or-before each click (beyond-reference)") { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    graft.operators.AsofJoin.asofJoin(clicks, purchases,
      key = "user_id", ts = "ts", ord = "event_id", payload = "event_id",
      outCol = "prior_purchase_id")
  }

  /** Runs the REAL stateful sessionizer (flatMapGroupsWithState) to
    * completion; the oracle is q61's window SQL projected to the
    * exact columns (session boundaries + counts — `sum_value` is
    * arrival-order float accumulation, not oracle-replayable). */
  val q108 = QuerySpec.sql(
    "q108_stream_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events
      |FROM sessions GROUP BY user_id, session_seq""",
    "stateful streaming sessionization == batch window oracle") { (s, d) =>
    StreamOps.runSessionizeStream(s, d, gapMinutes = 30)
  }

  /** Datetime scalar family (F-extension): component extraction,
    * truncation, and interval arithmetic — the portable subset (no
    * day-of-week: Spark counts 1=Sunday, DuckDB 0=Sunday). */
  val q124 = QuerySpec.sql(
    "q124_datetime_functions",
    """SELECT event_id,
      |       CAST(year(ts) AS INT) AS y,
      |       CAST(month(ts) AS INT) AS mo,
      |       CAST(day(ts) AS INT) AS dom,
      |       CAST(hour(ts) AS INT) AS h,
      |       date_trunc('day', ts) AS day_start,
      |       ts + INTERVAL 90 MINUTE AS ts_plus
      |FROM events WHERE event_id % 100 = 0""",
    "datetime extraction/trunc/interval arithmetic (scalar family)") { (s, d) =>
    Tables.events(s, d)
      .where(pmod(col("event_id"), lit(100)) === 0)
      .select(col("event_id"),
        year(col("ts")).as("y"), month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("h"),
        date_trunc("day", col("ts")).as("day_start"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("ts_plus"))
  }

  /** Semi-structured column handling: the events table carries a JSON
    * `props` string — extract a typed field and aggregate it, the
    * schema-on-read path every log pipeline needs. Spark
    * get_json_object and DuckDB json_extract_string agree on the
    * string value; the integer cast and sums are exact. */
  val q127 = QuerySpec.sql(
    "q127_json_extract",
    """SELECT event_type,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) AS n
      |FROM events GROUP BY event_type""",
    "JSON field extraction + typed aggregate (semi-structured)") { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
  }

  /** Runs a REAL stream-static broadcast enrichment join (unbounded
    * events × bounded customer dim — stateless, no state store) to
    * completion, then aggregates per segment; oracle = the equivalent
    * relational join+agg, proving the streaming enrichment computes
    * the batch answer. */
  val q142 = QuerySpec.sql(
    "q142_stream_enrich",
    """SELECT c_mktsegment, count(*) AS n_events,
      |       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1""",
    "stream-static broadcast enrichment == batch join oracle") { (s, d) =>
    StreamOps.enrichStream(s, d)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
  }

  /** Runs the checkpointed parquet FILE-sink ingestion (the
    * production landing path — exactly-once via source-offset WAL +
    * sink metadata log) to completion, re-reads what landed, and
    * aggregates it; oracle = the same aggregate over the original
    * events, proving the landed files carry exactly the input rows. */
  val q143 = QuerySpec.sql(
    "q143_stream_file_sink",
    """SELECT event_type, count(*) AS n_events,
      |       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
      |FROM events GROUP BY 1""",
    "checkpointed file-sink ingestion lands exactly the input") { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft-q143")
    StreamOps.runIngestToParquet(s, d, s"$tmp/out", s"$tmp/ckpt")
    s.read.parquet(s"$tmp/out")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
  }

  /** Count-Min cells maintained by the streaming engine (Complete-
    * mode agg, state = the d·w cells); oracle rebuilds the identical
    * sketch relationally via the md5-slice twin — stream, batch, and
    * external engine all agree cell-for-cell. */
  val q145 = QuerySpec.sql(
    "q145_stream_sketch",
    s"""WITH hr AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(r))
      |SELECT r, ${graft.operators.Sketches.bucketSqlTwin(42, 64, "r", "user_id")} AS b,
      |       count(*) AS cnt
      |FROM events CROSS JOIN hr GROUP BY 1, 2""".stripMargin,
    "streaming-maintained Count-Min sketch == relational rebuild") { (s, d) =>
    StreamOps.runSketchStream(s, d, 4, 64, seed = 42)
  }

  /** q145's quantile twin: the streaming engine maintains a
    * fixed-domain histogram (state = 256 longs for any stream length),
    * hashed cell-for-cell against the relational rebuild — see
    * [[graft.streaming.StreamOps.runHistogramStream]] and
    * [[graft.operators.Sketches.histogramCells]]; q247 gates the
    * quantile interpolation this state feeds. */
  val q251 = QuerySpec.sql(
    "q251_stream_histogram",
    """WITH v AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v FROM events)
      |SELECT CAST(least(255, greatest(0, (v * 256) // 100000)) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM v GROUP BY 1""",
    "streaming-maintained fixed-domain histogram == relational rebuild") { (s, d) =>
    StreamOps.runHistogramStream(s, d, lo = 0L, hi = 99999L, nBuckets = 256)
  }

  /** q251 at the q259 guarantee: the streaming engine maintains the
    * q-DIGEST node-count state (Complete-mode aggregate, < 2^17 cells
    * for levels = 16 — bounded by the declared domain, never the
    * stream), and the on-demand quantile read compresses + picks over
    * the maintained table ([[graft.streaming.StreamOps
    * .runQdigestStream]]). RANK-error-bounded percentiles on a live
    * stream — what equi-width cells (q251) cannot promise on heavy-
    * tailed values. DuckDB replays build + compression + pick
    * hash-exact. */
  val q263 = QuerySpec.sql(
    "q263_stream_qdigest",
    """WITH v AS (
      |  SELECT least(CAST(65535 AS BIGINT), greatest(CAST(0 AS BIGINT),
      |           CAST(round(value * 100, 0) AS BIGINT))) AS leaf
      |  FROM events),
      |b AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |counts AS (
      |  SELECT l AS lvl, leaf >> l AS id, CAST(count(*) AS BIGINT) AS cnt
      |  FROM v, unnest(generate_series(0, 16)) AS g(l) GROUP BY 1, 2),
      |kept AS (
      |  SELECT lvl, id, cnt FROM counts CROSS JOIN b
      |  WHERE cnt >= greatest(1, n // 1024)),
      |childmass AS (
      |  SELECT lvl + 1 AS lvl, id // 2 AS id, CAST(sum(cnt) AS BIGINT) AS child_cnt
      |  FROM kept WHERE lvl < 16 GROUP BY 1, 2),
      |entries AS (
      |  SELECT k.lvl, k.id, k.cnt - coalesce(c.child_cnt, 0) AS mass
      |  FROM kept k LEFT JOIN childmass c USING (lvl, id)
      |  WHERE k.cnt - coalesce(c.child_cnt, 0) > 0),
      |ordered AS (
      |  SELECT lvl, (id + 1) * (CAST(1 AS BIGINT) << lvl) - 1 AS range_end, mass,
      |         CAST(sum(mass) OVER (
      |           ORDER BY (id + 1) * (CAST(1 AS BIGINT) << lvl) - 1, lvl)
      |           AS BIGINT) AS cum
      |  FROM entries),
      |q AS (SELECT CAST(unnest([1, 25, 50, 75, 99]) AS BIGINT) AS q_pct),
      |t AS (SELECT q_pct, n, greatest(1, (n * q_pct + 99) // 100) AS target_rank
      |      FROM q CROSS JOIN b),
      |pick AS (
      |  SELECT t.q_pct, t.n, t.target_rank, o.lvl, o.range_end,
      |         row_number() OVER (PARTITION BY t.q_pct
      |                            ORDER BY o.range_end, o.lvl) AS rn
      |  FROM t JOIN ordered o ON o.cum >= t.target_rank)
      |SELECT q_pct, n, CAST(target_rank AS BIGINT) AS target_rank,
      |       CAST(lvl AS BIGINT) AS lvl,
      |       CAST(least(range_end, 65535) AS BIGINT) AS est
      |FROM pick WHERE rn = 1""",
    "streaming-maintained q-digest: rank-error quantiles on a live stream") { (s, d) =>
    StreamOps.runQdigestStream(s, d, loVal = 0L, levels = 16, k = 1024,
      percents = Seq(1, 25, 50, 75, 99))
  }

  /** q263 PER KEY — the round-9 verdict's named composition: q261's
    * grouped q-digest build maintained by the live streaming engine
    * (Complete-mode (grp, lvl, id) counts, state bounded by keys ×
    * domain nodes, never stream length), quantile reads through the
    * SHARED [[graft.operators.Sketches.qdigestFromCountsByKey]] —
    * per-event-type rank-error percentiles, the per-service latency
    * monitoring shape. DuckDB replays build + compression + pick
    * hash-exact per key; StreamOpsSpec pins the maintained state
    * table itself against the batch count table. Reference analog:
    * per-group 5th-percentile cutoffs, bin/CompareSkin.R:55,59. */
  val q266 = QuerySpec.sql(
    "q266_stream_qdigest_by_key",
    """WITH v AS (
      |  SELECT event_type AS grp,
      |         least(CAST(65535 AS BIGINT), greatest(CAST(0 AS BIGINT),
      |           CAST(round(value * 100, 0) AS BIGINT))) AS leaf
      |  FROM events),
      |b AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |counts AS (
      |  SELECT grp, l AS lvl, leaf >> l AS id, CAST(count(*) AS BIGINT) AS cnt
      |  FROM v, unnest(generate_series(0, 16)) AS g(l) GROUP BY 1, 2, 3),
      |kept AS (
      |  SELECT c.grp, lvl, id, cnt FROM counts c JOIN b USING (grp)
      |  WHERE cnt >= greatest(1, n // 256)),
      |childmass AS (
      |  SELECT grp, lvl + 1 AS lvl, id // 2 AS id,
      |         CAST(sum(cnt) AS BIGINT) AS child_cnt
      |  FROM kept WHERE lvl < 16 GROUP BY 1, 2, 3),
      |entries AS (
      |  SELECT k.grp, k.lvl, k.id, k.cnt - coalesce(c.child_cnt, 0) AS mass
      |  FROM kept k LEFT JOIN childmass c USING (grp, lvl, id)
      |  WHERE k.cnt - coalesce(c.child_cnt, 0) > 0),
      |ordered AS (
      |  SELECT grp, lvl, (id + 1) * (CAST(1 AS BIGINT) << lvl) - 1 AS range_end, mass,
      |         CAST(sum(mass) OVER (PARTITION BY grp
      |           ORDER BY (id + 1) * (CAST(1 AS BIGINT) << lvl) - 1, lvl)
      |           AS BIGINT) AS cum
      |  FROM entries),
      |q AS (SELECT CAST(unnest([25, 50, 75, 99]) AS BIGINT) AS q_pct),
      |t AS (SELECT grp, q_pct, n, greatest(1, (n * q_pct + 99) // 100) AS target_rank
      |      FROM q CROSS JOIN b),
      |pick AS (
      |  SELECT t.grp, t.q_pct, t.n, t.target_rank, o.lvl, o.range_end,
      |         row_number() OVER (PARTITION BY t.grp, t.q_pct
      |                            ORDER BY o.range_end, o.lvl) AS rn
      |  FROM t JOIN ordered o ON o.grp = t.grp AND o.cum >= t.target_rank)
      |SELECT grp, q_pct, n, CAST(target_rank AS BIGINT) AS target_rank,
      |       CAST(lvl AS BIGINT) AS lvl,
      |       CAST(least(range_end, 65535) AS BIGINT) AS est
      |FROM pick WHERE rn = 1""",
    "per-key streaming q-digest: rank-error percentiles per event type (monitoring)") { (s, d) =>
    StreamOps.runQdigestStreamByKey(s, d, "event_type", loVal = 0L,
      levels = 16, k = 256, percents = Seq(25, 50, 75, 99))
  }

  /** Ordered-funnel analysis: users who progressed view → click →
    * purchase with each stage STRICTLY after the previous one — the
    * product-analytics staple. Stage k is one filtered min-ts
    * aggregate joined to stage k−1 on user_id with a ts range
    * predicate, so every stage reuses the user_id hash partitioning
    * (one exchange, then co-partitioned joins); no window over the
    * whole event stream, no per-user sort. Strict `>` keeps ties
    * deterministic (min of equal timestamps is unique). */
  val q151 = QuerySpec.sql(
    "q151_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |      WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3
      |      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |      WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_view_click,
      |       (SELECT count(*) FROM p) AS n_full_funnel""",
    "ordered view->click->purchase funnel (event analytics)") { (s, d) =>
    val ev = Tables.events(s, d)
    def stage(typ: String, prev: org.apache.spark.sql.DataFrame,
        prevTs: String, outTs: String) =
      ev.where(col("event_type") === typ)
        .join(prev, Seq("user_id"))
        .where(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min(col("ts")).as(outTs))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = stage("click", v, "t1", "t2")
    val p = stage("purchase", c, "t2", "t3")
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Cohort retention matrix: users bucketed by the epoch-week of
    * their FIRST event, counted distinct in every later week they
    * were active. Weeks are pure integer epoch arithmetic
    * (floor(sec/604800)) — no calendar/timezone semantics to diverge
    * between engines. Two aggregates over the user_id partitioning
    * plus one co-partitioned join; the matrix is cohorts × horizon,
    * always tiny. */
  val q152 = QuerySpec.sql(
    "q152_cohort_retention",
    """WITH wk AS (
      |  SELECT user_id,
      |         CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
      |  FROM events),
      |cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)
      |SELECT cohort_week, week - cohort_week AS weeks_since,
      |       count(DISTINCT wk.user_id) AS n_users
      |FROM wk JOIN cohort ON wk.user_id = cohort.user_id
      |GROUP BY 1, 2""",
    "cohort retention by epoch week (event analytics)") { (s, d) =>
    val wk = Tables.events(s, d).select(col("user_id"),
      floor(col("ts").cast("long") / 604800).cast("long").as("week"))
    val cohort = wk.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    wk.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Robust per-type outlier detection on the metric stream: median /
    * MAD (median absolute deviation) with a 5·MAD fence — the
    * rank-based robust alternative to z-scores whose mean/σ a single
    * spike corrupts. Engine-exactness by construction: medians are
    * SELECTED values (lower median at rank ⌈n/2⌉ — ties share the
    * value, so unspecified peer order cannot change the result), the
    * deviation and fence are per-row IEEE ops, and NOTHING is summed —
    * no float-summation order dependence, no scaled-int overflow at
    * any corpus size. Scale: two rank windows and one count, all
    * partitioned by event_type. */
  val q165 = QuerySpec.sql(
    "q165_outlier_mad",
    """WITH v AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |rk AS (
      |  SELECT event_type, value,
      |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v),
      |med AS (
      |  SELECT event_type, value AS med
      |  FROM rk WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)),
      |dev AS (
      |  SELECT v.event_type, v.value, med, abs(v.value - med) AS d
      |  FROM v JOIN med USING (event_type)),
      |drk AS (
      |  SELECT event_type, value, med, d,
      |         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type, d AS mad
      |  FROM drk WHERE rn = CAST(ceil(n / 2.0) AS BIGINT))
      |SELECT dev.event_type, count(*) AS n, max(med) AS med, max(mad) AS mad,
      |       count(CASE WHEN dev.d > 5.0 * mad THEN 1 END) AS n_outliers
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY dev.event_type""",
    // a skewed event type at 100× makes the rank windows full-sort
    // stragglers — the documented fallback is
    // Sketches.approxOutlierFence (percentile_approx, sort-free, same
    // output schema), at the cost of hash-oracle-ability
    "median/MAD robust outlier fence per event type (event analytics)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, d).where(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val byType = Window.partitionBy("event_type")
    def lowerMedian(df: org.apache.spark.sql.DataFrame, ord: String, out: String) = df
      .withColumn("rn", row_number().over(byType.orderBy(col(ord))))
      .withColumn("n", count(lit(1)).over(byType))
      .where(col("rn") === ceil(col("n") / 2.0).cast("long"))
      .select(col("event_type"), col(ord).as(out))
    val med = lowerMedian(v, "value", "med")
    val dev = v.join(med, "event_type")
      .withColumn("d", abs(col("value") - col("med")))
    val mad = lowerMedian(dev.select(col("event_type"), col("d")), "d", "mad")
    dev.join(mad, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(when(col("d") > lit(5.0) * col("mad"), lit(1))).as("n_outliers"))
  }

  /** Sketch tier, heavy-hitter side: the Count-Min cells screen the
    * event stream for high-activity users as a PURE PROJECTION against
    * the broadcast-literal cells (the bloom idiom applied to
    * frequencies — zero shuffle on the screen), and the exact verify
    * aggregates only the survivors, so its shuffle is bounded by the
    * heavy keys' rows instead of |distinct users|. CM never
    * under-counts → every true heavy hitter survives (one-sided);
    * collision-inflated false positives appear with n_exact below the
    * fence, exactly as the operator contract documents. The md5 hash
    * rows are engine-portable, so DuckDB rebuilds the identical
    * sketch and replays every candidate verdict
    * ([[graft.operators.Sketches.heavyHitters]]). */
  val q169 = QuerySpec.sql(
    "q169_cm_heavy_hitters",
    s"""WITH keyed AS (
      |  SELECT CAST(user_id AS BIGINT) AS key FROM events
      |  WHERE user_id IS NOT NULL),
      |hr AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(r)),
      |cells AS (
      |  SELECT r, ${Sketches.bucketSqlTwin(9, 4096, "r", "key")} AS b,
      |         count(*) AS cnt
      |  FROM keyed CROSS JOIN hr GROUP BY 1, 2),
      |est AS (
      |  SELECT key, min(cnt) AS n_cm
      |  FROM (SELECT DISTINCT key FROM keyed) qk CROSS JOIN hr
      |  JOIN cells ON cells.r = hr.r
      |   AND cells.b = ${Sketches.bucketSqlTwin(9, 4096, "hr.r", "key")}
      |  GROUP BY key),
      |ex AS (SELECT key, count(*) AS n_exact FROM keyed GROUP BY key)
      |SELECT ex.key, n_exact, n_cm
      |FROM ex JOIN est USING (key) WHERE n_cm >= 85""".stripMargin,
    "Count-Min heavy-hitter screen + exact verify over event users (sketch tier)") { (s, d) =>
    Sketches.heavyHitters(
      Tables.events(s, d).where(col("user_id").isNotNull),
      col("user_id").cast("long"), threshold = 85L, d = 4, w = 4096, seed = 9L)
  }

  /** Event-path transition matrix — the Markov-chain view of user
    * journeys: per (event_type → next event_type) edge, the count and
    * the row-normalized transition probability. Order within a user
    * is (ts, event_id) — the q108 tie-break, so concurrent events
    * sequence identically in every engine; the probability is ONE
    * IEEE division of exact counts. Scale: one window per user (one
    * exchange on user_id) + one grouped count — no self-join; the
    * matrix is |event_type|² rows regardless of data size. */
  val q171 = QuerySpec.sql(
    "q171_event_transitions",
    """WITH seq AS (
      |  SELECT event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |t AS (
      |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(n) AS row_n FROM t GROUP BY 1)
      |SELECT t.from_type, t.to_type, n AS n_transitions,
      |       CAST(n AS DOUBLE) / row_n AS p
      |FROM t JOIN tot USING (from_type)""",
    "per-user event-type transition counts + row-normalized Markov matrix (event analytics)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val t = Tables.events(s, d)
      .select(col("event_type"), lead(col("event_type"), 1).over(byUser).as("next_type"))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = t.groupBy("from_type").agg(sum(col("n")).as("row_n"))
    t.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n").as("n_transitions"),
        (col("n").cast("double") / col("row_n")).as("p"))
  }

  /** Linear multi-touch attribution — every view/click in the 7 days
    * before a purchase shares the conversion credit equally. The
    * fractional credit 1/k is NOT float-summed (order-dependence):
    * each touch gets ⌊10⁶/k⌋ parts-per-million by INTEGER division,
    * so the per-channel totals are exact BIGINTs any engine replays.
    * Scale: the touch↔conversion pairing is an equi-join on user_id
    * with a time-range predicate (co-partitioned, never cartesian),
    * the per-conversion k is one window over that join's user_id
    * partitioning, and the final rollup is |channels| rows. */
  val q175 = QuerySpec.sql(
    "q175_attribution",
    """WITH conv AS (
      |  SELECT event_id AS conv_id, user_id, ts AS conv_ts FROM events
      |  WHERE event_type = 'purchase'),
      |touch AS (
      |  SELECT event_id AS touch_id, user_id, event_type AS channel, ts
      |  FROM events WHERE event_type IN ('view', 'click')),
      |paired AS (
      |  SELECT conv_id, touch_id, channel,
      |         count(*) OVER (PARTITION BY conv_id) AS k
      |  FROM conv JOIN touch ON conv.user_id = touch.user_id
      |   AND touch.ts <= conv_ts AND touch.ts > conv_ts - INTERVAL 7 DAY)
      |SELECT channel, count(*) AS n_touches,
      |       count(DISTINCT conv_id) AS n_conversions,
      |       CAST(sum(1000000 // k) AS BIGINT) AS credit_ppm
      |FROM paired GROUP BY channel""",
    "linear multi-touch attribution with exact ppm credit split (event analytics)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"), col("ts").as("conv_ts"))
    val touch = ev.where(col("event_type").isin("view", "click"))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("event_type").as("channel"), col("ts"))
    val paired = conv.join(touch, Seq("user_id"))
      .where(col("ts") <= col("conv_ts") &&
        col("ts") > col("conv_ts") - expr("INTERVAL 7 DAYS"))
      .withColumn("k", count(lit(1)).over(Window.partitionBy("conv_id")))
    paired.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct("conv_id").as("n_conversions"),
        sum(expr("CAST(1000000 AS BIGINT) DIV k")).as("credit_ppm"))
  }

  /** Rolling 7-day active users per day — the DAU/WAU engagement
    * metric. Days are pure integer epoch arithmetic (no calendar
    * drift); the day↔event pairing is a range join of the TINY
    * distinct-day table against the stream (at any scale |days| stays
    * calendar-bounded, so the build side broadcasts — and being a
    * no-equi-key BETWEEN join it is exactly the shape the
    * BinnedRangeJoinRule fuses engine-wide), then one distinct-count
    * per day. */
  val q180 = QuerySpec.sql(
    "q180_rolling_active",
    """WITH ev AS (
      |  SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ev)
      |SELECT days.day, count(DISTINCT ev.user_id) AS n_active_7d
      |FROM days JOIN ev ON ev.day BETWEEN days.day - 6 AND days.day
      |GROUP BY days.day""",
    "rolling 7-day active users per day (event analytics)") { (s, d) =>
    val ev = Tables.events(s, d)
      .select(floor(col("ts").cast("long") / 86400).cast("long").as("day"),
        col("user_id"))
    val days = ev.select(col("day").as("d0")).distinct()
    broadcast(days).join(ev,
        col("day") >= col("d0") - 6 && col("day") <= col("d0"))
      .groupBy(col("d0").as("day"))
      .agg(countDistinct("user_id").as("n_active_7d"))
  }

  /** OHLC bars — open/high/low/close/volume per (event_type, epoch
    * day), the time-series summarization every metrics store performs.
    * Open/close are rank-SELECTED values under the (ts, event_id)
    * total order (the q108 tie-break — no first_value ambiguity in
    * either engine); high/low/volume are exact. One window + one agg,
    * both on the (event_type, day) partitioning. */
  val q188 = QuerySpec.sql(
    "q188_ohlc_bars",
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
      |         ts, event_id, value
      |  FROM events WHERE value IS NOT NULL),
      |rk AS (
      |  SELECT event_type, day, value,
      |         row_number() OVER (PARTITION BY event_type, day
      |                            ORDER BY ts, event_id) AS rn_a,
      |         row_number() OVER (PARTITION BY event_type, day
      |                            ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM e)
      |SELECT event_type, day,
      |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |       max(value) AS high, min(value) AS low,
      |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
      |       count(*) AS volume
      |FROM rk GROUP BY event_type, day""",
    "OHLC/volume bars per event type and epoch day (time-series tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d).where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("ts").cast("long") / 86400).cast("long").as("day"),
        col("ts"), col("event_id"), col("value"))
    val w = Window.partitionBy("event_type", "day")
    val rk = e
      .withColumn("rn_a", row_number().over(w.orderBy(col("ts"), col("event_id"))))
      .withColumn("rn_d", row_number().over(
        w.orderBy(col("ts").desc, col("event_id").desc)))
    rk.groupBy("event_type", "day")
      .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("volume"))
  }

  /** Telemetry gap scan — per user, the count and maximum of
    * inter-event gaps above a 6 h threshold: the missing-data /
    * dead-sensor detector. Pure integer epoch arithmetic on one lead
    * window over the user_id partitioning. */
  val q189 = QuerySpec.sql(
    "q189_gap_scan",
    """WITH g AS (
      |  SELECT user_id,
      |         CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
      |                                         ORDER BY ts, event_id)))
      |              - floor(epoch(ts)) AS BIGINT) AS gap_s
      |  FROM events)
      |SELECT user_id, count(*) AS n_gaps,
      |       count(CASE WHEN gap_s > 21600 THEN 1 END) AS n_gaps_6h,
      |       max(gap_s) AS max_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY user_id""",
    "inter-event gap detection per user (data-quality tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"),
        (lead(col("ts").cast("long"), 1).over(w) - col("ts").cast("long"))
          .as("gap_s"))
      .where(col("gap_s").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        count(when(col("gap_s") > 21600, lit(1))).as("n_gaps_6h"),
        max(col("gap_s")).as("max_gap_s"))
  }

  /** Time-weighted average value per event type (TWAP): each reading
    * holds until the next one, so the mean weights each value by its
    * holding time. Engine-exact: values scale to BIGINT cents, the
    * weighted mass Σ(cents·seconds) is an exact integer sum, and the
    * ONE division at the end un-scales. The order-dependent float
    * accumulation a naive avg-of-samples gets wrong under irregular
    * sampling. */
  val q190 = QuerySpec.sql(
    "q190_twap",
    """WITH seg AS (
      |  SELECT event_type,
      |         CAST(round(value * 100, 0) AS BIGINT) AS cents,
      |         CAST(floor(epoch(lead(ts) OVER (PARTITION BY event_type
      |                                         ORDER BY ts, event_id)))
      |              - floor(epoch(ts)) AS BIGINT) AS dt
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type,
      |       CAST(sum(cents * dt) AS BIGINT) AS mass_cent_s,
      |       CAST(sum(dt) AS BIGINT) AS total_s,
      |       CAST(sum(cents * dt) AS DOUBLE) / (100.0 * sum(dt)) AS twap
      |FROM seg WHERE dt IS NOT NULL AND dt > 0
      |GROUP BY event_type""",
    "time-weighted average value per event type, exact-scaled (time-series tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val seg = Tables.events(s, d).where(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        (lead(col("ts").cast("long"), 1).over(w) - col("ts").cast("long"))
          .as("dt"))
      .where(col("dt").isNotNull && col("dt") > 0)
    seg.groupBy("event_type")
      .agg(sum(col("cents") * col("dt")).as("mass_cent_s"),
        sum(col("dt")).as("total_s"),
        (sum(col("cents") * col("dt")).cast("double") /
          (lit(100.0) * sum(col("dt")))).as("twap"))
  }

  /** RFM segmentation — recency/frequency/monetary quintiles per
    * user, the classic behavioral-cohort assignment. All three raw
    * features are exact integers (epoch-day recency, event count,
    * summed cents) and each quintile is ntile(5) under a fully
    * tie-broken total order (feature, user_id) — deterministic in any
    * engine, no float anywhere. One grouped pass + three range-
    * partitioned [[graft.operators.GlobalRank]] passes over the
    * |users|-sized feature table (the oracle keeps NTILE SQL — the
    * semantics; the engine avoids its one-task execution). */
  val q193 = QuerySpec.sql(
    "q193_rfm",
    """WITH f AS (
      |  SELECT user_id,
      |         max(CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)) AS last_day,
      |         count(*) AS freq,
      |         CAST(coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)), 0) AS BIGINT) AS mon_cents
      |  FROM events GROUP BY user_id),
      |mx AS (SELECT max(last_day) AS maxday FROM f),
      |s AS (
      |  SELECT user_id, maxday - last_day AS recency_days, freq, mon_cents,
      |         ntile(5) OVER (ORDER BY maxday - last_day, user_id) AS r,
      |         ntile(5) OVER (ORDER BY freq DESC, user_id) AS fq,
      |         ntile(5) OVER (ORDER BY mon_cents DESC, user_id) AS m
      |  FROM f CROSS JOIN mx)
      |SELECT user_id, recency_days, freq, mon_cents,
      |       CAST(r AS INT) AS r, CAST(fq AS INT) AS f,
      |       CAST(m AS INT) AS m,
      |       CAST(r * 100 + fq * 10 + m AS INT) AS segment
      |FROM s""",
    "RFM quintile segmentation per user, integer-exact (event analytics)") { (s, d) =>
    import graft.operators.GlobalRank
    val f = Tables.events(s, d).groupBy("user_id")
      .agg(max(floor(col("ts").cast("long") / 86400).cast("long")).as("last_day"),
        count(lit(1)).as("freq"),
        coalesce(sum(round(col("value") * 100, 0).cast("long")), lit(0L))
          .as("mon_cents"))
    val mx = f.agg(max(col("last_day")).as("maxday"))
    val st0 = f.crossJoin(broadcast(mx))
      .withColumn("recency_days", col("maxday") - col("last_day"))
    // three quintiles = three INDEPENDENT range-partitioned global
    // ranks, each over a skinny (user_id, feature) projection of the
    // feature table, joined back on user_id — not three sequential
    // single-task unpartitioned windows, and not NESTED rank passes
    // (nesting re-plans the whole upstream inside each stats branch;
    // factoring keeps every rank's input one shared aggregate)
    def quintile(out: String, feature: String,
        asc: Boolean): org.apache.spark.sql.DataFrame =
      GlobalRank.withRank(st0.select(col("user_id"), col(feature)),
          Seq(if (asc) col(feature) else col(feature).desc, col("user_id")),
          "__rk", "__n")
        .select(col("user_id"),
          GlobalRank.ntileFromRank("__rk", "__n", 5).as(out))
    val st = st0
      .join(quintile("r", "recency_days", asc = true), "user_id")
      .join(quintile("fq", "freq", asc = false), "user_id")
      .join(quintile("m", "mon_cents", asc = false), "user_id")
    st.select(col("user_id"), col("recency_days"), col("freq"), col("mon_cents"),
      col("r").cast("int").as("r"), col("fq").cast("int").as("f"),
      col("m").cast("int").as("m"),
      (col("r") * 100 + col("fq") * 10 + col("m")).cast("int").as("segment"))
  }

  /** Burst detection — per event type, the maximum event count inside
    * ANY trailing 1-hour window (the rate-spike detector a fixed
    * tumbling window misses when a burst straddles the boundary).
    * A RANGE frame over integer epoch seconds counts each event's
    * trailing hour exactly; everything is integer, and the argmax
    * window end is rank-selected (max count, earliest second) so the
    * output is tie-deterministic. One exchange on event_type. */
  val q198 = QuerySpec.sql(
    "q198_burst_detection",
    """WITH e AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |w AS (
      |  SELECT event_type, sec,
      |         count(*) OVER (PARTITION BY event_type ORDER BY sec
      |                        RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS n_1h
      |  FROM e),
      |rk AS (
      |  SELECT event_type, sec, n_1h,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY n_1h DESC, sec) AS r
      |  FROM w)
      |SELECT event_type, n_1h AS peak_1h, sec AS peak_end_sec
      |FROM rk WHERE r = 1""",
    "peak trailing-hour event rate per type (burst detection, time-series tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
    val w = e.withColumn("n_1h", count(lit(1)).over(
      Window.partitionBy("event_type").orderBy(col("sec"))
        .rangeBetween(-3599, Window.currentRow)))
    w.withColumn("r", row_number().over(
        Window.partitionBy("event_type").orderBy(col("n_1h").desc, col("sec"))))
      .where(col("r") === 1)
      .select(col("event_type"), col("n_1h").as("peak_1h"),
        col("sec").as("peak_end_sec"))
  }

  /** CDC changelog merge (SCD-1 apply): the events stream read as an
    * ordered change log per user — `error` rows are tombstones that
    * clear state, every other row upserts `value`. The merged snapshot
    * keeps, per user, only upserts AFTER the last tombstone: latest
    * value + live-op count. Total order inside a key is (ts,
    * event_id), so the result is tie-deterministic. Scale shape: one
    * hash exchange on user_id feeds the rank window, the tombstone
    * watermark AND the final aggregate — Catalyst reuses the
    * partitioning, so the whole merge is one shuffle of (key, rk,
    * cents), the standard log-compaction cost. */
  val q201 = QuerySpec.sql(
    "q201_cdc_merge",
    """WITH ops AS (
      |  SELECT user_id, event_id,
      |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
      |  FROM events),
      |del AS (
      |  SELECT user_id, max(CASE WHEN op = 'D' THEN rk ELSE 0 END) AS last_del
      |  FROM ops GROUP BY 1),
      |live AS (
      |  SELECT o.user_id, o.rk, o.value_cents
      |  FROM ops o JOIN del d ON d.user_id = o.user_id
      |  WHERE o.op = 'U' AND o.rk > d.last_del)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_live_ops,
      |       CAST(max_by(value_cents, rk) AS BIGINT) AS last_value_cents
      |FROM live GROUP BY 1""",
    "CDC changelog merge with tombstone semantics (SCD-1 apply, lakehouse tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // both windows share the user_id partitioning → ONE exchange; the
    // final aggregate reuses it too (plan-audited: single Exchange)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        round(col("value") * 100, 0).cast("long").as("value_cents"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .withColumn("last_del", max(when(col("op") === "D", col("rk")).otherwise(0))
        .over(Window.partitionBy("user_id")))
      .where(col("op") === "U" && col("rk") > col("last_del"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_live_ops"),
        expr("max_by(value_cents, rk)").cast("long").as("last_value_cents"))
  }

  /** Incremental aggregate-view maintenance ([[graft.operators
    * .MaterializedAgg.applyDelta]]): the per-user rollup is built
    * from the base batch, then batch 2 arrives as PARTIAL aggregates
    * and merges in one co-partitioned full-outer join — the base is
    * never re-read. The oracle is the full recompute over
    * base ∪ delta, so the gate hash-proves the incremental path's
    * defining invariant. Measures are exact cents, so addition is
    * associative and the merge is order-safe. */
  val q252 = QuerySpec.sql(
    "q252_incremental_agg_view",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY 1""",
    "incremental agg-view maintenance: delta merge == full recompute (lakehouse tier)") { (s, d) =>
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
    val ev = Tables.events(s, d)
    val view = rollup(ev.where(pmod(col("event_id"), lit(3)) =!= 0))
    val delta = rollup(ev.where(pmod(col("event_id"), lit(3)) === 0))
    graft.operators.MaterializedAgg.applyDelta(view, delta,
      keys = Seq("user_id"), measures = Seq("n_events", "sum_cents"))
  }

  /** First-order Markov transition model over per-user event
    * sequences — the behavior-modeling primitive (what follows what,
    * and each state's ranked next events). ONE exchange on user_id
    * feeds the lead() window; the transition table is |types|² rows
    * regardless of corpus size, so the model itself is
    * driver/broadcast-sized at any scale. Total order (ts, event_id)
    * keeps ties deterministic. */
  val q253 = QuerySpec.sql(
    "q253_markov_transitions",
    """WITH s AS (
      |  SELECT user_id, event_type AS f,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
      |  FROM events),
      |c AS (SELECT f, t, count(*) AS n FROM s WHERE t IS NOT NULL GROUP BY 1, 2)
      |SELECT f AS from_type, t AS to_type, CAST(n AS BIGINT) AS n_trans,
      |       CAST(row_number() OVER (PARTITION BY f ORDER BY n DESC, t) AS BIGINT) AS rnk
      |FROM c""",
    "first-order Markov transition counts + ranked next events (sequence modeling)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val seq = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
          .as("to_type"))
      .where(col("to_type").isNotNull)
    seq.groupBy("from_type", "to_type").agg(count(lit(1)).as("n_trans"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("from_type")
          .orderBy(col("n_trans").desc, col("to_type"))).cast("long"))
  }

  /** Ordered-sequence pattern matching (the MATCH_RECOGNIZE-shaped
    * CEP ask): each user's event history collapses to a tiny symbol
    * string — initial letter per event, total-ordered by (ts,
    * event_id) — and the pattern `s[cv]*p` (signup, then purchase
    * with only clicks/views between) is counted by one regex scan.
    * Scale shape: ONE exchange on user_id; the shuffled payload is a
    * few bytes per event (symbol + order key), and the per-user
    * string is bounded by that user's event count — regex time is
    * linear, state never leaves the row. Non-overlapping match
    * semantics are identical in Java and DuckDB's regex engines for
    * this alternation-free pattern. */
  val q204 = QuerySpec.sql(
    "q204_sequence_pattern",
    """WITH seqs AS (
      |  SELECT user_id,
      |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY 1)
      |SELECT user_id,
      |       CAST(len(regexp_extract_all(seq, 's[cv]*p')) AS BIGINT) AS n_conversions,
      |       CAST(length(seq) AS BIGINT) AS n_events
      |FROM seqs""",
    "signup->purchase conversion paths via regex over ordered event symbols (CEP tier)") { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("sym")).as("e"))
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        e => e.getField("sym")), "").as("seq"))
      .select(col("user_id"),
        regexp_count(col("seq"), lit("s[cv]*p")).cast("long").as("n_conversions"),
        length(col("seq")).cast("long").as("n_events"))
  }

  /** SCD-2 history build — q201's companion: instead of compacting
    * the changelog to its latest state, every change becomes a
    * versioned validity interval (valid_from, valid_to, is_current),
    * the dimension-table shape a warehouse keeps for point-in-time
    * joins (q106 consumes exactly this form). One exchange on
    * user_id; version numbers and interval ends are pure window
    * arithmetic under the total order (ts, event_id). */
  val q208 = QuerySpec.sql(
    "q208_scd2_history",
    """SELECT user_id, event_id,
      |       CAST(row_number() OVER w AS BIGINT) AS version,
      |       CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
      |       ts AS valid_from,
      |       lead(ts) OVER w AS valid_to,
      |       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "SCD-2 validity intervals from the event changelog (lakehouse tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("version"),
        round(col("value") * 100, 0).cast("long").as("value_cents"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        when(lead(col("ts"), 1).over(w).isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** Streaming CDC compaction parity — [[graft.streaming.StreamOps
    * .cdcMergeStream]] run on the real streaming engine
    * (mapGroupsWithState, Update mode, state = two longs per live
    * key) must land exactly where the batch merge lands: the oracle
    * is q201's SQL verbatim. This is the log-compaction state store
    * gate — the same fold, bounded or unbounded. */
  val q211 = QuerySpec.sql(
    "q211_cdc_stream_parity",
    """WITH ops AS (
      |  SELECT user_id, event_id,
      |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
      |  FROM events),
      |del AS (
      |  SELECT user_id, max(CASE WHEN op = 'D' THEN rk ELSE 0 END) AS last_del
      |  FROM ops GROUP BY 1),
      |live AS (
      |  SELECT o.user_id, o.rk, o.value_cents
      |  FROM ops o JOIN del d ON d.user_id = o.user_id
      |  WHERE o.op = 'U' AND o.rk > d.last_del)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_live_ops,
      |       CAST(max_by(value_cents, rk) AS BIGINT) AS last_value_cents
      |FROM live GROUP BY 1""",
    "streaming CDC state store == batch changelog merge (stream parity)") { (s, d) =>
    graft.streaming.StreamOps.runCdcMergeStream(s, d)
  }

  /** Date-spine gap filling — the calendar-completion join every BI /
    * time-series consumer needs: the observed daily counts joined
    * onto a GENERATED continuous day spine (sequence of dates ×
    * event types), zero-filling days with no events so downstream
    * windows see a dense series. Scale shape: the spine is
    * |days|×|types| rows — generated, tiny, broadcast; the daily
    * aggregate is the only data-sized shuffle. */
  val q222 = QuerySpec.sql(
    "q222_date_spine",
    """WITH bounds AS (
      |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |daily AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT CAST(s.day AS VARCHAR) AS day, t.event_type,
      |       CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |FROM spine s CROSS JOIN types t
      |LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type""",
    "calendar spine generation + zero-filled daily series (time-series tier)") { (s, d) =>
    val ev = Tables.events(s, d)
    val bounds = ev.agg(to_date(min(col("ts"))).as("d0"),
      to_date(max(col("ts"))).as("d1"))
    val spine = bounds
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val daily = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    broadcast(spine).crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left_outer")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Cumulative distinct users per type by day — DISTINCT aggregation
    * over a window, a surface Spark's windowed aggregates lack
    * natively: expressed as `size(collect_set() OVER (RANGE
    * UNBOUNDED..CURRENT))`, which DuckDB replays with its native
    * `count(DISTINCT) OVER`. Scale note: the per-frame set is
    * bounded by the key's distinct users; the documented 100 TB
    * fallback is the HLL sketch (q140) merged cumulatively. */
  val q225 = QuerySpec.sql(
    "q225_window_distinct",
    """WITH daily AS (
      |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id FROM events)
      |SELECT DISTINCT event_type, CAST(day AS VARCHAR) AS day,
      |       CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY day
      |              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM daily""",
    "running distinct-user counts per type (window DISTINCT surface)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    daily.withColumn("cum_users",
        size(collect_set(col("user_id")).over(
          Window.partitionBy("event_type").orderBy("day")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cum_users"))
      .distinct()
  }

  /** Gini mean difference per event type — the pairwise dispersion
    * Σ|xᵢ−xⱼ| WITHOUT the pairwise join: the classic sorted-rank
    * identity Σ(2i−n−1)·x₍ᵢ₎ turns an O(n²) statistic into one sort
    * + one aggregate, integer-exact end to end (tie order cannot
    * change the sum — equal values contribute zero either way). */
  val q226 = QuerySpec.sql(
    "q226_gini_dispersion",
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
      |r AS (
      |  SELECT event_type, c,
      |         row_number() OVER (PARTITION BY event_type ORDER BY c) AS i,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v)
      |SELECT event_type, CAST(sum((2 * i - n - 1) * c) AS BIGINT) AS gmd_sum,
      |       CAST(max(n) AS BIGINT) AS n
      |FROM r GROUP BY 1""",
    "pairwise dispersion via the sorted-rank identity, no n^2 join (stats tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("c"))
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy("c")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(sum((lit(2) * col("i") - col("n") - 1) * col("c")).as("gmd_sum"),
        max(col("n")).as("n"))
  }

  /** Per-type OLS trend of daily value — slope of cents-per-day over
    * day index, carried as EXACT integer numerator/denominator
    * (n·Σxy − Σx·Σy over n·Σx² − (Σx)²) with ONE final IEEE
    * division: the regression a drift monitor fits, engine-portable
    * bit-for-bit. Day indexing (not epoch seconds) keeps every
    * product far inside BIGINT at any corpus length (x ≤ days,
    * documented bound). One groupBy(type, day) + one groupBy(type). */
  val q228 = QuerySpec.sql(
    "q228_trend_ols",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type,
      |         CAST(day - (SELECT min(CAST(ts AS DATE)) FROM events) AS BIGINT) AS x,
      |         cents AS y
      |  FROM daily),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM idx GROUP BY 1)
      |SELECT event_type,
      |       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
      |       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
      |       CAST(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS slope
      |FROM m""",
    "integer-exact OLS slope of daily value per type (trend tier)") { (s, d) =>
    val ev = Tables.events(s, d)
    val d0 = ev.agg(to_date(min(col("ts"))).as("d0"))
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .crossJoin(broadcast(d0))
      .select(col("event_type"), datediff(col("day"), col("d0")).cast("long").as("x"),
        col("y"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"))
  }

  /** Day-of-week seasonal anomaly fence — a daily count is anomalous
    * relative to ITS WEEKDAY's own baseline (Monday spikes compare
    * to Mondays), the seasonality-aware form a naive global fence
    * gets wrong. All comparisons are cross-multiplied integers
    * (5·c·den vs 6·num — a ±20% fence), no division anywhere. */
  val q229 = QuerySpec.sql(
    "q229_seasonal_anomaly",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |dw AS (SELECT event_type, day, c, dayofweek(day) AS dow FROM daily),
      |base AS (
      |  SELECT event_type, dow, CAST(sum(c) AS BIGINT) AS num,
      |         count(*) AS den
      |  FROM dw GROUP BY 1, 2)
      |SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, CAST(d.c AS BIGINT) AS n_events,
      |       b.num AS base_num, CAST(b.den AS BIGINT) AS base_den,
      |       CAST(CASE WHEN d.c * b.den * 5 > 6 * b.num THEN 1
      |                 WHEN d.c * b.den * 6 < 5 * b.num THEN -1 ELSE 0 END AS BIGINT) AS flag
      |FROM dw d JOIN base b ON b.event_type = d.event_type AND b.dow = d.dow
      |WHERE d.c * b.den * 5 > 6 * b.num OR d.c * b.den * 6 < 5 * b.num""",
    "weekday-baseline anomaly days, cross-multiplied integers (time-series tier)") { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dow", dayofweek(col("day")))
    val base = daily.groupBy("event_type", "dow")
      .agg(sum(col("c")).as("num"), count(lit(1)).as("den"))
    daily.join(base, Seq("event_type", "dow"))
      .where(col("c") * col("den") * 5 > lit(6) * col("num") ||
        col("c") * col("den") * 6 < lit(5) * col("num"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("c").as("n_events"), col("num").as("base_num"),
        col("den").as("base_den"),
        when(col("c") * col("den") * 5 > lit(6) * col("num"), 1L)
          .when(col("c") * col("den") * 6 < lit(5) * col("num"), -1L)
          .otherwise(0L).as("flag"))
  }

  /** Hopping (sliding) windows — every event lands in FOUR
    * overlapping 1-hour windows at 15-minute hops, the
    * dashboard-smoothing form tumbling windows (q60) can't give.
    * Spark's `window(ts, len, slide)` expands slots inside the scan;
    * the oracle replays the slot arithmetic with integer epoch
    * division. */
  val q232 = QuerySpec.sql(
    "q232_hopping_windows",
    """WITH slots AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) // 900 - k AS slot,
      |         CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events, unnest(generate_series(0, 3)) AS u(k)),
      |w AS (
      |  SELECT event_type, slot * 900 AS win_start_sec, count(*) AS n_events,
      |         CAST(sum(cents) AS BIGINT) AS cents
      |  FROM slots GROUP BY 1, 2)
      |SELECT event_type, win_start_sec, n_events, cents FROM w""",
    "overlapping 1h windows at 15min hops (hopping-window surface)") { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        window(col("ts"), "1 hour", "15 minutes").as("w"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("event_type", "w")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
      .select(col("event_type"),
        col("w.start").cast("long").as("win_start_sec"),
        col("n_events"), col("cents"))
  }

  /** Native session windows — Spark's `session_window(ts, gap)`
    * (the state-store-ready form) must land exactly where the
    * hand-rolled lag/cumsum sessionizer (q61) lands: same sessions,
    * same boundaries, same counts. The oracle is q61's window SQL
    * reshaped to the same columns. */
  val q233 = QuerySpec.sql(
    "q233_session_window_native",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM sessions GROUP BY user_id, session_seq""",
    "native session_window == hand-rolled sessionizer (streaming surface)") { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
  }

  /** Gaps-and-islands — maximal runs of CONSECUTIVE active days per
    * user via the classic day − dense_rank grouping constant: rows
    * in one island share (day − rank), so islands fall out of one
    * window + one aggregate, no self-join, no iteration. Output per
    * user: island count, longest streak, total active days — the
    * engagement-streak features a retention model consumes. */
  val q234 = QuerySpec.sql(
    "q234_gaps_islands",
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |grp AS (
      |  SELECT user_id, day,
      |         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS island
      |  FROM days),
      |islands AS (
      |  SELECT user_id, island, count(*) AS len
      |  FROM grp GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_islands,
      |       CAST(max(len) AS BIGINT) AS longest_streak,
      |       CAST(sum(len) AS BIGINT) AS active_days
      |FROM islands GROUP BY 1""",
    "consecutive-day activity streaks via day-rank islands (sequence tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("island", expr("date_sub(day, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day))"))
      .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"), max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"))
  }

  /** MODE aggregate — most frequent event type per user,
    * tie-deterministic (max count, then lexicographically first
    * type): the categorical summary `avg` can't give. Expressed as
    * max_by over (count, reversed tie-break) in both engines. */
  val q237 = QuerySpec.sql(
    "q237_mode_aggregate",
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT user_id, event_type, n,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY n DESC, event_type) AS rk
      |  FROM c)
      |SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
      |FROM r WHERE rk = 1""",
    "tie-deterministic per-user mode of event type (aggregate surface)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))))
      .where(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
  }

  /** Trimmed (10%-winsorized-out) mean per event type — the robust
    * center a heavy-tailed value column needs: drop the exact
    * bottom/top decile BY RANK (ceil/floor integer cutoffs shared by
    * both engines) and average the middle as an exact cents sum with
    * one final division. Rank-select idiom; approx_percentile is the
    * documented skewed-key fallback as with q165/q166. */
  val q238 = QuerySpec.sql(
    "q238_trimmed_mean",
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c,
      |         event_id
      |  FROM events),
      |r AS (
      |  SELECT event_type, c,
      |         row_number() OVER (PARTITION BY event_type ORDER BY c, event_id) AS i,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v),
      |kept AS (
      |  SELECT event_type, c, n FROM r
      |  WHERE i > n // 10 AND i <= n - n // 10)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_kept,
      |       CAST(sum(c) AS BIGINT) AS cents_sum,
      |       CAST(sum(c) AS DOUBLE) / count(*) / 100.0 AS trimmed_mean
      |FROM kept GROUP BY 1""",
    "exact rank-trimmed decile mean per type (robust stats tier)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("c"),
        col("event_id"))
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy(col("c"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .where(col("i") > expr("n DIV 10") && col("i") <= col("n") - expr("n DIV 10"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), sum(col("c")).as("cents_sum"),
        (sum(col("c")).cast("double") / count(lit(1)) / 100.0).as("trimmed_mean"))
  }

  val all: Seq[QuerySpec] =
    Seq(q60, q61, q62, q88, q105, q106, q108, q124, q127, q142, q143, q145,
      q151, q152, q165, q169, q171, q175, q180, q188, q189, q190, q193, q198,
      q201, q204, q208, q211, q222, q225, q226, q228, q229, q232, q233, q234,
      q237, q238, q251, q252, q253, q263, q266)
}
