package graft

import graft.graph.GraphAnalytics
import org.apache.spark.sql.functions._

/** Invariant laws for the round-7 analytics/statistics gates — the
  * oracle proves engine-equality at one dataset; these pin the
  * algebraic properties that must hold at ANY scale or partitioning.
  */
class GateLawsSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    // two groups; g1 is a path 1-2-3-4 plus chord 1-3, g2 a star
    ("g1", 1L, 2L), ("g1", 2L, 3L), ("g1", 3L, 4L), ("g1", 1L, 3L),
    ("g2", 10L, 11L), ("g2", 10L, 12L), ("g2", 10L, 13L))
    .toDF("group", "src", "dst")

  test("pprExactScaled: partitioning-independent, seed-positive, teleport floor") {
    val a = GraphAnalytics.pprExactScaled(edges, damping = 0.85, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = GraphAnalytics.pprExactScaled(edges.repartition(7), damping = 0.85, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "PPR depends on input partitioning")
    // the seed (min node) re-receives the teleport mass every step, so
    // it holds at least (1-d)*1e6; every score is non-negative
    assert(a(("g1", 1L)) >= 150000L && a(("g2", 10L)) >= 150000L)
    assert(a.values.forall(_ >= 0L))
    // g2's star: leaves are symmetric → identical scores
    assert(a(("g2", 11L)) == a(("g2", 12L)) &&
      a(("g2", 12L)) == a(("g2", 13L)))
    // proximity: in g1 the seed's neighbors outrank the far end
    assert(a(("g1", 2L)) >= a(("g1", 4L)))
  }

  test("q176 link prediction: no existing edge emitted; cn bounded by degrees") {
    val out = SparkEntry.queries("q176_link_prediction")(spark, sf)
    val bad = out.filter(col("cn") > least(col("deg_u"), col("deg_v")) ||
      col("jaccard") <= 0 || col("jaccard") > 1).count()
    assert(bad == 0, "cn exceeds a degree bound or jaccard out of (0,1]")
    // candidates must be non-adjacent: rebuild the edge set and anti-check
    val e = graft.queries.AnalyticsQueries.groupEdges(spark, sf)
      .select(col("group").as("grp"), col("src").cast("long").as("u"),
        (col("dst")).cast("long").as("v"))
    val overlap = out.join(e, Seq("grp", "u", "v")).count() +
      out.join(e.select(col("grp"), col("v").as("u"), col("u").as("v")),
        Seq("grp", "u", "v")).count()
    assert(overlap == 0, "an adjacent pair leaked into the candidate set")
  }

  test("q175 attribution: per-conversion credit conserved up to integer rounding") {
    // k touches each get floor(1e6/k): the total lost to rounding is < k
    val ev = Tables.events(spark, sf)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"), col("ts").as("cts"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"))
    val k = conv.join(touches, Seq("user_id"))
      .where(col("ts") <= col("cts") && col("ts") > col("cts") - expr("INTERVAL 7 DAYS"))
      .groupBy("conv_id").agg(count(lit(1)).as("k"))
    val credited = k.select(sum(expr("k * (CAST(1000000 AS BIGINT) DIV k)")).as("c"),
      sum(lit(1000000L)).as("full"), sum(col("k")).as("ks")).head()
    val (c, full, ks) = (credited.getLong(0), credited.getLong(1), credited.getLong(2))
    assert(c <= full && full - c < ks, s"credit not conserved: $c of $full, slack ${full - c}")
    // and the gate's channel totals sum to exactly the same credited mass
    val gate = SparkEntry.queries("q175_attribution")(spark, sf)
      .agg(sum("credit_ppm")).head.getLong(0)
    assert(gate == c, s"gate credit $gate != recomputed $c")
  }

  test("q179 bootstrap CI: ordered bounds that bracket the grand spread") {
    val out = SparkEntry.queries("q179_bootstrap_ci")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= hi, s"ci_lo $lo > ci_hi $hi")
      // resample means live inside the sample's value range by construction
      val m = r.getAs[Double]("mean_obs")
      assert(lo <= m * 2 && hi >= m / 2, "CI wildly off the observed mean")
    }
  }

  test("q173 collocations: bigram support never exceeds either unigram count") {
    val out = SparkEntry.queries("q173_collocations")(spark, sf)
    assert(out.filter(col("c_ab") > least(col("c_a"), col("c_b"))).count() == 0)
    assert(out.filter(col("lift") <= 0).count() == 0)
  }

  test("ktrussPeel: 4-clique survives k=4; peeling is monotone; supports bounded") {
    val clique = (for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j))
      .toDF("u", "v")
    val kept = GraphAnalytics.ktrussPeel(clique, k = 4, rounds = 3).collect()
    // every 4-clique edge sits in exactly 2 triangles → all survive
    assert(kept.length == 6 && kept.forall(_.getLong(2) == 2L))
    // a pendant edge (no triangle) dies in round one
    val withTail = clique.union(Seq((3L, 9L)).toDF("u", "v"))
    val kept2 = GraphAnalytics.ktrussPeel(withTail, k = 4, rounds = 1)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!kept2.contains((3L, 9L)) && kept2.size == 6)
    // more rounds can only shrink the survivor set
    val r1 = GraphAnalytics.ktrussPeel(withTail, k = 4, rounds = 1)
      .select("u", "v").collect().toSet
    val r2 = GraphAnalytics.ktrussPeel(withTail, k = 4, rounds = 2)
      .select("u", "v").collect().toSet
    assert(r2.subsetOf(r1))
  }

  test("weightedSamplePortable: k per stratum, partitioning-independent, weight bias") {
    val df = Tables.customer(spark, sf)
      .select("c_mktsegment", "c_custkey", "c_acctbal")
    val a = graft.operators.Sampling.weightedSamplePortable(
      df, "c_mktsegment", Seq("c_custkey"), "c_acctbal", k = 10, seed = 21)
    val b = graft.operators.Sampling.weightedSamplePortable(
      df.repartition(13), "c_mktsegment", Seq("c_custkey"), "c_acctbal",
      k = 10, seed = 21)
    assert(a.collect().map(_.getLong(1)).sorted.sameElements(
      b.collect().map(_.getLong(1)).sorted))
    val counts = a.groupBy("c_mktsegment").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 10L))
    // the sample's mean balance should exceed the population's (weight bias)
    val sMean = a.agg(avg("c_acctbal")).head.getDouble(0)
    val pMean = df.agg(avg("c_acctbal")).head.getDouble(0)
    assert(sMean > pMean, s"weighted sample not balance-biased: $sMean <= $pMean")
  }

  test("q184 fuzzy join: every pair verified at distance <= 1, none self, none missed locally") {
    val out = SparkEntry.queries("q184_fuzzy_join")(spark, sf)
    assert(out.filter(col("dist") > 1 || col("id1") >= col("id2")).count() == 0)
    // spot-law: consecutive single-digit customers differ in one char
    val names = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    if (names.contains(1L) && names.contains(2L)) {
      val hit = out.filter(col("id1") === 1 && col("id2") === 2).count()
      assert(hit == 1, "adjacent-key near-duplicate pair missed")
    }
  }

  test("q183/q186: quantile vector is monotone; unit weights reduce to plain median") {
    val q = SparkEntry.queries("q183_group_quantiles")(spark, sf).collect()
      .groupBy(_.getString(0)).map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    q.values.foreach { v => assert(v.sameElements(v.sorted), "quantiles not monotone") }
    // weighted median with all weights 1 == lower median rank selection
    val df = Seq(("a", 1.0, 1L, 1L, 1), ("a", 2.0, 1L, 2L, 1), ("a", 3.0, 1L, 3L, 1),
      ("a", 4.0, 1L, 4L, 1)).toDF("g", "v", "wt", "l_orderkey", "l_linenumber")
    import org.apache.spark.sql.expressions.Window
    val cum = df.withColumn("cw", sum(col("wt")).over(
      Window.partitionBy("g").orderBy(col("v"), col("l_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = df.groupBy("g").agg(sum("wt").as("tw"))
    val med = cum.join(tot, "g")
      .agg(min(when(lit(2) * col("cw") >= col("tw"), col("v")))).head.getDouble(0)
    assert(med == 2.0, s"unit-weight weighted median $med != lower median 2.0")
  }

  test("q185 drift: every cell's expectation and residual match an independent recompute") {
    val cells = Tables.documents(spark, sf).groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum.toDouble
    val out = SparkEntry.queries("q185_drift_residuals")(spark, sf).collect()
    assert(out.length == cells.size)
    out.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val o = cells(key)
      val e = rt(key._1).toDouble * ct(key._2) / n
      assert(r.getAs[Long]("n_obs") == o)
      assert(math.abs(r.getAs[Double]("n_exp") - e) < 1e-9 * e + 1e-12)
      assert(math.abs(r.getAs[Double]("resid") - (o - e) / math.sqrt(e)) < 1e-9)
    }
  }

  test("q187 centroid distances: all label pairs present, non-negative, counts reconcile") {
    val out = SparkEntry.queries("q187_centroid_distances")(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.length == labels.size * (labels.size - 1) / 2)
    out.foreach { r =>
      assert(r.getAs[Long]("d2_scaled") >= 0L)
      assert(r.getAs[Long]("n1") == labels(r.getAs[Int]("label1")))
      assert(r.getAs[Long]("n2") == labels(r.getAs[Int]("label2")))
    }
  }

  test("q188 OHLC: low <= open,close <= high; volume reconciles") {
    val out = SparkEntry.queries("q188_ohlc_bars")(spark, sf)
    assert(out.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close")).count() == 0)
    val vol = out.agg(sum("volume")).head.getLong(0)
    val want = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(vol == want)
  }

  test("q189 gap scan: per-user gap count is n_events - 1") {
    val out = SparkEntry.queries("q189_gap_scan")(spark, sf)
      .select("user_id", "n_gaps").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    n.foreach { case (u, c) =>
      if (c > 1) assert(out(u) == c - 1, s"user $u: ${out(u)} gaps for $c events")
      else assert(!out.contains(u))
    }
  }

  test("q190 TWAP: bounded by each type's value range; mass reconciles with one division") {
    val out = SparkEntry.queries("q190_twap")(spark, sf).collect()
    val rng = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy("event_type").agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (lo, hi) = rng(r.getAs[String]("event_type"))
      val t = r.getAs[Double]("twap")
      // cents quantization can nudge past the true extrema by < 1 cent
      assert(t >= lo - 0.01 && t <= hi + 0.01, s"twap $t outside [$lo, $hi]")
      assert(math.abs(t - r.getAs[Long]("mass_cent_s").toDouble /
        (100.0 * r.getAs[Long]("total_s"))) < 1e-12)
    }
  }

  test("q191 neighbor features: mean identity and co-supplier bound") {
    val out = SparkEntry.queries("q191_neighbor_features")(spark, sf)
    val nSupp = out.count()
    assert(out.filter(col("n_cosupp") >= nSupp).count() == 0)
    assert(out.filter(abs(col("mean_bal") -
      col("sum_cents").cast("double") / (lit(100.0) * col("n_cust"))) > 1e-9)
      .count() == 0)
  }

  test("q192 quantile normalization: equal-size sources get identical distributions") {
    val out = SparkEntry.queries("q192_quantile_normalize")(spark, sf).collect()
    val bySrc = out.groupBy(_.getString(1))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("norm_chars")).sorted.toSeq }
    val sizes = bySrc.view.mapValues(_.size).toMap
    // any two sources with the same row count must normalize to the
    // SAME value multiset — that is what distribution matching means
    bySrc.groupBy { case (s, _) => sizes(s) }.values.foreach { grp =>
      val vecs = grp.values.toSeq
      assert(vecs.forall(_ == vecs.head), "equal-size sources diverged")
    }
    // normalized values are drawn from the observed global values
    val global = out.map(_.getAs[Long]("n_chars")).toSet
    assert(bySrc.values.flatten.forall(global.contains))
  }

  test("q193 RFM: quintiles balanced to within one; segment decomposes") {
    val out = SparkEntry.queries("q193_rfm")(spark, sf).collect()
    val n = out.length
    Seq("r", "f", "m").foreach { c =>
      val counts = out.groupBy(_.getAs[Int](c)).view.mapValues(_.size)
      assert(counts.keySet == (1 to 5).toSet)
      assert(counts.values.max - counts.values.min <= 1,
        s"$c quintiles unbalanced for $n users")
    }
    out.foreach { r =>
      assert(r.getAs[Int]("segment") ==
        r.getAs[Int]("r") * 100 + r.getAs[Int]("f") * 10 + r.getAs[Int]("m"))
    }
  }

  test("q194 novelty: rate in [0,1]; unique-gram mass reconciles with df table") {
    val out = SparkEntry.queries("q194_novelty_rate")(spark, sf)
    assert(out.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    val uniq = out.agg(sum("n_unique")).head.getLong(0)
    val want = Tables.documents(spark, sf)
      .select(explode(graft.operators.TextOps.wordShingles(col("text"), 3)).as("tok"))
      .groupBy("tok").count().filter(col("count") === 1).count()
    assert(uniq == want, s"unique-gram mass $uniq != df-1 gram count $want")
  }

  test("q198 burst: sliding peak dominates every tumbling hour; argmax is a real window") {
    val peak = SparkEntry.queries("q198_burst_detection")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tumbling = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        floor(col("ts").cast("long") / 3600).as("hr"))
      .count().groupBy("event_type").agg(max("count").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tumbling.foreach { case (t, mx) =>
      assert(peak(t) >= mx, s"$t: sliding peak ${peak(t)} < tumbling max $mx")
    }
    // and the peak is attainable: never more than total events of the type
    val tot = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    peak.foreach { case (t, p) => assert(p <= tot(t)) }
  }

  test("q203 snapshot diff: statuses partition both snapshots; totals reconcile") {
    val out = SparkEntry.queries("q203_snapshot_diff")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val docs = Tables.documents(spark, sf)
    val nA = docs.where(col("doc_id") % 7 =!= 0).count()
    val nB = docs.where(col("doc_id") % 5 =!= 0).count()
    val inA = out.getOrElse("removed", 0L) + out.getOrElse("changed", 0L) +
      out.getOrElse("unchanged", 0L)
    val inB = out.getOrElse("added", 0L) + out.getOrElse("changed", 0L) +
      out.getOrElse("unchanged", 0L)
    assert(inA == nA, s"A-side rows $inA != |A| $nA")
    assert(inB == nB, s"B-side rows $inB != |B| $nB")
    // every doc_id≡0 mod 11 surviving both snapshots must be 'changed'
    val nChanged = docs.where(col("doc_id") % 11 === 0 &&
      col("doc_id") % 7 =!= 0 && col("doc_id") % 5 =!= 0).count()
    assert(out.getOrElse("changed", 0L) == nChanged,
      s"changed ${out.get("changed")} != revised survivors $nChanged")
  }

  test("q204 sequence pattern: conversions bounded by signups and purchases") {
    val out = SparkEntry.queries("q204_sequence_pattern")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val counts = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("s"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.foreach { case (u, (conv, nEv)) =>
      val (sCnt, pCnt, n) = counts(u)
      assert(conv <= math.min(sCnt, pCnt), s"user $u: $conv conversions > min($sCnt,$pCnt)")
      assert(nEv == n, s"user $u: seq length $nEv != event count $n")
    }
    assert(out.values.exists(_._1 > 0), "no conversions anywhere — vacuous gate")
  }

  test("q236 weighted re-score: scores in (0,1], exactly the candidate pair set") {
    val wj = SparkEntry.queries("q236_weighted_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(wj.nonEmpty)
    assert(wj.values.forall(v => v > 0.0 && v <= 1.0), "wjaccard out of (0,1]")
    val cand = SparkEntry.queries("q35_jaccard_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wj.keySet == cand, s"re-score pairs ${wj.size} != candidates ${cand.size}")
  }

  test("q242 market basket: lift arithmetic reconciles; support threshold respected") {
    val rows = SparkEntry.queries("q242_market_basket")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, num, den, lift) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
      assert(nab >= 20, "support threshold violated")
      assert(num % nab == 0, "lift_num not a multiple of n_ab")
      assert(math.abs(lift - num.toDouble / den) < 1e-12, "lift != num/den")
    }
  }

  test("q178 profile: null/distinct counts reconcile with direct recompute") {
    val out = SparkEntry.queries("q178_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, sf)
    val want = li.select(countDistinct("l_returnflag")).head.getLong(0)
    assert(out("l_returnflag").getAs[Long]("n_distinct") == want)
    assert(out.values.forall(_.getAs[Long]("n_nulls") == 0L))
  }
}
