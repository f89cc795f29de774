package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Count-Min sketch invariants (q141's operator). */
class SketchesSpec extends SparkSpec {

  private val (d, w, seed) = (4, 512, 42L)

  private def keyed = Tables.lineitem(spark, sf)
    .select(col("l_partkey").cast("long").as("key"))

  test("every hash row of the cell table holds every increment") {
    val cells = Sketches.countMinCells(keyed, col("key"), d, w, seed)
    val n = keyed.count()
    val perRow = cells.groupBy("r").agg(sum("cnt").as("tot"))
      .collect().map(r => r.getAs[Int]("r") -> r.getAs[Long]("tot")).toMap
    assert(perRow.keySet == (0 until d).toSet)
    assert(perRow.values.forall(_ == n), s"row totals $perRow != $n")
  }

  test("estimates never under-count, and are exact when collision-free") {
    val cells = Sketches.countMinCells(keyed, col("key"), d, w, seed)
    val qk = keyed.distinct().limit(200).cache()
    val est = Sketches.countMinEstimate(cells, qk, d, w, seed)
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("n_exact"))
    val both = est.join(exact, "key")
      .select(col("key"), col("n_cm"), col("n_exact")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Long]("n_cm") >= r.getAs[Long]("n_exact"),
        s"CM under-counted key ${r.get(0)}: $r")
    }
  }

  test("a cramped sketch still upper-bounds (collisions only inflate)") {
    val cells = Sketches.countMinCells(keyed, col("key"), d = 2, w = 8, seed = 7)
    val qk = keyed.distinct().limit(50)
    val est = Sketches.countMinEstimate(cells, qk, d = 2, w = 8, seed = 7)
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("n_exact"))
    val both = est.join(exact, "key").collect()
    assert(both.forall(r => r.getAs[Long]("n_cm") >= r.getAs[Long]("n_exact")))
    // with 8 buckets over thousands of keys, collisions are certain
    assert(both.exists(r => r.getAs[Long]("n_cm") > r.getAs[Long]("n_exact")))
  }

  test("cell table is partition-independent") {
    val a = Sketches.countMinCells(keyed, col("key"), d, w, seed)
    val b = Sketches.countMinCells(keyed.repartition(17), col("key"), d, w, seed)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // ---------------------------------------------- approx fence valve

  test("approxOutlierFence matches the exact rank-select fence on odd counts, sort-free") {
    import spark.implicits._
    // odd per-key counts → GK at high accuracy returns the true median
    val rows = Seq("a", "b").flatMap { k =>
      val base = (1 to 101).map(i => (k, i.toDouble))
      base :+ (k, 10000.0) // one gross outlier per key
    }.toDF("key", "value")
    val got = Sketches.approxOutlierFence(rows, "key", "value", nMads = 5.0)
    val m = got.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    for (k <- Seq("a", "b")) {
      val (n, med, mad, out) = m(k)
      assert(n == 102)
      assert(med == 51.0 || med == 52.0) // 102 values: either middle value
      assert(mad >= 25.0 && mad <= 27.0)
      assert(out == 1L, s"key $k: the planted outlier must be fenced, got $out")
    }
    // the scale property: no rank-selecting window (and so no per-key
    // full sort for the quantiles) anywhere in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"approx fence must not rank-select via windows:\n${plan.take(800)}")
  }

  // ---------------------------------------------------- heavy hitters

  test("heavy hitters: screen is one-sided and estimates replay the cell table") {
    // skewed keys: key k appears k times for k in 1..40
    import spark.implicits._
    val rows = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("key")
    val hh = Sketches.heavyHitters(rows, col("key"), threshold = 25L,
        d = 4, w = 64, seed = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // no false negatives: every truly-heavy key survives the screen
    (25L to 40L).foreach(k => assert(hh.contains(k), s"true heavy hitter $k dropped"))
    // estimates never under-count, and match the standalone cell build
    val cells = Sketches.countMinCellsArray(rows, col("key"), d = 4, w = 64, seed = 5)
    hh.foreach { case (k, (nExact, nCm)) =>
      assert(nCm >= nExact, s"key $k: CM $nCm under-counts exact $nExact")
      val est = rows.select(Sketches.cmEstimate(cells, 4, 64, 5, col("key")).as("e"))
        .where(col("key") === k).head().getLong(0)
      assert(est == nCm, s"key $k: operator estimate $nCm != standalone $est")
    }
    // exact counts are the true frequencies for every survivor
    hh.foreach { case (k, (nExact, _)) => assert(nExact == k) }
  }

  test("heavy-hitter screen itself plans no shuffle before the verify agg") {
    val cells = Sketches.countMinCellsArray(keyed, col("key"), d = 4, w = 512, seed = 7)
    val screen = keyed.where(
      Sketches.cmEstimate(cells, 4, 512, 7, col("key")) >= lit(50L))
    val plan = screen.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"frequency screen must be a narrow projection:\n${plan.take(600)}")
  }

  // ---------------------------------------------------------- Bloom

  test("bloom filter has no false negatives, ever") {
    val members = keyed.where(col("key") % 3 === 0).distinct()
    val bits = Sketches.bloomBits(members, col("key"), m = 1024, k = 4, seed = 5)
    val missed = members
      .where(!Sketches.bloomContains(bits, 1024, 4, 5, col("key")))
      .count()
    assert(missed == 0, s"$missed members failed their own filter")
  }

  test("a cramped bloom filter produces false positives but stays one-sided") {
    val members = keyed.distinct().where(col("key") <= 40)
    // 40 keys × 4 bits into 64 bits: heavily loaded on purpose
    val bits = Sketches.bloomBits(members, col("key"), m = 64, k = 4, seed = 5)
    val verdicts = keyed.distinct()
      .select(col("key"), Sketches.bloomContains(bits, 64, 4, 5, col("key")).as("pass"))
    val fp = verdicts.where(col("pass") && col("key") > 40).count()
    val fn = verdicts.where(!col("pass") && col("key") <= 40).count()
    assert(fn == 0, s"false negatives: $fn")
    assert(fp > 0, "a 64-bit filter over 40 keys must collide")
  }

  test("bloom bits are partition-independent and match the relational bit set") {
    val members = keyed.where(col("key") % 5 === 0).distinct()
    val a = Sketches.bloomBits(members, col("key"), m = 2048, k = 4, seed = 9)
    val b = Sketches.bloomBits(members.repartition(13), col("key"), m = 2048, k = 4, seed = 9)
    assert(a.sameElements(b))
    // relational rebuild: distinct (md5 slice % m) positions
    val hex = md5(concat(lit("9|"), col("key").cast("string")))
    val pos = members.select(explode(array((0 until 4).map(r =>
        graft.functions.HexSlice32(hex, lit(r * 8)) % 2048): _*)).as("pos"))
      .distinct().collect().map(_.getLong(0)).toSet
    val fromBits = (0 until 2048).filter(p => (a(p >>> 6) & (1L << (p & 63))) != 0L).toSet
    assert(fromBits.map(_.toLong) == pos)
  }

  test("null keys: ignored at build, never members at probe") {
    import spark.implicits._
    val members = Seq(Some(3L), None, Some(6L), None).toDF("key")
    // build must not NPE on null keys, and nulls must not set any bits
    val bits = Sketches.bloomBits(members, col("key"), m = 1024, k = 4, seed = 5)
    val noNull = Sketches.bloomBits(members.na.drop(), col("key"), m = 1024, k = 4, seed = 5)
    assert(bits.sameElements(noNull), "null keys must not contribute bits")
    val verdicts = Seq(Some(3L), None, Some(999L)).toDF("key")
      .where(Sketches.bloomContains(bits, 1024, 4, 5, col("key")))
      .select("key").as[Option[Long]].collect()
    assert(verdicts.flatten.contains(3L))
    assert(!verdicts.contains(None), "a null key must never probe as a member")
  }

  test("bloom membership probe plans no shuffle on the probe side") {
    val members = keyed.distinct().limit(100)
    val bits = Sketches.bloomBits(members, col("key"), m = 1024, k = 4, seed = 5)
    val probe = keyed.where(Sketches.bloomContains(bits, 1024, 4, 5, col("key")))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom probe must be a narrow projection:\n${plan.take(600)}")
  }

  test("histogramQuantiles: error bound vs exact order statistic, partition independence, edges") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
      .cache()
    val nBuckets = 256
    val est = Sketches.histogramQuantiles(li, col("v"), nBuckets,
        Seq(1, 25, 50, 75, 99))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).sortBy(_._1)
    val vs = li.orderBy("v").as[Long].collect()
    val (lo, hi) = (vs.head, vs.last)
    val width = (hi - lo + 1 + nBuckets - 1) / nBuckets
    est.foreach { case (q, rank, e) =>
      val exact = vs(rank.toInt - 1)
      assert(math.abs(e - exact) <= width,
        s"q=$q est=$e exact=$exact off by more than bucket width $width")
    }
    // bit-identical on any partitioning (mergeable state)
    val re = Sketches.histogramQuantiles(li.repartition(17), col("v"), nBuckets,
        Seq(1, 25, 50, 75, 99))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).sortBy(_._1)
    assert(est.toSeq == re.toSeq)
    // all-equal column degenerates to the constant
    val const = Sketches.histogramQuantiles(
        Seq(7L, 7L, 7L).toDF("v"), col("v"), 64, Seq(50, 99))
      .collect().map(_.getLong(4)).toSeq
    assert(const == Seq(7L, 7L))
    // q=100 targets the max; q=0 clamps to rank 1 (the min)
    val ends = Sketches.histogramQuantiles(li, col("v"), nBuckets, Seq(0, 100))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).sortBy(_._1)
    assert(ends(0)._2 == 1L && math.abs(ends(0)._3 - lo) <= width)
    assert(ends(1)._2 == vs.length.toLong && math.abs(ends(1)._3 - hi) <= width)
    // discretizer map: bins cover 0..9, are monotone in bucket, and
    // conserve row mass exactly
    val bins = Sketches.quantileBinMap(li, col("v"), nBuckets, nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(bins.map(_._2).sum == vs.length.toLong, "bin mass != n")
    assert(bins.forall(b => b._3 >= 0 && b._3 <= 9))
    assert(bins.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "bins must be monotone in bucket order")
    // per-key form: every estimate within its key's bucket width of
    // the exact per-key order statistic
    val byKey = Sketches.histogramQuantilesByKey(
        graft.Tables.lineitem(spark, sf), "l_returnflag",
        round(col("l_extendedprice") * 100, 0).cast("long"),
        nBuckets, Seq(25, 50, 75))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(5)))
    val byFlag = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("k"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
    byKey.foreach { case (k, q, rank, e) =>
      val vsk = byFlag(k)
      val wk = (vsk.last - vsk.head + 1 + nBuckets - 1) / nBuckets
      val exact = vsk(rank.toInt - 1)
      assert(math.abs(e - exact) <= wk,
        s"grp=$k q=$q est=$e exact=$exact off by more than width $wk")
    }
  }

  test("qdigest: rank error bounded by 2*levels*theta on heavy-tailed data, where equi-width collapses") {
    import spark.implicits._
    // pathological for equi-width: 9999 values in [0, 1000), one
    // outlier at 1,000,000 -> equi-width buckets are ~977 wide and
    // the entire real distribution lands in bucket 0
    val vals = (1 to 9999).map(i => (i * i) % 1000L) :+ 1000000L
    val df = vals.toDF("x")
    val levels = 20
    val k = 512
    val n = vals.length
    val theta = math.max(1L, n / k)
    val out = Sketches.qdigestQuantiles(df, col("x"), 0L, levels, k,
      Seq(1, 25, 50, 75, 99)).collect()
    assert(out.length == 5)
    val sorted = vals.sorted
    out.foreach { r =>
      val target = r.getAs[Long]("target_rank")
      val est = r.getAs[Long]("est")
      // rank of est in the true data: positions with value <= est
      val rankOfEst = sorted.count(_ <= est).toLong
      assert(math.abs(rankOfEst - target) <= 2L * levels * theta,
        s"q=${r.getAs[Long]("q_pct")} est=$est rankOfEst=$rankOfEst target=$target")
    }
    // the median estimate must live inside the real mass, not be
    // dragged toward the outlier (the failure mode of q247's
    // equi-width state on this data)
    val med = out.find(_.getAs[Long]("q_pct") == 50L).get.getAs[Long]("est")
    assert(med < 1000L, s"median $med dragged out of the real distribution")
  }

  test("qdigest: exact when theta = 1, partition-independent always") {
    import spark.implicits._
    val vals = (1 to 400).map(i => (i * 7919L) % 300L)
    val df = vals.toDF("x")
    // n/k < 1 -> theta = 1: every nonzero node kept, leaf masses own
    // everything, estimates are EXACT order statistics
    val exact = Sketches.qdigestQuantiles(df, col("x"), 0L, 16, 100000,
      Seq(1, 25, 50, 75, 99)).collect()
      .map(r => r.getAs[Long]("q_pct") -> r.getAs[Long]("est")).toMap
    val sorted = vals.sorted
    for ((q, est) <- exact) {
      val target = math.max(1L, (vals.length * q + 99) / 100)
      assert(est == sorted((target - 1).toInt), s"q=$q")
    }
    // multiset determinism: any partitioning produces identical rows
    def rows(d: org.apache.spark.sql.DataFrame) =
      Sketches.qdigestQuantiles(d, col("x"), 0L, 16, 64, Seq(25, 50, 75))
        .collect().map(_.toSeq).toSet
    assert(rows(df) == rows(df.repartition(13)))
  }

  test("qdigestByKey: per-key rank-error bound; single-key form equals the flat sketch") {
    import spark.implicits._
    // two groups with very different shapes: a uniform one and a
    // heavy-tailed one (per-key theta must isolate them)
    val a = (1 to 600).map(i => ("u", (i * 31L) % 500L))
    val bTail = (1 to 399).map(i => ("t", (i * 7L) % 50L)) :+ (("t", 900000L))
    val df = (a ++ bTail).toDF("grp", "x")
    val levels = 20
    val k = 128
    val out = Sketches.qdigestQuantilesByKey(df, "grp", col("x"), 0L,
      levels, k, Seq(25, 50, 75)).collect()
    assert(out.length == 6)
    val byGrp = Map("u" -> a.map(_._2).sorted, "t" -> bTail.map(_._2).sorted)
    out.foreach { r =>
      val g = r.getAs[String]("grp")
      val sorted = byGrp(g)
      val theta = math.max(1L, sorted.length / k)
      val rankOfEst = sorted.count(_ <= r.getAs[Long]("est")).toLong
      assert(math.abs(rankOfEst - r.getAs[Long]("target_rank")) <= 2L * levels * theta,
        s"grp=$g q=${r.getAs[Long]("q_pct")}")
    }
    // a single-key input reproduces the flat sketch exactly
    val one = df.where(col("grp") === "u")
    val flat = Sketches.qdigestQuantiles(one, col("x"), 0L, levels, k, Seq(25, 50, 75))
      .collect().map(r => r.getAs[Long]("q_pct") ->
        (r.getAs[Long]("target_rank"), r.getAs[Long]("est"))).toMap
    val keyed = Sketches.qdigestQuantilesByKey(one, "grp", col("x"), 0L,
      levels, k, Seq(25, 50, 75))
      .collect().map(r => r.getAs[Long]("q_pct") ->
        (r.getAs[Long]("target_rank"), r.getAs[Long]("est"))).toMap
    assert(flat == keyed)
  }

  test("qdigest: MERGE = add count tables, recompress — exactly the union's sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // counts are pure per-node tallies, so counts(A ∪ B) ==
    // counts(A) + counts(B) and the closed-form compression of the
    // summed tables IS the union's sketch — the mergeability claim
    val a = (1 to 300).map(i => (i * 13L) % 200L).toDF("x")
    val b = ((1 to 250).map(i => (i * 7L) % 900L) :+ 500000L).toDF("x")
    val levels = 20
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .select(least(lit((1L << levels) - 1),
        greatest(lit(0L), col("x"))).as("leaf"))
      .select(explode(expr(s"transform(sequence(0, $levels), " +
        "l -> named_struct('lvl', l, 'id', shiftright(leaf, l)))")).as("nd"))
      .groupBy(col("nd.lvl").as("lvl"), col("nd.id").as("id"))
      .agg(count(lit(1)).as("cnt"))
    val merged = counts(a).unionByName(counts(b))
      .groupBy("lvl", "id").agg(sum(col("cnt")).as("cnt"))
    val nDf = merged.where(col("lvl") === levels).agg(sum(col("cnt")).as("n"))
    val viaMerge = Sketches.qdigestFromCounts(merged, nDf, 0L, levels, 64,
      Seq(25, 50, 75)).collect().map(_.toSeq).toSet
    val direct = Sketches.qdigestQuantiles(a.unionByName(b), col("x"), 0L,
      levels, 64, Seq(25, 50, 75)).collect().map(_.toSeq).toSet
    assert(viaMerge == direct, "merged sketch != union's sketch")
  }
}
