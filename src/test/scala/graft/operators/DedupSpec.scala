package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "a"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog", "a"),   // near dup of 1
    (4L, "completely different content about spark engines", "b"),
    (5L, "completely different content about spark planes", "b"), // near dup of 4
    (6L, "unrelated text with no overlap whatsoever here", "c")
  ).toDF("doc_id", "text", "source")

  test("exactDuplicates keeps min id and counts copies") {
    val out = Dedup.exactDuplicates(docs, "doc_id", "text").collect()
    assert(out.length == 5)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id is the min
  }

  test("word_shingles native expression matches the built-in HOF chain value-for-value") {
    // the chain word_shingles replaced (see WordShingles scaladoc)
    def builtin(text: org.apache.spark.sql.Column, k: Int) = {
      val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
      if (k <= 1) array_distinct(toks)
      else {
        val n = size(toks)
        array_distinct(
          transform(sequence(lit(0), greatest(n - k, lit(0))),
            i => concat_ws("_", slice(toks, i + 1, lit(k)))))
      }
    }
    val tricky = (Seq(
      "", "   ", "one", "one two", "a  b\tc\nd", "UPPER Case MiXeD",
      "x x x x x x", "Ünïcodé tökens ünïcodé tökens straße",
      "short doc", "a b c d e f g h i j k l m") ++
      docs.collect().map(_.getString(1))).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = tricky.toDF("id", "text")
    Seq(1, 2, 3, 5).foreach { k =>
      val got = df.select(col("id"), TextOps.wordShingles(col("text"), k).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select(col("id"), builtin(col("text"), k).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got == want, s"k=$k mismatch")
    }
    // null text → null, as split(null) propagates
    val nullRow = Seq((0L, null: String)).toDF("id", "text")
      .select(TextOps.wordShingles(col("text"), 5)).head()
    assert(nullRow.isNullAt(0))
  }

  test("minhash signatures are identical for identical docs and stable under repartitioning") {
    val sig1 = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig1(1L) == sig1(2L))
    assert(sig1(1L) != sig1(6L))
    val sig2 = Dedup.minhashSignatures(docs.repartition(7), "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig1 == sig2, "signatures must not depend on partitioning")
  }

  test("minhash_sig native expression matches the aggregate form bit-for-bit") {
    for (k <- Seq(1, 2); n <- Seq(4, 16)) {
      val agg = Dedup.minhashSignatures(docs, "doc_id", "text", n, k)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val narrow = Dedup.minhashSignaturesNarrow(docs, "doc_id", "text", n, k)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(narrow == agg, s"k=$k n=$n: narrow != aggregate")
    }
    // token-less docs are dropped by both forms
    val empty = Seq((1L, "   ", "a"), (2L, "real text", "a")).toDF("doc_id", "text", "source")
    assert(Dedup.minhashSignaturesNarrow(empty, "doc_id", "text", 8).count() == 1)
  }

  test("lsh candidate pairs surface near-dups with high estimated jaccard") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
    val pairs = Dedup.lshCandidatePairs(sig, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)          // exact dup → all hashes agree
    assert(pairs.contains((1L, 3L)))         // near dup caught by some band
    assert(pairs((1L, 3L)) > 0.3)
    assert(!pairs.contains((1L, 6L)))        // unrelated not candidate
  }

  test("simhash64 native expression matches the aggregate form bit-for-bit") {
    val agg = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val narrow = Dedup.simhashNarrow(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow == agg)
    val empty = Seq((1L, " ", "a"), (2L, "real text", "a")).toDF("doc_id", "text", "source")
    assert(Dedup.simhashNarrow(empty, "doc_id", "text").count() == 1)
  }

  test("simhash: identical docs equal, near dups close, unrelated far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L))
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(6L)))
  }

  test("simhashNearDups finds the exact pair via band blocking") {
    val pairs = Dedup.simhashNearDups(Dedup.simhash(docs, "doc_id", "text"), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("passage dedup flags exactly the verbatim cross-doc 8-token windows (q148's law)") {
    // the q148 composition on the fixture: the exact-dup pair (1,2)
    // shares EVERY window; the near-dup pair (1,3) differs at a token
    // inside every 8-window, so substring-level dedup correctly sees
    // no shared passage where set-similarity sees jaccard 7/9
    val g = Dedup.shingleTokens(docs, "doc_id", "text", shingleK = 8)
      .select(col("doc_id"), md5(col("tok")).as("h"))
    val c = g.groupBy("h").agg(count(lit(1)).as("ndocs"))
    val res = g.join(c, "h").groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        count(when(col("ndocs") >= 2, lit(1))).as("n_dup_passages"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(res(1L) == ((2L, 2L)) && res(2L) == ((2L, 2L))) // 9 toks → 2 windows, all shared
    assert(res(3L)._2 == 0L && res(4L)._2 == 0L && res(5L)._2 == 0L && res(6L)._2 == 0L)
  }

  test("jaccardPairs computes exact set jaccard within blocks only") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", "source", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    // doc1 vocab = {the,quick,brown,fox,jumps,over,lazy,dog} (8),
    // doc3 swaps jumps→leaps: inter=7, union=9
    assert(math.abs(out((1L, 3L)) - 7.0 / 9.0) < 1e-12)
    assert(!out.contains((1L, 4L))) // different block
  }

  test("cross-set prefix join equals the direct join restricted to cross pairs (q150's law)") {
    val real = graft.Tables.documents(spark, sf)
    def tokOf(f: org.apache.spark.sql.Column) = real.where(f)
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    val across = Dedup.jaccardPairsAcrossTokens(
        tokOf(pmod(col("doc_id"), lit(7)) === 0),
        tokOf(pmod(col("doc_id"), lit(7)) =!= 0), minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // direct exact join with no blocking, restricted to cross pairs
    // (either orientation — the direct form orders d1 < d2)
    val direct = Dedup.jaccardPairsTokens(
        real.select(col("doc_id"), lit("all").as("blk"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("tok")), 0.5)
      .collect().flatMap { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        if (a % 7 == 0 && b % 7 != 0) Some((a, b) -> j)
        else if (b % 7 == 0 && a % 7 != 0) Some((b, a) -> j)
        else None
      }.toMap
    assert(across.nonEmpty, "fixture has no cross-set near-dups at 0.5")
    assert(across == direct)
  }

  test("cluster-level split never separates near-duplicates (q144's law)") {
    val real = graft.Tables.documents(spark, sf)
    val pairs = Dedup.jaccardPairs(real, "doc_id", "text", "source", 0.8)
      .select("d1", "d2").cache()
    assert(pairs.count() > 0, "fixture has no near-dup pairs at 0.8")
    val clusters = Dedup.clusterDuplicates(pairs, real.select("doc_id"))
    val split = clusters.select(col("doc_id"),
      when(Sampling.md5Bits32(7, col("cluster_rep")) < 3435973836L, "train")
        .otherwise("heldout").as("split"))
    // every near-dup pair lands whole on one side
    val leaked = pairs
      .join(split.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("split", "s1"), "d1")
      .join(split.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("split", "s2"), "d2")
      .where(col("s1") =!= col("s2")).count()
    assert(leaked == 0, s"$leaked near-dup pairs straddle the split")
    // and the invariant is non-vacuous: a DOC-level split of the same
    // rate DOES separate at least one near-dup pair on this fixture
    val docLeaked = pairs
      .where((Sampling.md5Bits32(7, col("d1")) < 3435973836L) =!=
        (Sampling.md5Bits32(7, col("d2")) < 3435973836L)).count()
    assert(docLeaked > 0, "fixture cannot demonstrate doc-level leakage")
  }

  test("sorted-neighborhood candidates: exact count, uniqueness, one exchange") {
    val docs = graft.Tables.documents(spark, sf)
    val w = 3
    def build() = Dedup.sortedNeighborhoodCandidates(docs, "doc_id", "source",
      substring(lower(col("text")), 1, 40), w)
    // plan audited on an uncached copy: caching below wraps the plan in
    // an InMemoryRelation whose string repeats the child plan
    val exchanges = "Exchange".r.findAllIn(
      build().queryExecution.executedPlan.toString).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges")
    val cand = build().cache()
    // per block of n rows the window emits n*w - w(w+1)/2 pairs
    val expected = docs.groupBy("source").count().collect()
      .map(r => { val n = r.getLong(1); n * w - w.toLong * (w + 1) / 2 }).sum
    assert(cand.count() == expected)
    assert(cand.distinct().count() == cand.count(), "duplicate candidate pair")
    assert(cand.where(col("d1") >= col("d2")).count() == 0, "pair not least-first")
    cand.unpersist()
  }

  test("jaccardPairsPrefix returns bit-identical results to the naive join") {
    // wide-vocab corpus with shared stop words (the naive join's blowup
    // case) plus planted near-dup families, across two blocks
    val rnd = new scala.util.Random(13)
    val stop = Seq("the", "a", "of", "and", "to")
    val vocab = (0 until 120).map(i => s"w$i")
    val synth = (1L to 90L).map { id =>
      val fam = id % 9 // nine families of near-identical docs
      val famRnd = new scala.util.Random(fam)
      val base = famRnd.shuffle(vocab).take(14 + famRnd.nextInt(6))
      val mut = base.map(w => if (rnd.nextDouble() < 0.12) vocab(rnd.nextInt(vocab.size)) else w)
      (id, (stop ++ mut).mkString(" "), if (id % 2 == 0) "x" else "y")
    }.toDF("doc_id", "text", "source")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val naive = Dedup.jaccardPairs(synth, "doc_id", "text", "source", t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val pref = Dedup.jaccardPairsPrefix(synth, "doc_id", "text", "source", t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pref == naive, s"threshold $t: prefix-filtered != naive")
      assert(naive.nonEmpty, s"threshold $t: degenerate test corpus")
    }
  }

  test("jaccardPairsAcrossBitmap is bit-identical to the prefix form") {
    // same synthetic shape as the prefix test: shared stop words,
    // planted near-dup families, plus noise docs; vocab ≈ 125 ≪ 4096
    val rnd = new scala.util.Random(41)
    val stop = Seq("the", "a", "of", "and", "to")
    val vocab = (0 until 120).map(i => s"w$i")
    val synth = (1L to 80L).map { id =>
      val fam = id % 8
      val famRnd = new scala.util.Random(fam)
      val base = famRnd.shuffle(vocab).take(12 + famRnd.nextInt(8))
      val mut = base.map(w => if (rnd.nextDouble() < 0.15) vocab(rnd.nextInt(vocab.size)) else w)
      (id, (stop ++ mut).mkString(" "))
    }
    def tokOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    val probe = synth.filter(_._1 % 5 == 0)
    val corpus = synth.filter(_._1 % 5 != 0)
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val pref = Dedup.jaccardPairsAcrossTokens(tokOf(probe), tokOf(corpus), t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val bm = Dedup.jaccardPairsAcrossBitmap(tokOf(probe), tokOf(corpus), t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(bm == pref, s"threshold $t: bitmap != prefix")
    }
    // dispatcher picks the bitmap path here and the result agrees too
    val viaDispatch = Dedup.jaccardPairsAcross(tokOf(probe), tokOf(corpus), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val direct = Dedup.jaccardPairsAcrossTokens(tokOf(probe), tokOf(corpus), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaDispatch == direct)
    assert(direct.nonEmpty)
  }

  test("containmentPairsAcrossTokens: prefix filter invisible vs the naive join") {
    // probe docs include exact substrings of corpus docs (the
    // containment-not-Jaccard case: small probe inside big corpus doc)
    val rnd = new scala.util.Random(29)
    val vocab = (0 until 100).map(i => s"w$i")
    val corpus = (100L to 140L).map { id =>
      val r2 = new scala.util.Random(id)
      (id, r2.shuffle(vocab).take(20 + r2.nextInt(10)).mkString(" "))
    }
    val probe = (1L to 30L).map { id =>
      val src = corpus((id % corpus.size).toInt)._2.split(" ")
      val keep = src.take(5 + rnd.nextInt(src.length - 5))
      // a third of the probes get noise tokens breaking containment
      val doc = if (id % 3 == 0) keep.toSeq ++ Seq(s"noise$id", s"junk$id")
        else keep.toSeq
      (id, doc.mkString(" "))
    }
    def tokOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    for (t <- Seq(0.4, 0.7, 0.95)) {
      val naive = tokOf(probe).as("a")
        .join(tokOf(corpus).as("b"), col("a.tok") === col("b.tok"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_inter"))
        .join(tokOf(probe).groupBy("doc_id").agg(count(lit(1)).as("n1"))
          .withColumnRenamed("doc_id", "d1"), Seq("d1"))
        .select(col("d1"), col("d2"),
          (col("n_inter") * lit(1.0) / col("n1")).as("containment"))
        .where(col("containment") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val got = Dedup.containmentPairsAcrossTokens(tokOf(probe), tokOf(corpus), t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == naive, s"threshold $t: prefix-filtered != naive")
      assert(naive.nonEmpty, s"threshold $t: degenerate fixture")
      val bm = Dedup.containmentPairsAcrossBitmap(tokOf(probe), tokOf(corpus), t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(bm == naive, s"threshold $t: bitmap != naive")
    }
  }

  test("coOccurrencePairs: bitset kernel bit-identical to the self-join, both regimes") {
    import spark.implicits._
    // 200 bags over 131 items (spans >2 words), skewed membership,
    // duplicate (bag, item) rows on purpose
    val bagItem = (0 until 200).flatMap { bag =>
      (0 until (bag % 7) + 1).map(j => (bag.toLong, ((bag * 37 + j * j) % 131).toLong))
    }
    val df = (bagItem ++ bagItem.take(50)).toDF("bag", "item")
    val naive = {
      val a = df.select(col("bag"), col("item").as("i1")).distinct()
      val b = df.select(col("bag"), col("item").as("i2")).distinct()
      a.join(b, Seq("bag")).where(col("i1") < col("i2"))
        .select("i1", "i2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val dense = Dedup.coOccurrencePairsBitmap(df, maxItems = 4096).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dense == naive && naive.nonEmpty)
    // over-cap item space: bitmap refuses, dispatcher falls back and
    // still matches
    assert(Dedup.coOccurrencePairsBitmap(df, maxItems = 64).isEmpty)
    val sparse = Dedup.coOccurrencePairs(df, maxItems = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sparse == naive)
    // string items go through the same dictionary
    val sdf = df.select(col("bag"), concat(lit("it"), col("item")).as("item"))
    val sNaive = naive.map { case (a, b) =>
      val (x, y) = (s"it$a", s"it$b"); if (x < y) (x, y) else (y, x)
    }
    val sGot = Dedup.coOccurrencePairs(sdf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sGot == sNaive)
  }

  test("tokenWindows: windows reconstruct the token sequence exactly") {
    val texts = Seq("", "   ", "one", "one two three",
      "a  b\tc d e f g h i", docs.collect().map(_.getString(1)).mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    for (k <- Seq(1, 3, 8)) {
      val got = df.select(col("id"), array_join(transform(
          TextOps.tokenWindows(col("text"), k), w => w.getField("passage")), " ").as("j"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = df.select(col("id"),
          array_join(TextOps.tokens(col("text")), " ").as("j"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"k=$k")
    }
  }

  test("simHashNearDupPairs: pigeonhole block join identical to brute force; dup invariants") {
    // real corpus slice — the structure the blocking must not miss
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0, 3, 7)) {
      val blocked = Dedup.simHashNearDupPairs(corpus, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = Dedup.simHashNearDupPairsBrute(corpus, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == brute, s"maxHamming=$t: blocked ${blocked.size} != brute ${brute.size}")
    }
    // the native expression is bit-equal to the relational vote chain
    val nat = Dedup.simHashPortable(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rel = Dedup.simHashPortableRelational(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nat == rel, "native simhash_portable != relational vote chain")
    // identical texts get identical signatures → hamming 0
    val sig = Dedup.simHashPortable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sig(1L) == sig(2L), "exact dup texts differ in signature")
    assert(sig.values.forall { case (a, b) =>
      a >= 0 && a < (1L << 32) && b >= 0 && b < (1L << 32) }, "word out of u32 range")
    // the guard refuses thresholds past the pigeonhole guarantee
    val ex = intercept[IllegalArgumentException] {
      Dedup.simHashNearDupPairs(docs, "doc_id", "text", 8)
    }
    assert(ex.getMessage.contains("pigeonhole"))
  }

  test("deletion_variants_tagged: hashes == xxhash64(variant), tags correct, nd<=1 deduped") {
    import spark.implicits._
    // repeated chars ("aab": two 1-deletions collapse to "ab"),
    // a non-BMP code point, empty and 1-char edges
    val df = Seq("kitten", "aab", "a😀b", "", "x").toDF("s")
    val tagged = df.select(col("s"),
        explode(graft.functions.DeletionVariantsTagged(col("s"), 2)).as("t"))
      .select(col("s"), col("t.h").as("h"), col("t.nd").as("nd"),
        col("t.pos").as("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // reference: per-string untagged neighborhood, hashed by Spark's own
    // xxhash64 — every tagged hash must appear there and vice versa
    val untaggedH = df.select(col("s"),
        explode(graft.operators.Dedup.deletionVariants(col("s"), 2)).as("v"))
      .select(col("s"), xxhash64(col("v")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val taggedByS = tagged.groupBy(_._1)
    taggedByS.foreach { case (s, rows) =>
      assert(rows.map(_._2).toSet == untaggedH(s),
        s"hash set mismatch vs xxhash64(deletion_variants) for '$s'")
      // nd<=1 rows are string-deduped: their hash multiset has no dups
      val nd01 = rows.filter(_._3 <= 1).map(_._2)
      assert(nd01.distinct.size == nd01.size, s"nd<=1 dup rows for '$s'")
      // tag sanity: self row present exactly once with pos -1
      assert(rows.count(r => r._3 == 0) == 1 && rows.find(_._3 == 0).get._4 == -1)
      // nd=2 rows carry i*65536+j with i<j in code points
      rows.filter(_._3 == 2).foreach { r =>
        val i = r._4 / 65536; val j = r._4 % 65536
        assert(i < j && j < s.codePointCount(0, s.length), s"bad pos tag in '$s'")
      }
    }
    // "aab": 1-deletion strings {"ab"(x2 collapsed),"aa"} → 2 nd=1 rows
    assert(taggedByS("aab").count(_._3 == 1) == 2)
  }

  test("fuzzyJoinPairs: deletion blocking complete vs brute force at k=1 and k=2") {
    import spark.implicits._
    // handcrafted radii: exact dup, 1-sub, 1-del, 2-sub, 1-sub+1-del,
    // transposition (= ed 2), ed-3 (must NOT match at k=2), empties
    val df = Seq(
      1L -> "kitten", 2L -> "kitten", 3L -> "mitten", 4L -> "kiten",
      5L -> "mitter", 6L -> "miten", 7L -> "kittne", 8L -> "sitting",
      9L -> "", 10L -> "a", 11L -> "ab"
    ).toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val blocked = Dedup.fuzzyJoinPairs(df, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
      val brute = Dedup.fuzzyJoinPairsBrute(df, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
      assert(blocked == brute, s"blocking incomplete at maxDist=$k")
    }
    // spot invariants at k=2
    val p2 = Dedup.fuzzyJoinPairs(df, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(4)).toMap
    assert(p2((1L, 2L)) == 0)                  // exact dup
    assert(p2((1L, 7L)) == 2)                  // transposition
    assert(p2((3L, 5L)) == 1)                  // 1-sub
    assert(!p2.contains((1L, 8L)))             // kitten→sitting is ed 3
    assert(p2((9L, 10L)) == 1 && p2((9L, 11L)) == 2) // empty vs "a","ab"
    // the fixture's real corpus: blocked == brute on customer names
    val names = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val blocked = Dedup.fuzzyJoinPairs(names, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.fuzzyJoinPairsBrute(names, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute && blocked.nonEmpty)
  }
}
