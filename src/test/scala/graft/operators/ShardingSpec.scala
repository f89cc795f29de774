package graft.operators

import graft.SparkSpec

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("packShards: per-key budget boundaries, straddling docs, key isolation") {
    val docs = Seq(
      // source a: 400 + 300 -> doc 2 starts at 400 (shard 0, straddles),
      // doc 3 starts at 700 (shard 1), doc 4 starts at 1100 (shard 2)
      (1L, "a", 400L), (2L, "a", 300L), (3L, "a", 400L), (4L, "a", 100L),
      // source b restarts its own cumsum regardless of a's totals
      (5L, "b", 600L), (6L, "b", 10L)
    ).toDF("doc_id", "source", "n_tokens")
    val out = Sharding.packShards(docs, "doc_id", "source", "n_tokens", budget = 500L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (400L, 0L))
    assert(out(2L) == (700L, 0L))  // starts at 400 < 500 -> shard 0
    assert(out(3L) == (1100L, 1L)) // starts at 700 -> shard 1
    assert(out(4L) == (1200L, 2L)) // starts at 1100 -> shard 2
    assert(out(5L) == (600L, 0L))  // b's cumsum is independent
    assert(out(6L) == (610L, 1L))  // starts at 600 -> shard 1
  }

  test("packShards is deterministic under repartitioning") {
    val docs = (1L to 200L).map(i => (i, s"s${i % 7}", 37L + i % 13))
      .toDF("doc_id", "source", "n_tokens")
    val a = Sharding.packShards(docs, "doc_id", "source", "n_tokens", 300L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val b = Sharding.packShards(docs.repartition(11), "doc_id", "source", "n_tokens", 300L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(a == b)
  }
}
