package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shuffle-shard export (x54) contract: a total, reproducible layout —
  * every row lands in exactly one shard with a dense 1..n position,
  * the layout is identical across re-runs, and the within-shard order
  * is DECORRELATED from the source id order (the whole point of the
  * export shuffle: a loader streaming a shard must not replay ingest
  * order).
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(1000).select(col("id").as("doc_id"))

  test("layout is total, dense per shard, and rerun-identical") {
    val out = Sharding.shuffleShard(docs, "doc_id", nShards = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 1000)
    assert(rows.map(_._1).distinct.length == 1000, "every doc appears once")
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val pos = rs.map(_._3).sorted
      assert(pos.toSeq == (1L to rs.length), s"shard $shard positions not dense")
    }
    // deterministic: a second evaluation produces the identical layout
    val again = Sharding.shuffleShard(docs, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
  }

  test("within-shard order is decorrelated from id order, shards balanced") {
    val out = Sharding.shuffleShard(docs, "doc_id", nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // no shard is pathologically empty or dominant on a uniform corpus
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size == 8)
    assert(sizes.values.min > 60 && sizes.values.max < 190,
      s"shard sizes badly skewed: ${sizes.toMap}")
    // the first 10 positions of shard 0 must not be 10 consecutive ids
    val head = out.filter(_._2 == 0).sortBy(_._3).take(10).map(_._1)
    val consecutive = head.sorted.sliding(2).forall(p => p(1) - p(0) == 1)
    assert(!consecutive, s"shard order replays ingest order: ${head.toSeq}")
  }
}
