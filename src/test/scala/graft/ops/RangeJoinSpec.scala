package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Banded range join (SURVEY §2 custom-operator list).
  *
  * Pins the round-11 histogram rewrite of `rangeMatchCounts`: on its
  * documented UNIQUE-KEY precondition, counts must be identical to the
  * pair-enumeration spelling (enumerate every key_a≠key_b pair within
  * ±radius, group, count) on inputs with heavy value duplication,
  * band-boundary values, and NULLs — the three shapes where a
  * histogram-vs-histogram count could silently diverge. With duplicate
  * keys the histogram spelling deliberately counts same-key OTHER ROWS
  * (minus-one-self semantics, see the Scaladoc); that divergence is
  * pinned below so it can never drift silently (ADVICE r11).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteCounts(rows: Seq[(Int, java.lang.Double)], radius: Double)
      : Map[Int, Long] =
    rows.map { case (k, v) =>
      val n =
        if (v == null) 0L
        else rows.count { case (k2, v2) =>
          k2 != k && v2 != null && v2 >= v - radius && v2 <= v + radius
        }.toLong
      k -> n
    }.toMap

  test("rangeMatchCounts matches brute-force pair counts (dups + boundaries)") {
    // duplicated values, exact band boundaries (v = band*r), and spread
    val vals: Seq[(Int, java.lang.Double)] =
      Seq(1 -> 10.0, 2 -> 10.0, 3 -> 10.0, 4 -> 15.0, 5 -> 14.9,
        6 -> 20.0, 7 -> 25.0, 8 -> 25.1, 9 -> 60.0, 10 -> 5.0)
        .map { case (k, v) => (k, java.lang.Double.valueOf(v)) }
    val df = vals.toDF("k", "v")
    val got = RangeJoin.rangeMatchCounts(df, "k", "v", 5.0)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == bruteCounts(vals, 5.0))
  }

  test("rangeMatchCounts keeps NULL-valued rows with zero matches") {
    val vals: Seq[(Int, java.lang.Double)] =
      Seq((1, java.lang.Double.valueOf(10.0)),
        (2, null: java.lang.Double),
        (3, java.lang.Double.valueOf(12.0)))
    val df = vals.toDF("k", "v")
    val got = RangeJoin.rangeMatchCounts(df, "k", "v", 5.0)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 1L, 2 -> 0L, 3 -> 1L))
  }

  test("rangeMatchCounts is duplication-invariant in plan size (histogram join)") {
    // 200 rows over only 7 distinct values: the histogram side the
    // neighbour join reads must be bounded by distinct values, not rows.
    val vals = (0 until 200).map(i => (i, java.lang.Double.valueOf((i % 7) * 2.0)))
    val df = vals.toDF("k", "v")
    val out = RangeJoin.rangeMatchCounts(df, "k", "v", 3.0)
    val got = out.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == bruteCounts(vals, 3.0))
    // the aggregate below the neighbour join groups by the VALUE column
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), plan.take(400))
  }

  test("rangeMatchCounts under DUPLICATE keys: minus-one-self row " +
      "semantics (documented divergence from the same-key-excluding " +
      "pair spelling)") {
    // key 1 appears twice at v=10.0; key 2 sits in range at v=12.0
    val df = Seq((1, 10.0), (1, 10.0), (2, 12.0)).toDF("k", "v")
    val got = RangeJoin.rangeMatchCounts(df, "k", "v", 5.0)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    // one OUTPUT row per INPUT row (duplicates preserved)
    assert(got.length == 3, s"got ${got.toSeq}")
    // each key-1 row counts the OTHER key-1 row AND key 2 => 2, never 1
    // (the pair spelling's a.k =!= b.k would have said 1); key 2 counts
    // both key-1 rows => 2
    assert(got.toSeq.sorted == Seq((1, 10.0, 2L), (1, 10.0, 2L), (2, 12.0, 2L)),
      s"got ${got.toSeq}")
  }

  test("selfRangeJoin pairs agree with rangeMatchCounts totals") {
    val vals = (0 until 50).map(i => (i, java.lang.Double.valueOf(i * 1.3 % 11)))
    val df = vals.toDF("k", "v")
    val pairTotal = RangeJoin.selfRangeJoin(df, "k", "v", 2.0).count()
    val countTotal = RangeJoin.rangeMatchCounts(df, "k", "v", 2.0)
      .agg(sum("n_within")).collect()(0).getLong(0)
    assert(pairTotal == countTotal)
  }
}
