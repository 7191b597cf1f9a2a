package graft.ops

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Token-budget selection (x71) and BPE pair counting (x72) contracts. */
class BudgetBpeSpec extends SparkSpec {
  import spark.implicits._

  // domain A: three docs of 4 tokens each, quality (distinct tokens)
  // 4 > 3 > 2; domain B: one doc over budget on its own
  private def docsDf = Seq(
    (1L, "a", "w x y z"),          // q=4, 4 tokens
    (2L, "a", "w w x y"),          // q=3
    (3L, "a", "w w x x"),          // q=2
    (10L, "b", "p q r s t u v w neverfits j k l m")) // 13 tokens
    .toDF("doc_id", "source", "text")

  test("budget keeps the quality-ranked prefix per domain") {
    val out = Sampling.tokenBudgetSelect(docsDf, "doc_id", "text",
        "source", budget = 8L)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    // domain a: cum 4, 8, 12 → docs 1 and 2 fit, doc 3 overflows
    assert(out(1L) == ((4L, true)) && out(2L) == ((8L, true)))
    assert(out(3L) == ((12L, false)))
    // domain b: a single 13-token doc cannot fit an 8-token budget
    assert(out(10L) == ((13L, false)))
    assert(out.size == 4, "one row per input doc")
  }

  test("budget selection is partition-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetSelect(df, "doc_id", "text", "source", 8L)
        .collect().map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5))).toSet
    assert(run(docsDf) == run(docsDf.repartition(5)))
  }

  test("bpe pairs are word-frequency-weighted and rank-deterministic") {
    // "ab" appears in both words; word "abc" occurs 2×, "abd" 1× —
    // so cnt(ab) = 3, cnt(bc) = 2, cnt(bd) = 1; 1-char words add none
    val df = Seq((1L, "abc abd x"), (2L, "abc y")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCounts(df, "doc_id", "text", topN = 10)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("ab", 3L, 1L), ("bc", 2L, 2L), ("bd", 1L, 3L)))
  }

  test("bpe training learns merges greedily and uses merged symbols") {
    // "abab"×2: round 1 merges (a,b) — 4 occurrences beat (b,a)'s 2 —
    // and round 2 merges the MERGED symbol pair (ab,ab)
    val df = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, "doc_id", "text", merges = 4)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "b", 4L), (2L, "ab", "ab", 2L)),
      s"got ${out.toSeq}")
  }

  test("bpe training is greedy-non-overlapping and stops when pairs run out") {
    // vocab: aa(3) ab(1) b(1); (a,a) counts 3 (one per 'aa', no overlap
    // inside a 2-char word), then only (a,b) remains, then nothing
    val df = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, "doc_id", "text", merges = 4)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "a", 3L), (2L, "a", "b", 1L)),
      s"got ${out.toSeq}")
  }

  test("bpe training counts overlapping pairs per greedy scan, not naively") {
    // "aaa": adjacent-pair count for (a,a) is 2 in round 1 (both
    // windows), but the greedy merge yields [aa, a]; round 2 then sees
    // (aa,a) once — the fold must not re-merge the fresh symbol
    val df = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, "doc_id", "text", merges = 2)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)),
      s"got ${out.toSeq}")
  }

  test("bpe segmentation applies the learned merges via the vocabulary") {
    val df = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    // one merge (a,a): aa→[aa], ab→[a,b], b→[b]
    val out = TextAnalysis.bpeSegment(df, "doc_id", "text", merges = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((3L, 4L)), 2L -> ((2L, 2L))), s"$out")
    // zero merges degenerate to character counts per word
    val chars = TextAnalysis.bpeSegment(df, "doc_id", "text", merges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chars == Map(1L -> 6L, 2L -> 3L), s"$chars")
    // more merges never increase the subword count
    val m4 = TextAnalysis.bpeSegment(df, "doc_id", "text", merges = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m4.forall { case (id, n) => n <= out(id)._2 }, s"$m4 vs $out")
  }

  test("segmentation past pair exhaustion keeps the LAST vocabulary") {
    // the r10 oracle-desync shape: the corpus exhausts its pair supply
    // (2 learnable merges) before the requested merges=4 rounds. The
    // engine must keep segmenting with the final vocabulary — not
    // degrade to characters, not change with the requested round count
    // once past exhaustion. (The DuckDB twin's LEFT-JOIN fallback was
    // proven hash-identical on this exact corpus shape via the x75/x76
    // oracle gate on an exhaustion fixture.)
    val df = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(df, "doc_id", "text", merges = 4)
      .count() == 2L, "only 2 merges learnable")
    def seg(m: Int) = TextAnalysis.bpeSegment(df, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val atExhaustion = seg(2)
    assert(seg(3) == atExhaustion && seg(4) == atExhaustion && seg(7) == atExhaustion,
      "rounds past exhaustion must be no-ops on the vocabulary")
  }

  test("bpe training is deterministic under repartition") {
    val df = Seq((1L, "abc abd x"), (2L, "abc y"), (3L, "bcd bcd")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeTrain(d, "doc_id", "text", merges = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(run(df) == run(df.repartition(7)))
  }

  test("bpe pair counting is total on empty and 1-char-only corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bpePairCounts(empty, "doc_id", "text").count() == 0L)
    val ones = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.bpePairCounts(ones, "doc_id", "text").count() == 0L)
    // the trainer is equally total: zero merges learned, empty frame
    assert(TextAnalysis.bpeTrain(empty, "doc_id", "text").count() == 0L)
    assert(TextAnalysis.bpeTrain(ones, "doc_id", "text").count() == 0L)
  }
}
