package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic decontamination (x69) contract: a training doc is flagged
  * iff SOME eval embedding sits inside its cosine epsilon-ball;
  * n_close counts the offenders, max_sim is the worst, clean docs
  * produce no row, and scaled copies (cosine 1.0) are caught even
  * though no n-gram overlaps.
  */
class SemanticDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval: two 4-dim benchmark vectors; train: one exact copy, one
  // scaled copy (cosine 1.0 — the case lexical decontamination
  // misses), one near-miss off-ball, one orthogonal clean doc, and
  // one doc close to BOTH eval vectors' directions? (no — axes are
  // orthogonal; 201 is close to e1 only)
  private def eval = Seq(
    (100L, Seq(100L, 0L, 0L, 0L)),
    (101L, Seq(0L, 100L, 0L, 0L)))
    .toDF("doc_id", "embedding")
  private def train = Seq(
    (200L, Seq(100L, 0L, 0L, 0L)),   // exact copy of eval 100
    (201L, Seq(300L, 0L, 0L, 0L)),   // scaled copy: cosine 1.0
    (202L, Seq(100L, 30L, 0L, 0L)),  // cosine ~0.958 — off the 0.999 ball
    (203L, Seq(0L, 0L, 100L, 0L)))   // orthogonal, clean
    .toDF("doc_id", "embedding")

  test("epsilon-ball membership flags exact and scaled copies only") {
    val out = Similarity.semanticDecontaminate(train, eval,
        "doc_id", "embedding", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(200L, 201L), "off-ball and orthogonal docs stay")
    assert(out(200L) == ((1L, 1.0)), "one eval offender at cosine 1.0")
    assert(out(201L) == ((1L, 1.0)), "scale-invariant: cosine catches it")
  }

  test("n_close counts every offending eval doc") {
    val evalDup = eval.union(
      Seq((102L, Seq(200L, 0L, 0L, 0L))).toDF("doc_id", "embedding"))
    val out = Similarity.semanticDecontaminate(train, evalDup,
        "doc_id", "embedding", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(200L) == 2L && out(201L) == 2L)
  }

  test("empty eval set flags nothing; empty train yields empty output") {
    assert(Similarity.semanticDecontaminate(train,
      eval.filter(col("doc_id") < 0), "doc_id", "embedding", 0.999)
      .count() == 0L)
    assert(Similarity.semanticDecontaminate(train.filter(col("doc_id") < 0),
      eval, "doc_id", "embedding", 0.999).count() == 0L)
  }
}
